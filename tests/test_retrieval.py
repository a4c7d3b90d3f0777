"""Retrieval-path tests: the streaming blocked top-k MIPS must equal the
full-matrix path exactly (values and ids), including seen-item masking and
non-multiple block boundaries."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arec.retrieval.mips import blocked_topk_mips
from arec.train.evalu import _topk_full


@pytest.mark.parametrize("v,block", [(1000, 256), (1000, 1000), (777, 256)])
def test_blocked_topk_matches_full(v, block):
    b, d, s = 64, 16, 9
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    items = jnp.asarray(rng.standard_normal((v, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(v), jnp.float32)
    seen = rng.integers(0, v, (b, s)).astype(np.int32)
    seen[:, 5:] = -1
    seen = jnp.asarray(seen)

    fv, fi = _topk_full(q, items, bias, seen, k=10,
                        compute_dtype=jnp.float32)
    bv, bi = blocked_topk_mips(q, items, bias, seen, k=10, block=block,
                               compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(bv), np.asarray(fv),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(fi))


def test_blocked_topk_never_returns_seen():
    b, v, d = 32, 500, 8
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    items = jnp.asarray(rng.standard_normal((v, d)), jnp.float32)
    bias = jnp.zeros((v,))
    seen = jnp.asarray(rng.integers(0, v, (b, 20)).astype(np.int32))
    _, ids = blocked_topk_mips(q, items, bias, seen, k=5, block=128,
                               compute_dtype=jnp.float32)
    ids = np.asarray(ids)
    seen_np = np.asarray(seen)
    for r in range(b):
        assert not set(ids[r]) & set(seen_np[r]), r
