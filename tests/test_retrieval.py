"""Retrieval-path tests: the query-blocked production top-k MIPS must equal
the full-matrix path exactly (values and ids), including seen-item masking
and non-multiple query-block boundaries; the approx serving mode must honor
masking and hit a high recall on easy inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arec.retrieval.mips import blocked_topk_mips
from arec.train.evalu import _topk_full


@pytest.mark.parametrize("qblock", [16, 64, 24])  # 24: 64 % 24 != 0 (padding)
def test_blocked_topk_matches_full(qblock):
    b, v, d, s = 64, 1000, 16, 9
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    items = jnp.asarray(rng.standard_normal((v, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(v), jnp.float32)
    seen = rng.integers(0, v, (b, s)).astype(np.int32)
    seen[:, 5:] = -1
    seen = jnp.asarray(seen)

    fv, fi = _topk_full(q, items, bias, seen, k=10,
                        compute_dtype=jnp.float32)
    bv, bi = blocked_topk_mips(q, items, bias, seen, k=10, qblock=qblock,
                               compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(bv), np.asarray(fv),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(fi))


def test_blocked_topk_auto_qblock_matches_full():
    """qblock=0 derives the chunk from score_mem_mb; result is unchanged.
    v=8000 with a 1 MB budget forces real chunking (qblock < b, with a
    padded final chunk: 48 % 32 != 0)."""
    b, v, d = 48, 8000, 8
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    items = jnp.asarray(rng.standard_normal((v, d)), jnp.float32)
    bias = jnp.zeros((v,))
    seen = jnp.full((b, 4), -1, jnp.int32)
    assert 0 < (1 << 20) // (4 * v) < b  # precondition: budget forces chunks
    fv, fi = _topk_full(q, items, bias, seen, k=7, compute_dtype=jnp.float32)
    bv, bi = blocked_topk_mips(q, items, bias, seen, k=7,
                               compute_dtype=jnp.float32, score_mem_mb=1)
    np.testing.assert_allclose(np.asarray(bv), np.asarray(fv),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(fi))


def test_blocked_topk_degenerate_k_exceeds_unseen():
    """k > #unseen items: the -1e9 penalty (not -inf) keeps the tail of the
    top-k ordered by true score among seen items, exactly like _topk_full."""
    b, v, d, k = 8, 10, 4, 5
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    items = jnp.asarray(rng.standard_normal((v, d)), jnp.float32)
    bias = jnp.zeros((v,))
    # 6 distinct seen per row → only 4 unseen < k
    seen = jnp.asarray(np.stack([rng.permutation(v)[:6] for _ in range(b)])
                       .astype(np.int32))
    fv, fi = _topk_full(q, items, bias, seen, k=k, compute_dtype=jnp.float32)
    bv, bi = blocked_topk_mips(q, items, bias, seen, k=k, qblock=3,
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
    _, ids = blocked_topk_mips(q, items, bias, seen, k=5, qblock=8,
                               compute_dtype=jnp.float32)
    ids = np.asarray(ids)
    seen_np = np.asarray(seen)
    for r in range(b):
        assert not set(ids[r]) & set(seen_np[r]), r


def test_blocked_topk_approx_mode():
    """recall_target < 1: seen masking still holds, and recall vs the exact
    ids is ≥ the target on this easy distribution (CPU lowering of
    approx_max_k is exact, so this is = 1.0 in CI; the bound is what the
    TPU path guarantees in expectation)."""
    b, v, d = 32, 2000, 16
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    items = jnp.asarray(rng.standard_normal((v, d)), jnp.float32)
    bias = jnp.zeros((v,))
    seen = jnp.asarray(rng.integers(0, v, (b, 10)).astype(np.int32))
    _, exact_ids = blocked_topk_mips(q, items, bias, seen, k=10, qblock=16,
                                     compute_dtype=jnp.float32)
    _, approx_ids = blocked_topk_mips(q, items, bias, seen, k=10, qblock=16,
                                      compute_dtype=jnp.float32,
                                      recall_target=0.95)
    approx_np, exact_np = np.asarray(approx_ids), np.asarray(exact_ids)
    seen_np = np.asarray(seen)
    recalls = []
    for r in range(b):
        assert not set(approx_np[r]) & set(seen_np[r]), r
        recalls.append(len(set(approx_np[r]) & set(exact_np[r])) / 10)
    assert np.mean(recalls) >= 0.9, np.mean(recalls)
