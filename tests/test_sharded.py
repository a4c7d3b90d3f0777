"""Distributed tests on the 8-fake-device CPU mesh (SURVEY.md §4
"Distributed tests without a cluster"). Golden invariant: the sharded
forward/backward equals the single-device reference path within tolerance
(SURVEY.md §7 lists sparse-grad-under-sharding as hard part #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from arec.dist.mesh import make_mesh
from arec.dist.specs import param_pspecs
from arec.tables.engine import dense_lookup
from arec.tables.sharded import (
    make_sharded_lookup, pad_table_rows, round_up_rows,
)

V, D, N = 37, 16, 50  # deliberately non-divisible vocab


@pytest.fixture(params=[(1, 8), (2, 4), (4, 2)])
def mesh(request):
    return make_mesh(*request.param)


@pytest.fixture
def table_ids(mesh):
    rng = np.random.default_rng(0)
    t_model = mesh.shape["model"]
    table = jnp.asarray(rng.normal(size=(round_up_rows(V, t_model), D)),
                        jnp.float32)
    # ids skewed to the head (like real popularity) + duplicates
    ids = jnp.asarray(
        np.minimum(rng.zipf(1.5, N) - 1, V - 1).astype(np.int32))
    return table, ids


def test_sharded_lookup_matches_dense(mesh, table_ids):
    table, ids = table_ids
    lookup = make_sharded_lookup(mesh)
    got = jax.jit(lookup)(table, ids)
    want = dense_lookup(table, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_sharded_lookup_multidim_ids(mesh, table_ids):
    table, ids = table_ids
    lookup = make_sharded_lookup(mesh)
    ids2 = ids[:48].reshape(8, 6)
    got = jax.jit(lookup)(table, ids2)
    assert got.shape == (8, 6, D)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(dense_lookup(table, ids2)),
                               rtol=1e-6, atol=1e-6)


def test_sharded_lookup_gradients_accumulate_duplicates(mesh, table_ids):
    """The reverse exchange must scatter-ADD duplicate-id contributions into
    the owning shard — the classic silent-wrongness spot."""
    table, ids = table_ids
    lookup = make_sharded_lookup(mesh)
    w = jnp.asarray(np.random.default_rng(1).normal(size=(N, D)), jnp.float32)

    def loss_sharded(t):
        return jnp.sum(lookup(t, ids) * w)

    def loss_dense(t):
        return jnp.sum(dense_lookup(t, ids) * w)

    g_sharded = jax.jit(jax.grad(loss_sharded))(table)
    g_dense = jax.grad(loss_dense)(table)
    assert np.abs(np.asarray(g_dense)).sum() > 0
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_dense),
                               rtol=1e-5, atol=1e-6)


def test_capacity_factor_full_is_lossless(mesh, table_ids):
    table, ids = table_ids
    # capacity_factor high enough to hold the worst bucket → exact
    lookup = make_sharded_lookup(mesh, capacity_factor=float(mesh.shape["model"]))
    got = jax.jit(lookup)(table, ids)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(dense_lookup(table, ids)),
                               rtol=1e-6, atol=1e-6)


def test_pad_table_rows():
    t = jnp.ones((37, 4))
    p = pad_table_rows(t, 8)
    assert p.shape == (40, 4)
    assert np.asarray(p[37:]).sum() == 0


def test_param_pspecs_classify_tables():
    params = {
        "user": {"tables": {"user_id": jnp.zeros((4, 2))},
                 "fusion": {"w1": jnp.zeros((2, 2))}},
        "item_out": jnp.zeros((5, 2)),
        "rnn": [{"w": jnp.zeros((4, 8))}],
    }
    specs = param_pspecs(params)
    assert specs["user"]["tables"]["user_id"] == P("model", None)
    assert specs["user"]["fusion"]["w1"] == P()
    assert specs["item_out"] == P("model", None)
    assert specs["rnn"][0]["w"] == P()
