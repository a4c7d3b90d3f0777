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
from arec.tables.layout import RowPerm
from arec.tables.sharded import (
    EXCHANGE_DROPS, make_perm_dense_lookup, make_sharded_lookup,
    pad_table_rows, round_up_rows,
)

V, D, N = 37, 16, 50  # deliberately non-divisible vocab


@pytest.fixture(params=[(1, 8), (2, 4), (4, 2)])
def mesh(request):
    return make_mesh(*request.param)


@pytest.fixture(params=[False, True], ids=["nodedup", "dedup"])
def dedup(request):
    return request.param


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


def test_sharded_lookup_matches_dense(mesh, table_ids, dedup):
    table, ids = table_ids
    lookup = make_sharded_lookup(mesh, dedup=dedup)
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


def test_sharded_lookup_gradients_accumulate_duplicates(mesh, table_ids,
                                                        dedup):
    """The reverse exchange must scatter-ADD duplicate-id contributions into
    the owning shard — the classic silent-wrongness spot. With dedup the
    accumulation happens in the inverse-map transpose BEFORE the reverse
    exchange; result must be identical."""
    table, ids = table_ids
    lookup = make_sharded_lookup(mesh, dedup=dedup)
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


def test_capacity_overflow_regression():
    """Round-1 shipped default capacity_factor=1.0 silently zeroed ~39% of
    zipf(1.3)-skewed lookups on a (2,4) mesh (VERDICT.md round 1, weak #1).
    Locks in: (a) factor 0.0 — the new default — is exact on the same
    batch; (b) at factor 1.0 every dropped request is COUNTED by
    EXCHANGE_DROPS (the count equals the observed zero rows exactly);
    (c) dedup + the shuffle row layout each cut the overflow rate."""
    rng = np.random.default_rng(7)
    mesh = make_mesh(2, 4)
    vb = 4096
    table = jnp.asarray(rng.normal(size=(vb, D)), jnp.float32)
    ids = jnp.asarray(np.minimum(rng.zipf(1.3, 2048) - 1, vb - 1)
                      .astype(np.int32))
    want = np.asarray(dense_lookup(table, ids))

    def run(**kw):
        EXCHANGE_DROPS.read_and_reset()
        got = np.asarray(jax.jit(make_sharded_lookup(mesh, **kw))(table, ids))
        jax.effects_barrier()
        drops = EXCHANGE_DROPS.read_and_reset()
        zeros = int(((np.abs(got).sum(1) == 0)
                     & (np.abs(want).sum(1) > 0)).sum())
        return got, drops, zeros

    # (a) the overflow-proof default is exact
    got0, drops0, zeros0 = run(capacity_factor=0.0, dedup=False)
    np.testing.assert_allclose(got0, want, rtol=1e-6, atol=1e-6)
    assert drops0 == 0 and zeros0 == 0

    # (b) the round-1 footgun drops a large skewed fraction — and is counted
    _, drops1, zeros1 = run(capacity_factor=1.0, dedup=False)
    assert zeros1 > 0.25 * len(ids), f"expected heavy overflow, got {zeros1}"
    assert drops1 == zeros1

    # (c) dedup collapses duplicate hot ids before bucketing
    _, drops2, zeros2 = run(capacity_factor=1.0, dedup=True)
    assert drops2 == zeros2 and zeros2 < zeros1 / 4

    # (c') shuffle layout spreads the hot head across owners
    perm = RowPerm.for_rows(vb, 0)
    tp = jnp.asarray(perm.permute_table(np.asarray(table)))
    EXCHANGE_DROPS.read_and_reset()
    got3 = np.asarray(jax.jit(make_sharded_lookup(
        mesh, capacity_factor=1.0, dedup=True, perm=perm))(tp, ids))
    jax.effects_barrier()
    drops3 = EXCHANGE_DROPS.read_and_reset()
    zeros3 = int(((np.abs(got3).sum(1) == 0)
                  & (np.abs(want).sum(1) > 0)).sum())
    assert drops3 == zeros3 and zeros3 <= zeros2


@pytest.mark.parametrize("prefix", [0, 5])
def test_shuffle_layout_parity(mesh, table_ids, dedup, prefix):
    """Lookup + grads through a shuffle-permuted table equal the dense
    natural-layout path (grads compared after un-permuting)."""
    table, ids = table_ids
    perm = RowPerm.for_rows(V, prefix)
    tp = jnp.asarray(perm.permute_table(np.asarray(table)))
    lookup = make_sharded_lookup(mesh, dedup=dedup, perm=perm)
    want = dense_lookup(table, ids)
    got = jax.jit(lookup)(tp, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # single-gather eval counterpart
    got_e = make_perm_dense_lookup(perm)(tp, ids)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    w = jnp.asarray(np.random.default_rng(1).normal(size=(N, D)), jnp.float32)
    g0 = jax.grad(lambda t: jnp.sum(dense_lookup(t, ids) * w))(table)
    g1 = jax.jit(jax.grad(lambda t: jnp.sum(lookup(t, ids) * w)))(tp)
    g1n = perm.permute_table(np.asarray(g1), inverse=True)
    np.testing.assert_allclose(g1n, np.asarray(g0), rtol=1e-5, atol=1e-6)


def test_shuffle_layout_balances_hot_shards():
    """VERDICT round 1 weak #2: contiguous ownership over frequency-ranked
    ids puts every hot row on shard 0. Done-criterion from the verdict:
    per-shard request spread ≤ ~2× on zipf batches under the shuffle
    layout (contiguous spread on the same batch is far worse).

    Measured on the DEDUPED request stream — what the default pipeline
    actually exchanges (MeshConfig.dedup=True). Raw-request balance is
    bounded below by the hottest single id's frequency (zipf(1.3) puts
    ~25% of raw draws on id 0 — no row placement can split ONE id across
    owners; dedup is precisely the mitigation)."""
    rng = np.random.default_rng(3)
    vb, T = 4096, 8
    ids = np.minimum(rng.zipf(1.3, 8192) - 1, vb - 1)
    uniq = np.unique(ids)
    rows_per = vb // T

    def spread(owner):
        counts = np.bincount(owner, minlength=T)
        return counts.max() / max(counts.mean(), 1e-9)

    contig = spread(uniq // rows_per)
    perm = RowPerm.for_rows(vb, 0)
    puniq = np.asarray(perm.apply_ids(jnp.asarray(uniq.astype(np.int32))))
    shuf = spread(puniq // rows_per)
    assert contig > 2.5, f"zipf uniques should hot-spot contiguous: {contig}"
    assert shuf <= 1.5, f"shuffle spread too high: {shuf}"


def test_row_perm_is_a_bijection_and_roundtrips():
    for total, prefix in [(37, 0), (37, 5), (4096, 0), (1000, 999)]:
        perm = RowPerm.for_rows(total, prefix)
        if perm is None:
            continue
        idx = perm.perm_index()
        assert sorted(idx.tolist()) == list(range(total))
        assert (idx[:prefix] == np.arange(prefix)).all()
        t = np.random.default_rng(0).normal(size=(total, 3))
        rt = perm.permute_table(perm.permute_table(t), inverse=True)
        np.testing.assert_array_equal(rt, t)
        # device-side arithmetic remap == host index
        ids = jnp.arange(total, dtype=jnp.int32)
        np.testing.assert_array_equal(np.asarray(perm.apply_ids(ids)),
                                      idx)


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
