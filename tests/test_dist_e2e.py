"""Sharded end-to-end parity tests (SURVEY.md §4 golden invariant: "sharded
forward/backward ... equal to the single-device reference path") + the
sharded full-softmax top-k merge."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arec.config import Config, DataConfig, MeshConfig, ModelConfig, TrainConfig
from arec.data.synthetic import generate
from arec.dist.mesh import make_mesh
from arec.models.mf import MFSpec, init_mf, mf_loss
from arec.retrieval.mips import make_sharded_topk, pad_item_shards
from arec.tables.engine import attrs_to_device, dense_lookup
from arec.tables.sharded import make_sharded_lookup
from arec.train.evalu import topk_with_mask
from arec.train.loop import Trainer, _pad_params_tables


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        data=DataConfig(syn_users=200, syn_items=160, syn_interactions=4000,
                        data_dir="/tmp/arec_test_dist"),
        model=ModelConfig(model="mf", dim=16, use_attributes=True),
        train=TrainConfig(batch_size=64, num_sampled=32,
                          compute_dtype="float32"),
    )
    ds = generate(cfg.data)
    spec = MFSpec.from_config(cfg, ds.user_schema, ds.item_schema)
    params = init_mf(jax.random.key(0), spec)
    user_dev = attrs_to_device(ds.user_attrs.restrict(spec.user.schema))
    item_dev = attrs_to_device(ds.item_attrs.restrict(spec.item.schema))
    batch = {
        "user": jnp.asarray(ds.train_users[:64]),
        "pos_item": jnp.asarray(ds.train_items[:64]),
    }
    return cfg, ds, spec, params, user_dev, item_dev, batch


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (8, 1), (1, 8)])
def test_sharded_mf_loss_and_grads_match_single_device(setup, mesh_shape):
    """Whole-model forward+backward through the all-to-all lookup equals the
    dense single-device path (tables are row-padded for the mesh; padding
    must not change results)."""
    cfg, ds, spec, params, user_dev, item_dev, batch = setup
    mesh = make_mesh(*mesh_shape)
    lookup = make_sharded_lookup(mesh)
    params_p = _pad_params_tables(params, mesh_shape[1])
    rng = jax.random.key(3)

    def loss_dense(p):
        return mf_loss(p, spec, user_dev, item_dev, batch, rng, dense_lookup)

    def loss_sharded(p):
        return mf_loss(p, spec, user_dev, item_dev, batch, rng, lookup)

    l0, g0 = jax.value_and_grad(loss_dense)(params)
    l1, g1 = jax.jit(jax.value_and_grad(loss_sharded))(params_p)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for k in ("user", "item"):
        for name, g in g0[k]["tables"].items():
            got = np.asarray(g1[k]["tables"][name])[: g.shape[0]]
            np.testing.assert_allclose(got, np.asarray(g), rtol=1e-4,
                                       atol=1e-6, err_msg=f"{k}/{name}")


@pytest.mark.parametrize("loss", ["warp", "bpr", "mw", "bbpr"])
def test_sharded_nonce_losses_match_single_device(setup, loss):
    """The whole loss table — not just ce — must hold the golden sharded-
    equals-dense invariant on a (2,4) mesh (loss value + table grads)."""
    cfg, ds, spec, params, user_dev, item_dev, batch = setup
    from dataclasses import replace
    lspec = replace(spec, loss=loss)
    mesh = make_mesh(2, 4)
    lookup = make_sharded_lookup(mesh)
    params_p = _pad_params_tables(params, 4)
    rng = jax.random.key(5)

    l0, g0 = jax.value_and_grad(
        lambda p: mf_loss(p, lspec, user_dev, item_dev, batch, rng,
                          dense_lookup))(params)
    l1, g1 = jax.jit(jax.value_and_grad(
        lambda p: mf_loss(p, lspec, user_dev, item_dev, batch, rng,
                          lookup)))(params_p)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for k in ("user", "item"):
        for name, g in g0[k]["tables"].items():
            got = np.asarray(g1[k]["tables"][name])[: g.shape[0]]
            np.testing.assert_allclose(got, np.asarray(g), rtol=1e-4,
                                       atol=1e-6, err_msg=f"{loss}/{k}/{name}")


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
def test_sharded_topk_matches_dense(mesh_shape):
    rng = np.random.default_rng(0)
    B, V, D, K = 16, 37, 8, 5
    mesh = make_mesh(*mesh_shape)
    q = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(V,)), jnp.float32)
    seen = jnp.asarray(
        np.where(rng.random((B, 6)) < 0.5,
                 rng.integers(0, V, (B, 6)), -1).astype(np.int32))
    vp, bp = pad_item_shards(v, b, mesh_shape[1])
    got_s, got_i = make_sharded_topk(mesh, k=K, compute_dtype=jnp.float32)(
        q, vp, bp, seen)
    want_s, want_i = topk_with_mask(q, v, b, seen, k=K,
                                    compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-5, atol=1e-5)
    # ids must agree wherever scores are distinct (ties may reorder)
    s = np.asarray(want_s)
    distinct = np.abs(s - np.roll(s, 1, axis=1)) > 1e-5
    np.testing.assert_array_equal(np.asarray(got_i)[distinct],
                                  np.asarray(want_i)[distinct])


@pytest.mark.parametrize("qblock", [1, 3, 16])
def test_sharded_topk_query_blocked_matches_unblocked(qblock):
    """The per-shard query-blocked body must equal the single-chunk path
    for every chunking (incl. qblock=1 and a non-dividing 3)."""
    rng = np.random.default_rng(1)
    B, V, D, K = 16, 40, 8, 5
    mesh = make_mesh(2, 4)
    q = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(V,)), jnp.float32)
    seen = jnp.asarray(
        np.where(rng.random((B, 6)) < 0.5,
                 rng.integers(0, V, (B, 6)), -1).astype(np.int32))
    vp, bp = pad_item_shards(v, b, 4)
    want_s, want_i = make_sharded_topk(mesh, k=K, compute_dtype=jnp.float32)(
        q, vp, bp, seen)
    got_s, got_i = make_sharded_topk(mesh, k=K, compute_dtype=jnp.float32,
                                     qblock=qblock)(q, vp, bp, seen)
    # chunked matmuls reduce in a different order → ~1e-7 float drift
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-5, atol=1e-6)
    s = np.asarray(want_s)
    distinct = np.abs(s - np.roll(s, 1, axis=1)) > 1e-5
    np.testing.assert_array_equal(np.asarray(got_i)[distinct],
                                  np.asarray(want_i)[distinct])


def test_sharded_topk_approx_mode_never_seen_and_overlaps_exact():
    """recall_target < 1 on the mesh: results never contain seen items and
    (on CPU, where approx_max_k lowers to exact) match the exact path on
    rows whose top-k is unaffected by the candidate-set masking rule."""
    rng = np.random.default_rng(2)
    B, V, D, K = 16, 64, 8, 5
    mesh = make_mesh(2, 4)
    q = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(V,)), jnp.float32)
    seen = jnp.asarray(
        np.where(rng.random((B, 6)) < 0.7,
                 rng.integers(0, V, (B, 6)), -1).astype(np.int32))
    vp, bp = pad_item_shards(v, b, 4)
    ex_s, ex_i = make_sharded_topk(mesh, k=K, compute_dtype=jnp.float32)(
        q, vp, bp, seen)
    ap_s, ap_i = make_sharded_topk(mesh, k=K, compute_dtype=jnp.float32,
                                   recall_target=0.9)(q, vp, bp, seen)
    ap_i, ex_i, sn = np.asarray(ap_i), np.asarray(ex_i), np.asarray(seen)
    for i in range(B):
        s = set(sn[i][sn[i] >= 0])
        assert not (set(ap_i[i]) & s), f"row {i} returned a seen item"
        # exact path uses a -1e9 penalty, so if no seen item re-entered its
        # top-k the two candidate sets must agree
        if not (set(ex_i[i]) & s):
            assert set(ap_i[i]) == set(ex_i[i]), f"row {i} ids differ"


@pytest.mark.parametrize("mesh_shape", [(2, 4)])
def test_sharded_seq_loss_and_grads_match_single_device(setup, mesh_shape):
    """The LSTM family through the all-to-all lookup (input-side fused item
    encoder AND the item_out sampled-softmax table are both sharded)."""
    from arec.config import Config as C, DataConfig as DC, ModelConfig as MC, TrainConfig as TC
    from arec.models.seq import SeqSpec, init_seq, seq_loss
    cfg, ds, *_ = setup
    scfg = C(data=cfg.data,
             model=MC(model="lstm", dim=16, use_attributes=True,
                      max_seq_len=6, use_pallas_scan=False),
             train=TC(batch_size=32, num_sampled=16, compute_dtype="float32"))
    sspec = SeqSpec.from_config(scfg, ds.user_schema, ds.item_schema)
    params = init_seq(jax.random.key(0), sspec)
    item_dev = attrs_to_device(ds.item_attrs.restrict(sspec.item_in.schema))
    from arec.data.dataset import seq_batches
    batch = next(iter(seq_batches(ds, 32, 6, 0, 0)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    mesh = make_mesh(*mesh_shape)
    lookup = make_sharded_lookup(mesh)
    params_p = _pad_params_tables(params, mesh_shape[1])
    rng = jax.random.key(5)

    l0, g0 = jax.value_and_grad(seq_loss)(
        params, sspec, item_dev, None, batch, rng, dense_lookup)
    l1, g1 = jax.jit(jax.value_and_grad(
        lambda p: seq_loss(p, sspec, item_dev, None, batch, rng, lookup)))(
        params_p)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for name, g in g0["item_in"]["tables"].items():
        np.testing.assert_allclose(
            np.asarray(g1["item_in"]["tables"][name])[: g.shape[0]],
            np.asarray(g), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g1["item_out"])[: g0["item_out"].shape[0]],
        np.asarray(g0["item_out"]), rtol=1e-4, atol=1e-6)
    for a, b in zip(g0["rnn"], g1["rnn"]):
        np.testing.assert_allclose(np.asarray(b["w"]), np.asarray(a["w"]),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("model,lookup", [("mf", "alltoall"),
                                          ("mf", "gspmd"),
                                          ("lstm", "alltoall")])
def test_trainer_sharded_end_to_end(tmp_path, model, lookup):
    """Trainer on a (2,4) mesh: a few steps run, loss finite and decreasing,
    eval + recommend paths work — for the explicit all-to-all exchange and
    the GSPMD (XLA-chosen collectives) lookup backends, and for BOTH model
    families (the LSTM case is the c5 multihost-XING config's shape)."""
    cfg = Config(
        data=DataConfig(syn_users=150, syn_items=120, syn_interactions=3000,
                        data_dir=str(tmp_path / "data")),
        model=ModelConfig(model=model, dim=16, use_attributes=True,
                          max_seq_len=6, use_pallas_scan=False),
        train=TrainConfig(batch_size=64, num_sampled=32, n_epoch=2,
                          steps_per_checkpoint=10_000,
                          compute_dtype="float32",
                          train_dir=str(tmp_path / "train")),
        mesh=MeshConfig(data=2, model=4, lookup=lookup),
    )
    trainer = Trainer(cfg)
    summary = trainer.train()
    assert np.isfinite(summary["recall_at_k"])
    rows = trainer.recommend(out_path=str(tmp_path / "sub.tsv"))
    assert len(rows) == len(trainer.ds.valid_users)
    assert len(rows[0][1]) == cfg.train.eval_topk
    assert (tmp_path / "sub.tsv").exists()


# ---------------------------------------------------------------------------
# Trainer-CONFIG-path parity (VERDICT round 1, weak #1/#3): the golden
# invariant must hold through the Trainer's actual plumbing — mesh defaults
# (capacity_factor, dedup, row_shard) included — not just through
# hand-constructed lookups.
# ---------------------------------------------------------------------------

def _mk_cfg(tmp_path, model="mf", mesh=None, seed=0):
    return Config(
        data=DataConfig(syn_users=150, syn_items=120, syn_interactions=4000,
                        data_dir=str(tmp_path / "data")),
        model=ModelConfig(model=model, dim=16, use_attributes=True,
                          max_seq_len=6, use_pallas_scan=False),
        train=TrainConfig(batch_size=64, num_sampled=32, seed=seed,
                          compute_dtype="float32",
                          train_dir=str(tmp_path / f"train_{model}"
                                        f"_{'m' if mesh else 's'}")),
        mesh=mesh or MeshConfig(),
    )


@pytest.mark.parametrize("model", ["mf", "lstm"])
@pytest.mark.parametrize("row_shard", ["shuffle", "contiguous"])
def test_trainer_mesh_parity_through_defaults(tmp_path, model, row_shard):
    """Step-for-step loss parity between a (2,4)-mesh Trainer — built purely
    from MeshConfig (capacity/dedup/row_shard defaults flow through
    Trainer.__init__, the exact path where the round-1 capacity bug lived)
    — and the single-device Trainer, on the zipf-skewed synthetic data.
    Then eval parity: the mesh evaluate() (sharded top-k, item matrix never
    gathered) must equal the dense evaluate()."""
    mesh_cfg = MeshConfig(data=2, model=4, row_shard=row_shard)
    t_dense = Trainer(_mk_cfg(tmp_path, model))
    t_mesh = Trainer(_mk_cfg(tmp_path, model, mesh=mesh_cfg))

    base_rng = jax.random.key(123)
    import itertools
    batches_d = list(itertools.islice(t_dense._batches(0), 4))
    batches_m = list(itertools.islice(t_mesh._batches(0), 4))
    assert len(batches_d) >= 2
    for i, (rbd, rbm) in enumerate(zip(batches_d, batches_m)):
        bd = {k: jnp.asarray(v) for k, v in rbd.items()}
        bm = {k: jnp.asarray(v) for k, v in rbm.items()}
        for k in bd:
            np.testing.assert_array_equal(np.asarray(bd[k]),
                                          np.asarray(bm[k]))
        rng = jax.random.fold_in(base_rng, i)
        t_dense.state, md = t_dense.step_fn(t_dense.state, bd, rng)
        t_mesh.state, mm = t_mesh.step_fn(t_mesh.state, bm, rng)
        np.testing.assert_allclose(float(mm["loss"]), float(md["loss"]),
                                   rtol=2e-4, err_msg=f"step {i}")
    r_dense = t_dense.evaluate()
    r_mesh = t_mesh.evaluate()
    assert r_mesh == pytest.approx(r_dense, abs=1e-6), (r_mesh, r_dense)


def test_trainer_shuffle_checkpoint_restores_everywhere(tmp_path):
    """Shuffle-sharded checkpoints are written in NATURAL row order
    (arec/tables/layout.py): a checkpoint saved by a (2,4) shuffle-mesh run
    must restore into (a) a single-device Trainer and (b) a contiguous-mesh
    Trainer, both reproducing the saving run's eval exactly."""
    mesh_cfg = MeshConfig(data=2, model=4, row_shard="shuffle")
    cfg_m = _mk_cfg(tmp_path, "mf", mesh=mesh_cfg)
    t_mesh = Trainer(cfg_m)
    # a couple of steps so tables differ from init
    rng = jax.random.key(9)
    batches = t_mesh._batches(0)
    for i in range(2):
        b = {k: jnp.asarray(v) for k, v in next(batches).items()}
        t_mesh.state, _ = t_mesh.step_fn(t_mesh.state, b,
                                         jax.random.fold_in(rng, i))
    r0 = t_mesh.evaluate()
    t_mesh.ckpt.save(2, t_mesh._canonical_state(t_mesh.state),
                     {"epoch": 0, "step_in_epoch": 2}, cfg_m.to_json())

    # (a) restore into a single-device Trainer sharing the train_dir
    cfg_s = _mk_cfg(tmp_path, "mf")
    cfg_s = cfg_s.replace(train=cfg_s.train.__class__(
        **{**cfg_s.train.__dict__, "train_dir": cfg_m.train.train_dir}))
    t_single = Trainer(cfg_s)
    assert int(t_single.state.step) == int(t_mesh.state.step)
    assert t_single.evaluate() == pytest.approx(r0, abs=1e-6)

    # (b) restore into a contiguous-placement mesh Trainer
    cfg_c = _mk_cfg(tmp_path, "mf",
                    mesh=MeshConfig(data=2, model=4, row_shard="contiguous"))
    cfg_c = cfg_c.replace(train=cfg_c.train.__class__(
        **{**cfg_c.train.__dict__, "train_dir": cfg_m.train.train_dir}))
    t_contig = Trainer(cfg_c)
    assert t_contig.evaluate() == pytest.approx(r0, abs=1e-6)
