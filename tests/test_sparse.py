"""Sparse (touched-rows-only) update path vs the dense step — exact parity.

The sparse step (arec/train/sparse.py) must produce the SAME parameters as
the dense step after every update: same negatives (pre-drawn `sampled` makes
the loss's own draw unused), same Adagrad math (optax.scale_by_rss
defaults). This is the §7 "Sparse-grad correctness" hard part for the
single-device big-vocab path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arec.config import Config, DataConfig, ModelConfig, TrainConfig
from arec.data.dataset import mf_batches, seq_batches
from arec.data.io import load_or_prepare
from arec.models import mf as mf_mod
from arec.models import seq as seq_mod
from arec.tables.engine import attrs_to_device
from arec.train.sparse import (
    init_sparse_state, make_sparse_train_step, table_paths, unpack_params,
)
from arec.train.step import init_state, make_optimizer, make_train_step


def _cfg(model, tmp_path, optimizer="adagrad", dense_threshold=512,
         loss="ce", sampler="log_uniform", **model_kw):
    return Config(
        data=DataConfig(syn_users=120, syn_items=90, syn_interactions=2500,
                        data_dir=str(tmp_path / "data")),
        model=ModelConfig(model=model, dim=16, use_attributes=True,
                          max_seq_len=6, use_pallas_scan=False,
                          dense_vocab_threshold=dense_threshold, **model_kw),
        train=TrainConfig(batch_size=32, num_sampled=24, loss=loss,
                          sampler=sampler, optimizer=optimizer,
                          learning_rate=0.2, compute_dtype="float32"),
    )


def _steps_equal(dense_params, sparse_params, paths=None):
    flat_d = jax.tree_util.tree_leaves_with_path(dense_params)
    flat_s = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(sparse_params)}
    for p, v in flat_d:
        key = jax.tree_util.keystr(p)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_s[key]),
            rtol=2e-5, atol=1e-6, err_msg=key)


# dense_threshold=512 → every small field in the dense prefix (tiny
# synthetic vocabs: uids empty, prefix-only updates); 0 → every field on
# the GATHER path (full uids/subset/scatter machinery exercised); 12 →
# MIXED: cat fields dense (prefix > 0) while the mulhot fields gather with
# invalid (-1) slots — the regression case where invalid slots mapped to
# row 0 used to overwrite the prefix update of row 0 (gather_row_ids).
@pytest.mark.parametrize("optimizer,dense_threshold",
                         [("adagrad", 512), ("sgd", 512),
                          ("adagrad", 0), ("sgd", 0),
                          ("adagrad", 12), ("sgd", 12)])
def test_mf_sparse_step_matches_dense(tmp_path, optimizer, dense_threshold):
    cfg = _cfg("mf", tmp_path, optimizer, dense_threshold)
    ds = load_or_prepare(cfg.data)
    spec = mf_mod.MFSpec.from_config(cfg, ds.user_schema, ds.item_schema)
    params = mf_mod.init_mf(jax.random.key(0), spec)
    user_dev = attrs_to_device(ds.user_attrs.restrict(spec.user.schema),
                               spec.user)
    item_dev = attrs_to_device(ds.item_attrs.restrict(spec.item.schema),
                               spec.item)
    opt = make_optimizer(optimizer, cfg.train.learning_rate)

    dense_step = make_train_step(
        lambda p, b, r: mf_mod.mf_loss(p, spec, user_dev, item_dev, b, r),
        opt, cfg.train.learning_rate, donate=False)
    d_state = init_state(params, opt)

    sparse_step = make_sparse_train_step(
        False, spec, user_dev, item_dev, opt, cfg.train.learning_rate,
        optimizer)
    s_state = init_sparse_state(params, table_paths(False, spec), opt,
                                optimizer)

    rng = jax.random.key(7)
    for i, batch in enumerate(mf_batches(ds, cfg.train.batch_size, 0, 0)):
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        rng, sub = jax.random.split(rng)
        d_state, dm = dense_step(d_state, jb, sub)
        s_state, sm = sparse_step(s_state, jb, sub)
        np.testing.assert_allclose(float(dm["loss"]), float(sm["loss"]),
                                   rtol=1e-5)
        if i >= 3:
            break
    s_params = (unpack_params(s_state.params, table_paths(False, spec))
                if optimizer == "adagrad" else s_state.params)
    _steps_equal(d_state.params, s_params)


# the round-3 verdict's confirmed bug: sparse_update × {warp, bpr} under the
# DEFAULT sampler=log_uniform silently diverged from the dense oracle (max
# param delta 0.155 after one step) because warp/bpr redrew negatives
# internally with dist="uniform" while the touched-row subset was derived
# from the spec.sampler pre-draw. The whole loss table must hold the parity
# invariant under BOTH samplers; dense_threshold=0 keeps every field on the
# gather path (the shapes where the aliasing corrupted gradients).
@pytest.mark.parametrize("loss", ["warp", "bpr", "mw", "bbpr"])
@pytest.mark.parametrize("sampler", ["log_uniform", "uniform"])
def test_mf_sparse_losses_match_dense(tmp_path, loss, sampler):
    cfg = _cfg("mf", tmp_path, "adagrad", 0, loss=loss, sampler=sampler)
    ds = load_or_prepare(cfg.data)
    spec = mf_mod.MFSpec.from_config(cfg, ds.user_schema, ds.item_schema)
    params = mf_mod.init_mf(jax.random.key(0), spec)
    user_dev = attrs_to_device(ds.user_attrs.restrict(spec.user.schema),
                               spec.user)
    item_dev = attrs_to_device(ds.item_attrs.restrict(spec.item.schema),
                               spec.item)
    opt = make_optimizer("adagrad", cfg.train.learning_rate)

    dense_step = make_train_step(
        lambda p, b, r: mf_mod.mf_loss(p, spec, user_dev, item_dev, b, r),
        opt, cfg.train.learning_rate, donate=False)
    d_state = init_state(params, opt)
    sparse_step = make_sparse_train_step(
        False, spec, user_dev, item_dev, opt, cfg.train.learning_rate,
        "adagrad")
    s_state = init_sparse_state(params, table_paths(False, spec), opt,
                                "adagrad")

    rng = jax.random.key(7)
    for i, batch in enumerate(mf_batches(ds, cfg.train.batch_size, 0, 0)):
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        rng, sub = jax.random.split(rng)
        d_state, dm = dense_step(d_state, jb, sub)
        s_state, sm = sparse_step(s_state, jb, sub)
        np.testing.assert_allclose(float(dm["loss"]), float(sm["loss"]),
                                   rtol=1e-5, atol=1e-7)
        if i >= 2:
            break
    _steps_equal(d_state.params,
                 unpack_params(s_state.params, table_paths(False, spec)))


def test_sparse_rejects_unknown_loss(tmp_path):
    """Unsupported loss combos must fail LOUDLY at factory time, never
    corrupt gradients silently."""
    from dataclasses import replace
    cfg = _cfg("mf", tmp_path)
    ds = load_or_prepare(cfg.data)
    spec = mf_mod.MFSpec.from_config(cfg, ds.user_schema, ds.item_schema)
    bad = replace(spec, loss="nope")
    with pytest.raises(ValueError, match="sparse_update supports"):
        make_sparse_train_step(False, bad, None, None,
                               make_optimizer("adagrad", 0.1), 0.1,
                               "adagrad")


@pytest.mark.parametrize("tie_output,concat_user,dense_threshold",
                         [(False, False, 512), (True, True, 512),
                          (False, False, 0), (True, True, 0),
                          (False, False, 12), (True, True, 12)])
def test_seq_sparse_step_matches_dense(tmp_path, tie_output, concat_user,
                                       dense_threshold):
    cfg = _cfg("lstm", tmp_path, tie_output=tie_output,
               concat_user=concat_user, dense_threshold=dense_threshold)
    ds = load_or_prepare(cfg.data)
    spec = seq_mod.SeqSpec.from_config(cfg, ds.user_schema, ds.item_schema)
    params = seq_mod.init_seq(jax.random.key(1), spec)
    item_dev = attrs_to_device(ds.item_attrs.restrict(spec.item_in.schema),
                               spec.item_in)
    user_dev = (attrs_to_device(ds.user_attrs.restrict(spec.user.schema),
                                spec.user)
                if spec.user is not None else None)
    opt = make_optimizer("adagrad", cfg.train.learning_rate)

    dense_step = make_train_step(
        lambda p, b, r: seq_mod.seq_loss(p, spec, item_dev, user_dev, b, r),
        opt, cfg.train.learning_rate, donate=False)
    d_state = init_state(params, opt)

    sparse_step = make_sparse_train_step(
        True, spec, user_dev, item_dev, opt, cfg.train.learning_rate,
        "adagrad")
    s_state = init_sparse_state(params, table_paths(True, spec), opt,
                                "adagrad")

    rng = jax.random.key(9)
    for i, batch in enumerate(
            seq_batches(ds, cfg.train.batch_size, spec.max_seq_len, 0, 0)):
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        rng, sub = jax.random.split(rng)
        d_state, dm = dense_step(d_state, jb, sub)
        s_state, sm = sparse_step(s_state, jb, sub)
        np.testing.assert_allclose(float(dm["loss"]), float(sm["loss"]),
                                   rtol=1e-5)
        if i >= 2:
            break
    _steps_equal(d_state.params,
                 unpack_params(s_state.params, table_paths(True, spec)))


def test_sparse_trainer_end_to_end(tmp_path):
    """Trainer with sparse_update: loss falls, eval + recommend work."""
    from arec.train.loop import Trainer
    cfg = Config(
        data=DataConfig(syn_users=150, syn_items=120, syn_interactions=3000,
                        data_dir=str(tmp_path / "data")),
        model=ModelConfig(model="mf", dim=16),
        train=TrainConfig(batch_size=64, n_epoch=2, max_steps=60,
                          steps_per_checkpoint=30, sparse_update=True,
                          compute_dtype="float32",
                          train_dir=str(tmp_path / "train")),
    )
    trainer = Trainer(cfg)
    summary = trainer.train()
    assert summary["steps"] == 60
    assert np.isfinite(summary["recall_at_k"])
    rows = trainer.recommend(k=5)
    assert len(rows) > 0 and len(rows[0][1]) == 5


@pytest.mark.parametrize("loss", ["mw", "bbpr"])
def test_mf_sparse_batch_ht_matches_dense(tmp_path, loss):
    """train.batch_ht (HT-corrected in-batch proposal, round-4 extension)
    must hold the same dense-oracle parity invariant as the paper
    estimators — pop rides both step factories identically."""
    from dataclasses import replace
    from arec.losses.sampling import make_pop
    cfg = _cfg("mf", tmp_path, "adagrad", 0, loss=loss)
    ds = load_or_prepare(cfg.data)
    spec = replace(
        mf_mod.MFSpec.from_config(cfg, ds.user_schema, ds.item_schema),
        batch_ht=True)
    pop = make_pop(ds.item_freq, 1.0)
    params = mf_mod.init_mf(jax.random.key(0), spec)
    user_dev = attrs_to_device(ds.user_attrs.restrict(spec.user.schema),
                               spec.user)
    item_dev = attrs_to_device(ds.item_attrs.restrict(spec.item.schema),
                               spec.item)
    opt = make_optimizer("adagrad", cfg.train.learning_rate)

    dense_step = make_train_step(
        lambda p, b, r: mf_mod.mf_loss(p, spec, user_dev, item_dev, b, r,
                                       pop=pop),
        opt, cfg.train.learning_rate, donate=False)
    d_state = init_state(params, opt)
    sparse_step = make_sparse_train_step(
        False, spec, user_dev, item_dev, opt, cfg.train.learning_rate,
        "adagrad", pop=pop)
    s_state = init_sparse_state(params, table_paths(False, spec), opt,
                                "adagrad")

    rng = jax.random.key(7)
    for i, batch in enumerate(mf_batches(ds, cfg.train.batch_size, 0, 0)):
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        rng, sub = jax.random.split(rng)
        d_state, dm = dense_step(d_state, jb, sub)
        s_state, sm = sparse_step(s_state, jb, sub)
        np.testing.assert_allclose(float(dm["loss"]), float(sm["loss"]),
                                   rtol=1e-5, atol=1e-7)
        if i >= 2:
            break
    _steps_equal(d_state.params,
                 unpack_params(s_state.params, table_paths(False, spec)))


def test_batch_ht_requires_pop(tmp_path):
    """batch_ht without the empirical distribution must fail loudly at
    trace time, never silently fall back to the biased estimator."""
    from dataclasses import replace
    cfg = _cfg("mf", tmp_path, "adagrad", 0, loss="mw")
    ds = load_or_prepare(cfg.data)
    spec = replace(
        mf_mod.MFSpec.from_config(cfg, ds.user_schema, ds.item_schema),
        batch_ht=True)
    params = mf_mod.init_mf(jax.random.key(0), spec)
    user_dev = attrs_to_device(ds.user_attrs.restrict(spec.user.schema),
                               spec.user)
    item_dev = attrs_to_device(ds.item_attrs.restrict(spec.item.schema),
                               spec.item)
    batch = next(iter(mf_batches(ds, cfg.train.batch_size, 0, 0)))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    with pytest.raises(ValueError, match="batch_ht"):
        mf_mod.mf_loss(params, spec, user_dev, item_dev, jb,
                       jax.random.key(0))
