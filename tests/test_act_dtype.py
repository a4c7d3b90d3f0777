"""TrainConfig.act_dtype (bf16 train-path activations — the round-3 closing
profile's top busy-time lever): the bf16 path must stay numerically close to
the f32 oracle, and the sparse/dense parity invariant (CLAUDE.md) must hold
WITHIN the bf16 path (both sides cast identically after identical gathers)."""

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


def _cfg(tmp_path, model, act, **train_kw):
    return Config(
        data=DataConfig(syn_users=150, syn_items=120, syn_interactions=3000,
                        data_dir=str(tmp_path / "data")),
        model=ModelConfig(model=model, dim=16, use_attributes=True,
                          max_seq_len=6, use_pallas_scan=False,
                          dense_vocab_threshold=0),
        train=TrainConfig(batch_size=32, num_sampled=24, act_dtype=act,
                          learning_rate=0.2, compute_dtype="float32",
                          **train_kw),
    )


def _run_steps(cfg, ds, n=3):
    if cfg.model.model == "mf":
        spec = mf_mod.MFSpec.from_config(cfg, ds.user_schema, ds.item_schema)
        params = mf_mod.init_mf(jax.random.key(0), spec)
        udev = attrs_to_device(ds.user_attrs.restrict(spec.user.schema),
                               spec.user)
        idev = attrs_to_device(ds.item_attrs.restrict(spec.item.schema),
                               spec.item)
        loss_fn = lambda p, b, r: mf_mod.mf_loss(p, spec, udev, idev, b, r)
        batches = mf_batches(ds, cfg.train.batch_size, 0, 0)
    else:
        spec = seq_mod.SeqSpec.from_config(cfg, ds.user_schema,
                                           ds.item_schema)
        params = seq_mod.init_seq(jax.random.key(0), spec)
        idev = attrs_to_device(ds.item_attrs.restrict(spec.item_in.schema),
                               spec.item_in)
        loss_fn = lambda p, b, r: seq_mod.seq_loss(p, spec, idev, None, b, r)
        batches = seq_batches(ds, cfg.train.batch_size, spec.max_seq_len,
                              0, 0)
    opt = make_optimizer("adagrad", cfg.train.learning_rate)
    step = make_train_step(loss_fn, opt, cfg.train.learning_rate,
                           donate=False)
    st = init_state(params, opt)
    losses = []
    for i, b in zip(range(n), batches):
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        st, m = step(st, jb, jax.random.fold_in(jax.random.key(5), i))
        losses.append(float(m["loss"]))
    return st.params, losses


@pytest.mark.parametrize("model", ["mf", "lstm"])
def test_bf16_acts_close_to_f32(tmp_path, model):
    cfg32 = _cfg(tmp_path, model, "float32")
    ds = load_or_prepare(cfg32.data)
    p32, l32 = _run_steps(cfg32, ds)
    p16, l16 = _run_steps(_cfg(tmp_path, model, "bfloat16"), ds)
    # same data/rng; bf16 rounding only — losses track within bf16 epsilon
    np.testing.assert_allclose(l16, l32, rtol=5e-2)
    for a, b in zip(jax.tree_util.tree_leaves(p32),
                    jax.tree_util.tree_leaves(p16)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.2, atol=0.05)


def test_sparse_parity_holds_under_bf16_acts(tmp_path):
    """dense-vs-sparse parity is exact WITHIN the bf16 path: both sides
    gather the same rows and cast identically."""
    cfg = _cfg(tmp_path, "mf", "bfloat16")
    ds = load_or_prepare(cfg.data)
    spec = mf_mod.MFSpec.from_config(cfg, ds.user_schema, ds.item_schema)
    assert spec.act_dt == jnp.bfloat16
    params = mf_mod.init_mf(jax.random.key(0), spec)
    udev = attrs_to_device(ds.user_attrs.restrict(spec.user.schema),
                           spec.user)
    idev = attrs_to_device(ds.item_attrs.restrict(spec.item.schema),
                           spec.item)
    opt = make_optimizer("adagrad", cfg.train.learning_rate)
    dense_step = make_train_step(
        lambda p, b, r: mf_mod.mf_loss(p, spec, udev, idev, b, r),
        opt, cfg.train.learning_rate, donate=False)
    d_state = init_state(params, opt)
    sparse_step = make_sparse_train_step(
        False, spec, udev, idev, opt, cfg.train.learning_rate, "adagrad")
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
    sp = unpack_params(s_state.params, table_paths(False, spec))
    for a, b in zip(jax.tree_util.tree_leaves(d_state.params),
                    jax.tree_util.tree_leaves(sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_eval_paths_stay_f32(tmp_path):
    """Eval/serving latents are encoded f32 regardless of act_dtype."""
    cfg = _cfg(tmp_path, "mf", "bfloat16")
    ds = load_or_prepare(cfg.data)
    spec = mf_mod.MFSpec.from_config(cfg, ds.user_schema, ds.item_schema)
    params = mf_mod.init_mf(jax.random.key(0), spec)
    idev = attrs_to_device(ds.item_attrs.restrict(spec.item.schema),
                           spec.item)
    v, b = mf_mod.mf_item_latents(params, spec, idev)
    assert v.dtype == jnp.float32 and b.dtype == jnp.float32
