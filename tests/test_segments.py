"""Long-history support (SURVEY.md §5 "Long-context"): segmented scans with
carried (h, c) — temporal pipelining. The reference truncates histories at
--L (SURVEY.md §5); here a history of n·L steps runs through the same jitted
L-length graph n times with exact state carry and exact gradients.

Covers: forward/gradient parity of the segmented vs unsegmented scan on
every recurrence path (lax.scan and Pallas, LSTM and GRU), segmented
seq_loss == unsegmented seq_loss on the packed history, and
seq_final_state_full == single-shot final state."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arec.config import Config, DataConfig, ModelConfig, TrainConfig
from arec.data.dataset import seq_batches
from arec.data.synthetic import generate
from arec.kernels.gru_scan import pallas_gru_scan
from arec.kernels.lstm_scan import pallas_lstm_scan
from arec.models.seq import (
    SeqSpec, init_seq, init_states, rnn_scan, seq_final_state,
    seq_final_state_full, seq_loss,
)
from arec.tables.engine import attrs_to_device

B, L, D = 4, 12, 16


def _layer(key, d, cell):
    g = 4 if cell == "lstm" else 3
    return {"w": jax.random.normal(key, (2 * d, g * d)) / np.sqrt(2 * d),
            "b": jnp.zeros((g * d,))}


@pytest.fixture
def xm():
    k = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(k, 1), (B, L, D))
    mask = np.ones((B, L), np.float32)
    mask[0, :5] = 0.0   # left-padding crossing the segment boundary
    mask[2, :11] = 0.0  # padding deep into the second segment
    return x, jnp.asarray(mask)


def _scanner(kind, cell):
    if kind == "scan":
        return lambda ps, x, m, **kw: rnn_scan(ps, cell, x, m, jnp.float32,
                                               **kw)
    pallas = pallas_lstm_scan if cell == "lstm" else pallas_gru_scan
    return lambda ps, x, m, **kw: pallas(ps, x, m, dtype=jnp.float32, **kw)


@pytest.mark.parametrize("kind", ["scan", "pallas"])
@pytest.mark.parametrize("cell", ["lstm", "gru"])
def test_segmented_scan_matches_full(xm, kind, cell):
    x, mask = xm
    ps = [_layer(jax.random.fold_in(jax.random.key(2), i), D, cell)
          for i in range(2)]
    run = _scanner(kind, cell)
    full = run(ps, x, mask)
    h1, st = run(ps, x[:, :6], mask[:, :6], return_states=True)
    h2 = run(ps, x[:, 6:], mask[:, 6:], states=st)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(full[:, :6]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(full[:, 6:]),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("kind", ["scan", "pallas"])
@pytest.mark.parametrize("cell", ["lstm", "gru"])
def test_segmented_gradients_match_full(xm, kind, cell):
    """Gradients flow through the (h, c) carry — including the Pallas
    kernels' dh0/dc0/dcT plumbing — so the segmented scan has EXACTLY the
    gradient of the unsegmented one."""
    x, mask = xm
    p = _layer(jax.random.key(3), D, cell)
    run = _scanner(kind, cell)

    def loss_full(p, x):
        return (run([p], x, mask) ** 2).sum()

    def loss_seg(p, x):
        h1, st = run([p], x[:, :6], mask[:, :6], return_states=True)
        h2 = run([p], x[:, 6:], mask[:, 6:], states=st)
        return (h1 ** 2).sum() + (h2 ** 2).sum()

    gp_f, gx_f = jax.grad(loss_full, argnums=(0, 1))(p, x)
    gp_s, gx_s = jax.grad(loss_seg, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_f),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gp_s["w"]), np.asarray(gp_f["w"]),
                               rtol=2e-3, atol=2e-4)


def _spec_pair(ds, segments, L_seg):
    """Two specs over the same data: one packed single-shot (L = n·L_seg),
    one segmented (max_seq_len=L_seg, train_segments=n)."""
    base = dict(model="lstm", dim=16, use_attributes=False,
                use_pallas_scan=False)
    cfg1 = Config(
        data=DataConfig(),
        model=ModelConfig(max_seq_len=segments * L_seg, **base),
        train=TrainConfig(num_sampled=16, compute_dtype="float32"))
    cfgn = Config(
        data=DataConfig(),
        model=ModelConfig(max_seq_len=L_seg, train_segments=segments, **base),
        train=TrainConfig(num_sampled=16, compute_dtype="float32"))
    s1 = SeqSpec.from_config(cfg1, ds.user_schema, ds.item_schema)
    sn = SeqSpec.from_config(cfgn, ds.user_schema, ds.item_schema)
    assert s1.pack_len == sn.pack_len
    return s1, sn


def test_seq_loss_segmented_matches_single_shot():
    ds = generate(DataConfig(syn_users=80, syn_items=60,
                             syn_interactions=2000))
    s1, sn = _spec_pair(ds, segments=3, L_seg=4)
    params = init_seq(jax.random.key(0), s1)
    item_dev = attrs_to_device(ds.item_attrs.restrict(s1.item_in.schema))
    batch = next(iter(seq_batches(ds, 16, s1.pack_len, 0, 0)))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.key(5)

    l1, g1 = jax.value_and_grad(seq_loss)(params, s1, item_dev, None, jb, rng)
    ln, gn = jax.value_and_grad(seq_loss)(params, sn, item_dev, None, jb, rng)
    np.testing.assert_allclose(float(l1), float(ln), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(gn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_seq_final_state_full_matches_single_shot():
    ds = generate(DataConfig(syn_users=80, syn_items=60,
                             syn_interactions=2000))
    s1, sn = _spec_pair(ds, segments=3, L_seg=4)
    params = init_seq(jax.random.key(0), s1)
    item_dev = attrs_to_device(ds.item_attrs.restrict(s1.item_in.schema))
    batch = next(iter(seq_batches(ds, 16, s1.pack_len, 0, 0)))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    want = seq_final_state(params, s1, item_dev, None, jb)
    got = seq_final_state_full(params, sn, item_dev, None, jb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_segmented_training_learns_beyond_truncation():
    """A segmented model trained on 3·L history must run end to end and
    produce finite loss/grads with the Pallas path too."""
    ds = generate(DataConfig(syn_users=60, syn_items=50,
                             syn_interactions=1800))
    cfg = Config(
        data=DataConfig(),
        model=ModelConfig(model="lstm", dim=16, use_attributes=False,
                          max_seq_len=4, train_segments=3,
                          use_pallas_scan=True),
        train=TrainConfig(num_sampled=16, compute_dtype="float32"))
    spec = SeqSpec.from_config(cfg, ds.user_schema, ds.item_schema)
    params = init_seq(jax.random.key(0), spec)
    item_dev = attrs_to_device(ds.item_attrs.restrict(spec.item_in.schema))
    batch = next(iter(seq_batches(ds, 8, spec.pack_len, 0, 0)))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    loss, grads = jax.jit(jax.value_and_grad(seq_loss), static_argnums=(1,))(
        params, spec, item_dev, None, jb, jax.random.key(1))
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_init_states_shape():
    cfg = Config(model=ModelConfig(model="lstm", dim=16, num_layers=2))
    ds = generate(DataConfig(syn_users=40, syn_items=30,
                             syn_interactions=600))
    spec = SeqSpec.from_config(cfg, ds.user_schema, ds.item_schema)
    st = init_states(spec, 8)
    assert len(st) == 2
    assert st[0][0].shape == (8, 16) and st[1][1].shape == (8, 16)
