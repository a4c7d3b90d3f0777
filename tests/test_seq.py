"""Sequence-family tests: cell correctness vs textbook numpy, masked-padding
semantics, Pallas-vs-scan differential (forward AND gradients), and an
end-to-end learning run (SURVEY.md §4; §7 "keep the lax.scan fallback
permanently for differential testing")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arec.config import Config, DataConfig, ModelConfig, TrainConfig
from arec.data.dataset import eval_batches, seq_batches
from arec.data.synthetic import generate
from arec.kernels.lstm_scan import pallas_lstm_scan
from arec.models.seq import (
    SeqSpec, init_seq, rnn_scan, seq_final_state, seq_hidden,
    seq_item_latents, seq_loss,
)
from arec.tables.engine import attrs_to_device
from arec.train.evalu import recall_hits
from arec.train.step import init_state, make_optimizer, make_train_step

B, L, D = 4, 7, 16


def _layer(key, d, cell="lstm"):
    g = 4 if cell == "lstm" else 3
    w = jax.random.normal(key, (2 * d, g * d)) / np.sqrt(2 * d)
    b = jnp.zeros((g * d,))
    if cell == "lstm":
        b = b.at[d:2 * d].set(1.0)
    return {"w": w, "b": b}


def _numpy_lstm(w, b, x, mask):
    """Textbook per-step LSTM, no tricks — the oracle."""
    w, b, x, mask = map(np.asarray, (w, b, x, mask))
    bsz, T, d = x.shape
    h = np.zeros((bsz, d))
    c = np.zeros((bsz, d))
    out = np.zeros((bsz, T, d))
    sig = lambda z: 1.0 / (1.0 + np.exp(-z))
    for t in range(T):
        z = np.concatenate([x[:, t], h], -1) @ w + b
        i, f, g, o = np.split(z, 4, -1)
        c_new = sig(f) * c + sig(i) * np.tanh(g)
        h_new = sig(o) * np.tanh(c_new)
        m = mask[:, t][:, None]
        h = m * h_new + (1 - m) * h
        c = m * c_new + (1 - m) * c
        out[:, t] = h
    return out


@pytest.fixture
def xm():
    k = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(k, 1), (B, L, D))
    mask = np.ones((B, L), np.float32)
    mask[0, :3] = 0.0  # left-padded row
    mask[1, :6] = 0.0
    return x, jnp.asarray(mask)


def test_scan_lstm_matches_numpy_oracle(xm):
    x, mask = xm
    p = _layer(jax.random.key(2), D)
    got = rnn_scan([p], "lstm", x, mask, jnp.float32)
    want = _numpy_lstm(p["w"], p["b"], x, mask)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_masked_padding_is_noop(xm):
    """Left-padding + masked updates: a padded sequence must produce the same
    final state as the unpadded suffix alone."""
    x, _ = xm
    p = _layer(jax.random.key(3), D)
    full_mask = jnp.ones((B, L))
    suffix = rnn_scan([p], "lstm", x[:, 3:], full_mask[:, 3:], jnp.float32)
    padded_mask = jnp.concatenate(
        [jnp.zeros((B, 3)), jnp.ones((B, L - 3))], axis=1)
    padded = rnn_scan([p], "lstm", x, padded_mask, jnp.float32)
    np.testing.assert_allclose(np.asarray(padded[:, -1]),
                               np.asarray(suffix[:, -1]), rtol=1e-4, atol=1e-5)


def test_gru_runs_and_respects_mask(xm):
    x, mask = xm
    p = _layer(jax.random.key(4), D, "gru")
    out = rnn_scan([p], "gru", x, mask, jnp.float32)
    assert out.shape == (B, L, D)
    # masked-out prefix keeps zero state
    np.testing.assert_allclose(np.asarray(out[0, :3]), 0.0, atol=1e-6)


@pytest.mark.parametrize("layers", [1, 2])
def test_pallas_forward_matches_scan(xm, layers):
    x, mask = xm
    ps = [_layer(jax.random.key(10 + i), D) for i in range(layers)]
    ref = rnn_scan(ps, "lstm", x, mask, jnp.float32)
    got = pallas_lstm_scan(ps, x, mask, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_gradients_match_scan(xm):
    x, mask = xm
    p = _layer(jax.random.key(11), D)

    def loss_ref(p, x):
        return (rnn_scan([p], "lstm", x, mask, jnp.float32) ** 2).sum()

    def loss_pl(p, x):
        return (pallas_lstm_scan([p], x, mask, dtype=jnp.float32) ** 2).sum()

    (gp_ref, gx_ref) = jax.grad(loss_ref, argnums=(0, 1))(p, x)
    (gp_pl, gx_pl) = jax.grad(loss_pl, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(gx_pl), np.asarray(gx_ref),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gp_pl["w"]), np.asarray(gp_ref["w"]),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gp_pl["b"]), np.asarray(gp_ref["b"]),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("layers", [1, 2])
def test_pallas_gru_forward_matches_scan(xm, layers):
    from arec.kernels.gru_scan import pallas_gru_scan
    x, mask = xm
    ps = [_layer(jax.random.key(20 + i), D, "gru") for i in range(layers)]
    ref = rnn_scan(ps, "gru", x, mask, jnp.float32)
    got = pallas_gru_scan(ps, x, mask, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_gru_gradients_match_scan(xm):
    from arec.kernels.gru_scan import pallas_gru_scan
    x, mask = xm
    p = _layer(jax.random.key(21), D, "gru")

    def loss_ref(p, x):
        return (rnn_scan([p], "gru", x, mask, jnp.float32) ** 2).sum()

    def loss_pl(p, x):
        return (pallas_gru_scan([p], x, mask, dtype=jnp.float32) ** 2).sum()

    (gp_ref, gx_ref) = jax.grad(loss_ref, argnums=(0, 1))(p, x)
    (gp_pl, gx_pl) = jax.grad(loss_pl, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(gx_pl), np.asarray(gx_ref),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gp_pl["w"]), np.asarray(gp_ref["w"]),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gp_pl["b"]), np.asarray(gp_ref["b"]),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("pallas,segments,cell",
                         [(False, 1, "lstm"), (True, 1, "lstm"),
                          (False, 2, "lstm"), (True, 1, "gru")])
def test_time_major_loss_matches_batch_major(pallas, segments, cell):
    """The single-device time-major fast path (ids transposed before the
    gather, no embedding-sized layout changes) must give the same loss and
    gradients as the batch-major path, for the lax.scan and Pallas
    recurrences and for the segmented (temporal-pipelining) scan."""
    from arec.data.dataset import seq_batches
    from arec.data.synthetic import generate

    L = 6
    cfg = Config(
        data=DataConfig(syn_users=120, syn_items=90, syn_interactions=2600,
                        data_dir="/tmp/arec_test_tm"),
        model=ModelConfig(model="lstm", dim=16, use_attributes=True,
                          cell=cell, max_seq_len=L, train_segments=segments,
                          use_pallas_scan=pallas),
        train=TrainConfig(batch_size=32, num_sampled=16,
                          compute_dtype="float32"),
    )
    ds = generate(cfg.data)
    spec = SeqSpec.from_config(cfg, ds.user_schema, ds.item_schema)
    params = init_seq(jax.random.key(0), spec)
    item_dev = attrs_to_device(ds.item_attrs.restrict(spec.item_in.schema))
    batch = next(iter(seq_batches(ds, 32, spec.pack_len, 0, 0)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.key(3)

    def f(tm):
        return lambda p: seq_loss(p, spec, item_dev, None, batch, rng,
                                  time_major=tm)

    l0, g0 = jax.value_and_grad(f(False))(params)
    l1, g1 = jax.value_and_grad(f(True))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def _recall_seq(params, spec, item_dev, user_dev, ds):
    v, b = seq_item_latents(params, spec, item_dev)
    hits = total = 0.0
    for batch in eval_batches(ds, 64, max_seq_len=spec.max_seq_len):
        jb = {k: jnp.asarray(x) for k, x in batch.items()}
        h = seq_final_state(params, spec, item_dev, user_dev, jb)
        seen = jnp.asarray(ds.seen_items[batch["user"]])
        hh, tt = recall_hits(h, v, b, seen, jb["pos_item"], jb["valid"], k=30)
        hits += float(hh)
        total += float(tt)
    return hits / max(total, 1.0)


@pytest.mark.parametrize("cell", ["lstm", "gru"])
def test_seq_end_to_end_learns(cell):
    cfg = Config(
        data=DataConfig(syn_users=300, syn_items=200, syn_interactions=9000),
        model=ModelConfig(model="lstm", dim=32, use_attributes=False,
                          cell=cell, max_seq_len=10, use_pallas_scan=False),
        train=TrainConfig(batch_size=64, learning_rate=0.4, num_sampled=64,
                          compute_dtype="float32"),
    )
    ds = generate(cfg.data)
    spec = SeqSpec.from_config(cfg, ds.user_schema, ds.item_schema)
    params = init_seq(jax.random.key(0), spec)
    item_dev = attrs_to_device(ds.item_attrs.restrict(spec.item_in.schema))
    user_dev = None

    opt = make_optimizer("adagrad", cfg.train.learning_rate)
    state = init_state(params, opt)

    def loss_fn(p, batch, rng):
        return seq_loss(p, spec, item_dev, user_dev, batch, rng)

    step = make_train_step(loss_fn, opt, cfg.train.learning_rate, donate=False)

    r0 = _recall_seq(params, spec, item_dev, user_dev, ds)
    rng = jax.random.key(7)
    losses = []
    for epoch in range(12):
        for batch in seq_batches(ds, cfg.train.batch_size, spec.max_seq_len,
                                 0, epoch):
            rng, sub = jax.random.split(rng)
            state, m = step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                            sub)
            losses.append(float(m["loss"]))
    r1 = _recall_seq(state.params, spec, item_dev, user_dev, ds)
    # Note the bar: with seen-item masking, even a perfect popularity model
    # only reaches ≈ the random baseline on this synthetic set (popular items
    # are mostly already consumed); the regression signal is the improvement
    # delta from the untrained model plus loss descent.
    random_baseline = 30 / ds.num_items
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9
    assert r1 > random_baseline * 0.9, (r1, random_baseline)
    assert r1 > r0 + 0.05, (r0, r1)


def test_seq_tie_output_trains_and_evals():
    cfg = Config(
        data=DataConfig(syn_users=80, syn_items=60, syn_interactions=1500),
        model=ModelConfig(model="lstm", dim=16, use_attributes=True,
                          max_seq_len=6, use_pallas_scan=False,
                          tie_output=True),
        train=TrainConfig(batch_size=16, num_sampled=16,
                          compute_dtype="float32"),
    )
    ds = generate(cfg.data)
    spec = SeqSpec.from_config(cfg, ds.user_schema, ds.item_schema)
    assert spec.tie_output
    params = init_seq(jax.random.key(0), spec)
    assert "item_out" not in params
    item_dev = attrs_to_device(ds.item_attrs.restrict(spec.item_in.schema))
    batch = next(iter(seq_batches(ds, 16, 6, 0, 0)))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    val, grads = jax.value_and_grad(seq_loss)(
        params, spec, item_dev, None, jb, jax.random.key(1))
    assert np.isfinite(float(val))
    v, b = seq_item_latents(params, spec, item_dev)
    assert v.shape == (ds.num_items, 16)


def test_seq_attribute_path_one_step():
    cfg = Config(
        data=DataConfig(syn_users=80, syn_items=60, syn_interactions=1500),
        model=ModelConfig(model="lstm", dim=16, use_attributes=True,
                          concat_user=True, max_seq_len=6,
                          use_pallas_scan=False, num_layers=2),
        train=TrainConfig(batch_size=16, num_sampled=16,
                          compute_dtype="float32"),
    )
    ds = generate(cfg.data)
    spec = SeqSpec.from_config(cfg, ds.user_schema, ds.item_schema)
    params = init_seq(jax.random.key(0), spec)
    item_dev = attrs_to_device(ds.item_attrs.restrict(spec.item_in.schema))
    user_dev = attrs_to_device(ds.user_attrs.restrict(spec.user.schema))
    batch = next(iter(seq_batches(ds, 16, 6, 0, 0)))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    val, grads = jax.value_and_grad(seq_loss)(
        params, spec, item_dev, user_dev, jb, jax.random.key(1))
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


# ---------------------------------------------------------------------------
# Recurrent dropout (ref --keep_prob wrapped RNN cells in a TF1
# DropoutWrapper; VERDICT round 1 missing #6). Output dropout between
# stacked layers and into the softmax, per-timestep masks, carries
# undropped, OFF at eval.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("use_pallas", [False, True])
def test_recurrent_dropout_trains_and_eval_is_deterministic(use_pallas):
    import dataclasses
    cfg = Config(
        data=DataConfig(syn_users=120, syn_items=90, syn_interactions=2600,
                        data_dir="/tmp/arec_test_tm"),
        model=ModelConfig(model="lstm", dim=16, use_attributes=True,
                          max_seq_len=6, num_layers=2, keep_prob=0.6,
                          use_pallas_scan=use_pallas),
        train=TrainConfig(batch_size=32, num_sampled=16,
                          compute_dtype="float32"),
    )
    ds = generate(cfg.data)
    spec = SeqSpec.from_config(cfg, ds.user_schema, ds.item_schema)
    params = init_seq(jax.random.key(0), spec)
    item_dev = attrs_to_device(
        ds.item_attrs.restrict(spec.item_in.schema), spec.item_in)
    batch = next(iter(seq_batches(ds, 32, spec.max_seq_len, 0, 0)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.key(7)

    loss, grads = jax.value_and_grad(seq_loss)(
        params, spec, item_dev, None, batch, rng)
    assert np.isfinite(float(loss))
    gsum = sum(float(jnp.abs(g).sum())
               for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gsum) and gsum > 0

    # dropout actually fires: same rng, keep_prob=1 spec gives another loss
    spec1 = dataclasses.replace(spec, keep_prob=1.0)
    loss1 = seq_loss(params, spec1, item_dev, None, batch, rng)
    assert abs(float(loss) - float(loss1)) > 1e-6

    # different rng -> different loss (fresh masks, not a frozen mask)
    loss2 = seq_loss(params, spec, item_dev, None, batch, jax.random.key(8))
    assert abs(float(loss) - float(loss2)) > 1e-6

    # eval path (no dropout_rng) is deterministic and keep_prob-independent
    h_a = seq_final_state(params, spec, item_dev, None, batch)
    h_b = seq_final_state(params, spec, item_dev, None, batch)
    h_c = seq_final_state(params, spec1, item_dev, None, batch)
    np.testing.assert_array_equal(np.asarray(h_a), np.asarray(h_b))
    np.testing.assert_array_equal(np.asarray(h_a), np.asarray(h_c))


def test_recurrent_dropout_masks_differ_across_layers():
    """Layer-indexed fold_in: two stacked layers must not share one mask
    (a shared mask would correlate the layers' regularization)."""
    from arec.models.seq import output_dropout
    rng = jax.random.key(3)
    h = jnp.ones((4, 5, 8))
    m0 = np.asarray(output_dropout(h, jax.random.fold_in(rng, 0), 0.5))
    m1 = np.asarray(output_dropout(h, jax.random.fold_in(rng, 1), 0.5))
    assert (m0 != m1).any()
    # inverted scaling: surviving entries are 1/keep_prob
    assert set(np.unique(m0).tolist()) <= {0.0, 2.0}
