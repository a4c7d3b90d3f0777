"""LSTM/GRU sequence-recommendation model family.

Rebuild of the reference's `SeqModel` (SURVEY.md §2.1 "LSTM sequence model",
§3.2): language-model-style next-item prediction over a user's time-ordered
item sequence. Input at step t is the fused attribute embedding of item t
(optionally + the user embedding); stacked LSTM/GRU cells; output projection
against a dedicated item output-embedding table; sampled softmax in training,
full softmax at eval.

TPU-first departures:
  * No bucketed per-length graphs (the reference builds one unrolled TF graph
    per bucket, SURVEY.md §3.2). One fixed max_seq_len L, left-padded inputs,
    and a scan — a single jitted graph serves every batch.
  * Left-padding + masked state updates: h,c only advance where mask==1, so
    pad steps are exact no-ops and the state at position L−1 is the state
    after the user's full (truncated) history — which is what the recommend
    path consumes (SURVEY.md §3.3).
  * The recurrence runs either as a `lax.scan` of a fused-gate cell (the
    permanent differential-testing reference, SURVEY.md §7 "Pallas LSTM
    scan") or as the Pallas kernel in arec/kernels/lstm_scan.py.

Hidden size equals the embedding dim (the reference's single --size flag
controls both).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from arec.config import Config
from arec.data.schema import EntitySchema
from arec.losses.losses import sampled_softmax_loss
from arec.tables.engine import (
    EncoderSpec, dense_lookup, encode, encode_with_bias, init_encoder,
)


@dataclass(frozen=True)
class SeqSpec:
    item_in: EncoderSpec            # input-side fused item encoder
    user: EncoderSpec | None        # optional user encoder (concat_user)
    cell: str = "lstm"              # {lstm, gru}
    num_layers: int = 1
    max_seq_len: int = 30           # scan segment length
    train_segments: int = 1         # segments per example (pack_len = n·L)
    num_sampled: int = 256
    sampler: str = "log_uniform"
    keep_prob: float = 1.0
    use_pallas_scan: bool = False
    tie_output: bool = False    # score against the fused item encoder instead
                                # of a dedicated output table
    compute_dtype: str = "bfloat16"
    act_dtype: str = "float32"  # TRAIN-path activation dtype (see MFSpec)

    @property
    def dim(self) -> int:
        return self.item_in.dim

    @property
    def pack_len(self) -> int:
        """Total history length per example (data-packing width)."""
        return self.max_seq_len * self.train_segments

    @property
    def vocab(self) -> int:
        return self.item_in.schema.num_entities

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    @staticmethod
    def from_config(cfg: Config, user_schema: EntitySchema,
                    item_schema: EntitySchema) -> "SeqSpec":
        if cfg.train.loss not in ("ce", "mce"):
            # the seq family trains every valid position under sampled CE
            # (ref losses ce/mce are the same computation here); reject
            # MF-only losses instead of silently ignoring them
            raise ValueError(
                f"sequence model supports loss ce/mce, not "
                f"{cfg.train.loss!r}")
        if not cfg.model.use_attributes:
            item_schema = item_schema.id_only()
            user_schema = user_schema.id_only()
        mk = lambda s, wb=False: EncoderSpec(
            s, cfg.model.dim, cfg.model.fusion, cfg.model.nonlinear,
            with_bias=wb,
            dense_mulhot_threshold=cfg.model.dense_vocab_threshold)
        return SeqSpec(
            # with tie_output the fused input encoder is also the output
            # embedding, so it carries the per-item score bias column
            item_in=mk(item_schema, wb=cfg.model.tie_output),
            user=mk(user_schema) if cfg.model.concat_user else None,
            cell=cfg.model.cell,
            num_layers=cfg.model.num_layers,
            max_seq_len=cfg.model.max_seq_len,
            train_segments=cfg.model.train_segments,
            num_sampled=cfg.train.num_sampled,
            sampler=cfg.train.sampler,
            keep_prob=cfg.model.keep_prob,
            use_pallas_scan=cfg.model.use_pallas_scan,
            tie_output=cfg.model.tie_output,
            compute_dtype=cfg.train.compute_dtype,
            act_dtype=cfg.train.act_dtype,
        )

    @property
    def act_dt(self):
        """jnp dtype for train-path activations; None = float32 (no cast)."""
        return None if self.act_dtype == "float32" else jnp.dtype(
            self.act_dtype)


def _gate_count(cell: str) -> int:
    return {"lstm": 4, "gru": 3}[cell]


def init_seq(key: jax.Array, spec: SeqSpec) -> dict:
    keys = jax.random.split(key, spec.num_layers + 3)
    d, g = spec.dim, _gate_count(spec.cell)
    params: dict = {"item_in": init_encoder(keys[0], spec.item_in)}
    if spec.user is not None:
        params["user"] = init_encoder(keys[1], spec.user)
    layers = []
    for l in range(spec.num_layers):
        k = keys[2 + l]
        d_in = d  # input dim == hidden dim at every layer (single --size)
        w = jax.random.normal(k, (d_in + d, g * d)) / jnp.sqrt(d_in + d)
        b = jnp.zeros((g * d,))
        if spec.cell == "lstm":
            # forget-gate bias 1.0 — standard LSTM training stabilizer
            b = b.at[d : 2 * d].set(1.0)
        layers.append({"w": w, "b": b})
    params["rnn"] = layers
    # dedicated output table (TF1 sampled_softmax weights analog): [V+1, D+1]
    # with the per-item score bias in COLUMN D (zero-initialized) so bias
    # lookup + gradient ride the row gather — no separate [V] bias array
    # (see EncoderSpec.with_bias for the measured cost of one). One PAD row
    # so sequence-pad target ids stay in range. With tie_output the fused
    # input encoder doubles as the output embedding (ref --use_concat-era
    # weight tying) and carries the bias column itself (with_bias=True).
    v = spec.vocab
    if not spec.tie_output:
        t = jax.random.normal(keys[-1], (v + 1, d + 1)) / jnp.sqrt(d)
        params["item_out"] = t.at[:, d].set(0.0)
    return params


# --------------------------------------------------------------------------
# Recurrence. TPU layout: the input projection x·Wx for ALL timesteps is one
# big [B·L, D] × [D, G·H] MXU matmul OUTSIDE the scan; the sequential part is
# only the small recurrent matmul h·Wh per step. The same (xw, wh) layout is
# shared by the lax.scan reference below and the Pallas fused-gate kernel
# (arec/kernels/lstm_scan.py), so they are drop-in interchangeable.
# --------------------------------------------------------------------------

def input_projection(p: dict, x: jnp.ndarray, dtype) -> jnp.ndarray:
    """x [B, L, D_in] → xw [B, L, G·H] = x · Wx + b (bias folded in)."""
    d_in = x.shape[-1]
    wx = p["w"][:d_in]
    return jax.lax.dot_general(
        x.astype(dtype), wx.astype(dtype),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + p["b"]


def lstm_step(wh, xw_t, h, c, dtype):
    """One LSTM step from precomputed input projection xw_t [B, 4H]."""
    gates = xw_t + jax.lax.dot_general(
        h.astype(dtype), wh.astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def gru_step(wh, xw_t, h, c, dtype):
    """One GRU step; xw_t [B, 3H] = x·[Wx_r|Wx_u|Wx_n] + b."""
    d = h.shape[-1]
    hw = jax.lax.dot_general(
        h.astype(dtype), wh[:, : 2 * d].astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    r = jax.nn.sigmoid(xw_t[:, :d] + hw[:, :d])
    u = jax.nn.sigmoid(xw_t[:, d : 2 * d] + hw[:, d:])
    n = jnp.tanh(xw_t[:, 2 * d :] + jax.lax.dot_general(
        (r * h).astype(dtype), wh[:, 2 * d :].astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    h_new = (1.0 - u) * n + u * h
    return h_new, c


def layer_scan(p: dict, cell: str, x: jnp.ndarray, mask: jnp.ndarray,
               dtype, state: tuple | None = None,
               return_state: bool = False, time_major: bool = False):
    """One recurrent layer via lax.scan: x [B, L, D] → h_all [B, L, H]
    (with time_major=True: x [L, B, D], mask [L, B] → h_all [L, B, H] — no
    embedding-sized transposes anywhere; see seq_hidden).
    Masked state updates make pad steps exact no-ops. This is the permanent
    correctness reference for the Pallas kernel (SURVEY.md §7).

    `state` is an optional (h0, c0) carry-in (each [B, H]) and
    `return_state=True` additionally returns the final (hT, cT) — the
    segmented-scan / temporal-pipelining hook (SURVEY.md §5 "Long-context":
    segment the scan and carry (h, c) across segments). Gradients flow
    through the carry, so a segmented scan is exactly the unsegmented one."""
    b = x.shape[1] if time_major else x.shape[0]
    d = p["w"].shape[0] - x.shape[-1]
    wh = p["w"][x.shape[-1]:]
    xw = input_projection(p, x, dtype)                    # [..., G·H]
    step_fn = lstm_step if cell == "lstm" else gru_step

    def step(carry, inp):
        h, c = carry
        xw_t, m_t = inp
        m = m_t[:, None]
        h_new, c_new = step_fn(wh, xw_t, h, c, dtype)
        h = m * h_new + (1.0 - m) * h
        c = m * c_new + (1.0 - m) * c
        return (h, c), h

    if state is None:
        zeros = jnp.zeros((b, d), jnp.float32)
        state = (zeros, zeros)
    xs = (xw, mask) if time_major else (xw.transpose(1, 0, 2),
                                        mask.transpose(1, 0))
    (hT, cT), out = jax.lax.scan(step, state, xs)
    if not time_major:
        out = out.transpose(1, 0, 2)
    if return_state:
        return out, (hT, cT)
    return out


def output_dropout(h: jnp.ndarray, rng: jax.Array | None,
                   keep_prob: float) -> jnp.ndarray:
    """TF1 DropoutWrapper(output_keep_prob) semantics: an independent
    per-timestep mask on a layer's OUTPUT sequence — what the next layer
    and the softmax see — while the recurrent (h, c) carry propagates
    undropped. rng=None (eval) is the identity."""
    if rng is None or keep_prob >= 1.0:
        return h
    keep = jax.random.bernoulli(rng, keep_prob, h.shape)
    return jnp.where(keep, h / keep_prob, 0.0)


def rnn_scan(layers: list[dict], cell: str, x: jnp.ndarray,
             mask: jnp.ndarray, dtype, states: list | None = None,
             return_states: bool = False, time_major: bool = False,
             dropout_rng: jax.Array | None = None, keep_prob: float = 1.0):
    """Stacked layers; returns top-layer hidden states [B, L, H]
    ([L, B, H] with time_major=True).
    `states`: optional per-layer (h0, c0) carries (see layer_scan).
    `dropout_rng`/`keep_prob`: recurrent output dropout per layer (ref:
    --keep_prob wrapped cells in DropoutWrapper — see output_dropout)."""
    h = x
    new_states = []
    for li, p in enumerate(layers):
        st = states[li] if states is not None else None
        h, stT = layer_scan(p, cell, h, mask, dtype, state=st,
                            return_state=True, time_major=time_major)
        new_states.append(stT)   # carry is pre-dropout (DropoutWrapper)
        if dropout_rng is not None:
            h = output_dropout(h, jax.random.fold_in(dropout_rng, li),
                               keep_prob)
    if return_states:
        return h, new_states
    return h


# --------------------------------------------------------------------------
# Forward / loss / recommend
# --------------------------------------------------------------------------

def seq_inputs(params, spec: SeqSpec, item_dev, user_dev, batch,
               lookup_fn=dense_lookup, dropout_rng=None,
               lookup_fns: dict | None = None,
               time_major: bool = False) -> jnp.ndarray:
    """Fused per-step input embeddings [B, L, D] (SURVEY.md §3.2:
    input_t = fuse(item-attr lookups at position t)). With time_major=True
    the int32 id matrix is transposed BEFORE the gather, so the embeddings
    are born [L, B, D] — transposing ids costs B·L·4 bytes; transposing the
    embeddings after would cost B·L·D·4."""
    lk = lookup_fns or {}
    ids = batch["inputs"].T if time_major else batch["inputs"]
    # act_dtype (bf16 activations): both scan paths cast x into the compute
    # dtype at the input projection anyway (input_projection), so a bf16 x
    # only narrows the [L, B, D] HBM intermediate, never the math
    x = encode(params["item_in"], spec.item_in, item_dev, ids,
               lk.get("item", lookup_fn),
               dropout_rng=dropout_rng, keep_prob=spec.keep_prob,
               act_dtype=spec.act_dt)
    if spec.user is not None:
        u = encode(params["user"], spec.user, user_dev, batch["user"],
                   lk.get("user", lookup_fn), act_dtype=spec.act_dt)
        x = x + (u[None, :, :] if time_major else u[:, None, :])
    return x


def init_states(spec: SeqSpec, batch_size: int) -> list:
    """Zero per-layer (h, c) carries for TBPTT / segmented scans."""
    z = jnp.zeros((batch_size, spec.dim), jnp.float32)
    return [(z, z) for _ in range(spec.num_layers)]


def seq_hidden(params, spec: SeqSpec, item_dev, user_dev, batch,
               lookup_fn=dense_lookup, dropout_rng=None,
               lookup_fns: dict | None = None,
               states: list | None = None, return_states: bool = False,
               time_major: bool = False):
    """Top-layer hidden states [B, L, H] ([L, B, H] with time_major=True —
    the single-device fast path: ids are transposed before the gather and
    no [B, L, D]-sized layout change exists anywhere in the pipeline; the
    mesh path keeps batch-major so the flattened position axis preserves
    data-parallel sharding locality). `states`/`return_states` expose the
    per-layer (h, c) carries — the temporal-pipelining hook (SURVEY.md §5
    "Long-context"): run segments of a long history through the same jitted
    graph, carrying state, instead of truncating at L."""
    r_in = r_rnn = None
    if dropout_rng is not None and spec.keep_prob < 1.0:
        r_in, r_rnn = jax.random.split(dropout_rng)
    elif dropout_rng is not None:
        r_in = dropout_rng
    x = seq_inputs(params, spec, item_dev, user_dev, batch, lookup_fn,
                   r_in, lookup_fns, time_major=time_major)
    mask = batch["mask"].T if time_major else batch["mask"]
    if spec.use_pallas_scan and spec.cell == "lstm":
        from arec.kernels.lstm_scan import pallas_lstm_scan
        return pallas_lstm_scan(params["rnn"], x, mask, dtype=spec.dtype,
                                states=states, return_states=return_states,
                                time_major=time_major, dropout_rng=r_rnn,
                                keep_prob=spec.keep_prob)
    if spec.use_pallas_scan and spec.cell == "gru":
        from arec.kernels.gru_scan import pallas_gru_scan
        return pallas_gru_scan(params["rnn"], x, mask, dtype=spec.dtype,
                               states=states, return_states=return_states,
                               time_major=time_major, dropout_rng=r_rnn,
                               keep_prob=spec.keep_prob)
    return rnn_scan(params["rnn"], spec.cell, x, mask, spec.dtype,
                    states=states, return_states=return_states,
                    time_major=time_major, dropout_rng=r_rnn,
                    keep_prob=spec.keep_prob)


def _pad_time_for_scan(spec: SeqSpec, batch: dict) -> dict:
    """RIGHT-pad the time axis to the Pallas kernels' native tile length.

    Pad steps carry mask 0, so they are exact no-ops for the recurrence
    (masked state updates) and weight 0 in the loss — the value and every
    gradient are unchanged. Padding the int32 batch ONCE here is ~1000×
    cheaper than the [L, B, ·]-sized f32 pad/slice copies the kernel
    wrappers otherwise emit around every forward+backward (measured
    ~275 µs/step at the flagship LSTM shape, L=30 → 32)."""
    if not spec.use_pallas_scan:
        return batch
    from arec.kernels.lstm_scan import padded_seq_len
    b, L = batch["inputs"].shape
    lp = padded_seq_len(L, b, spec.dim)
    if lp == L:
        return batch
    pad_id = spec.vocab          # the PAD row; encodes to exactly zero
    out = dict(batch)
    out["inputs"] = jnp.pad(batch["inputs"], ((0, 0), (0, lp - L)),
                            constant_values=pad_id)
    out["targets"] = jnp.pad(batch["targets"], ((0, 0), (0, lp - L)),
                             constant_values=pad_id)
    out["mask"] = jnp.pad(batch["mask"], ((0, 0), (0, lp - L)))
    return out


def seq_loss(params, spec: SeqSpec, item_dev, user_dev, batch,
             rng: jax.Array, lookup_fn=dense_lookup,
             lookup_fns: dict | None = None,
             sampled: tuple | None = None,
             states: list | None = None, return_states: bool = False,
             use_kernel: bool | None = None, time_major: bool = False,
             mesh=None, pop=None):
    """Sampled-softmax CE over all valid positions (ref losses ce/mce both
    train every position; SURVEY.md §3.2). With `states`/`return_states`
    the loss runs one TBPTT segment: the caller carries (and stop-gradients)
    the returned per-layer states into the next segment's call."""
    lk = lookup_fns or {}
    r_drop, r_neg = jax.random.split(rng)
    L, n = spec.max_seq_len, spec.train_segments
    if n > 1 and batch["inputs"].shape[1] == n * L:
        # long-history training (SURVEY.md §5 temporal pipelining): scan the
        # packed n·L history in n carried-(h,c) segments. Gradients flow
        # through the carries (exact — see layer_scan), and jax.checkpoint
        # drops each segment's scan residuals, so activation memory is
        # O(B·L) + recompute instead of O(B·n·L).
        def seg_fn(p, st, seg, r):
            return seq_hidden(p, spec, item_dev, user_dev, seg, lookup_fn,
                              dropout_rng=r, lookup_fns=lookup_fns,
                              states=st, return_states=True,
                              time_major=time_major)
        seg_fn = jax.checkpoint(seg_fn)
        st = states if states is not None else init_states(
            spec, batch["inputs"].shape[0])
        hs = []
        for s in range(n):
            seg = dict(batch)
            seg["inputs"] = batch["inputs"][:, s * L:(s + 1) * L]
            seg["mask"] = batch["mask"][:, s * L:(s + 1) * L]
            h_s, st = seg_fn(params, st, seg,
                             jax.random.fold_in(r_drop, s))
            hs.append(h_s)
        h, new_states = jnp.concatenate(hs, axis=0 if time_major else 1), st
    else:
        batch = _pad_time_for_scan(spec, batch)
        h = seq_hidden(params, spec, item_dev, user_dev, batch, lookup_fn,
                       dropout_rng=r_drop, lookup_fns=lookup_fns,
                       states=states, return_states=return_states,
                       time_major=time_major)
        if return_states:
            h, new_states = h
    d = h.shape[-1]
    flat_h = h.reshape(-1, d)
    if time_major:
        # position order is (t, b) — the loss is a weighted mean, so any
        # consistent flattening of (h, targets, mask) gives the same value
        flat_t = batch["targets"].T.reshape(-1)
        flat_w = batch["mask"].T.reshape(-1)
    else:
        flat_t = batch["targets"].reshape(-1)
        flat_w = batch["mask"].reshape(-1)
    embed_raw = None
    if spec.tie_output:
        embed = lambda ids: encode_with_bias(
            params["item_in"], spec.item_in, item_dev, ids,
            lk.get("item", lookup_fn), act_dtype=spec.act_dt)
    else:
        # raw [n, D+1] rows (bias in lane D): the fused-CE kernel's aug
        # mode consumes/produces this shape directly for the true side —
        # bias slice and grad re-merge both disappear
        embed_raw = lambda ids: lk.get("out", lookup_fn)(
            params["item_out"], ids)

        def embed(ids):
            rows = embed_raw(ids)
            return rows[:, :d], rows[:, d]
    loss = sampled_softmax_loss(
        flat_h, flat_t, embed, r_neg, spec.num_sampled, spec.vocab,
        dist=spec.sampler, weights=flat_w, compute_dtype=spec.dtype,
        sampled=sampled, use_kernel=use_kernel, mesh=mesh, pop=pop,
        embed_raw=embed_raw)
    if return_states:
        return loss, new_states
    return loss


def seq_final_state(params, spec: SeqSpec, item_dev, user_dev, batch,
                    lookup_fn=dense_lookup,
                    states: list | None = None,
                    lookup_fns: dict | None = None) -> jnp.ndarray:
    """Recommend path (SURVEY.md §3.3): run the RNN over the user's full
    (truncated) history; with left-padding the state at the last position is
    the final state. `states` carries segment state for full-history eval
    (seq_final_state_full)."""
    h = seq_hidden(params, spec, item_dev, user_dev, batch, lookup_fn,
                   states=states, lookup_fns=lookup_fns)
    return h[:, -1, :]


def seq_final_state_full(params, spec: SeqSpec, item_dev, user_dev, batch,
                         lookup_fn=dense_lookup,
                         lookup_fns: dict | None = None) -> jnp.ndarray:
    """Final state over a history of ANY length (SURVEY.md §5 temporal
    pipelining): batch["inputs"]/["mask"] are [B, n·L]; the scan runs in
    n segments of the jitted L-length graph, carrying (h, c). With
    left-padding this is EXACTLY the state of the unsegmented scan."""
    L = spec.max_seq_len
    total = batch["inputs"].shape[1]
    assert total % L == 0, (total, L)
    n = total // L
    if n == 1:
        return seq_final_state(params, spec, item_dev, user_dev, batch,
                               lookup_fn, lookup_fns=lookup_fns)
    states = init_states(spec, batch["inputs"].shape[0])
    for s in range(n):
        seg = dict(batch)
        seg["inputs"] = batch["inputs"][:, s * L:(s + 1) * L]
        seg["mask"] = batch["mask"][:, s * L:(s + 1) * L]
        h, states = seq_hidden(params, spec, item_dev, user_dev, seg,
                               lookup_fn, states=states, return_states=True,
                               lookup_fns=lookup_fns)
    return h[:, -1, :]


def seq_item_latents(params, spec: SeqSpec, item_dev=None,
                     lookup_fn=dense_lookup, out_lookup=None):
    """Output-side item matrix + bias for full-softmax eval / retrieval.
    `lookup_fn` serves the tie_output (fused-encoder) path; `out_lookup`
    (when set) re-orders a shuffle-sharded item_out table back to natural
    id order — None keeps the direct slice (natural layout)."""
    v, d = spec.vocab, spec.dim
    if spec.tie_output:
        from arec.tables.engine import encode_all_items_with_bias
        return encode_all_items_with_bias(params["item_in"], spec.item_in,
                                          item_dev, lookup_fn=lookup_fn)
    t = params["item_out"]
    if out_lookup is not None:
        rows = out_lookup(t, jnp.arange(v, dtype=jnp.int32))
        return rows[:, :d], rows[:, d]
    return t[:v, :d], t[:v, d]
