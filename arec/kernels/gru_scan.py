"""Pallas fused-gate GRU scan — companion of arec/kernels/lstm_scan.py.

The reference offers GRU cells alongside LSTM (SURVEY.md §2.1 "stacked
GRU/LSTM cells"; BASELINE.json:5 "the LSTM/GRU sequence encoder"). The
lax.scan GRU in arec/models/seq.py (gru_step) is the permanent correctness
reference; this kernel gives it the same treatment the LSTM got:

  * input projection xw = x·[Wx_r|Wx_u|Wx_n] + b precomputed outside as one
    large MXU matmul (shared layout, arec/models/seq.py);
  * 2-D grid (batch tiles × time blocks), h carried in VMEM scratch across
    the whole sequence while time blocks stream HBM→VMEM;
  * per step TWO small recurrent matmuls (h·W_ru for the r/u gates, then
    (r·h)·W_n for the candidate — the GRU data dependence r→n forbids
    fusing them into one);
  * masked state updates (left padding): pad steps are exact no-ops;
  * hand-written backward (custom VJP): time blocks visited in reverse,
    gates recomputed from (xw, h_prev) — no [B, L, 3H] stash; h_prev
    arrives as a shift-by-one view so block boundaries need no
    cross-block reads; dWh accumulated per batch tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arec.kernels.lstm_scan import _interpret, _pad_axis, _pick_tiles


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(xw_ref, wh_ref, mask_ref, h0_ref, h_out_ref, hp_out_ref,
                h_scr, *, LT, H, dtype):
    @pl.when(pl.program_id(1) == 0)
    def _():
        h_scr[:] = h0_ref[:]

    wh = wh_ref[:].astype(dtype)

    def step(tt, _):
        h = h_scr[:]
        # pre-update state = h_{t-1}: shift-by-one residual for the
        # backward sweep (replaces the external concat([h0, h_all[:-1]])
        # slice+pad copies; see lstm_scan._fwd_kernel)
        hp_out_ref[pl.ds(tt, 1)] = h[None]
        xw_t = xw_ref[pl.ds(tt, 1)][0]                      # [BT, 3H]
        hw = jax.lax.dot_general(
            h.astype(dtype), wh[:, : 2 * H],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        r = jax.nn.sigmoid(xw_t[:, :H] + hw[:, :H])
        u = jax.nn.sigmoid(xw_t[:, H:2 * H] + hw[:, H:])
        n = jnp.tanh(xw_t[:, 2 * H:] + jax.lax.dot_general(
            (r * h).astype(dtype), wh[:, 2 * H:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        h_new = (1.0 - u) * n + u * h
        m = mask_ref[pl.ds(tt, 1)][0]                       # [BT, H]
        h_scr[:] = m * h_new + (1.0 - m) * h
        h_out_ref[pl.ds(tt, 1)] = h_scr[:][None]
        return 0

    jax.lax.fori_loop(0, LT, step, 0)


def _forward(xw_tm, wh, mask_bm, h0, *, dtype):
    """xw_tm [L, B, 3H], wh [H, 3H], mask_bm [B, L], h0 [B, H]
    → h_all [L, B, H]."""
    L, B, H3 = xw_tm.shape
    H = H3 // 3
    BT, LT = _pick_tiles(B, L, H)
    xw_tm = _pad_axis(_pad_axis(xw_tm, BT, 1), LT, 0)
    Lp, Bp = xw_tm.shape[:2]
    mask_bm = _pad_axis(_pad_axis(mask_bm, BT, 0), LT, 1)
    mask_e = jnp.broadcast_to(mask_bm.T[:, :, None], (Lp, Bp, H))
    h0 = _pad_axis(h0, BT, 0)
    grid = (Bp // BT, Lp // LT)
    kernel = functools.partial(_fwd_kernel, LT=LT, H=H, dtype=dtype)
    tblock = lambda w: pl.BlockSpec((LT, BT, w), lambda i, j: (j, i, 0),
                                    memory_space=pltpu.VMEM)
    bblock = pl.BlockSpec((BT, H), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    h_all, hp_all = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tblock(3 * H),
            pl.BlockSpec((H, 3 * H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            tblock(H),
            bblock,
        ],
        out_specs=[tblock(H), tblock(H)],
        out_shape=[jax.ShapeDtypeStruct((Lp, Bp, H), jnp.float32),
                   jax.ShapeDtypeStruct((Lp, Bp, H), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((BT, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Lp * Bp * H * 3 * H + 12 * Lp * Bp * H,
            bytes_accessed=4 * (Lp * Bp * 3 * H + 2 * Lp * Bp * H),
            transcendentals=3 * Lp * Bp * H,
        ),
        interpret=_interpret(),
    )(xw_tm, wh, mask_e, h0)
    return h_all[:L, :B], hp_all[:L, :B]


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_kernel(xw_ref, wh_ref, mask_ref, hp_ref, dh_out_ref,
                dxw_ref, dwh_ref, dh0_ref, dh_scr, *, LT, H, dtype):
    @pl.when(pl.program_id(1) == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)

    wh = wh_ref[:].astype(dtype)

    def step(k, _):
        tt = LT - 1 - k
        h_prev = hp_ref[pl.ds(tt, 1)][0]                    # [BT, H]
        xw_t = xw_ref[pl.ds(tt, 1)][0]

        # recompute gates (cheaper than stashing [L, B, 3H])
        hw = jax.lax.dot_general(
            h_prev.astype(dtype), wh[:, : 2 * H],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        r = jax.nn.sigmoid(xw_t[:, :H] + hw[:, :H])
        u = jax.nn.sigmoid(xw_t[:, H:2 * H] + hw[:, H:])
        rh = r * h_prev
        n = jnp.tanh(xw_t[:, 2 * H:] + jax.lax.dot_general(
            rh.astype(dtype), wh[:, 2 * H:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))

        m = mask_ref[pl.ds(tt, 1)][0]
        dh_total = dh_out_ref[pl.ds(tt, 1)][0] + dh_scr[:]
        dh_new = m * dh_total
        dh_skip = (1.0 - m) * dh_total

        # h_new = (1-u)·n + u·h_prev
        dn = dh_new * (1.0 - u)
        du = dh_new * (h_prev - n)
        dh_prev = dh_new * u

        da_n = dn * (1.0 - n * n)
        drh = jax.lax.dot_general(
            da_n.astype(dtype), wh[:, 2 * H:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dr = drh * h_prev
        dh_prev = dh_prev + drh * r

        da_r = dr * r * (1.0 - r)
        da_u = du * u * (1.0 - u)
        da_ru = jnp.concatenate([da_r, da_u], axis=1)       # [BT, 2H]
        dh_prev = dh_prev + jax.lax.dot_general(
            da_ru.astype(dtype), wh[:, : 2 * H],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        dgates = jnp.concatenate([da_r, da_u, da_n], axis=1)
        dxw_ref[pl.ds(tt, 1)] = dgates[None]

        # dWh: [:, :2H] += h_prevᵀ·[da_r|da_u]; [:, 2H:] += (r·h_prev)ᵀ·da_n
        dwh_ref[:] += jnp.concatenate([
            jax.lax.dot_general(
                h_prev.astype(dtype), da_ru.astype(dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32),
            jax.lax.dot_general(
                rh.astype(dtype), da_n.astype(dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32),
        ], axis=1)[None]

        dh_scr[:] = dh_prev + dh_skip
        return 0

    jax.lax.fori_loop(0, LT, step, 0)
    # after the LAST grid step (time block 0) this holds d h0; the out
    # block is revisited per time block, so the final write wins.
    dh0_ref[:] = dh_scr[:]


def _backward(xw_tm, wh, mask_bm, h_prev, dh_out, *, dtype):
    L, B, H3 = xw_tm.shape
    H = H3 // 3
    BT, LT = _pick_tiles(B, L, H)
    pad2 = lambda x: _pad_axis(_pad_axis(x, BT, 1), LT, 0)
    xw_tm = pad2(xw_tm)
    Lp, Bp = xw_tm.shape[:2]
    mask_bm = _pad_axis(_pad_axis(mask_bm, BT, 0), LT, 1)
    mask_e = jnp.broadcast_to(mask_bm.T[:, :, None], (Lp, Bp, H))
    # shift-by-one residuals come straight from the forward kernel
    h_prev = pad2(h_prev)
    dh_out = pad2(dh_out)

    grid = (Bp // BT, Lp // LT)
    nt = Lp // LT
    kernel = functools.partial(_bwd_kernel, LT=LT, H=H, dtype=dtype)
    rblock = lambda w: pl.BlockSpec(
        (LT, BT, w), lambda i, j: (nt - 1 - j, i, 0),
        memory_space=pltpu.VMEM)
    bblock = pl.BlockSpec((BT, H), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    dxw, dwh_parts, dh0 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            rblock(3 * H),
            pl.BlockSpec((H, 3 * H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            rblock(H), rblock(H), rblock(H),
        ],
        out_specs=[
            rblock(3 * H),
            pl.BlockSpec((1, H, 3 * H), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            bblock,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Lp, Bp, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((Bp // BT, H, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((BT, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=8 * Lp * Bp * H * 3 * H + 30 * Lp * Bp * H,
            bytes_accessed=4 * Lp * Bp * (6 * H + 3 * H),
            transcendentals=3 * Lp * Bp * H,
        ),
        interpret=_interpret(),
    )(xw_tm, wh, mask_e, h_prev, dh_out)
    return dxw[:L, :B], dwh_parts.sum(axis=0), dh0[:B]


# ---------------------------------------------------------------------------
# custom-VJP primitive: one recurrent layer
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gru_layer_pallas(xw_tm, wh, mask_bm, h0, dtype=jnp.bfloat16):
    """One recurrent layer → h_all [L, B, H]; the final state is h_all[-1].
    h0 [B, H] is the carried-in state; gradients flow through it, so a
    segmented scan matches the unsegmented one exactly (SURVEY.md §5)."""
    return _forward(xw_tm, wh, mask_bm, h0, dtype=dtype)[0]


def _vjp_fwd(xw_tm, wh, mask_bm, h0, dtype):
    h_all, hp_all = _forward(xw_tm, wh, mask_bm, h0, dtype=dtype)
    return h_all, (xw_tm, wh, mask_bm, hp_all)


def _vjp_bwd(dtype, res, dh_out):
    xw_tm, wh, mask_bm, hp_all = res
    dxw, dwh, dh0 = _backward(xw_tm, wh, mask_bm, hp_all, dh_out,
                              dtype=dtype)
    return dxw, dwh, None, dh0


gru_layer_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def pallas_gru_scan(layers: list[dict], x: jnp.ndarray, mask: jnp.ndarray,
                    dtype=jnp.bfloat16, states: list | None = None,
                    return_states: bool = False, time_major: bool = False,
                    dropout_rng=None, keep_prob: float = 1.0):
    """Drop-in replacement for arec.models.seq.rnn_scan (cell='gru'):
    x [B, L, D], mask [B, L] → top-layer hidden states [B, L, H]; with
    time_major=True, x [L, B, D], mask [L, B] → [L, B, H] (no
    embedding-sized transposes — see pallas_lstm_scan).
    `states`: per-layer (h0, c0) carries — the c slot rides along unused so
    the state pytree matches the LSTM/lax.scan paths.
    `dropout_rng`/`keep_prob`: per-layer output dropout applied OUTSIDE the
    kernel (arec.models.seq.output_dropout), carries stay undropped."""
    from arec.models.seq import input_projection, output_dropout

    b = x.shape[1] if time_major else x.shape[0]
    if time_major:
        mask = mask.T          # kernel's mask input stays [B, L]
    h = x
    new_states = []
    for li, p in enumerate(layers):
        d_in = h.shape[-1]
        d = p["w"].shape[0] - d_in
        xw = input_projection(p, h, dtype)              # [..., 3H]
        if states is not None:
            h0, c0 = states[li]
        else:
            h0 = jnp.zeros((b, d), jnp.float32)
            c0 = h0
        h_all = gru_layer_pallas(
            xw if time_major else xw.transpose(1, 0, 2),
            p["w"][d_in:], mask, h0, dtype)
        new_states.append((h_all[-1], c0))   # carry pre-dropout
        h = h_all if time_major else h_all.transpose(1, 0, 2)
        if dropout_rng is not None:
            h = output_dropout(h, jax.random.fold_in(dropout_rng, li),
                               keep_prob)
    if return_states:
        return h, new_states
    return h
