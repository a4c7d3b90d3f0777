"""Pallas fused-gate LSTM scan — the sequence family's hot kernel.

The reference's hot loop is the unrolled TF1 recurrence (SURVEY.md §3.2);
BASELINE.json:5 mandates a "Pallas LSTM scan" as its TPU-native rebuild.

Design (see arec/models/seq.py for the shared layout):
  * The input projection x·Wx for all timesteps is computed OUTSIDE as one
    large MXU matmul. The kernel receives xw = x·Wx + b, so the sequential
    part is only the small recurrent matmul h·Wh per step.
  * 2-D grid (batch tiles × TIME BLOCKS). TPU grids run sequentially on the
    core with the last axis fastest, and scratch persists across grid steps:
    h/c live in VMEM scratch for the whole sequence while Mosaic's automatic
    block pipelining streams [LT, BT, ·] time blocks HBM→VMEM. The batch
    tile stays MXU-sized (128) for any sequence length — VMEM holds one time
    block, not the whole sequence.
  * Gates fused in one [BT, H] × [H, 4H] matmul + VPU elementwise block.
  * Masked state updates (left-padded sequences): pad steps are exact
    no-ops, which also makes time-padding to a block multiple free. The
    mask is pre-broadcast to [L, B, H]: a [B, L] layout would need per-step
    column loads (vector<BTx1>) that Mosaic cannot lower.
  * Hand-written backward kernel (custom VJP, pallas_guide.md "Patterns:
    Custom VJP"): time blocks visited in REVERSE via the index_map;
    gate pre-activations are recomputed from (xw, h_prev) residuals — no
    [B, L, 4H] activation stash — h_prev/c_prev arrive as shift-by-one
    views so block boundaries need no cross-block reads; dWh accumulates
    in a revisited per-batch-tile output block.

The lax.scan implementation in arec/models/seq.py is the permanent
differential-testing reference (SURVEY.md §7 "Pallas LSTM scan").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """Pallas TPU kernels run in interpreter mode on non-TPU backends so the
    differential tests (SURVEY.md §4) exercise the same code path in CI."""
    return jax.default_backend() != "tpu"


def _pick_tiles(b: int, L: int, h: int, vmem_budget: int = 10 << 20):
    """(BT, LT): batch tile targets MXU rows; time block sized so the
    double-buffered working set fits scoped VMEM. Streams per time block
    (worst case = backward): xw + dxw (4H each) + h_prev/c_prev/dh_out/mask
    (H each) = 12H lanes, ×2 buffers, f32."""
    bt = min(128, max(8, 1 << (b - 1).bit_length()))
    lt = L
    while lt > 1 and 8 * lt * bt * 12 * h > vmem_budget:
        lt = (lt + 1) // 2
    return bt, lt


def _pad_axis(x, mult, axis):
    pad = (-x.shape[axis]) % mult
    if pad:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        x = jnp.pad(x, widths)
    return x


def padded_seq_len(L: int, b: int, h: int) -> int:
    """Smallest Lp ≥ L that the kernel tiles with no internal time padding.

    Callers that right-pad their batches to this length (pad steps carry
    mask 0 → exact no-ops under masked state updates) avoid the per-call
    [L, B, ·]-sized pad/slice copies around the kernel — measured ~275 µs
    per step at the flagship LSTM shape (L=30 → 32)."""
    lp = L
    for _ in range(8):
        _, lt = _pick_tiles(b, lp, h)
        if lp % lt == 0:
            return lp
        lp = -(-lp // lt) * lt
    return lp


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(xw_ref, wh_ref, mask_ref, h0_ref, c0_ref,
                h_out_ref, c_out_ref, hp_out_ref, cp_out_ref,
                h_scr, c_scr, *, LT, H, dtype):
    @pl.when(pl.program_id(1) == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    wh = wh_ref[:].astype(dtype)

    def step(tt, _):
        # shift-by-one residuals for the backward sweep: the scratch still
        # holds the PRE-update state here, i.e. h_{t-1}/c_{t-1}. Emitting
        # them from the kernel replaces the external
        # concat([h0, h_all[:-1]]) construction, which cost two
        # [L, B, H]-sized slice+pad copies per layer per step (measured
        # ~95 us each at the flagship LSTM shape).
        hp_out_ref[pl.ds(tt, 1)] = h_scr[:][None]
        cp_out_ref[pl.ds(tt, 1)] = c_scr[:][None]
        gates = xw_ref[pl.ds(tt, 1)][0] + jax.lax.dot_general(
            h_scr[:].astype(dtype), wh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        c_new = f * c_scr[:] + i * g
        h_new = o * jnp.tanh(c_new)
        m = mask_ref[pl.ds(tt, 1)][0]                       # [BT, H]
        h_scr[:] = m * h_new + (1.0 - m) * h_scr[:]
        c_scr[:] = m * c_new + (1.0 - m) * c_scr[:]
        h_out_ref[pl.ds(tt, 1)] = h_scr[:][None]
        c_out_ref[pl.ds(tt, 1)] = c_scr[:][None]
        return 0

    jax.lax.fori_loop(0, LT, step, 0)


def _forward(xw_tm, wh, mask_bm, h0, c0, *, dtype):
    """xw_tm [L, B, 4H], wh [H, 4H], mask_bm [B, L], h0/c0 [B, H]
    → (h_all, c_all) [L, B, H]."""
    L, B, H4 = xw_tm.shape
    H = H4 // 4
    BT, LT = _pick_tiles(B, L, H)
    xw_tm = _pad_axis(_pad_axis(xw_tm, BT, 1), LT, 0)
    Lp, Bp = xw_tm.shape[:2]
    mask_bm = _pad_axis(_pad_axis(mask_bm, BT, 0), LT, 1)
    mask_e = jnp.broadcast_to(mask_bm.T[:, :, None], (Lp, Bp, H))
    h0 = _pad_axis(h0, BT, 0)
    c0 = _pad_axis(c0, BT, 0)
    grid = (Bp // BT, Lp // LT)
    kernel = functools.partial(_fwd_kernel, LT=LT, H=H, dtype=dtype)
    tblock = lambda w: pl.BlockSpec((LT, BT, w), lambda i, j: (j, i, 0),
                                    memory_space=pltpu.VMEM)
    bblock = pl.BlockSpec((BT, H), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    h_all, c_all, hp_all, cp_all = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tblock(4 * H),
            pl.BlockSpec((H, 4 * H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            tblock(H),
            bblock, bblock,
        ],
        out_specs=[tblock(H), tblock(H), tblock(H), tblock(H)],
        out_shape=[
            jax.ShapeDtypeStruct((Lp, Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Lp, Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Lp, Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Lp, Bp, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BT, H), jnp.float32),
            pltpu.VMEM((BT, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Lp * Bp * H * 4 * H + 10 * Lp * Bp * H,
            bytes_accessed=4 * (Lp * Bp * 4 * H + 3 * Lp * Bp * H),
            transcendentals=4 * Lp * Bp * H,
        ),
        interpret=_interpret(),
    )(xw_tm, wh, mask_e, h0, c0)
    return (h_all[:L, :B], c_all[:L, :B],
            hp_all[:L, :B], cp_all[:L, :B])


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_kernel(xw_ref, wh_ref, mask_ref, hp_ref, cp_ref, dh_out_ref,
                dcT_ref,
                dxw_ref, dwh_ref, dh0_ref, dc0_ref,
                dh_scr, dc_scr, *, LT, H, dtype):
    @pl.when(pl.program_id(1) == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = dcT_ref[:]      # cotangent of the carried-out cell state
        dwh_ref[:] = jnp.zeros_like(dwh_ref)

    wh = wh_ref[:].astype(dtype)

    def step(k, _):
        tt = LT - 1 - k
        h_prev = hp_ref[pl.ds(tt, 1)][0]                    # [BT, H]
        c_prev = cp_ref[pl.ds(tt, 1)][0]

        # recompute gate pre-activations (cheaper than stashing [L,B,4H])
        gates = xw_ref[pl.ds(tt, 1)][0] + jax.lax.dot_general(
            h_prev.astype(dtype), wh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        si = jax.nn.sigmoid(gates[:, :H])
        sf = jax.nn.sigmoid(gates[:, H:2 * H])
        tg = jnp.tanh(gates[:, 2 * H:3 * H])
        so = jax.nn.sigmoid(gates[:, 3 * H:])
        c_new = sf * c_prev + si * tg
        tc = jnp.tanh(c_new)

        m = mask_ref[pl.ds(tt, 1)][0]                       # [BT, H]
        dh_total = dh_out_ref[pl.ds(tt, 1)][0] + dh_scr[:]
        dh_new = m * dh_total
        dh_skip = (1.0 - m) * dh_total
        dc_total = dc_scr[:]
        dc_new = m * dc_total
        dc_skip = (1.0 - m) * dc_total

        do_pre = dh_new * tc * so * (1.0 - so)
        dc_new = dc_new + dh_new * so * (1.0 - tc * tc)
        df_pre = dc_new * c_prev * sf * (1.0 - sf)
        di_pre = dc_new * tg * si * (1.0 - si)
        dg_pre = dc_new * si * (1.0 - tg * tg)

        dgates = jnp.concatenate([di_pre, df_pre, dg_pre, do_pre], axis=1)
        dxw_ref[pl.ds(tt, 1)] = dgates[None]

        # dWh += h_prevᵀ · dgates  (accumulates in the revisited out block)
        dwh_ref[:] += jax.lax.dot_general(
            h_prev.astype(dtype), dgates.astype(dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[None]

        # carries to step t−1
        dh_scr[:] = jax.lax.dot_general(
            dgates.astype(dtype), wh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + dh_skip
        dc_scr[:] = dc_new * sf + dc_skip
        return 0

    jax.lax.fori_loop(0, LT, step, 0)
    # after the LAST grid step (time block 0) these hold d h0 / d c0; the
    # out blocks are revisited per time block, so the final write wins.
    dh0_ref[:] = dh_scr[:]
    dc0_ref[:] = dc_scr[:]


def _backward(xw_tm, wh, mask_bm, h_prev, c_prev, dh_out, dcT,
              *, dtype):
    L, B, H4 = xw_tm.shape
    H = H4 // 4
    BT, LT = _pick_tiles(B, L, H)
    pad2 = lambda x: _pad_axis(_pad_axis(x, BT, 1), LT, 0)
    xw_tm = pad2(xw_tm)
    Lp, Bp = xw_tm.shape[:2]
    mask_bm = _pad_axis(_pad_axis(mask_bm, BT, 0), LT, 1)
    mask_e = jnp.broadcast_to(mask_bm.T[:, :, None], (Lp, Bp, H))
    # shift-by-one residuals h_prev[t] = h_{t-1} come straight from the
    # forward kernel (see _fwd_kernel), so no external concat/slice/pad —
    # block boundaries need no cross-block reads in the reversed sweep.
    h_prev = pad2(h_prev)
    c_prev = pad2(c_prev)
    dh_out = pad2(dh_out)
    dcT = _pad_axis(dcT, BT, 0)

    grid = (Bp // BT, Lp // LT)
    nt = Lp // LT
    kernel = functools.partial(_bwd_kernel, LT=LT, H=H, dtype=dtype)
    # reversed time-block visitation
    rblock = lambda w: pl.BlockSpec(
        (LT, BT, w), lambda i, j: (nt - 1 - j, i, 0),
        memory_space=pltpu.VMEM)
    bblock = pl.BlockSpec((BT, H), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    dxw, dwh_parts, dh0, dc0 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            rblock(4 * H),
            pl.BlockSpec((H, 4 * H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            rblock(H), rblock(H), rblock(H), rblock(H),
            bblock,
        ],
        out_specs=[
            rblock(4 * H),
            pl.BlockSpec((1, H, 4 * H), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            bblock, bblock,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Lp, Bp, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((Bp // BT, H, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BT, H), jnp.float32),
            pltpu.VMEM((BT, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * Lp * Bp * H * 4 * H + 30 * Lp * Bp * H,
            bytes_accessed=4 * Lp * Bp * (8 * H + 4 * H),
            transcendentals=4 * Lp * Bp * H,
        ),
        interpret=_interpret(),
    )(xw_tm, wh, mask_e, h_prev, c_prev, dh_out, dcT)
    return dxw[:L, :B], dwh_parts.sum(axis=0), dh0[:B], dc0[:B]


# ---------------------------------------------------------------------------
# custom-VJP primitive: one recurrent layer
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def lstm_layer_pallas(xw_tm, wh, mask_bm, h0, c0, dtype=jnp.bfloat16):
    """One recurrent layer. Returns (h_all [L, B, H], cT [B, H]); the final
    hidden state is h_all[-1]. (h0, c0) are carried-in states — gradients
    flow through them AND through cT, so a segmented scan over time chunks
    has exactly the gradient of the unsegmented scan (SURVEY.md §5
    "Long-context": temporal pipelining)."""
    h_all, c_all, _, _ = _forward(xw_tm, wh, mask_bm, h0, c0, dtype=dtype)
    return h_all, c_all[-1]


def _vjp_fwd(xw_tm, wh, mask_bm, h0, c0, dtype):
    h_all, c_all, hp_all, cp_all = _forward(xw_tm, wh, mask_bm, h0, c0,
                                            dtype=dtype)
    return (h_all, c_all[-1]), (xw_tm, wh, mask_bm, hp_all, cp_all)


def _vjp_bwd(dtype, res, cts):
    xw_tm, wh, mask_bm, hp_all, cp_all = res
    dh_out, dcT = cts
    dxw, dwh, dh0, dc0 = _backward(xw_tm, wh, mask_bm, hp_all, cp_all,
                                   dh_out, dcT, dtype=dtype)
    return dxw, dwh, None, dh0, dc0


lstm_layer_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def pallas_lstm_scan(layers: list[dict], x: jnp.ndarray, mask: jnp.ndarray,
                     dtype=jnp.bfloat16, states: list | None = None,
                     return_states: bool = False, time_major: bool = False,
                     dropout_rng=None, keep_prob: float = 1.0):
    """Drop-in replacement for arec.models.seq.rnn_scan (cell='lstm'):
    x [B, L, D], mask [B, L] → top-layer hidden states [B, L, H]; with
    time_major=True, x [L, B, D], mask [L, B] → [L, B, H] — the kernel is
    natively time-major, so this path has NO [B, L, D]-sized transposes.
    `states`: optional per-layer (h0, c0) carries; `return_states=True`
    additionally returns the per-layer final (hT, cT).
    `dropout_rng`/`keep_prob`: per-layer output dropout applied OUTSIDE the
    kernel (arec.models.seq.output_dropout), carries stay undropped."""
    from arec.models.seq import input_projection, output_dropout

    b = x.shape[1] if time_major else x.shape[0]
    # the kernel's mask input stays [B, L] (it broadcasts internally) — a
    # [B·L] float transpose is ~1000× smaller than the embedding transposes
    # this path eliminates
    if time_major:
        mask = mask.T
    h = x
    new_states = []
    for li, p in enumerate(layers):
        d_in = h.shape[-1]
        d = p["w"].shape[0] - d_in
        xw = input_projection(p, h, dtype)              # [..., 4H]
        if states is not None:
            h0, c0 = states[li]
        else:
            h0 = jnp.zeros((b, d), jnp.float32)
            c0 = h0
        h_all, cT = lstm_layer_pallas(
            xw if time_major else xw.transpose(1, 0, 2),
            p["w"][d_in:], mask, h0, c0, dtype)
        new_states.append((h_all[-1], cT))   # carry pre-dropout
        h = h_all if time_major else h_all.transpose(1, 0, 2)
        if dropout_rng is not None:
            h = output_dropout(h, jax.random.fold_in(dropout_rng, li),
                               keep_prob)
    if return_states:
        return h, new_states
    return h
