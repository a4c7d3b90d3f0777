"""Pallas fused-gate LSTM scan — the sequence family's hot kernel.

The reference's hot loop is the unrolled TF1 recurrence (SURVEY.md §3.2);
BASELINE.json:5 mandates a "Pallas LSTM scan" as its TPU-native rebuild.

Design (see arec/models/seq.py for the shared layout):
  * The input projection x·Wx for all timesteps is computed OUTSIDE as one
    large MXU matmul. The kernel receives xw = x·Wx + b, so the sequential
    part is only the small recurrent matmul h·Wh per step.
  * Grid over batch tiles; time-major layout [L, B, ·] so each step is a
    leading-dim slice. h and c live in VMEM scratch for the whole sequence —
    zero HBM traffic for the recurrent state.
  * Gates are fused in one [BT, H] × [H, 4H] matmul + VPU elementwise block.
  * Masked state updates (left-padded sequences): pad steps are exact no-ops.
  * Hand-written backward kernel (custom VJP, pallas_guide.md "Patterns:
    Custom VJP"): reverse-time scan that recomputes gate pre-activations
    from (xw, h_all) residuals — no [B, L, 4H] activation stash — and
    accumulates dWh in VMEM scratch, emitting one partial per batch tile.

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


def _pick_batch_tile(b: int, L: int, h: int, vmem_budget: int = 10 << 20) -> int:
    """Largest power-of-two tile (≥8) whose VMEM working set fits."""
    bt = 256
    while bt > 8:
        # xw [L,BT,4H] + h_all/c_all [L,BT,H]·2 + dh [L,BT,H] + scratch
        working = 4 * (L * bt * 4 * h + 3 * L * bt * h + 4 * bt * h)
        if working <= vmem_budget and bt <= max(b, 8):
            break
        bt //= 2
    return bt


def _pad_batch(x, bt):
    b = x.shape[1]
    pad = (-b) % bt
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
    return x, b


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(xw_ref, wh_ref, mask_ref, h_out_ref, c_out_ref,
                h_scr, c_scr, *, L, H, dtype):
    h_scr[:] = jnp.zeros_like(h_scr)
    c_scr[:] = jnp.zeros_like(c_scr)
    wh = wh_ref[:].astype(dtype)

    def step(t, _):
        xw_t = xw_ref[pl.ds(t, 1)][0]                       # [BT, 4H]
        gates = xw_t + jax.lax.dot_general(
            h_scr[:].astype(dtype), wh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        c_new = f * c_scr[:] + i * g
        h_new = o * jnp.tanh(c_new)
        m = mask_ref[pl.ds(t, 1)].reshape(-1, 1)            # [BT, 1]
        h_scr[:] = m * h_new + (1.0 - m) * h_scr[:]
        c_scr[:] = m * c_new + (1.0 - m) * c_scr[:]
        h_out_ref[pl.ds(t, 1)] = h_scr[:][None]
        c_out_ref[pl.ds(t, 1)] = c_scr[:][None]
        return 0

    jax.lax.fori_loop(0, L, step, 0)


def _forward(xw_tm, wh, mask_tm, *, dtype):
    """xw_tm [L, B, 4H], wh [H, 4H], mask_tm [L, B] → (h_all, c_all) [L, B, H]."""
    L, B, H4 = xw_tm.shape
    H = H4 // 4
    BT = _pick_batch_tile(B, L, H)
    xw_tm, b0 = _pad_batch(xw_tm, BT)
    mask_tm, _ = _pad_batch(mask_tm, BT)
    Bp = xw_tm.shape[1]
    grid = (Bp // BT,)
    kernel = functools.partial(_fwd_kernel, L=L, H=H, dtype=dtype)
    h_all, c_all = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, BT, 4 * H), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, BT), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((L, BT, H), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, BT, H), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((L, Bp, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BT, H), jnp.float32),
            pltpu.VMEM((BT, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * L * Bp * H * 4 * H + 10 * L * Bp * H,
            bytes_accessed=4 * (L * Bp * 4 * H + 2 * L * Bp * H),
            transcendentals=4 * L * Bp * H,
        ),
        interpret=_interpret(),
    )(xw_tm, wh, mask_tm)
    return h_all[:, :b0], c_all[:, :b0]


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_kernel(xw_ref, wh_ref, mask_ref, h_ref, c_ref, dh_out_ref,
                dxw_ref, dwh_ref,
                dh_scr, dc_scr, dwh_scr, *, L, H, dtype):
    dh_scr[:] = jnp.zeros_like(dh_scr)
    dc_scr[:] = jnp.zeros_like(dc_scr)
    dwh_scr[:] = jnp.zeros_like(dwh_scr)
    wh = wh_ref[:].astype(dtype)

    def step(k, _):
        t = L - 1 - k
        tm1 = jnp.maximum(t - 1, 0)
        prev_ok = (t > 0).astype(jnp.float32)
        h_prev = h_ref[pl.ds(tm1, 1)][0] * prev_ok           # [BT, H]
        c_prev = c_ref[pl.ds(tm1, 1)][0] * prev_ok

        # recompute gate pre-activations (cheaper than stashing [L,BT,4H])
        gates = xw_ref[pl.ds(t, 1)][0] + jax.lax.dot_general(
            h_prev.astype(dtype), wh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        si = jax.nn.sigmoid(gates[:, :H])
        sf = jax.nn.sigmoid(gates[:, H:2 * H])
        tg = jnp.tanh(gates[:, 2 * H:3 * H])
        so = jax.nn.sigmoid(gates[:, 3 * H:])
        c_new = sf * c_prev + si * tg
        tc = jnp.tanh(c_new)

        m = mask_ref[pl.ds(t, 1)].reshape(-1, 1)
        dh_total = dh_out_ref[pl.ds(t, 1)][0] + dh_scr[:]
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
        dxw_ref[pl.ds(t, 1)] = dgates[None]

        # dWh += h_prevᵀ · dgates   ([H, BT] × [BT, 4H])
        dwh_scr[:] += jax.lax.dot_general(
            h_prev.astype(dtype), dgates.astype(dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        # carries to step t−1
        dh_scr[:] = jax.lax.dot_general(
            dgates.astype(dtype), wh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + dh_skip
        dc_scr[:] = dc_new * sf + dc_skip
        return 0

    jax.lax.fori_loop(0, L, step, 0)
    dwh_ref[:] = dwh_scr[:][None]


def _backward(xw_tm, wh, mask_tm, h_all, c_all, dh_out, *, dtype):
    L, B, H4 = xw_tm.shape
    H = H4 // 4
    BT = _pick_batch_tile(B, L, H)
    xw_tm, b0 = _pad_batch(xw_tm, BT)
    mask_tm, _ = _pad_batch(mask_tm, BT)
    h_all, _ = _pad_batch(h_all, BT)
    c_all, _ = _pad_batch(c_all, BT)
    dh_out, _ = _pad_batch(dh_out, BT)
    Bp = xw_tm.shape[1]
    grid = (Bp // BT,)
    kernel = functools.partial(_bwd_kernel, L=L, H=H, dtype=dtype)
    dxw, dwh_parts = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, BT, 4 * H), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, BT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, BT, H), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, BT, H), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, BT, H), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((L, BT, 4 * H), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, 4 * H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, Bp, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((Bp // BT, H, 4 * H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BT, H), jnp.float32),
            pltpu.VMEM((BT, H), jnp.float32),
            pltpu.VMEM((H, 4 * H), jnp.float32),
        ],
        interpret=_interpret(),
    )(xw_tm, wh, mask_tm, h_all, c_all, dh_out)
    return dxw[:, :b0], dwh_parts.sum(axis=0)


# ---------------------------------------------------------------------------
# custom-VJP primitive: one recurrent layer
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def lstm_layer_pallas(xw_tm, wh, mask_tm, dtype=jnp.bfloat16):
    h_all, _ = _forward(xw_tm, wh, mask_tm, dtype=dtype)
    return h_all


def _vjp_fwd(xw_tm, wh, mask_tm, dtype):
    h_all, c_all = _forward(xw_tm, wh, mask_tm, dtype=dtype)
    return h_all, (xw_tm, wh, mask_tm, h_all, c_all)


def _vjp_bwd(dtype, res, dh_out):
    xw_tm, wh, mask_tm, h_all, c_all = res
    dxw, dwh = _backward(xw_tm, wh, mask_tm, h_all, c_all, dh_out,
                         dtype=dtype)
    return dxw, dwh, None


lstm_layer_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def pallas_lstm_scan(layers: list[dict], x: jnp.ndarray, mask: jnp.ndarray,
                     dtype=jnp.bfloat16) -> jnp.ndarray:
    """Drop-in replacement for arec.models.seq.rnn_scan (cell='lstm'):
    x [B, L, D], mask [B, L] → top-layer hidden states [B, L, H]."""
    from arec.models.seq import input_projection  # shared xw layout

    h = x
    mask_tm = mask.transpose(1, 0)
    for p in layers:
        d_in = h.shape[-1]
        xw = input_projection(p, h, dtype)              # [B, L, 4H]
        h_all = lstm_layer_pallas(
            xw.transpose(1, 0, 2), p["w"][d_in:], mask_tm, dtype)
        h = h_all.transpose(1, 0, 2)
    return h
