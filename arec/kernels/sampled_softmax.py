"""Pallas fused sampled-softmax CE — the mandated fused scoring kernel.

BASELINE.json:5: "sampled-softmax negative sampling and dot-product scoring
run as fused on-device kernels". The pure-JAX implementation
(arec/losses/losses.py sampled_softmax_loss) materializes the [N, S] logit
matrix in HBM three times (forward write+read, backward recompute); this
kernel streams N-tiles through VMEM — the logits never leave the chip:

  forward (per N-tile): logits = q·v_sampᵀ (MXU) + (bias − log S·P)
    corrections, accidental-hit mask, fused row max/LSE → per-row CE.
  backward (custom VJP, per N-tile): recompute the tile's logits, form the
    softmax residue p = exp(logit − lse), and emit
      dq      = w·(p_true−1)·v_true + (w·p)·v_samp
      dv_true = w·(p_true−1) ⊗ q
      dv_samp += (w·p)ᵀ·q         (accumulated across the grid)
      db_samp += Σ_i w·p_i        db_true = w·(p_true−1)
    where w is the incoming per-row cotangent.

The pure-JAX path (arec/losses/losses.py, use_kernel=False) remains the
permanent differential-testing oracle (tests/test_fused_softmax.py) and the
fallback for small row counts / non-TPU backends.

The public entry is SUMS-level — fused_sampled_ce_sums returns
(Σ w·ce, Σ w) with the reduction inside the kernel; see the section comment
below for the measured layout rationale (an earlier per-row variant
streamed four [N,1] columns per direction; each such column costs 128× its
logical bytes under TPU T(8,128) tiling).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arec.kernels.lstm_scan import _interpret

NEG = -1e9


def _folded() -> bool:
    """VPU-pass folding (round-4 lever c): collapse the −logQ add, hit
    mask, and exp into one [NT, S] traversal via an upper-bound row max.
    MEASURED LOSER (xplane per-op, adjacent processes, N=65536 S=1024 aug):
    folded fwd 0.286/bwd 0.432 ms vs 0.268/0.392 unfolded — Mosaic already
    register-fuses the original add/where/exp chain, so "folding" only
    added per-element arithmetic (the 3-term exp argument and log(g)).
    Default OFF; AREC_CE_FOLD=1 re-enables the variant for re-measurement
    on future toolchains (CLAUDE.md losing-path convention)."""
    return os.environ.get("AREC_CE_FOLD", "0") == "1"


def _pad_rows(x, mult):
    pad = (-x.shape[0]) % mult
    if pad:
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, widths)
    return x


# ---------------------------------------------------------------------------
# Sums-level kernel: the reduction lives INSIDE the kernel
# ---------------------------------------------------------------------------
#
# The per-row `fused_sampled_ce` above streams four padded per-row columns
# per direction ([N,1] under T(8,128) tiling pads the lane dim 1 → 128, so
# each column costs 128× its logical bytes in HBM traffic — measured 12–50 µs
# per stream at N=32768) plus an externally materialized [N,1] cotangent.
# Training only ever consumes the (weighted) MEAN of the per-row CE, so this
# variant returns (Σ w·ce, Σ w) accumulated across the grid instead:
#   * per-row inputs ride ONE lane-packed [N,3] array (tl, tid-bits, w) —
#     sublane-oriented, so no in-kernel lane→sublane relayout (an explicit
#     A/B of lane-major [g,1,nt] packing made the forward 2.7× SLOWER:
#     Mosaic's relayout shuffles cost more than the padded DMA they save);
#   * per-row residuals ride ONE [N,2] array (ce, lse);
#   * the backward takes a SCALAR cotangent (no [N,1] broadcast at all) and
#     derives per-row weights from the packed w lane.
# The division num/max(den,1) happens OUTSIDE in jnp, so autodiff applies
# the quotient rule and weighted-mean gradients (incl. d/dweights) are exact.


def _pick_lane_bits(r, k):
    """Lane k of a packed float block, extracted in the INTEGER domain.

    A direct lane slice `r_ref[:, k]` with k > 0 trips Mosaic's
    "Not implemented: Offset change" on real TPU (interpret mode accepts
    it), so extract by masked lane-reduction. The reduction must run on
    the BIT PATTERNS: float adds flush subnormals (ids < 2^23 bitcast to
    subnormal f32, and TPU/XLA-CPU FTZ zeroes them — observed as corrupted
    ids), while integer adds are exact for any pattern.
    """
    ri = jax.lax.bitcast_convert_type(r, jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
    return jnp.sum(jnp.where(lane == k, ri, 0), axis=1, keepdims=True)


def _unpack_lanes(r):
    """(tl, tid, w) as [NT, 1] COLUMNS from a packed [NT, 3] block.

    Everything stays 2-D: Mosaic rejects relayouts of the 1-D
    (lane-replicated) intermediates a squeezing reduction produces
    ("Invalid relayout: Non-singleton logical dimension is replicated").
    """
    f = lambda k: jax.lax.bitcast_convert_type(_pick_lane_bits(r, k),
                                               jnp.float32)
    return f(0), _pick_lane_bits(r, 1), f(2)


def _sel(d_in, d_out, dtype):
    """[d_in, d_out] 0/1 selection matrix: identity on the top-left block.
    vt @ _sel drops trailing lanes; x @ _sel.T re-expands — the MXU is the
    only offset-free way to move a lane-slab on TPU (direct lane slices at
    non-zero offsets fail Mosaic lowering, see _pick_lane_bits)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (d_in, d_out), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (d_in, d_out), 1)
    return (ii == jj).astype(dtype)


def _true_side(q, vt_ref, rin_ref, *, aug, dtype):
    """(v_true [NT, D] f32, tl [NT, 1], tid [NT, 1] i32, w [NT, 1]).

    aug=False: vt_ref is [NT, D]; rin lane 0 = bias − log(S·P).
    aug=True:  vt_ref is the RAW gathered [NT, D+1] output-table rows
    (bias in lane D); rin lane 0 = −log(S·P) only."""
    tl0, tid, w = _unpack_lanes(rin_ref[:])
    vt = vt_ref[:]
    if aug:
        d = q.shape[1]
        v = jax.lax.dot_general(
            vt.astype(dtype), _sel(d + 1, d, dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        bias = jax.lax.bitcast_convert_type(
            _pick_lane_bits(vt, d), jnp.float32)
        tl0 = tl0 + bias
    else:
        v = vt.astype(jnp.float32)
    tl = tl0 + jnp.sum(q.astype(jnp.float32) * v, axis=1, keepdims=True)
    return v, tl, tid, w


def _sums_fwd_kernel(q_ref, vt_ref, vs_ref, cs_ref, rin_ref, sid_ref,
                     rout_ref, sums_ref, *, aug, dtype, folded):
    @pl.when(pl.program_id(0) == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)

    q = q_ref[:]
    raw = jax.lax.dot_general(
        q.astype(dtype), vs_ref[:].astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                      # [NT, S]
    _, tl, tid, w = _true_side(q, vt_ref, rin_ref, aug=aug, dtype=dtype)
    hit = tid == sid_ref[:]                            # [NT, S]
    if folded:
        # VPU-pass-folded variant (the kernel is VPU-bound on [NT, S]
        # traversals — BASELINE.md nt sweep): take the row max of the RAW
        # logits and bound the corrected max by m_raw + max(cs). Any
        # m >= max(contributing logits) yields the exact lse, so the
        # correction add, hit mask, and exp collapse into ONE fused
        # elementwise traversal instead of add/where/max-after-mask/exp.
        # The bound overshoots by at most range(cs) (~10 for log-uniform at
        # 1M vocab): exp values scale down by e^-10, far above f32
        # underflow, and lse = m + log(sum) is unchanged.
        m = jnp.maximum(jnp.max(raw, axis=1, keepdims=True) + jnp.max(cs_ref[:]),
                        tl)
        ssum = jnp.sum(jnp.where(hit, 0.0, jnp.exp(raw + cs_ref[:] - m)),
                       axis=1, keepdims=True)
        lse = m + jnp.log(jnp.exp(tl - m) + ssum)
    else:
        logits = jnp.where(hit, NEG, raw + cs_ref[:])
        m = jnp.maximum(jnp.max(logits, axis=1, keepdims=True), tl)
        lse = m + jnp.log(
            jnp.exp(tl - m)
            + jnp.sum(jnp.exp(logits - m), axis=1, keepdims=True))
    ce = lse - tl                                      # [NT, 1]
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (ce.shape[0], 2), 1)
    rout_ref[:] = jnp.where(lane2 == 0, ce, lse)
    lane12 = jax.lax.broadcasted_iota(jnp.int32, (1, 2), 1)
    sums_ref[:] += jnp.where(lane12 == 0,
                             jnp.sum(ce * w, axis=0, keepdims=True),
                             jnp.sum(w, axis=0, keepdims=True))


def _sums_bwd_kernel(q_ref, vt_ref, vs_ref, cs_ref, rin_ref, sid_ref,
                     rout_ref, scale_ref,
                     dq_ref, dvt_ref, dvs_ref, dbs_ref, dbt_ref=None, *, aug,
                     dtype, folded):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dvs_ref[:] = jnp.zeros_like(dvs_ref)
        dbs_ref[:] = jnp.zeros_like(dbs_ref)

    q = q_ref[:]
    vs = vs_ref[:]
    raw = jax.lax.dot_general(
        q.astype(dtype), vs.astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    v, tl, tid, w = _true_side(q, vt_ref, rin_ref, aug=aug, dtype=dtype)
    hit = tid == sid_ref[:]

    lse = jax.lax.bitcast_convert_type(
        _pick_lane_bits(rout_ref[:], 1), jnp.float32)  # [NT, 1]
    g = scale_ref[0, 0] * w                            # [NT, 1]
    pt = jnp.exp(tl - lse)                             # [NT, 1]
    wt = g * (pt - 1.0)                                # [NT, 1]
    if folded:
        # one fused [NT, S] traversal: cs add, hit mask, g scale (as +log g;
        # g >= 0, log(0) = -inf exponentiates to exactly 0), and exp — vs
        # add/where/exp/mult as four traversals (see _sums_fwd_kernel)
        wp = jnp.where(hit, 0.0, jnp.exp(raw + cs_ref[:] - lse + jnp.log(g)))
    else:
        logits = jnp.where(hit, NEG, raw + cs_ref[:])
        wp = g * jnp.exp(logits - lse)                 # [NT, S]

    # dq/dvt stores cast to the REF dtype: with bf16 activations
    # (TrainConfig.act_dtype) the q/v_true primals are bf16, and custom_vjp
    # requires cotangent avals to match — the f32 math above is unchanged,
    # only the HBM store narrows
    dq_ref[:] = (wt * v
                 + jax.lax.dot_general(
                     wp.astype(dtype), vs.astype(dtype),
                     dimension_numbers=(((1,), (0,)), ((), ())),
                     preferred_element_type=jnp.float32)).astype(dq_ref.dtype)
    if aug:
        # d(vt_aug): value-lane grads re-expanded onto lanes 0..D-1 via the
        # selection matmul; the bias grad (= wt) rides lane D — no separate
        # [N,1] dbt stream (it would cost 128x its bytes under tiling)
        d = q.shape[1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], d + 1), 1)
        dvt_ref[:] = (jax.lax.dot_general(
            (wt * q.astype(jnp.float32)).astype(dtype),
            _sel(d + 1, d, dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
            + jnp.where(lane == d, wt, 0.0)).astype(dvt_ref.dtype)
    else:
        dvt_ref[:] = (wt * q.astype(jnp.float32)).astype(dvt_ref.dtype)
        dbt_ref[:] = wt
    dvs_ref[:] += jax.lax.dot_general(
        wp.astype(dtype), q.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbs_ref[:] += jnp.sum(wp, axis=0, keepdims=True)


def _pack_rin(tl_base, true_ids, weights, n, nt):
    """Lane-packed per-row inputs [np_, 3]: (tl, tid bits, weight)."""
    w = jnp.ones((n,), jnp.float32) if weights is None else (
        weights.astype(jnp.float32))
    rin = jnp.concatenate([
        tl_base.astype(jnp.float32)[:, None],
        jax.lax.bitcast_convert_type(true_ids.astype(jnp.int32),
                                     jnp.float32)[:, None],
        w[:, None],
    ], axis=1)
    return _pad_rows(rin, nt)            # pad rows carry w = 0


def _sums_forward(q, v_true, v_samp, c_samp, rin, sampled_ids, *, nt, dtype):
    s = v_samp.shape[0]
    np_ = rin.shape[0]
    aug = v_true.shape[1] == q.shape[1] + 1      # raw [N, D+1] rows, bias in
    q_p, vt_p = _pad_rows(q, nt), _pad_rows(v_true, nt)  # lane D (aug mode)
    grid = (np_ // nt,)
    row = lambda w: pl.BlockSpec((nt, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    rep = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    rout, sums = pl.pallas_call(
        functools.partial(_sums_fwd_kernel, aug=aug, dtype=dtype,
                          folded=_folded()),
        grid=grid,
        in_specs=[row(q.shape[1]), row(v_true.shape[1]),
                  rep(s, q.shape[1]), rep(1, s), row(3), rep(1, s)],
        out_specs=[row(2), rep(1, 2)],
        out_shape=[jax.ShapeDtypeStruct((np_, 2), jnp.float32),
                   jax.ShapeDtypeStruct((1, 2), jnp.float32)],
        interpret=_interpret(),
    )(q_p, vt_p, v_samp, c_samp[None, :], rin, sampled_ids[None, :])
    return sums[0, 0], sums[0, 1], rout


def _sums_backward(q, v_true, v_samp, c_samp, rin, sampled_ids, rout,
                   g_num, *, nt, dtype):
    n = q.shape[0]
    np_ = rin.shape[0]
    aug = v_true.shape[1] == q.shape[1] + 1
    q_p, vt_p = _pad_rows(q, nt), _pad_rows(v_true, nt)
    grid = (np_ // nt,)
    d = q.shape[1]
    dt = v_true.shape[1]                 # d+1 in aug mode: dvt carries the
    s = v_samp.shape[0]                  # bias grad in lane D, no dbt stream
    row = lambda w: pl.BlockSpec((nt, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    rep = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    col = pl.BlockSpec((nt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    scale = jnp.reshape(g_num.astype(jnp.float32), (1, 1))
    # dq/dvt dtypes follow their primals (bf16 under TrainConfig.act_dtype);
    # the accumulated dvs/dbs stay f32 — v_samp is cast f32 at the loss call
    # site (S·D is tiny) because a bf16 += accumulation across the grid
    # would lose precision on the shared negatives' gradients
    out_specs = [row(d), row(dt), rep(s, d), rep(1, s)]
    out_shape = [jax.ShapeDtypeStruct((np_, d), q.dtype),
                 jax.ShapeDtypeStruct((np_, dt), v_true.dtype),
                 jax.ShapeDtypeStruct((s, d), jnp.float32),
                 jax.ShapeDtypeStruct((1, s), jnp.float32)]
    if not aug:
        out_specs.append(col)
        out_shape.append(jax.ShapeDtypeStruct((np_, 1), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_sums_bwd_kernel, aug=aug, dtype=dtype,
                          folded=_folded()),
        grid=grid,
        in_specs=[row(d), row(dt), rep(s, d), rep(1, s), row(3), rep(1, s),
                  row(2),
                  pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(q_p, vt_p, v_samp, c_samp[None, :], rin, sampled_ids[None, :], rout,
      scale)
    if aug:
        dq, dvt, dvs, dbs = outs
        # d(loss)/d(tl_base) == the bias grad already riding dvt lane D;
        # tl_base is a sampler constant in training, so this slice is DCE'd
        dbt = dvt[:n, d]
    else:
        dq, dvt, dvs, dbs, dbt_col = outs
        dbt = dbt_col[:n, 0]
    return dq[:n], dvt[:n], dvs, dbs[0], dbt


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_sampled_ce_sums(q, v_true, v_samp, c_samp, tl_base, true_ids,
                          sampled_ids, weights=None, nt=256,
                          dtype=jnp.bfloat16):
    """(Σ wᵢ·ceᵢ, Σ wᵢ) of the sampled-softmax CE — the training entry.

    Same math as the pure-JAX path (tests assert parity) but the reduction
    happens inside the kernel; the caller divides. weights=None means
    w ≡ 1. Differentiable in q, v_true, v_samp, c_samp, tl_base, weights.

    AUG mode (dispatch: v_true.shape[1] == q.shape[1] + 1): v_true is the
    RAW gathered [N, D+1] output-table rows with the per-item bias in lane
    D, and tl_base carries only the −log(S·P) correction — the bias is
    added in-kernel. The VJP then returns d(v_true) as [N, D+1] with the
    bias grad in lane D: exactly the update-row shape the table
    scatter-add consumes, so no bias-column slice, no separate [N, 1] dbt
    stream (128× its logical bytes under T(8,128) tiling), and no
    re-merge of value/bias grads outside the kernel.
    """
    rin = _pack_rin(tl_base, true_ids, weights, q.shape[0], nt)
    num, den, _ = _sums_forward(q, v_true, v_samp, c_samp, rin, sampled_ids,
                                nt=nt, dtype=dtype)
    return num, den


def _sums_vjp_fwd(q, v_true, v_samp, c_samp, tl_base, true_ids, sampled_ids,
                  weights, nt, dtype):
    rin = _pack_rin(tl_base, true_ids, weights, q.shape[0], nt)
    num, den, rout = _sums_forward(q, v_true, v_samp, c_samp, rin,
                                   sampled_ids, nt=nt, dtype=dtype)
    return (num, den), (q, v_true, v_samp, c_samp, rin, sampled_ids, rout,
                        weights)


def _sums_vjp_bwd(nt, dtype, res, g):
    q, v_true, v_samp, c_samp, rin, sampled_ids, rout, weights = res
    g_num, g_den = g
    dq, dvt, dvs, dbs, dbt = _sums_backward(
        q, v_true, v_samp, c_samp, rin, sampled_ids, rout, g_num,
        nt=nt, dtype=dtype)
    n = q.shape[0]
    # num = Σ w·ce, den = Σ w  →  d/dwᵢ = g_num·ceᵢ + g_den (DCE'd when the
    # caller doesn't differentiate w.r.t. weights, i.e. always in training)
    dw = None if weights is None else g_num * rout[:n, 0] + g_den
    return dq, dvt, dvs, dbs, dbt, None, None, dw


fused_sampled_ce_sums.defvjp(_sums_vjp_fwd, _sums_vjp_bwd)


def fused_sampled_ce_sums_sharded(mesh, q, v_true, v_samp, c_samp, tl_base,
                                  true_ids, sampled_ids, weights=None,
                                  nt=256, dtype=jnp.bfloat16):
    """`fused_sampled_ce_sums` on a device mesh: per-shard kernel sums,
    psum'd inside the shard_map (see fused_sampled_ce_sharded for why the
    kernel must run under manual sharding). Returns GLOBAL (num, den)."""
    from jax.sharding import PartitionSpec as P
    rows = P(tuple(mesh.axis_names))
    rep = P()
    n = q.shape[0]
    w = jnp.ones((n,), jnp.float32) if weights is None else (
        weights.astype(jnp.float32))
    n_pad = -(-n // mesh.size) * mesh.size
    if n_pad != n:
        pad = n_pad - n
        q = jnp.pad(q, ((0, pad), (0, 0)))
        v_true = jnp.pad(v_true, ((0, pad), (0, 0)))
        tl_base = jnp.pad(tl_base, (0, pad))
        true_ids = jnp.pad(true_ids, (0, pad), constant_values=-1)
        w = jnp.pad(w, (0, pad))                 # pad rows weigh 0

    def body(q, vt, vs, cs, tl, tid, sid, w):
        num, den = fused_sampled_ce_sums(q, vt, vs, cs, tl, tid, sid, w,
                                         nt, dtype)
        ax = tuple(mesh.axis_names)
        return jax.lax.psum(num, ax), jax.lax.psum(den, ax)

    num, den = jax.shard_map(
        body, mesh=mesh,
        in_specs=(rows, rows, rep, rep, rows, rows, rep, rows),
        out_specs=(rep, rep),
        check_vma=False,
    )(q, v_true, v_samp, c_samp, tl_base, true_ids, sampled_ids, w)
    return num, den
