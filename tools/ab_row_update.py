"""A/B the Pallas DMA row-scatter (arec/kernels/row_update.py) against
XLA's scatter at the XING-rehearsal shape, on the real chip.

Usage: python tools/ab_row_update.py [--v 1304126] [--w 258] [--n 14336]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from arec.compile_cache import enable_compile_cache

enable_compile_cache()

# The candidate kernel is embedded below (NOT shipped in arec/: every
# Mosaic lowering attempt fails on this stack — see module docstring).



# --------------------------------------------------------------------------
# Candidate Pallas DMA row-scatter — measured DEAD END on this stack
# (kept here as the frontier record, per the losing-variant convention):
#   * XLA scatter: 8.8 ms / 14.3k rows into [1.3M, 258] (~600 ns/row);
#     sorted/presorted variants are WORSE (14 ms) — tools/ab_scatter.py.
#   * Random row GATHERS from the same table run ~64 ns/row, so the gap is
#     scatter-unit serialization, not DRAM.
#   * Pallas row-DMA attempts all fail to lower on this Mosaic version:
#     2-D refs (ANY and HBM spaces): "Slice shape along dimension 0 must
#     be aligned to tiling (8)" for single-row slices; 1-D flat views:
#     same error with tiling (1024). Row-granular async_copy offsets are
#     categorically rejected, and 8-row block staging would need a
#     read-modify-write ring whose complexity outweighs the ~5 ms/step.
# --------------------------------------------------------------------------

import functools

_Q = 8          # DMA queue depth (outstanding row writes)
_MIN_ROWS = 1024   # below this the plain scatter's fixed cost is fine


def _kernel(w, ids_ref, nv_ref, table_ref, rows_ref, out_ref, sems):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_valid = nv_ref[0]

    # refs are FLAT 1-D f32 views: Mosaic requires 2-D slices to be
    # 8-sublane aligned, which single rows are not; 1-D DMA slices take
    # arbitrary offsets
    def start(i):
        pltpu.make_async_copy(
            rows_ref.at[pl.ds(i * w, w)],
            out_ref.at[pl.ds(ids_ref[i] * w, w)],
            sems.at[jax.lax.rem(i, _Q)],
        ).start()

    def wait(slot):
        # the wait consumes the semaphore by the transfer's byte count,
        # which is shape-constant — any same-shaped slice pair works
        pltpu.make_async_copy(
            rows_ref.at[pl.ds(0, w)],
            out_ref.at[pl.ds(0, w)],
            sems.at[slot],
        ).wait()

    def body(i, _):
        @pl.when(i >= _Q)
        def _():
            wait(jax.lax.rem(i, _Q))
        start(i)
        return 0

    jax.lax.fori_loop(0, n_valid, body, 0)

    def drain(s, _):
        wait(s)
        return 0

    jax.lax.fori_loop(0, jnp.minimum(_Q, n_valid), drain, 0)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_rows_pallas(table, ids, rows):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import functools as _ft

    v, w = table.shape
    n_valid = jnp.sum(ids < v).astype(jnp.int32)[None]
    out = pl.pallas_call(
        _ft.partial(_kernel, w),
        out_shape=jax.ShapeDtypeStruct((v * w,), table.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # ids
            pl.BlockSpec(memory_space=pltpu.SMEM),      # n_valid
            pl.BlockSpec(memory_space=pltpu.HBM),       # table (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),       # rows
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_Q,))],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids.astype(jnp.int32), n_valid, table.reshape(-1),
      rows.reshape(-1))
    return out.reshape(v, w)


def scatter_rows_set(table: jnp.ndarray, ids: jnp.ndarray,
                     rows: jnp.ndarray, use_kernel: bool | None = None
                     ) -> jnp.ndarray:
    """table[ids] = rows (OOB ids dropped; in-range ids must be unique,
    and OOB entries must form a suffix — engine.unique_rows layout).
    use_kernel None = on TPU at ≥_MIN_ROWS rows; the jnp scatter is the
    oracle fallback."""
    if use_kernel is None:
        use_kernel = (jax.default_backend() == "tpu"
                      and ids.shape[0] >= _MIN_ROWS)
    if not use_kernel:
        return table.at[ids].set(rows, mode="drop", unique_indices=True,
                                 indices_are_sorted=True)
    return _scatter_rows_pallas(table, ids, rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=1_304_126)
    ap.add_argument("--w", type=int, default=258)
    ap.add_argument("--n", type=int, default=14336)
    ap.add_argument("--iters", type=int, default=24)
    args = ap.parse_args()
    V, W, N = args.v, args.w, args.n

    rng = np.random.default_rng(0)
    uniq = np.sort(rng.choice(V, size=N - 64, replace=False)).astype(np.int32)
    ids = np.concatenate([uniq, np.full(64, V, np.int32)])   # sentinel tail
    rows = rng.normal(size=(N, W)).astype(np.float32)
    table0 = rng.normal(size=(V, W)).astype(np.float32)

    ids_d, rows_d = jnp.asarray(ids), jnp.asarray(rows)

    # correctness: kernel result == oracle scatter
    want = np.asarray(jax.device_get(
        jnp.asarray(table0).at[ids_d].set(rows_d, mode="drop",
                                          unique_indices=True,
                                          indices_are_sorted=True)))
    got = np.asarray(jax.device_get(scatter_rows_set(
        jnp.asarray(table0), ids_d, rows_d, use_kernel=True)))
    np.testing.assert_array_equal(got, want)
    print("correctness: kernel == oracle scatter (bitwise)", flush=True)

    # K-chained timing (varied rows defeat CSE; donation keeps it in-place)
    def many(fn):
        def run(t):
            def body(c, x):
                return fn(c, ids_d, rows_d + x), None
            t, _ = jax.lax.scan(body, t,
                                jnp.arange(8, dtype=jnp.float32))
            return t
        return jax.jit(run, donate_argnums=(0,))

    oracle = lambda t, i, r: t.at[i].set(r, mode="drop", unique_indices=True,
                                         indices_are_sorted=True)
    kern = lambda t, i, r: scatter_rows_set(t, i, r, use_kernel=True)
    for name, fn in (("xla_scatter", oracle), ("pallas_dma", kern)):
        j = many(fn)
        t = jnp.asarray(table0)
        t = j(t)
        jax.block_until_ready(t)
        float(jnp.asarray(t).ravel()[0])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters // 8):
                t = j(t)
            jax.block_until_ready(t)
            times.append(time.perf_counter() - t0)
        per = sorted(times)[1] / (args.iters // 8) / 8
        print(f"{name:12s}: {per*1e3:7.3f} ms per {N}-row write "
              f"({per/N*1e9:6.1f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
