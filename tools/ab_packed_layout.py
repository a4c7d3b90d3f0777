"""A/B the big-table touched-rows Adagrad update LAYOUT at the XING
rehearsal shape (VERDICT r3 weak #5): the packed [V, 2W] row decision
(param ++ accum in one row, arec/train/sparse.py) was justified by a
small-table measurement where scatters are descriptor-bound; at multi-GB
tables they are DRAM-locality/byte-bound (~450-600 ns/row) and the two
packed scatters cost 11.3 ms of the 25.8 ms XING sparse step.

Variants (all perform the SAME Adagrad row update, n touched rows):
  packed      — one [V, 2W] f32 table: 1 gather + 1 scatter of [n, 2W]
  split       — two [V, W] f32 tables (param, accum): 2 gathers + 2
                scatters of [n, W]
  split_bf16  — param [V, W] bf16 + accum [V, W] f32: same op count,
                param bytes halved (update math still f32; param rows are
                cast on gather and rounded on scatter)

Usage: python tools/ab_packed_layout.py [--v 1300000] [--w 129] [--n 14336]
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

LR = 0.3
EPS = 1e-7


def _adagrad(p, a, g):
    a_new = a + g * g
    inv = jnp.where(a_new > 0, 1.0 / (jnp.sqrt(a_new) + EPS), 0.0)
    return p - LR * g * inv, a_new


def timeit(fn, args, iters=6, k=8):
    """Median window; each dispatch runs k updates under lax.scan (ids
    shifted per step to defeat CSE) so the tunnel's 2-4 ms launch latency
    is amortized out of the per-update number. Readback-synced
    (CLAUDE.md lazy-dispatch gotcha)."""
    def many(state, ids, g):
        def body(st, sh):
            return fn(st, ids + sh, g), None
        out, _ = jax.lax.scan(body, state,
                              jnp.arange(k, dtype=ids.dtype))
        return out
    jfn = jax.jit(many, donate_argnums=(0,))
    state = args[0]
    state = jfn(state, *args[1:])          # compile + warm
    jax.block_until_ready(state)
    first = state[0] if isinstance(state, tuple) else state
    float(jnp.asarray(first).ravel()[0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state = jfn(state, *args[1:])
        first = state[0] if isinstance(state, tuple) else state
        float(jnp.asarray(first).ravel()[0])
        times.append((time.perf_counter() - t0) / (iters * k))
    return sorted(times)[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=1_300_000)
    ap.add_argument("--w", type=int, default=129)
    ap.add_argument("--n", type=int, default=14336)
    args = ap.parse_args()
    V, W, n = args.v, args.w, args.n

    rng = np.random.default_rng(0)
    # 8-strided base ids: ids + shift stays sorted AND unique for every
    # scan shift in [0, 8) (the unique_indices scatter contract)
    ids = jnp.asarray((np.sort(rng.choice(V // 8, size=n, replace=False))
                       * 8).astype(np.int32))
    g = jnp.asarray(rng.standard_normal((n, W)) * 1e-3, jnp.float32)

    kw = dict(mode="drop", unique_indices=True, indices_are_sorted=True)

    def packed(table, ids, g):
        rows = table.at[ids].get(mode="fill", fill_value=0,
                                 unique_indices=True,
                                 indices_are_sorted=True)
        p_new, a_new = _adagrad(rows[:, :W], rows[:, W:], g)
        return table.at[ids].set(jnp.concatenate([p_new, a_new], 1), **kw)

    def split(state, ids, g):
        pt, at = state
        p = pt.at[ids].get(mode="fill", fill_value=0, unique_indices=True,
                           indices_are_sorted=True)
        a = at.at[ids].get(mode="fill", fill_value=0, unique_indices=True,
                           indices_are_sorted=True)
        p_new, a_new = _adagrad(p, a, g)
        return (pt.at[ids].set(p_new, **kw), at.at[ids].set(a_new, **kw))

    def split_bf16(state, ids, g):
        pt, at = state
        p = pt.at[ids].get(mode="fill", fill_value=0, unique_indices=True,
                           indices_are_sorted=True).astype(jnp.float32)
        a = at.at[ids].get(mode="fill", fill_value=0, unique_indices=True,
                           indices_are_sorted=True)
        p_new, a_new = _adagrad(p, a, g)
        return (pt.at[ids].set(p_new.astype(jnp.bfloat16), **kw),
                at.at[ids].set(a_new, **kw))

    gb_packed = V * 2 * W * 4 / 1e9
    print(f"V={V} W={W} n={n}  packed table {gb_packed:.2f} GB", flush=True)

    t_packed = timeit(packed, (jnp.zeros((V, 2 * W), jnp.float32), ids, g))
    print(f"packed     : {t_packed*1e3:8.3f} ms  "
          f"({t_packed/n*1e9:6.0f} ns/row)", flush=True)

    t_split = timeit(split, ((jnp.zeros((V, W), jnp.float32),
                              jnp.zeros((V, W), jnp.float32)), ids, g))
    print(f"split      : {t_split*1e3:8.3f} ms  "
          f"({t_split/n*1e9:6.0f} ns/row)", flush=True)

    t_bf16 = timeit(split_bf16, ((jnp.zeros((V, W), jnp.bfloat16),
                                  jnp.zeros((V, W), jnp.float32)), ids, g))
    print(f"split_bf16 : {t_bf16*1e3:8.3f} ms  "
          f"({t_bf16/n*1e9:6.0f} ns/row)", flush=True)
    print(f"split/packed {t_split/t_packed:.3f}   "
          f"bf16/packed {t_bf16/t_packed:.3f}", flush=True)


if __name__ == "__main__":
    main()
