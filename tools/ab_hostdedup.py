"""A/B the HOST-precomputed dedupe backward chain against the plain
table-grad scatter, on the real chip.

ab_scatter.py established (BASELINE.md round-2): scatter cost is
per-descriptor and nearly independent of duplicates or sortedness
(base 0.884 ms vs presort 0.797 ms at B=32k/V=60k/4.7x dup), and every
ON-DEVICE dedupe loses because the sort costs more than collisions and a
statically-padded dedupe still issues B descriptors. The one untested
lever is shrinking the scatter's STATIC row count: batch ids are known on
the host before the step, so the input pipeline can ship
(perm, starts, ends, uids) for free and the device backward becomes

    du  = take(dout, perm)            # duplicates grouped (gather, cheap?)
    c   = cumsum(du, axis=0)          # one pass over [B, D]
    seg = c[ends] - c[starts-1]       # [Ncap, D] segment sums (2 gathers)
    out = zeros.at[uids].add(seg, sorted+unique)   # Ncap << B descriptors

Variants measured:
    base        — plain scatter_add of [B, D] at ids (the VJP today)
    floor N     — scatter_add of a pre-summed [N, D] at sorted-unique ids
                  (lower bound: what a free segment-sum would leave)
    chain N     — the full host-aux chain above with Ncap = N

Usage: python tools/ab_hostdedup.py [--v 60043] [--d 64] [--b 32768]
       [--zipf 1.1] [--caps 8192,16384]
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


def timeit(jfn, args, iters=64, rounds=5):
    r = jfn(*args)
    jax.block_until_ready(r)
    float(jnp.asarray(r).ravel()[0])          # readback sync
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = jfn(*args)
        jax.block_until_ready(r)
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[len(times) // 2]


def host_aux(ids_np: np.ndarray, cap: int, v: int):
    """What the input pipeline would ship: grouping permutation, per-slot
    segment [start, end) into the permuted order, sorted-unique ids padded
    to `cap` (pad slots: empty segment at 0, id = V pad row)."""
    perm = np.argsort(ids_np, kind="stable").astype(np.int32)
    s = ids_np[perm]
    first = np.empty(len(s), bool)
    first[0] = True
    first[1:] = s[1:] != s[:-1]
    starts_all = np.flatnonzero(first)
    uids_all = s[starts_all]
    n = len(uids_all)
    assert n <= cap, (n, cap)
    starts = np.zeros(cap, np.int32)
    ends = np.zeros(cap, np.int32)
    uids = np.full(cap, v, np.int32)          # pad row (zero add target)
    starts[:n] = starts_all
    ends[:n] = np.append(starts_all[1:], len(s))
    uids[:n] = uids_all
    return perm, starts, ends, uids, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=60043)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--b", type=int, default=32768)
    ap.add_argument("--zipf", type=float, default=1.1)
    ap.add_argument("--caps", type=str, default="8192,16384")
    args = ap.parse_args()
    V, D, B = args.v, args.d, args.b

    rng = np.random.default_rng(0)
    raw = rng.zipf(args.zipf, size=B * 4)
    ids_np = (raw[raw <= V] - 1)[:B].astype(np.int32)
    uniq = len(np.unique(ids_np))
    print(f"V={V} D={D} B={B} unique={uniq}", flush=True)

    ids = jnp.asarray(ids_np)
    dout = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    zeros = jnp.zeros((V + 1, D), jnp.float32)   # arg, never closed over

    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,))

    def base(zeros, dout, ids):
        return jax.lax.scatter_add(zeros, ids[:, None], dout, dn)

    def floor_scatter(zeros, seg, uids):
        return jax.lax.scatter_add(zeros, uids[:, None], seg, dn,
                                   indices_are_sorted=True,
                                   unique_indices=True)

    def chain(zeros, dout, perm, starts, ends, uids):
        du = jnp.take(dout, perm, axis=0)
        c = jnp.cumsum(du, axis=0)
        ce = jnp.take(c, ends - 1, axis=0)
        cs = jnp.take(c, starts - 1, axis=0)
        seg = jnp.where((ends > starts)[:, None],
                        ce - jnp.where((starts > 0)[:, None], cs, 0.0),
                        0.0)
        return jax.lax.scatter_add(zeros, uids[:, None], seg, dn,
                                   indices_are_sorted=True,
                                   unique_indices=True)

    jbase = jax.jit(base)
    jfloor = jax.jit(floor_scatter)
    jchain = jax.jit(chain)

    # reference for correctness (device-side compare; big readbacks stall
    # the tunnel)
    ref = jbase(zeros, dout, ids)

    ms = timeit(jbase, (zeros, dout, ids)) * 1e3
    print(f"base          : {ms:.3f} ms", flush=True)

    for cap in [int(c) for c in args.caps.split(",")]:
        perm_np, starts_np, ends_np, uids_np, n = host_aux(ids_np, cap, V)
        perm = jnp.asarray(perm_np)
        starts = jnp.asarray(starts_np)
        ends = jnp.asarray(ends_np)
        uids = jnp.asarray(uids_np)

        got = jchain(zeros, dout, perm, starts, ends, uids)
        err = float(jnp.max(jnp.abs(got - ref)) /
                    jnp.maximum(jnp.max(jnp.abs(ref)), 1e-30))
        ms_chain = timeit(jchain, (zeros, dout, perm, starts, ends, uids)) * 1e3

        # floor: pre-summed rows of the same static size
        seg = jnp.asarray(rng.standard_normal((cap, D)).astype(np.float32))
        ms_floor = timeit(jfloor, (zeros, seg, uids)) * 1e3
        print(f"cap={cap:6d} (n={n:6d}): chain {ms_chain:.3f} ms  "
              f"floor-scatter {ms_floor:.3f} ms  rel-err {err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
