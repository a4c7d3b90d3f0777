"""A/B the table-gradient scatter-add strategies on real TPU.

The flagship steps spend ~25% of device-busy time scattering [B, D] update
rows into [V, D] tables (the gather VJP). Candidates:
  base    — plain scatter-add (what jnp.take's VJP emits)
  sorted  — lax.sort ids (+iota payload), permute rows, scatter with
            indices_are_sorted=True
  presort — scatter of ALREADY-sorted ids (upper bound for `sorted`:
            measures what sortedness alone buys, without sort+permute cost)
  segsum  — sort + segment_sum into first-occurrence slots + scatter the
            (partially-deduped) rows with indices_are_sorted=True; static
            row count is unchanged, but duplicate rows become no-op adds
            onto pad row V

Usage: python tools/ab_scatter.py [--v 60043] [--d 64] [--b 32768] [--zipf 1.1]
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


def timeit(fn, args, iters=48, k=8):
    jfn = jax.jit(fn)

    def many(*a):
        def body(c, x):
            return c + jfn(*a[:-1], a[-1] + x)[0, 0], None
        out, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(k, dtype=a[-1].dtype))
        return out

    manyj = jax.jit(many)
    v = manyj(*args)
    v.block_until_ready()
    float(v)   # readback sync
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters // k):
            v = manyj(*args)
        float(v)
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=60043)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--b", type=int, default=32768)
    ap.add_argument("--zipf", type=float, default=1.1)
    args = ap.parse_args()
    V, D, B = args.v, args.d, args.b

    rng = np.random.default_rng(0)
    # Zipf-ish ids like item frequency ranks
    raw = rng.zipf(args.zipf, size=B * 4)
    ids_np = (raw[raw <= V] - 1)[:B].astype(np.int32)
    uniq = len(np.unique(ids_np))
    ids = jnp.asarray(ids_np)
    ids_sorted = jnp.sort(ids)
    dout = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    zeros = jnp.zeros((V + 1, D), jnp.float32)

    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,))

    # NB: `zeros` is passed as an argument everywhere — closing over a [V, D]
    # device array inlines it into the HLO and the remote axon compile dies
    # with HTTP 413 / hangs (CLAUDE.md gotcha; this bit the first version).
    def base(zeros, dout, ids):
        return jax.lax.scatter_add(zeros, ids[:, None], dout, dn)

    def presort(zeros, dout, ids):
        return jax.lax.scatter_add(zeros, ids[:, None], dout, dn,
                                   indices_are_sorted=True)

    def sorted_(zeros, dout, ids):
        si, perm = jax.lax.sort_key_val(ids, jnp.arange(B, dtype=jnp.int32))
        du = jnp.take(dout, perm, axis=0)
        return jax.lax.scatter_add(zeros, si[:, None], du, dn,
                                   indices_are_sorted=True)

    def segsum(zeros, dout, ids):
        si, perm = jax.lax.sort_key_val(ids, jnp.arange(B, dtype=jnp.int32))
        du = jnp.take(dout, perm, axis=0)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), si[1:] != si[:-1]])
        seg = jnp.cumsum(first) - 1                      # [B] slot per row
        acc = jax.ops.segment_sum(du, seg, num_segments=B,
                                  indices_are_sorted=True)
        # slot k holds the sum for the k-th unique id; map slot -> id by
        # scattering each first-occurrence id into its slot; unused slots
        # point at pad row V (zero-add)
        slot_id = jnp.full((B,), V, si.dtype).at[seg].min(si, mode="drop")
        return jax.lax.scatter_add(zeros, slot_id[:, None], acc, dn,
                                   indices_are_sorted=False)

    # correctness cross-check on small slice
    ref = np.zeros((V + 1, D), np.float32)
    np.add.at(ref, ids_np, np.asarray(dout))
    for name, fn, a in [("base", base, (dout, ids)),
                        ("sorted", sorted_, (dout, ids)),
                        ("segsum", segsum, (dout, ids))]:
        got = np.asarray(jax.jit(fn)(zeros, *a))
        err = np.abs(got - ref).max()
        assert err < 1e-3, (name, err)
        print(f"{name}: correctness ok (max err {err:.2e})", flush=True)

    print(f"V={V} D={D} B={B} unique={uniq}", flush=True)
    for name, fn, a in [("base   ", base, (dout, ids)),
                        ("presort", presort, (dout, ids_sorted)),
                        ("sorted ", sorted_, (dout, ids)),
                        ("segsum ", segsum, (dout, ids))]:
        ms = timeit(fn, (zeros,) + a) * 1e3
        print(f"{name}: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
