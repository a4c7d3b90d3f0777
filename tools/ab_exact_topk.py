"""A/B: exact top-k selection strategies at production retrieval shape.

The exact serving path (arec/retrieval/mips.py blocked_topk_mips,
recall_target=1.0) spends ~99% of its time in `lax.top_k` over the full
[Qb, V] score matrix (TPU top_k is sort-based). Candidate replacement:
TWO-LEVEL selection — split the vocab into item blocks of Vb, take a
block-local top-k ([Qb, C, Vb] -> [Qb, C, k]), then one final top-k over the
C*k candidates. Exact for distinct scores: the global top-k is contained in
the union of block-local top-ks. (This differs from the losing "item-blocked
running merge" of round 1, which paid a top-(k+S) sort per block PLUS a
carried merge; here there is no carry — one flat candidate top-k at the end.)

Times the full per-chunk pipeline (matmul + bias + seen mask + selection),
median-of-windows, readback-synced, all variants back-to-back in one
process (CLAUDE.md measurement rules). Verifies the two-level ids match the
full-V selection ids on every run.

Usage: python tools/ab_exact_topk.py [--v 300000] [--q 4096] [--d 64]
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


def make_pipeline(selection, qblock, k, v):
    """Blocked scoring pipeline with a pluggable selection fn."""

    def run(qs, vb, bias, ss):
        def body(_, xs):
            qq, sn = xs
            scores = jax.lax.dot_general(
                qq, vb, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias[None, :]
            rows = jnp.broadcast_to(jnp.arange(qblock)[:, None], sn.shape)
            scores = scores.at[rows, jnp.clip(sn, 0, v - 1)].add(
                jnp.where(sn >= 0, -1e9, 0.0))
            return None, selection(scores)

        _, (vals, ids) = jax.lax.scan(body, None, (qs, ss))
        return vals, ids

    return jax.jit(run)


def full_topk(k):
    def sel(scores):
        return jax.lax.top_k(scores, k)
    return sel


def twolevel_topk(k, vb_block):
    def sel(scores):
        qb, v = scores.shape
        c = -(-v // vb_block)
        vp = c * vb_block
        if vp != v:
            scores = jnp.pad(scores, ((0, 0), (0, vp - v)),
                             constant_values=-jnp.inf)
        s3 = scores.reshape(qb, c, vb_block)
        bv, bi = jax.lax.top_k(s3, k)                      # [qb, c, k]
        gi = bi + (jnp.arange(c, dtype=jnp.int32) * vb_block)[None, :, None]
        fv, fp = jax.lax.top_k(bv.reshape(qb, c * k), k)
        return fv, jnp.take_along_axis(gi.reshape(qb, c * k), fp, axis=1)
    return sel


def approx_topk(k, recall):
    def sel(scores):
        return jax.lax.approx_max_k(scores, k, recall_target=recall)
    return sel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=300_000)
    ap.add_argument("--q", type=int, default=4096)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--seen", type=int, default=30)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--score-mem-mb", type=int, default=512)
    args = ap.parse_args()
    v, q, d, k = args.v, args.q, args.d, args.k

    key = jax.random.key(0)
    ks = jax.random.split(key, 4)
    query = jax.random.normal(ks[0], (q, d), jnp.float32)
    items = jax.random.normal(ks[1], (v, d), jnp.float32)
    bias = jax.random.normal(ks[2], (v,), jnp.float32) * 0.01
    seen = jax.random.randint(ks[3], (q, args.seen), 0, v)

    qblock = max(1, min(q, (args.score_mem_mb << 20) // (4 * v)))
    nb = -(-q // qblock)
    qblock = -(-q // nb)
    qp = nb * qblock
    print(f"V={v} Q={q} D={d} k={k} qblock={qblock} nb={nb}")
    if qp != q:
        query = jnp.pad(query, ((0, qp - q), (0, 0)))
        seen = jnp.pad(seen, ((0, qp - q), (0, 0)), constant_values=-1)

    qs = query.astype(jnp.bfloat16).reshape(nb, qblock, d)
    vb = items.astype(jnp.bfloat16)
    ss = seen.reshape(nb, qblock, args.seen)

    variants = [("full-V top_k (current exact)", full_topk(k))]
    for blk in (4096, 8192, 16384, 32768, 65536):
        if blk < v:
            variants.append((f"two-level Vb={blk}", twolevel_topk(k, blk)))
    variants.append(("approx 0.95 (reference)", approx_topk(k, 0.95)))

    ref_ids = None
    for name, sel in variants:
        fn = make_pipeline(sel, qblock, k, v)
        vals, ids = fn(qs, vb, bias, ss)
        ids_np = np.asarray(jax.device_get(ids)).reshape(qp, k)[:q]
        if ref_ids is None:
            ref_ids = ids_np
        elif "two-level" in name:
            same = np.mean([
                len(set(ref_ids[i]) & set(ids_np[i])) / k for i in range(q)])
            assert same > 0.9999, f"{name}: id-set overlap {same}"
        times = []
        for _ in range(args.windows):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                vals, ids = fn(qs, vb, bias, ss)
            _ = float(jnp.sum(vals))          # readback sync per window
            times.append((time.perf_counter() - t0) / args.iters)
        med = sorted(times)[len(times) // 2]
        print(f"{name:34s} {med * 1e3:8.2f} ms/batch  "
              f"{q / med:10.0f} qps  "
              f"windows={[round(t * 1e3, 1) for t in times]}")


if __name__ == "__main__":
    main()
