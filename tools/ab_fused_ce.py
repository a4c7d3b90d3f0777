"""Micro-bench for the fused sampled-CE kernel at the flagship MF shape.

Times value_and_grad of the sums-level fused CE loss — median of windows,
readback-synced (CLAUDE.md measurement rules). Run before/after a kernel
change back-to-back; the xplane trace is the definitive per-op check.

Usage: python tools/ab_fused_ce.py [N] [S] [D] [--nt 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=32768)
    ap.add_argument("s", nargs="?", type=int, default=1024)
    ap.add_argument("d", nargs="?", type=int, default=64)
    ap.add_argument("--nt", type=int, default=256)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--aug", action="store_true",
                    help="bias-in-vt mode: vt is [N, D+1] raw rows")
    args = ap.parse_args()
    n, s, d = args.n, args.s, args.d

    from arec.kernels.sampled_softmax import fused_sampled_ce_sums

    k = jax.random.key(0)
    ks = jax.random.split(k, 8)
    q = jax.random.normal(ks[0], (n, d), jnp.float32)
    vt = jax.random.normal(ks[1], (n, d + 1 if args.aug else d), jnp.float32)
    vs = jax.random.normal(ks[2], (s, d), jnp.float32)
    cs = jax.random.normal(ks[3], (s,), jnp.float32)
    tl = jax.random.normal(ks[4], (n,), jnp.float32)
    tid = jax.random.randint(ks[5], (n,), 0, 20000)
    sid = jax.random.randint(ks[6], (s,), 0, 20000)

    def loss(q, vt, vs, cs, tl):
        num, den = fused_sampled_ce_sums(q, vt, vs, cs, tl, tid, sid, None,
                                         args.nt, jnp.bfloat16)
        return num / q.shape[0]

    vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)))

    # K-scan dispatch to amortize tunnel launch latency, varied input
    # (q scaled per-iter) to defeat CSE
    def many(q, vt, vs, cs, tl, scales):
        def body(_, sc):
            v, g = vg(q * sc, vt, vs, cs, tl)
            return None, (v, g[0][0, 0])
        _, (vals, g00) = jax.lax.scan(body, None, scales)
        return vals.sum(), g00.sum()

    K = 8
    manyj = jax.jit(many)
    scales = 1.0 + jnp.arange(K, dtype=jnp.float32) * 1e-6

    v, g = manyj(q, vt, vs, cs, tl, scales)
    print("warm value:", float(v))  # real readback = sync barrier

    times = []
    for w in range(args.windows):
        t0 = time.perf_counter()
        acc = 0.0
        for i in range(max(1, args.iters // K)):
            v, g = manyj(q, vt, vs, cs, tl, scales + i * 1e-9)
        acc = float(v) + float(g)        # one readback per window
        times.append((time.perf_counter() - t0)
                     / (max(1, args.iters // K) * K))
    med = sorted(times)[len(times) // 2]
    print(f"N={n} S={s} D={d} nt={args.nt}: "
          f"{med * 1e3:.3f} ms/iter (fwd+bwd), windows(ms/iter)="
          f"{[round(t * 1e3, 3) for t in times]}")

    if os.environ.get("AB_TRACE"):
        import shutil
        tdir = os.environ["AB_TRACE"]
        shutil.rmtree(tdir, ignore_errors=True)
        with jax.profiler.trace(tdir):
            v, g = manyj(q, vt, vs, cs, tl, scales)
            jax.block_until_ready((v, g))
        print(f"trace -> {tdir} ({K} iters; divide op totals by {K})")


if __name__ == "__main__":
    main()
