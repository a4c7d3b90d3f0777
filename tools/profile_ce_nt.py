"""Per-op (xplane) timing of the fused sampled-CE kernel across row-block
sizes `nt` — dispatch-latency-immune, unlike wall-clock sweeps.

The tunnel's 2-4 ms launch latency drowns a ~0.7 ms kernel in wall-clock
loops, and wrapping value_and_grad in lax.scan makes the remote compile
wedge (>9 min, silent). So: dispatch N iterations eagerly under
jax.profiler.trace and aggregate the device-op durations — the trace
records on-device time only.

Usage: python tools/profile_ce_nt.py [--nts 256,1024] [--n 65536]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.xprof import aggregate, find_xplane

ITERS = 12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nts", type=str, default="256,1024")
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--s", type=int, default=1024)
    ap.add_argument("--d", type=int, default=64)
    args = ap.parse_args()
    n, s, d = args.n, args.s, args.d

    from arec.kernels.sampled_softmax import fused_sampled_ce_sums

    k = jax.random.key(0)
    ks = jax.random.split(k, 8)
    q = jax.random.normal(ks[0], (n, d), jnp.float32)
    vt = jax.random.normal(ks[1], (n, d + 1), jnp.float32)   # aug mode
    vs = jax.random.normal(ks[2], (s, d), jnp.float32)
    cs = jax.random.normal(ks[3], (s,), jnp.float32)
    tl = jnp.zeros((n,), jnp.float32)
    tid = jax.random.randint(ks[4], (n,), 0, 20000)
    sid = jax.random.randint(ks[5], (s,), 0, 20000)
    w = jnp.ones((n,), jnp.float32)

    for nt in [int(x) for x in args.nts.split(",")]:
        # tid/sid/w ride as jit ARGUMENTS: closed-over device arrays are
        # inlined into the HLO and large constants wedge the remote compile
        # (CLAUDE.md gotcha)
        def loss(q, vt, vs, cs, tl, tid, sid, w, nt=nt):
            num, den = fused_sampled_ce_sums(q, vt, vs, cs, tl, tid, sid,
                                             w, nt)
            return num / den
        f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
        v, g = f(q, vt, vs, cs, tl, tid, sid, w)
        jax.block_until_ready(g)
        print(f"nt={nt}: compiled, loss={float(v):.6f}", flush=True)

        tdir = f"/tmp/ce_nt_trace_{nt}"
        shutil.rmtree(tdir, ignore_errors=True)
        with jax.profiler.trace(tdir):
            for _ in range(ITERS):
                v, g = f(q, vt, vs, cs, tl, tid, sid, w)
            jax.block_until_ready(g)
        float(v)
        per_op, per_n, busy = aggregate(find_xplane(tdir))
        fwd = sum(ps for name, ps in per_op.items() if "jvp" in name
                  and "transpose" not in name)
        bwd = sum(ps for name, ps in per_op.items()
                  if "transpose_jvp" in name)
        print(f"nt={nt}: fwd {fwd/1e9/ITERS:.3f} ms  "
              f"bwd {bwd/1e9/ITERS:.3f} ms  "
              f"busy {busy/1e9/ITERS:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
