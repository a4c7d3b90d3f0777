"""A/B steps_per_dispatch K for the flagship MF bench shape, interleaved
windows in ONE process (chip drift makes sequential A/B meaningless).

K amortizes the remote tunnel's ~0.6 ms launch latency over K on-device
steps (make_multi_step lax.scan). bench.py ships K=4; this measures
whether deeper scan buys more at the flagship shape.

Usage: python tools/ab_k.py [--ks 4,16] [--pairs 6] [--iters 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from arec.config import Config, DataConfig, ModelConfig, TrainConfig
from arec.data.dataset import mf_batches
from arec.data.io import load_or_prepare
from arec.models.mf import MFSpec, init_mf, mf_loss
from arec.tables.engine import attrs_to_device
from arec.train.step import init_state, make_multi_step, make_optimizer

BATCH = 32768


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", type=str, default="4,16")
    ap.add_argument("--pairs", type=int, default=6)
    ap.add_argument("--iters", type=int, default=3,
                    help="dispatches per window")
    args = ap.parse_args()
    ks = [int(x) for x in args.ks.split(",")]
    kmax = max(ks)

    cfg = Config(
        data=DataConfig(dataset="synthetic", data_dir="_data",
                        syn_users=60000, syn_items=20000,
                        syn_interactions=600000),
        model=ModelConfig(model="mf", dim=64, use_attributes=True),
        train=TrainConfig(batch_size=BATCH, learning_rate=0.3,
                          num_sampled=1024, loss="ce"),
    )
    ds = load_or_prepare(cfg.data)
    spec = MFSpec.from_config(cfg, ds.user_schema, ds.item_schema)
    user_dev = attrs_to_device(ds.user_attrs.restrict(spec.user.schema),
                               spec.user)
    item_dev = attrs_to_device(ds.item_attrs.restrict(spec.item.schema),
                               spec.item)
    opt = make_optimizer("adagrad", cfg.train.learning_rate)

    def loss_fn(p, batch, rng):
        return mf_loss(p, spec, user_dev, item_dev, batch, rng)

    # one K-stacked device block per K (sliced views of the same batches;
    # the epoch holds ~18 flagship batches — cycle for deeper K)
    raw = []
    for b in mf_batches(ds, BATCH, 0, 0):
        raw.append(b)
        if len(raw) == kmax:
            break
    while len(raw) < kmax:
        raw = (raw + raw)[:kmax]
    blocks = {k: {key: jnp.stack([jnp.asarray(x[key]) for x in raw[:k]])
                  for key in raw[0]} for k in ks}

    # per-K state (donated buffers cannot be shared across variants)
    states = {}
    steps = {}
    for k in ks:
        params = init_mf(jax.random.key(0), spec)
        states[k] = init_state(params, opt)
        steps[k] = make_multi_step(loss_fn, opt, cfg.train.learning_rate)

    base = jax.random.key(1)
    counters = {k: 0 for k in ks}

    def run(k, n):
        st, loss = states[k], None
        for _ in range(n):
            g = counters[k]
            subs = jax.vmap(lambda j: jax.random.fold_in(base, j))(
                jnp.arange(g, g + k))
            st, ms = steps[k](st, blocks[k], subs)
            loss = ms["loss"][-1]
            counters[k] += k
        states[k] = st
        return loss

    for k in ks:
        loss = run(k, 2)                        # warm + compile
        print(f"K={k}: compiled, loss={float(loss):.5f}", flush=True)

    res = {k: [] for k in ks}
    for p in range(args.pairs):
        for k in ks:
            t0 = time.perf_counter()
            loss = run(k, args.iters)
            float(loss)                          # readback sync
            dt = time.perf_counter() - t0
            res[k].append(BATCH * k * args.iters / dt)
    for k in ks:
        r = sorted(res[k])
        med = r[len(r) // 2]
        print(f"K={k:3d}: median {med/1e6:.2f}M ex/s  "
              f"windows={[round(x/1e6, 2) for x in res[k]]}", flush=True)


if __name__ == "__main__":
    main()
