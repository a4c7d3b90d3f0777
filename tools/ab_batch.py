"""Interleaved A/B of flagship MF batch sizes at deep-K dispatch.

With dispatch overhead amortized away (K≥128), throughput is device-busy
bound; if per-step busy scales sub-linearly in batch (fixed per-op cost
tails), a bigger batch raises examples/s. Paired windows in one process.

Usage: python tools/ab_batch.py [--batches 32768,65536] [--k 128] [--pairs 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from arec.compile_cache import enable_compile_cache

enable_compile_cache()

from arec.config import Config, DataConfig, ModelConfig, TrainConfig
from arec.data.dataset import mf_batches
from arec.data.io import load_or_prepare
from arec.models.mf import MFSpec, init_mf, mf_loss
from arec.tables.engine import attrs_to_device
from arec.train.step import init_state, make_multi_step, make_optimizer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32768,65536")
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--pairs", type=int, default=4)
    args = ap.parse_args()
    sizes = [int(x) for x in args.batches.split(",")]
    K = args.k

    cfg = Config(
        data=DataConfig(dataset="synthetic", data_dir="_data",
                        syn_users=60000, syn_items=20000,
                        syn_interactions=600000),
        model=ModelConfig(model="mf", dim=64, use_attributes=True),
        train=TrainConfig(learning_rate=0.3, num_sampled=1024, loss="ce"),
    )
    ds = load_or_prepare(cfg.data)
    spec = MFSpec.from_config(cfg, ds.user_schema, ds.item_schema)
    udev = attrs_to_device(ds.user_attrs.restrict(spec.user.schema),
                           spec.user)
    idev = attrs_to_device(ds.item_attrs.restrict(spec.item.schema),
                           spec.item)
    opt = make_optimizer("adagrad", 0.3)

    def loss_fn(p, b, r):
        return mf_loss(p, spec, udev, idev, b, r)

    states, steps, blocks, counters = {}, {}, {}, {}
    base = jax.random.key(1)
    for bs in sizes:
        raw = []
        epoch = 0
        while len(raw) < K:
            raw += list(mf_batches(ds, bs, 0, epoch))
            epoch += 1
        raw = raw[:K]
        blocks[bs] = {k: jnp.stack([jnp.asarray(x[k]) for x in raw])
                      for k in raw[0]}
        states[bs] = init_state(init_mf(jax.random.key(0), spec), opt)
        steps[bs] = make_multi_step(loss_fn, opt, 0.3)
        counters[bs] = 0

    def run(bs, n=1):
        st = states[bs]
        for _ in range(n):
            g = counters[bs]
            subs = jax.vmap(lambda j: jax.random.fold_in(base, j))(
                jnp.arange(g, g + K))
            st, m = steps[bs](st, blocks[bs], subs)
            counters[bs] += K
        states[bs] = st
        return m["loss"][-1]

    for bs in sizes:
        loss = run(bs, 2)
        print(f"batch={bs}: compiled, loss={float(loss):.5f}", flush=True)

    res = {bs: [] for bs in sizes}
    for _ in range(args.pairs):
        for bs in sizes:
            t0 = time.perf_counter()
            loss = run(bs, 1)
            float(loss)
            dt = time.perf_counter() - t0
            res[bs].append(bs * K / dt)
    for bs in sizes:
        r = sorted(res[bs])
        print(f"batch={bs:6d}: median {r[len(r)//2]/1e6:.2f}M ex/s  "
              f"windows={[round(x/1e6, 2) for x in res[bs]]}", flush=True)


if __name__ == "__main__":
    main()
