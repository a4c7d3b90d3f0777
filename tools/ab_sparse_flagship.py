"""A/B dense vs sparse (touched-rows) table updates at the FLAGSHIP MF
shape — interleaved windows in ONE process (tools/ab_k.py discipline).

Round-4 lever (b) of the round-3 closing profile: the dense step spends
~500 us/step scattering full-table cotangents (descriptor-bound, ~8 ns/row)
plus ~150 us of dense Adagrad passes. The sparse step (arec/train/sparse)
replaces both with [unique-rows gather -> row update -> ONE packed scatter
per table]; at XING scale it wins 1.9x, but at the flagship (60k/20k vocab)
shape it was never measured. Parity is already guaranteed by
tests/test_sparse.py.

Usage: python tools/ab_sparse_flagship.py [--k 64] [--pairs 6] [--iters 2]
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
from arec.train.sparse import (
    init_sparse_state, make_sparse_multi_step, table_paths,
)
from arec.train.step import init_state, make_multi_step, make_optimizer

BATCH = 32768


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--pairs", type=int, default=6)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()
    k = args.k

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
    udev = attrs_to_device(ds.user_attrs.restrict(spec.user.schema),
                           spec.user)
    idev = attrs_to_device(ds.item_attrs.restrict(spec.item.schema),
                           spec.item)
    opt = make_optimizer("adagrad", cfg.train.learning_rate)

    raw = []
    for b in mf_batches(ds, BATCH, 0, 0):
        raw.append(b)
        if len(raw) == k:
            break
    while len(raw) < k:
        raw = (raw + raw)[:k]
    block = {key: jnp.stack([jnp.asarray(x[key]) for x in raw])
             for key in raw[0]}

    variants = ("dense", "sparse")
    states, steps, counters = {}, {}, {}
    # independent param trees per variant: the steps DONATE their state, so
    # sharing buffers across variants deletes the other's arrays
    states["dense"] = init_state(init_mf(jax.random.key(0), spec), opt)
    steps["dense"] = make_multi_step(
        lambda p, b, r: mf_loss(p, spec, udev, idev, b, r),
        opt, cfg.train.learning_rate)
    states["sparse"] = init_sparse_state(init_mf(jax.random.key(0), spec),
                                         table_paths(False, spec),
                                         opt, "adagrad")
    steps["sparse"] = make_sparse_multi_step(
        False, spec, udev, idev, opt, cfg.train.learning_rate, "adagrad")
    counters = {v: 0 for v in variants}

    base = jax.random.key(1)

    def run(v, n):
        st, loss = states[v], None
        for _ in range(n):
            g = counters[v]
            subs = jax.vmap(lambda j: jax.random.fold_in(base, j))(
                jnp.arange(g, g + k))
            st, ms = steps[v](st, block, subs)
            loss = ms["loss"][-1]
            counters[v] += k
        states[v] = st
        return loss

    for v in variants:
        loss = run(v, 1)
        print(f"{v}: compiled, loss={float(loss):.5f}", flush=True)

    res = {v: [] for v in variants}
    for p in range(args.pairs):
        for v in variants:
            t0 = time.perf_counter()
            loss = run(v, args.iters)
            float(loss)
            dt = time.perf_counter() - t0
            res[v].append(BATCH * k * args.iters / dt)
    for v in variants:
        r = sorted(res[v])
        med = r[len(r) // 2]
        print(f"{v:6s}: median {med/1e6:.2f}M ex/s  "
              f"windows={[round(x/1e6, 2) for x in res[v]]}", flush=True)
    md = sorted(res["dense"])[len(res["dense"]) // 2]
    ms_ = sorted(res["sparse"])[len(res["sparse"]) // 2]
    print(f"sparse/dense ratio: {ms_/md:.3f}", flush=True)


if __name__ == "__main__":
    main()
