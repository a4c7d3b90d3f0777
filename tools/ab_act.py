"""A/B TrainConfig.act_dtype (f32 vs bf16 train-path activations) at the
flagship MF bench shape — interleaved windows in ONE process (chip drift
makes sequential A/B meaningless; same discipline as tools/ab_k.py).

Round-3 closing profile: the step is busy-bound at K>=256 and the largest
lever is the batch-side activation traffic (many ~8 MB [32768, 64] f32
intermediates). bf16 activations halve that traffic; tables, gradients at
the table boundary, and the optimizer stay f32.

Usage: python tools/ab_act.py [--k 64] [--pairs 6] [--iters 2] [--lstm]
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
from arec.data.dataset import mf_batches, seq_batches
from arec.data.io import load_or_prepare
from arec.models.mf import MFSpec, init_mf, mf_loss
from arec.models import seq as seq_mod
from arec.tables.engine import attrs_to_device
from arec.train.step import init_state, make_multi_step, make_optimizer

BATCH = 32768
SB, L = 2048, 30


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=64, help="steps per dispatch")
    ap.add_argument("--pairs", type=int, default=6)
    ap.add_argument("--iters", type=int, default=2,
                    help="dispatches per window")
    ap.add_argument("--lstm", action="store_true",
                    help="A/B the LSTM flagship shape instead of MF")
    args = ap.parse_args()
    k = args.k
    variants = ("float32", "bfloat16")

    if args.lstm:
        cfg0 = Config(
            data=DataConfig(dataset="synthetic", data_dir="_data",
                            syn_users=60000, syn_items=20000,
                            syn_interactions=600000),
            model=ModelConfig(model="lstm", dim=64, use_attributes=True,
                              max_seq_len=L, use_pallas_scan=True),
            train=TrainConfig(batch_size=SB, learning_rate=0.3,
                              num_sampled=1024, loss="ce"),
        )
    else:
        cfg0 = Config(
            data=DataConfig(dataset="synthetic", data_dir="_data",
                            syn_users=60000, syn_items=20000,
                            syn_interactions=600000),
            model=ModelConfig(model="mf", dim=64, use_attributes=True),
            train=TrainConfig(batch_size=BATCH, learning_rate=0.3,
                              num_sampled=1024, loss="ce"),
        )
    ds = load_or_prepare(cfg0.data)
    ex_per_step = SB if args.lstm else BATCH

    # K-stacked device block (shared across variants — read-only)
    if args.lstm:
        it = seq_batches(ds, SB, L, 0, 0)
    else:
        it = mf_batches(ds, ex_per_step, 0, 0)
    raw = []
    for b in it:
        raw.append(b)
        if len(raw) == k:
            break
    while len(raw) < k:
        raw = (raw + raw)[:k]
    block = {key: jnp.stack([jnp.asarray(x[key]) for x in raw])
             for key in raw[0]}

    states, steps, counters = {}, {}, {}
    for act in variants:
        cfg = cfg0.replace(train=TrainConfig(
            **{**cfg0.train.__dict__, "act_dtype": act}))
        if args.lstm:
            spec = seq_mod.SeqSpec.from_config(cfg, ds.user_schema,
                                               ds.item_schema)
            idev = attrs_to_device(
                ds.item_attrs.restrict(spec.item_in.schema), spec.item_in)
            loss_fn = (lambda sp, idv: lambda p, b, r: seq_mod.seq_loss(
                p, sp, idv, None, b, r, time_major=True))(spec, idev)
            params = seq_mod.init_seq(jax.random.key(0), spec)
        else:
            spec = MFSpec.from_config(cfg, ds.user_schema, ds.item_schema)
            udev = attrs_to_device(ds.user_attrs.restrict(spec.user.schema),
                                   spec.user)
            idev = attrs_to_device(ds.item_attrs.restrict(spec.item.schema),
                                   spec.item)
            loss_fn = (lambda sp, ud, idv: lambda p, b, r: mf_loss(
                p, sp, ud, idv, b, r))(spec, udev, idev)
            params = init_mf(jax.random.key(0), spec)
        opt = make_optimizer("adagrad", cfg.train.learning_rate)
        states[act] = init_state(params, opt)
        steps[act] = make_multi_step(loss_fn, opt, cfg.train.learning_rate)
        counters[act] = 0

    base = jax.random.key(1)

    def run(act, n):
        st, loss = states[act], None
        for _ in range(n):
            g = counters[act]
            subs = jax.vmap(lambda j: jax.random.fold_in(base, j))(
                jnp.arange(g, g + k))
            st, ms = steps[act](st, block, subs)
            loss = ms["loss"][-1]
            counters[act] += k
        states[act] = st
        return loss

    for act in variants:
        loss = run(act, 1)                      # warm + compile
        print(f"act={act}: compiled, loss={float(loss):.5f}", flush=True)

    res = {a: [] for a in variants}
    for p in range(args.pairs):
        for act in variants:
            t0 = time.perf_counter()
            loss = run(act, args.iters)
            float(loss)                          # readback sync
            dt = time.perf_counter() - t0
            res[act].append(ex_per_step * k * args.iters / dt)
    for act in variants:
        r = sorted(res[act])
        med = r[len(r) // 2]
        print(f"act={act:9s}: median {med/1e6:.2f}M ex/s  "
              f"windows={[round(x/1e6, 2) for x in res[act]]}", flush=True)
    m32 = sorted(res["float32"])[len(res["float32"]) // 2]
    m16 = sorted(res["bfloat16"])[len(res["bfloat16"]) // 2]
    print(f"bf16/f32 ratio: {m16/m32:.3f}", flush=True)


if __name__ == "__main__":
    main()
