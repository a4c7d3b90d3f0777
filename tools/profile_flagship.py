"""Trace the flagship bench step (MF or LSTM) and print the device-op
breakdown via tools/xprof.py.

Usage:
    python tools/profile_flagship.py [mf|lstm] [--trace-dir /tmp/arec_trace]

Runs the same configuration bench.py / bench_all.py time (synthetic twin,
batch 32768 MF / 2048 LSTM, K=4 scan dispatch), captures 3 dispatches under
jax.profiler.trace, and aggregates the "XLA Ops" line.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from arec.config import Config, DataConfig, ModelConfig, TrainConfig
from arec.data.io import load_or_prepare
from arec.tables.engine import attrs_to_device
from arec.train.step import init_state, make_multi_step, make_optimizer

K = 4


def build(family: str):
    if family == "mf":
        from arec.data.dataset import mf_batches
        from arec.models.mf import MFSpec, init_mf, mf_loss
        cfg = Config(
            data=DataConfig(dataset="synthetic", data_dir="_data",
                            syn_users=60000, syn_items=20000,
                            syn_interactions=600000),
            model=ModelConfig(model="mf", dim=64, use_attributes=True),
            train=TrainConfig(batch_size=32768, learning_rate=0.3,
                              num_sampled=1024, loss="ce"),
        )
        ds = load_or_prepare(cfg.data)
        spec = MFSpec.from_config(cfg, ds.user_schema, ds.item_schema)
        params = init_mf(jax.random.key(0), spec)
        user_dev = attrs_to_device(ds.user_attrs.restrict(spec.user.schema), spec.user)
        item_dev = attrs_to_device(ds.item_attrs.restrict(spec.item.schema), spec.item)

        def loss_fn(p, batch, rng):
            return mf_loss(p, spec, user_dev, item_dev, batch, rng)

        batches = mf_batches(ds, cfg.train.batch_size, 0, 0)
        return cfg, params, loss_fn, batches

    from arec.data.dataset import seq_batches
    from arec.models.seq import SeqSpec, init_seq, seq_loss
    cfg = Config(
        data=DataConfig(dataset="synthetic", data_dir="_data",
                        syn_users=60000, syn_items=20000,
                        syn_interactions=600000),
        model=ModelConfig(model="lstm", dim=64, use_attributes=True,
                          max_seq_len=30, use_pallas_scan=True),
        train=TrainConfig(batch_size=2048, learning_rate=0.3,
                          num_sampled=1024, loss="ce"),
    )
    ds = load_or_prepare(cfg.data)
    spec = SeqSpec.from_config(cfg, ds.user_schema, ds.item_schema)
    params = init_seq(jax.random.key(0), spec)
    item_dev = attrs_to_device(
        ds.item_attrs.restrict(spec.item_in.schema), spec.item_in)

    def loss_fn(p, batch, rng):
        return seq_loss(p, spec, item_dev, None, batch, rng,
                        time_major=True)

    batches = seq_batches(ds, cfg.train.batch_size, cfg.model.max_seq_len,
                          0, 0)
    return cfg, params, loss_fn, batches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("family", nargs="?", default="mf", choices=["mf", "lstm"])
    ap.add_argument("--trace-dir", default="/tmp/arec_trace")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    cfg, params, loss_fn, batches = build(args.family)
    opt = make_optimizer("adagrad", cfg.train.learning_rate)
    state = init_state(params, opt)
    step = make_multi_step(loss_fn, opt, cfg.train.learning_rate)

    blocks, cur = [], []
    for b in batches:
        cur.append(b)
        if len(cur) == K:
            blocks.append({k: jnp.stack([jnp.asarray(x[k]) for x in cur])
                           for k in cur[0]})
            cur = []
        if len(blocks) == 2:
            break
    base = jax.random.key(1)

    def subs(g):
        return jax.vmap(lambda i: jax.random.fold_in(base, i))(
            jnp.arange(g, g + K))

    g = 0
    for i in range(3):   # warmup + prime readback
        state, m = step(state, blocks[i % 2], subs(g)); g += K
    assert jnp.isfinite(float(jnp.asarray(m["loss"][-1])))
    jax.block_until_ready(state.params)

    shutil.rmtree(args.trace_dir, ignore_errors=True)
    with jax.profiler.trace(args.trace_dir):
        for i in range(3):
            state, m = step(state, blocks[i % 2], subs(g)); g += K
        jax.block_until_ready(state.params)

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    sys.argv = ["xprof", args.trace_dir, "--top", str(args.top)]
    import tools.xprof as xprof
    xprof.main()
    print(f"# {3 * K} steps traced -> divide by {3 * K} for per-step")


if __name__ == "__main__":
    main()
