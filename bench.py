"""Benchmark entry point — run by the driver on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the graded throughput counter (BASELINE.json:2 "training
examples/s/chip") on the flagship config: attribute-aware hybrid MF
(fusion MLP + sampled-softmax over fused candidate encodings) on a cached
synthetic dataset with ML-1M-scale cardinalities, single chip.

No published reference numbers exist (BASELINE.md "Evidence status"):
vs_baseline is measured against the self-recorded regression floor in
BENCH_FLOOR.json (first accepted run; 1.0 when absent).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from arec.compile_cache import enable_compile_cache

enable_compile_cache()   # tunnel compiles swing 2-20+ min; replay is free

from arec.config import Config, DataConfig, ModelConfig, TrainConfig
from arec.data.dataset import mf_batches
from arec.data.io import load_or_prepare
from arec.models.mf import MFSpec, init_mf, mf_loss
from arec.tables.engine import attrs_to_device
from arec.train.step import init_state, make_multi_step, make_optimizer

# batch sweep (same-process A/B, contended chip, relative numbers): 3.43M
# ex/s @16384, 3.61M @32768, 3.58M @65536 — and at 32768 rows the Pallas
# fused-CE kernel auto-enables (arec/losses/losses.py _KERNEL_MIN_ROWS)
# for another +15%: 4.14M. 32768 is the sweet spot.
BATCH = 32768
K = 512        # steps per dispatch (train.steps_per_dispatch): one lax.scan
               # jit per K steps amortizes the tunnel's per-dispatch fixed
               # overhead (measured 0.6-11 ms depending on tunnel load).
               # Round-3 interleaved ladder (tools/ab_k.py, BASELINE.md):
               # 11.15M @K16 → 13.58M @K32 → 15.13M @K64 → 15.42M @K128 →
               # 16.56M @K256 → 17.32M @K512 — flat against the ~17.5M
               # device-busy ceiling (1.89 ms/step busy), so dispatch depth
               # is exhausted as a lever. Checked-in TRAINING configs keep
               # K=8 for checkpoint/metric granularity; the bench measures
               # the throughput ceiling.
WARMUP, STEPS = 2, 6   # in units of K-step dispatches


def main() -> None:
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
    params = init_mf(jax.random.key(0), spec)
    user_dev = attrs_to_device(ds.user_attrs.restrict(spec.user.schema), spec.user)
    item_dev = attrs_to_device(ds.item_attrs.restrict(spec.item.schema), spec.item)

    opt = make_optimizer("adagrad", cfg.train.learning_rate)
    state = init_state(params, opt)

    def loss_fn(p, batch, rng):
        return mf_loss(p, spec, user_dev, item_dev, batch, rng)

    step = make_multi_step(loss_fn, opt, cfg.train.learning_rate)

    # pre-stage two K-stacked dispatch blocks of device batches so host time
    # is out of the loop (one epoch holds ~18 flagship batches — cycle
    # across epochs for deep K; varied inputs defeat CSE either way)
    blocks, cur, epoch = [], [], 0
    while len(blocks) < 2:
        for b in mf_batches(ds, BATCH, 0, epoch):
            cur.append(b)
            if len(cur) == K:
                blocks.append(
                    {k: jnp.stack([jnp.asarray(x[k]) for x in cur])
                     for k in cur[0]})
                cur = []
            if len(blocks) == 2:
                break
        epoch += 1
    base = jax.random.key(1)
    gstep = 0

    def subs(g):
        return jax.vmap(lambda i: jax.random.fold_in(base, i))(
            jnp.arange(g, g + K))

    for i in range(WARMUP):
        state, m = step(state, blocks[i % len(blocks)], subs(gstep))
        gstep += K
    # PRIME the remote backend with a real host readback: in a fresh
    # process block_until_ready alone can return before execution (lazy
    # dispatch, observed 45× overreads); after one device_get it behaves
    assert jnp.isfinite(float(jnp.asarray(m["loss"][-1]))), "loss not finite"
    jax.block_until_ready(state.params)

    # median of 3 timed windows: the TPU sits behind a remote tunnel whose
    # transient stalls can poison a single contiguous window (observed 7×
    # swings); the median window is robust to them
    per, times = max(1, STEPS // 3), []
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(per):
            state, m = step(state, blocks[i % len(blocks)], subs(gstep))
            gstep += K
        jax.block_until_ready(state.params)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1] * STEPS / per

    eps = BATCH * K * STEPS / dt / max(jax.local_device_count(), 1)

    floor = None
    if os.path.exists("BENCH_FLOOR.json"):
        try:
            floor = json.load(open("BENCH_FLOOR.json")).get("value")
        except Exception:
            floor = None
    vs = (eps / floor) if floor else 1.0

    print(json.dumps({
        "metric": "mf_train_examples_per_s_per_chip",
        "value": round(eps, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
