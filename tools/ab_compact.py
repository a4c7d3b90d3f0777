"""A/B: plain dense lookup vs grad-compacting lookup on the real chip.

Attack on the table-scatter frontier (BASELINE.md xplane section: full-table
grad scatter-adds are 27% of the flagship MF step and 24% of LSTM, with ~3×
request duplication at the LSTM shape). Variant under test:
engine.make_compact_lookup — sort+unique ids per lookup call so the backward
table scatter sees sorted collision-free indices, at the cost of one id sort
per lookup.

Protocol: the chip is multi-tenant and drifts >20% WITHIN one process (two
identical variants benched sequentially measured 2.75M vs 3.35M ex/s), so
sequential same-process A/B is NOT enough. Variants are benched as
INTERLEAVED paired windows (A,B,A,B,...) and the reported statistic is the
median of per-pair ratios — drift that is slow relative to one window
cancels in each pair.

Usage: python tools/ab_compact.py [--quick] [--only mf,lstm]
Appends records to BASELINE_RUNS.jsonl like bench_all.py.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import bench_all as BA
from arec.tables.engine import dense_lookup, make_compact_lookup

ROUNDS = 4 if BA.QUICK else 8
PER = 10           # steps per timed window


def _interleaved_ab(mk_step, mk_state, ring, rng, label, out, unit_scale,
                    unit):
    """mk_step(lookup_fn) -> jitted step; states persist across windows."""
    variants = {"dense": dense_lookup, "compact": make_compact_lookup()}
    steps, states = {}, {}
    for name, lk in variants.items():
        steps[name] = mk_step(lk)
        states[name] = mk_state()
    # warmup + lazy-dispatch priming readback (see bench_all._bench_steps)
    for name in variants:
        r = rng
        for i in range(4):
            r, sub = jax.random.split(r)
            states[name], m = steps[name](states[name], ring[i % len(ring)],
                                          sub)
        assert float(jnp.asarray(m["loss"])) == float(jnp.asarray(m["loss"]))
        jax.block_until_ready(states[name].params)

    times = {"dense": [], "compact": []}
    r = rng
    for rd in range(ROUNDS):
        for name in ("dense", "compact"):
            t0 = time.perf_counter()
            for i in range(PER):
                r, sub = jax.random.split(r)
                states[name], m = steps[name](
                    states[name], ring[i % len(ring)], sub)
            jax.block_until_ready(states[name].params)
            times[name].append(time.perf_counter() - t0)

    ratios = sorted(d / c for d, c in zip(times["dense"], times["compact"]))
    med_ratio = ratios[len(ratios) // 2]
    med = {k: sorted(v)[len(v) // 2] for k, v in times.items()}
    BA._record(out, metric=f"ab_compact_{label}",
               value=round(med_ratio, 4),
               unit="dense_time/compact_time (median of paired windows)",
               dense=round(unit_scale * PER / med["dense"], 1),
               compact=round(unit_scale * PER / med["compact"], 1),
               rounds=ROUNDS, unit_throughput=unit,
               config=f"{label} paired-window A/B")
    return med_ratio


def ab_mf(out, ds, opt):
    from arec.config import Config, ModelConfig, TrainConfig
    from arec.data.dataset import mf_batches
    from arec.models.mf import MFSpec, init_mf, mf_loss
    from arec.tables.engine import attrs_to_device
    from arec.train.step import init_state, make_train_step

    cfg = Config(model=ModelConfig(model="mf", dim=64, use_attributes=True),
                 train=TrainConfig(num_sampled=1024))
    spec = MFSpec.from_config(cfg, ds.user_schema, ds.item_schema)
    user_dev = attrs_to_device(ds.user_attrs.restrict(spec.user.schema),
                               spec.user)
    item_dev = attrs_to_device(ds.item_attrs.restrict(spec.item.schema),
                               spec.item)
    ring = []
    for i, b in enumerate(mf_batches(ds, BA.BATCH, 0, 0)):
        ring.append({k: jnp.asarray(v) for k, v in b.items()})
        if i >= 7:
            break

    def mk_step(lk):
        return make_train_step(
            lambda p, b, r: mf_loss(p, spec, user_dev, item_dev, b, r,
                                    lookup_fn=lk), opt, 0.3)

    def mk_state():
        return init_state(init_mf(jax.random.key(0), spec), opt)

    _interleaved_ab(mk_step, mk_state, ring, jax.random.key(1),
                    "mf_b16384", out, BA.BATCH, "examples/s/chip")


def ab_lstm(out, ds, opt):
    from arec.config import Config, ModelConfig, TrainConfig
    from arec.data.dataset import seq_batches
    from arec.models.seq import SeqSpec, init_seq, seq_loss
    from arec.tables.engine import attrs_to_device
    from arec.train.step import init_state, make_train_step

    cfg = Config(model=ModelConfig(model="lstm", dim=64, use_attributes=True,
                                   max_seq_len=BA.L, use_pallas_scan=True),
                 train=TrainConfig(num_sampled=1024))
    sspec = SeqSpec.from_config(cfg, ds.user_schema, ds.item_schema)
    sitem = attrs_to_device(ds.item_attrs.restrict(sspec.item_in.schema),
                            sspec.item_in)
    ring = []
    for i, b in enumerate(seq_batches(ds, BA.SB, BA.L, 0, 0)):
        ring.append({k: jnp.asarray(v) for k, v in b.items()})
        if i >= 7:
            break

    def mk_step(lk):
        return make_train_step(
            lambda p, b, r: seq_loss(p, sspec, sitem, None, b, r,
                                     lookup_fn=lk, time_major=True),
            opt, 0.3)

    def mk_state():
        return init_state(init_seq(jax.random.key(0), sspec), opt)

    _interleaved_ab(mk_step, mk_state, ring, jax.random.key(2),
                    "lstm_b2048", out, BA.SB, "sequences/s/chip")


def main():
    from arec.train.step import make_optimizer
    out = []
    ds = BA._dataset()
    if BA.want("mf"):
        ab_mf(out, ds, make_optimizer("adagrad", 0.3))
    if BA.want("lstm"):
        ab_lstm(out, ds, make_optimizer("adagrad", 0.3))
    with open("BASELINE_RUNS.jsonl", "a") as f:
        for rec in out:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
