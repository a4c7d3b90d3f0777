"""train.async_ckpt A/B at XING scale: how much of the 1.27 GB
checkpoint save is orbax's blocking portion (device→host snapshot —
unavoidable training stall) vs the background directory write the async
flag hides?

One TPU process, one measurement each (a checkpoint save is a one-shot
heavyweight op — interleaved windows don't apply; the round-3 rehearsal's
195 s sync save is the reference point).

Usage: python tools/ab_async_ckpt.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from arec.compile_cache import enable_compile_cache

enable_compile_cache()

from arec.config import Config
from arec.train.checkpoint import Checkpointer

CFG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "configs", "syn_xing_full.json")


def rec(**kw):
    kw["t"] = round(time.time(), 1)
    print(json.dumps(kw), flush=True)
    if jax.default_backend() == "tpu":
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BASELINE_RUNS.jsonl"),
                "a") as f:
            f.write(json.dumps(kw) + "\n")


def main():
    import shutil
    from arec.train.loop import Trainer
    cfg = Config.from_json(open(CFG).read()).override({
        "mesh.data": "1", "mesh.model": "1",
        "train.train_dir": "_train/syn_xf_ackpt"})
    # stale checkpoints make orbax skip older-step saves (all-zero
    # timings) and the trainer restore — measure from a clean dir
    shutil.rmtree(cfg.train.train_dir, ignore_errors=True)
    tr = Trainer(cfg)
    state = tr._canonical_state(tr.state)
    pos = {"epoch": 0, "step_in_epoch": 0}
    js = tr.cfg.to_json()

    # async FIRST: a prior save leaves host-side array copies cached
    # (jax.Array caches device_get results), making a second save's
    # snapshot read 0 s — measured, see BASELINE.md round 4
    ck_async = Checkpointer(cfg.train.train_dir, async_save=True)
    t0 = time.perf_counter()
    ck_async.save(1, state, pos, js)
    dispatch_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    ck_async.drain()
    drain_s = time.perf_counter() - t0

    ck_sync = Checkpointer(cfg.train.train_dir, async_save=False)
    t0 = time.perf_counter()
    ck_sync.save(2, state, pos, js)
    sync_s = time.perf_counter() - t0

    rec(metric="xing_full_async_ckpt_save_s",
        async_dispatch_s=round(dispatch_s, 1),
        async_drain_s=round(drain_s, 1),
        sync_s_cached_host=round(sync_s, 1),
        stall_reduction_vs_rehearsal=round(195.4 / max(dispatch_s, 1e-9),
                                           1))


if __name__ == "__main__":
    main()
