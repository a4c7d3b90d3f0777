"""Measure Recommender.refresh() at XING scale (VERDICT r4 task 5): the
serving object must follow training without a rebuild — expected cost
≈ checkpoint restore + ~2 s item-latent encode, with NO recompile and NO
second multi-GB residency peak (the rebuild alternative measured ~41 s
trainer init + encode, and 4 concurrent rebuilds OOM'd in round 4).

Method: the anchor train_dir holds two checkpoints (mid-run + final). The
newest step directory is temporarily moved aside so the Recommender
starts on the OLDER checkpoint; moving it back and calling refresh() then
exercises a true newer-checkpoint refresh at full scale. The move happens
outside orbax's view — Checkpointer.reload() (which refresh calls) is
exactly what makes the reappeared step visible, so this measures the
production code path, not a test hook.

Usage:
    python tools/ab_refresh.py --config configs/syn_xing_full.json \
        --set mesh.data=1 --set mesh.model=1 \
        --set train.train_dir=_train/anchor_xf_ce
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from arec.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def main(argv=None) -> int:
    import numpy as np

    from arec.cli.main import load_config, parse_args
    from arec.serve import Recommender
    from arec.train.checkpoint import Checkpointer

    args = parse_args(argv)
    cfg = load_config(args)
    ck_dir = os.path.join(cfg.train.train_dir, "ckpt")
    steps = sorted(int(d) for d in os.listdir(ck_dir) if d.isdigit())
    if len(steps) < 2:
        print(f"need >=2 checkpoints under {ck_dir}, have {steps}",
              file=sys.stderr)
        return 1
    newest = steps[-1]
    hidden = os.path.join(cfg.train.train_dir, f".hidden_{newest}")
    shutil.move(os.path.join(ck_dir, str(newest)), hidden)
    try:
        t0 = time.perf_counter()
        rec = Recommender(cfg, serve_batch=256, seen_width=64)
        t_build = time.perf_counter() - t0
        assert rec._restored_step == steps[-2], rec._restored_step
        users = np.arange(256, dtype=np.int32)
        rec.for_users(users)                      # warm the serve jit
        t0 = time.perf_counter()
        ids_old = rec.for_users(users)
        t_serve_old = time.perf_counter() - t0
    finally:
        shutil.move(hidden, os.path.join(ck_dir, str(newest)))

    step_fn = rec._step
    t0 = time.perf_counter()
    changed = rec.refresh()
    t_refresh = time.perf_counter() - t0
    assert changed and rec._restored_step == newest, rec._restored_step
    assert rec._step is step_fn                   # no rebuild of the jit
    t0 = time.perf_counter()
    ids_new = rec.for_users(users)                # same shapes → cache hit
    t_serve_new = time.perf_counter() - t0

    # cross-check: a fresh Checkpointer agrees the served step is newest
    assert Checkpointer(cfg.train.train_dir).latest_step() == newest
    print(json.dumps({
        "build_s": round(t_build, 2),
        "refresh_s": round(t_refresh, 2),
        "refresh_vs_build": round(t_refresh / t_build, 3),
        "serve_ms_before": round(t_serve_old * 1e3, 1),
        "serve_ms_after": round(t_serve_new * 1e3, 1),
        "ids_changed": bool((ids_old != ids_new).any()),
        "from_step": steps[-2], "to_step": newest,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
