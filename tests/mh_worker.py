"""Worker program for the REAL 2-process multi-host test
(tests/test_multiprocess.py). Each process runs this SAME program — the
single-program multi-host contract of SURVEY.md §2.4 — with 4 fake CPU
devices, joining a (2,4) global mesh via jax.distributed (Gloo).

Phases:
  1. train to --steps1 (checkpointing along the way),
  2. a FRESH Trainer restores collectively and trains on to --steps2
     (exercises multi-process orbax save/restore + resume),
  3. process 0 dumps final params + recall to --out (tables gathered with
     process_allgather so the parent can compare against its
     single-process 8-device run).

Usage (parent sets JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID in the env):
    python tests/mh_worker.py --data-dir D --train-dir T --out P.npz \
        --batch 64 --steps1 12 --steps2 18
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def build_cfg(args, max_steps):
    from arec.config import (
        Config, DataConfig, MeshConfig, ModelConfig, TrainConfig,
    )
    return Config(
        data=DataConfig(dataset="synthetic", data_dir=args.data_dir,
                        syn_users=300, syn_items=250, syn_interactions=8000),
        model=ModelConfig(model="mf", dim=16, use_attributes=True),
        train=TrainConfig(batch_size=args.batch, num_sampled=32,
                          n_epoch=4, max_steps=max_steps,
                          steps_per_checkpoint=6,
                          steps_per_dispatch=args.dispatch_k,
                          sparse_update=bool(args.sparse),
                          async_ckpt=bool(args.async_ckpt),
                          compute_dtype="float32",
                          train_dir=args.train_dir),
        mesh=MeshConfig(data=2, model=4, lookup="alltoall",
                        row_shard=args.row_shard),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--train-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps1", type=int, default=12)
    ap.add_argument("--steps2", type=int, default=18)
    ap.add_argument("--dispatch-k", type=int, default=1)
    ap.add_argument("--row-shard", default="contiguous")
    ap.add_argument("--sparse", type=int, default=0)
    ap.add_argument("--async-ckpt", type=int, default=0)
    args = ap.parse_args()

    import numpy as np
    from jax.experimental import multihost_utils

    from arec.train.loop import Trainer

    t1 = Trainer(build_cfg(args, args.steps1))
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    t1.train()
    print(f"[worker {jax.process_index()}] phase1 done at "
          f"{int(t1.state.step)}", flush=True)

    # phase 2: collective restore + resume in a fresh Trainer
    t2 = Trainer(build_cfg(args, args.steps2))
    assert int(t2.state.step) == args.steps1, int(t2.state.step)
    summary = t2.train()
    assert int(t2.state.step) == args.steps2, int(t2.state.step)
    recall = summary["recall_at_k"]
    rows = t2.recommend()
    print(f"[worker {jax.process_index()}] phase2 done "
          f"recall={recall:.6f} rows={len(rows)}", flush=True)

    # gather the full param tree host-side on every process; process 0 dumps
    flat, treedef = jax.tree_util.tree_flatten(t2.state.params)
    gathered = [np.asarray(multihost_utils.process_allgather(x, tiled=True))
                if not getattr(x.sharding, "is_fully_replicated", False)
                else np.asarray(jax.device_get(x))
                for x in flat]
    if jax.process_index() == 0:
        np.savez(args.out,
                 recall=np.float64(recall),
                 n_rows=np.int64(len(rows)),
                 row0_user=np.int64(rows[0][0]),
                 row0=np.asarray(rows[0][1], np.int64),
                 **{f"leaf{i}": g for i, g in enumerate(gathered)})
    print(f"[worker {jax.process_index()}] OK", flush=True)


if __name__ == "__main__":
    sys.exit(main())
