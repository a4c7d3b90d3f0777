"""Scaling-efficiency harness (SURVEY.md §6 / BASELINE.json:5: examples/s
measured at 1 chip, 1 host, and ≥2 hosts; target ≥80% efficiency 1-host →
multi-host).

Runs the flagship attribute-aware MF config's SHARDED train step at a list
of ("data","model") mesh shapes with a FIXED per-data-shard batch (weak
scaling), and reports examples/s plus efficiency relative to the first
shape:

    efficiency(M) = (ex/s at M) / (chips(M)/chips(base) × ex/s at base)

On a real TPU slice this runs unmodified over the slice's devices (multi-
host: launch one process per host; jax.distributed.initialize is called by
the Trainer). Without a slice, `--fake N` forces the CPU backend with N
virtual devices — that validates the collectives and the harness, not TPU
efficiency numbers (CPU all-to-all is not ICI; do not quote them).

Appends one JSON record per mesh shape to BASELINE_RUNS.jsonl.

Usage:
    python bench_scaling.py --fake 8 --mesh 1x1 --mesh 2x1 --mesh 2x4
    python bench_scaling.py --mesh 1x1 --mesh 4x2   # real devices
    # REAL multi-process run (the ≥2-hosts measurement path; CPU numbers
    # validate the harness + global-array plumbing, not ICI efficiency):
    python bench_scaling.py --mp-launch 2 --fake 4 --mesh 8x1
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time


def _mp_launch(args) -> None:
    """Spawn N copies of this script as a jax.distributed cluster (one
    'host' per process, each with --fake devices); process 0's records are
    streamed through."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    argv = [sys.executable, "-u", os.path.abspath(__file__),
            "--fake", str(args.fake)]
    for m in args.mesh:
        argv += ["--mesh", m]
    argv += ["--per-shard-batch", str(args.per_shard_batch),
             "--steps", str(args.steps)]
    procs = []
    for i in range(args.mp_launch):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = str(args.mp_launch)
        env["JAX_PROCESS_ID"] = str(i)
        procs.append(subprocess.Popen(
            argv, env=env,
            stdout=None if i == 0 else subprocess.DEVNULL,
            stderr=subprocess.STDOUT if i == 0 else subprocess.DEVNULL))
    rc = [p.wait() for p in procs]
    sys.exit(max(rc))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", action="append", default=[],
                    help="DxM mesh shape, repeatable (default: 1x1 and "
                         "all-devices x 1)")
    ap.add_argument("--fake", type=int, default=0,
                    help="force CPU backend with N virtual devices "
                         "(per process under --mp-launch)")
    ap.add_argument("--per-shard-batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--mp-launch", type=int, default=0,
                    help="spawn N processes as a jax.distributed cluster "
                         "and run the shapes over their GLOBAL devices")
    args = ap.parse_args()
    if args.mp_launch:
        _mp_launch(args)

    if args.fake:
        import os
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.fake}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from arec.dist.mesh import multihost_init

    multihost_init()   # BEFORE any backend query (jax.distributed contract)
    import jax.numpy as jnp

    from arec.config import Config, DataConfig, MeshConfig, ModelConfig, \
        TrainConfig
    from arec.train.loop import Trainer

    n_dev = jax.device_count()
    n_proc = jax.process_count()
    shapes = [tuple(map(int, m.split("x"))) for m in args.mesh]
    if not shapes:
        shapes = [(1, 1), (n_dev, 1)]

    records = []
    for data, model in shapes:
        if data * model > n_dev:
            print(f"skip mesh ({data},{model}): only {n_dev} devices")
            continue
        if n_proc > 1 and data * model != n_dev:
            print(f"skip mesh ({data},{model}): a multi-process run needs "
                  f"the mesh to span all {n_dev} global devices")
            continue
        gbatch = args.per_shard_batch * data
        cfg = Config(
            data=DataConfig(dataset="synthetic", data_dir="_data",
                            syn_users=60000, syn_items=20000,
                            syn_interactions=600000),
            model=ModelConfig(model="mf", dim=64, use_attributes=True),
            train=TrainConfig(batch_size=gbatch, learning_rate=0.3,
                              num_sampled=1024,
                              train_dir=f"/tmp/arec_scale_{data}x{model}"),
            mesh=MeshConfig(data=data, model=model),
        )
        tr = Trainer(cfg)
        ring = []
        for b in tr._batches(0):
            # Trainer staging: multi-process global arrays + DEVS_KEY
            ring.append(tr._stage_batch(
                {k: jnp.asarray(v) for k, v in b.items()}
                if tr.num_hosts == 1 else b))
            if len(ring) == 4:
                break
        rng = jax.random.key(7)
        state = tr.state
        for i in range(5):  # warmup + compile
            rng, sub = jax.random.split(rng)
            state, _ = tr.step_fn(state, ring[i % len(ring)], sub)
        jax.block_until_ready(state.params)
        times = []
        per = max(1, args.steps // 5)
        for w in range(5):
            t0 = time.perf_counter()
            for i in range(per):
                rng, sub = jax.random.split(rng)
                state, _ = tr.step_fn(state, ring[i % len(ring)], sub)
            jax.block_until_ready(state.params)
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[2] / per
        eps = gbatch / dt
        chips = data * model
        records.append({"metric": "scaling_examples_per_s", "value": round(eps, 1),
                        "unit": "examples/s",
                        "config": f"mesh=({data},{model}) chips={chips} "
                                  f"hosts={n_proc} "
                                  f"per-shard-batch={args.per_shard_batch} "
                                  f"backend={jax.default_backend()}"})
        if jax.process_index() == 0:
            print(json.dumps(records[-1]))

    if len(records) > 1:
        base = records[0]
        base_chips = int(base["config"].split("chips=")[1].split()[0])
        for rec in records[1:]:
            chips = int(rec["config"].split("chips=")[1].split()[0])
            eff = rec["value"] / (base["value"] * chips / base_chips)
            out = {"metric": "scaling_efficiency", "value": round(eff, 4),
                   "unit": "ratio",
                   "config": f"{rec['config']} vs {base['config']}"}
            records.append(out)
            if jax.process_index() == 0:
                print(json.dumps(out))

    if jax.process_index() == 0:
        with open("BASELINE_RUNS.jsonl", "a") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
