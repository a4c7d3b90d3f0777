"""Device mesh construction + multi-host bring-up.

The TPU-native replacement for a distributed-communication backend
(SURVEY.md §2.4): the reference has none (single-process TF1); here all
cross-chip communication is XLA collectives over ICI/DCN, reached through
jit/shard_map on a named mesh.

Mesh axes ("data", "model"):
  * "data"  — batch sharding for the dense path (fusion MLP, LSTM scan,
              losses): pure data parallelism.
  * "model" — row sharding for the embedding tables + item-shard axis for
              full-softmax eval / top-k retrieval (the EP-analog component,
              SURVEY.md §2.3).
A (1, 1) mesh degrades to the single-device path; tests run (2, 4)/(4, 2)
shapes on 8 fake CPU devices (tests/conftest.py).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def multihost_init() -> None:
    """jax.distributed.initialize when launched under a multi-process
    runtime (SURVEY.md §2.4). No-op single-host. Launch contract (what the
    2-process test and a real multi-host job both use): every process sets
    JAX_COORDINATOR_ADDRESS plus JAX_NUM_PROCESSES and JAX_PROCESS_ID, and
    runs the SAME program. Must run before any other jax use (backends
    initialize on first query); a second call in-process is a no-op."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    if jax.distributed.is_initialized():
        return   # e.g. a second Trainer in the same process
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    timeout = int(os.environ.get("AREC_INIT_TIMEOUT_S", "300"))
    try:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc) if nproc else None,
            process_id=int(pid) if pid else None,
            initialization_timeout=timeout)
    except Exception as e:
        # SURVEY.md §5 "multi-host init timeout handling": a host that
        # cannot join must fail LOUDLY with the cluster coordinates — a
        # silent single-process fallback would train a wrong model
        raise RuntimeError(
            f"multi-host bring-up failed (coordinator={addr}, "
            f"process={pid}/{nproc}, timeout={timeout}s — all processes "
            f"must start within it; set AREC_INIT_TIMEOUT_S to extend): "
            f"{e}") from e


def is_primary() -> bool:
    """True on the process that owns singleton side effects (metrics JSONL,
    submission files). Per-host work is NOT gated on this — checkpoints are
    collective (every process saves its addressable shards)."""
    return jax.process_index() == 0


def host_info() -> tuple[int, int]:
    """(host_id, num_hosts) for the per-host input pipeline
    (SURVEY.md §7 "Multi-host input pipeline")."""
    return jax.process_index(), jax.process_count()


def make_mesh(data: int, model: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    need = data * model
    if devices.size < need:
        raise ValueError(
            f"mesh ({data}×{model}) needs {need} devices, have {devices.size}")
    grid = devices[:need].reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))
