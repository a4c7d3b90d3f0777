"""Host-local ↔ global-array bridge for multi-process (multi-host) runs.

SURVEY.md §2.4 mandates single-program multi-host jit over a named mesh;
§7 calls the multi-host input pipeline a hard part. A jit over a mesh that
spans processes only accepts GLOBAL jax.Arrays — a plain `jax.device_put`
of a host-local numpy batch (fine single-process) is wrong at
`jax.process_count() > 1`. This module is the one place that builds global
arrays, in the two shapes the framework needs:

  * `shard_from_hosts(local, sharding)` — each process contributes ITS OWN
    disjoint slab of the global batch (the per-host input iterators of
    arec.data.dataset yield exactly that). Wraps
    `jax.make_array_from_process_local_data`; no cross-host data motion —
    each host's rows land on its own devices and the collective work
    happens inside the jitted step, over ICI/DCN.
  * `put_replicated_global(full, sharding)` — every process holds the FULL
    array (deterministic same-seed init, restored checkpoints, item-latent
    matrices) and the sharding picks which slice each device keeps. Wraps
    `jax.make_array_from_callback`, so each process materializes only its
    addressable shards.

Single-process, both degrade to `jax.device_put` — callers never branch.

Verified by a REAL 2-process run in tests/test_multiprocess.py (CPU Gloo
collectives, 4 fake devices per process): loss/param parity with the
single-process 8-device mesh, plus save/restore.
"""

from __future__ import annotations

import jax
import numpy as np


def multiprocess() -> bool:
    return jax.process_count() > 1


def shard_from_hosts(local, sharding) -> jax.Array:
    """Per-process local slab → global array laid out by `sharding`: the
    batch axis (wherever the sharding's pspec names a process-spanning mesh
    axis — leading for [B, ...] batches, axis 1 for K-stacked [K, B, ...])
    must be sharded so each process's devices own exactly its slab — true
    for P("data")-style specs on a data-major mesh built by make_mesh.
    Global shape is inferred from the local slab + sharding (equal slabs
    per process)."""
    local = np.asarray(local)
    if not multiprocess():
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)


def put_replicated_global(full, sharding) -> jax.Array:
    """Full array present on every process → global array under `sharding`
    (each process materializes only its addressable shards)."""
    if not multiprocess():
        return jax.device_put(full, sharding)
    if hasattr(full, "addressable_shards") and not isinstance(
            full, np.ndarray):
        # already a global jax.Array: reshard through jit (device_put-style
        # eager resharding is not process-spanning-safe)
        return jax.jit(lambda x: x, out_shardings=sharding)(full)
    full = np.asarray(full)
    return jax.make_array_from_callback(
        full.shape, sharding, lambda idx: full[idx])


def tree_put_replicated(tree, shardings):
    """put_replicated_global over matching pytrees."""
    return jax.tree_util.tree_map(put_replicated_global, tree, shardings)


def all_hosts_concat(x) -> np.ndarray:
    """Global (possibly data-sharded) array → full numpy array on EVERY
    process (recommend-mode output assembly). Single-process: device_get."""
    if not multiprocess():
        return np.asarray(jax.device_get(x))
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
