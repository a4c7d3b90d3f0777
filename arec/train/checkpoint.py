"""Checkpoint / resume.

Rebuild of the reference's `tf.train.Saver` flow (SURVEY.md §5: save every
--steps_per_checkpoint into --train_dir, restore latest on startup), upgraded
to Orbax sharded checkpoints: table shards are written per-host from their
device shards (no host gather), and restore re-lays-out onto whatever mesh
the restoring job runs (Orbax reshards from the target shardings).

Cross-mesh-shape restore (SURVEY.md §5 "restore onto a possibly different
mesh shape via resharding"): sharded tables are row-padded to a multiple of
the mesh's model-axis size (arec.tables.sharded.pad_table_rows), so a
checkpoint saved on mesh (d, m) can have different table ROW COUNTS than the
restoring job's target (e.g. V=250 pads to 250 on m=2 but 252 on m=4).
`Checkpointer.restore` detects this from the checkpoint's array metadata,
restores at the saved shapes, then slices/zero-pads axis 0 to the target
shape and device_puts onto the target shardings. Pad rows are never
addressed by any lookup (ids < true rows) and carry zero gradient, so this
adaptation is semantically exact. Mismatched leaves are staged through host
memory on one device — fine up to mid-size tables; a production multi-host
restore of a table that cannot fit one host should keep the mesh model-axis
size fixed instead.

Saved payload: params, optimizer state, lr_scale, step, plus the data-iterator
position (epoch, step-in-epoch) and the config JSON — restart-from-checkpoint
is exact because the input pipeline is deterministically keyed on
(seed, epoch) (SURVEY.md §5 "Failure detection").
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from arec.train.step import TrainState


def _saved_abstract(target, md):
    """Mirror `target` (a pytree of ShapeDtypeStruct) with the SAVED shapes
    from orbax ArrayMetadata `md`. Orbax metadata represents namedtuples as
    dicts keyed by field name, tuples as lists, empty containers as
    None/absent."""
    if target is None:
        return None
    if isinstance(target, dict):
        if not target:
            return {}
        return {k: _saved_abstract(v, md[k]) for k, v in target.items()}
    if hasattr(target, "_fields"):  # namedtuple (optax states)
        if not target._fields:
            return type(target)()
        return type(target)(*(_saved_abstract(getattr(target, f), md[f])
                              for f in target._fields))
    if isinstance(target, (list, tuple)):
        return type(target)(_saved_abstract(v, md[i])
                            for i, v in enumerate(target))
    saved_shape = tuple(md.shape)
    if saved_shape == tuple(target.shape):
        return target  # keep target sharding for the common case
    # mismatched leaf: restore at the saved shape on one local device
    # (topology-safe), adapted + resharded by _adapt_leaf afterwards
    return jax.ShapeDtypeStruct(
        saved_shape, target.dtype,
        sharding=jax.sharding.SingleDeviceSharding(jax.local_devices()[0]))


def _adapt_leaf(restored, target):
    """Slice / zero-pad axis 0 of a restored array to the target shape, then
    lay out on the target sharding (row-count changes come from per-mesh
    table padding; any other mismatch is a config error)."""
    if restored is None or tuple(restored.shape) == tuple(target.shape):
        if getattr(target, "sharding", None) is not None and restored is not None:
            return jax.device_put(restored, target.sharding)
        return restored
    if (restored.ndim != len(target.shape)
            or tuple(restored.shape[1:]) != tuple(target.shape[1:])):
        raise ValueError(
            f"checkpoint/model shape mismatch beyond row padding: "
            f"saved {tuple(restored.shape)} vs target {tuple(target.shape)}")
    rows = target.shape[0]
    arr = np.asarray(jax.device_get(restored))
    if arr.shape[0] >= rows:
        arr = arr[:rows]
    else:
        arr = np.concatenate(
            [arr, np.zeros((rows - arr.shape[0],) + arr.shape[1:],
                           arr.dtype)], axis=0)
    out = jnp.asarray(arr)
    if getattr(target, "sharding", None) is not None:
        out = jax.device_put(out, target.sharding)
    return out


class Checkpointer:
    def __init__(self, train_dir: str, keep: int = 3,
                 async_save: bool = False):
        """async_save (train.async_ckpt): save() returns after orbax's
        blocking portion (device→host snapshot — donation-safe: the next
        step may overwrite device buffers immediately) and the directory
        write/finalize runs on orbax's background thread. Callers that
        need durability (final save, anything reading latest_step for
        decisions) call drain() first; orbax itself serializes a new
        save against an in-flight one."""
        self.path = os.path.abspath(os.path.join(train_dir, "ckpt"))
        self.async_save = async_save
        self.mgr = ocp.CheckpointManager(
            self.path,
            # handlers registered up front so a FRESH manager can serve
            # item_metadata() before any restore (cross-mesh shape probe)
            item_handlers={"state": ocp.StandardCheckpointHandler(),
                           "meta": ocp.JsonCheckpointHandler()},
            options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                                 create=True),
        )

    def save(self, step: int, state: TrainState, data_pos: dict,
             config_json: str) -> None:
        self.mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state._asdict()),
                meta=ocp.args.JsonSave({"data_pos": data_pos,
                                        "config": config_json}),
            ),
        )
        if not self.async_save:
            self.mgr.wait_until_finished()

    def drain(self) -> None:
        """Block until any in-flight async save is finalized and visible
        to latest_step()/restore()."""
        self.mgr.wait_until_finished()

    def latest_step(self):
        return self.mgr.latest_step()

    def reload(self):
        """Re-scan the directory for steps written by ANOTHER process or
        manager (orbax caches its step list at construction) — the serving
        refresh path polls through this."""
        self.mgr.reload()

    def restore(self, abstract_state: TrainState):
        """abstract_state: jax.eval_shape-style target (with shardings) for
        resharded restore. Returns (state, data_pos, config_json) or None.

        Tolerates row-count differences from per-mesh table padding (see
        module docstring): the checkpoint is restored at its saved shapes
        and adapted to the target."""
        self.mgr.wait_until_finished()   # an in-flight async save must win
        step = self.mgr.latest_step()
        if step is None:
            return None
        target = abstract_state._asdict()
        saved, mismatch = target, False
        try:
            md = self.mgr.item_metadata(step).state
            md_tree = md.tree if hasattr(md, "tree") else md
            if md_tree is None:
                raise ValueError("no state metadata in checkpoint")
            saved = _saved_abstract(target, md_tree)
            mismatch = any(
                tuple(s.shape) != tuple(t.shape)
                for s, t in zip(jax.tree_util.tree_leaves(saved),
                                jax.tree_util.tree_leaves(target)))
        except Exception as e:  # metadata probe is best-effort
            saved, mismatch = target, False
            print(f"[ckpt] shape metadata probe failed ({e!r}); "
                  f"strict-shape restore", flush=True)
        if mismatch:
            print("[ckpt] saved table shapes differ from target "
                  "(mesh-shape change): adapting row padding", flush=True)
        restored = self.mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(saved if mismatch else target),
                meta=ocp.args.JsonRestore(),
            ),
        )
        rstate = restored["state"]
        if mismatch:
            rstate = jax.tree_util.tree_map(_adapt_leaf, rstate, target)
        state = TrainState(**rstate)
        meta = restored["meta"]
        return state, meta["data_pos"], meta["config"]


def abstract_like(state: TrainState, shardings=None) -> TrainState:
    """ShapeDtypeStruct pytree for resharded restore.

    Leaves always carry a CONCRETE sharding: with sharding=None orbax falls
    back to the sharding file saved WITH the checkpoint, which names the
    saving job's devices — restoring a TPU-written checkpoint in a CPU
    process (or any different topology) then fails with "sharding ...
    Got None". Defaulting to the local device makes restore
    platform-portable (the trainer re-lays-out afterwards as needed)."""
    dev = jax.local_devices()[0]
    def mk(x, s=None):
        if s is None:
            s = jax.sharding.SingleDeviceSharding(dev)
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s)
    if shardings is None:
        return jax.tree_util.tree_map(mk, state)
    return jax.tree_util.tree_map(mk, state, shardings)
