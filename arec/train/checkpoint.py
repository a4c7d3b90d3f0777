"""Checkpoint / resume.

Rebuild of the reference's `tf.train.Saver` flow (SURVEY.md §5: save every
--steps_per_checkpoint into --train_dir, restore latest on startup), upgraded
to Orbax sharded checkpoints: table shards are written per-host from their
device shards (no host gather), and restore re-lays-out onto whatever mesh
the restoring job runs (Orbax reshards from the target shardings).

Saved payload: params, optimizer state, lr_scale, step, plus the data-iterator
position (epoch, step-in-epoch) and the config JSON — restart-from-checkpoint
is exact because the input pipeline is deterministically keyed on
(seed, epoch) (SURVEY.md §5 "Failure detection").
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp

from arec.train.step import TrainState


class Checkpointer:
    def __init__(self, train_dir: str, keep: int = 3):
        self.path = os.path.abspath(os.path.join(train_dir, "ckpt"))
        self.mgr = ocp.CheckpointManager(
            self.path,
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
        self.mgr.wait_until_finished()

    def latest_step(self):
        return self.mgr.latest_step()

    def restore(self, abstract_state: TrainState):
        """abstract_state: jax.eval_shape-style target (with shardings) for
        resharded restore. Returns (state, data_pos, config_json) or None."""
        step = self.mgr.latest_step()
        if step is None:
            return None
        restored = self.mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state._asdict()),
                meta=ocp.args.JsonRestore(),
            ),
        )
        state = TrainState(**restored["state"])
        meta = restored["meta"]
        return state, meta["data_pos"], meta["config"]


def abstract_like(state: TrainState, shardings=None) -> TrainState:
    """ShapeDtypeStruct pytree for resharded restore."""
    def mk(x, s=None):
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s)
    if shardings is None:
        return jax.tree_util.tree_map(mk, state)
    return jax.tree_util.tree_map(mk, state, shardings)
