"""PartitionSpec conventions for the whole framework.

One place decides how every parameter and batch tensor is laid out on the
("data", "model") mesh (cf. SNIPPETS.md pattern [1] — spec helpers keyed on
parameter identity):

  * Embedding tables (any leaf under a "tables" subtree, the LSTM "item_out"
    output table) — row-sharded: P("model", None). These are the multi-GB
    state; row sharding is the whole point (BASELINE.json:5).
  * Everything else (fusion MLP, RNN weights, biases) — replicated: P().
    The dense path is deliberately data-parallel only (TP/PP are N/A at
    these dims — SURVEY.md §2.3).
  * Batch tensors — P("data") on the leading axis.

Tables are row-PADDED to a multiple of the model-axis size at init
(see arec.tables.sharded.round_up_rows) so shard_map sees equal shards.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TABLE_AXIS = "model"

TABLE_SPEC = P(TABLE_AXIS, None)
REPLICATED = P()


def _is_table_path(path) -> bool:
    keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    return ("tables" in keys) or ("item_out" in keys)


def param_pspecs(params):
    """PartitionSpec pytree matching a model params pytree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: TABLE_SPEC if _is_table_path(path) else REPLICATED,
        params,
    )


def batch_pspec(batch):
    """P("data", ...) on every batch tensor."""
    return jax.tree_util.tree_map(
        lambda leaf: P(DATA_AXIS, *([None] * (leaf.ndim - 1))), batch)


def stacked_pspec(batch):
    """P(None, "data", ...) on every K-stacked [K, B, ...] batch tensor
    (steps_per_dispatch > 1: the scan axis is unsharded, the batch axis
    keeps its data sharding)."""
    return jax.tree_util.tree_map(
        lambda leaf: P(None, DATA_AXIS, *([None] * (leaf.ndim - 2))), batch)


def shardings(mesh, pspecs):
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), pspecs,
        is_leaf=lambda x: isinstance(x, P))
