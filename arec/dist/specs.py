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

# Reserved batch key carrying the device attribute maps ({"user": attr_dev,
# "item": attr_dev}) INTO the jitted step as an argument. Why: a jitted
# function that merely closes over these arrays inlines them into the HLO
# as constants — at XING cardinality the [1.5M, deg] mulhot indirection
# maps alone exceed the remote compiler's request limit (HTTP 413, the
# CLAUDE.md gotcha, hit for real in the round-3 full-scale rehearsal).
# The Trainer attaches this key at dispatch; loss/step cores fall back to
# their closures when it is absent (small-attr tests and benches).
DEVS_KEY = "__devs__"


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
    """P("data", ...) on every batch tensor; the reserved DEVS_KEY subtree
    (attribute maps) is replicated."""
    out = {k: jax.tree_util.tree_map(
        (lambda leaf: P()) if k == DEVS_KEY else
        (lambda leaf: P(DATA_AXIS, *([None] * (leaf.ndim - 1)))), v)
        for k, v in batch.items()}
    return out


def stacked_pspec(batch):
    """P(None, "data", ...) on every K-stacked [K, B, ...] batch tensor
    (steps_per_dispatch > 1: the scan axis is unsharded, the batch axis
    keeps its data sharding); DEVS_KEY (never stacked) is replicated."""
    return {k: jax.tree_util.tree_map(
        (lambda leaf: P()) if k == DEVS_KEY else
        (lambda leaf: P(None, DATA_AXIS, *([None] * (leaf.ndim - 2)))), v)
        for k, v in batch.items()}


def shardings(mesh, pspecs):
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), pspecs,
        is_leaf=lambda x: isinstance(x, P))
