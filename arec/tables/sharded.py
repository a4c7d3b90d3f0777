"""Row-sharded embedding lookup with explicit all-to-all ID exchange.

The EP-analog core of the rebuild (BASELINE.json:5: "row-sharded across a
multi-host TPU mesh with all-to-all ID exchange and gathered activations fed
into a data-parallel dense path"; SURVEY.md §2.3/§2.4). No counterpart in the
single-device reference.

Protocol (classic DLRM-style exchange, per data-parallel shard):
  0. The request list (replicated across the "model" axis) is split T ways:
     model-device m exchanges only slice m — comm and gather work are 1/T
     per device instead of redundantly repeated.
  1. Each slice's ids are bucketed by owner shard (contiguous row ranges:
     owner = id // rows_per_shard) via one stable sort + rank-in-group.
  2. Request buckets [T, C] are exchanged with all_to_all over the "model"
     axis (rides ICI).
  3. Each shard gathers its local rows for the requests it received.
  4. Rows [T, C, D] are all_to_all'd back and scattered to request order.
  5. Each device returns its result slice; the out_spec
     P(("data","model"), ·) stitches slices back into request order, and
     XLA re-shards downstream consumers as needed (its transpose slices the
     cotangent back per device to start the backward exchange).

Gradient path: every step above is differentiable (gather ↔ scatter-add,
all_to_all ↔ reverse all_to_all), so jax.grad produces the reverse exchange
with duplicate-id accumulation for free; because the table shard enters
shard_map unvarying over "data", its cotangent is psum'd over "data"
automatically. Verified against the single-device path in
tests/test_sharded.py (SURVEY.md §7 "Sparse-grad correctness under
sharding" — the first-listed hard part).

Capacity: each destination bucket holds C = ceil(n · capacity_factor / T)
slots (n = local lookup count). capacity_factor=0 (default) means C = n —
overflow-proof for any id skew, at T× comm volume. Lower factors trade comm
for a drop risk on pathological skew; dropped requests contribute zero
embedding rows (and are counted nowhere — prefer 0 for correctness runs).

The lookup is exposed as a LookupFn (same signature as
arec.tables.engine.dense_lookup) so every model runs unchanged on a mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from arec.dist.specs import DATA_AXIS, TABLE_AXIS


def round_up_rows(rows: int, model_size: int) -> int:
    """Tables are padded to a model-axis multiple so shard_map sees equal
    row shards (extra rows are never addressed: ids < rows)."""
    return -(-rows // model_size) * model_size


def pad_table_rows(table: jnp.ndarray, model_size: int) -> jnp.ndarray:
    pad = round_up_rows(table.shape[0], model_size) - table.shape[0]
    if pad:
        table = jnp.pad(table, ((0, pad), (0, 0)))
    return table


def _bucket_by_owner(ids: jnp.ndarray, num_shards: int, rows_per: int,
                     capacity: int):
    """ids [n] → (send_local [T,C], send_valid [T,C], send_pos [T,C])."""
    n = ids.shape[0]
    owner = ids // rows_per
    local = ids % rows_per
    order = jnp.argsort(owner, stable=True)
    so = owner[order]
    # rank within each owner group (so is sorted)
    rank = jnp.arange(n) - jnp.searchsorted(so, so, side="left")
    send_local = jnp.zeros((num_shards, capacity), jnp.int32)
    send_valid = jnp.zeros((num_shards, capacity), jnp.bool_)
    send_pos = jnp.zeros((num_shards, capacity), jnp.int32)
    send_local = send_local.at[so, rank].set(local[order], mode="drop")
    send_valid = send_valid.at[so, rank].set(True, mode="drop")
    send_pos = send_pos.at[so, rank].set(order.astype(jnp.int32), mode="drop")
    return send_local, send_valid, send_pos


def _exchange_lookup(table_shard: jnp.ndarray, ids: jnp.ndarray,
                     capacity_factor: float):
    """Runs per-device inside shard_map. table_shard [Vp/T, D], ids [n]."""
    T = jax.lax.axis_size(TABLE_AXIS)
    n = ids.shape[0]
    rows_per = table_shard.shape[0]
    if capacity_factor <= 0:
        cap = n
    else:
        cap = max(1, -(-int(n * capacity_factor) // T))
    send_local, send_valid, send_pos = _bucket_by_owner(ids, T, rows_per, cap)

    recv_local = jax.lax.all_to_all(send_local, TABLE_AXIS, 0, 0, tiled=False)
    # mode="clip": recv_local is `id % rows_per` or 0 for pad slots — always
    # in range; avoids the fill-mode select pass over the gathered rows.
    rows = jnp.take(table_shard, recv_local.reshape(-1), axis=0, mode="clip")
    rows = rows.reshape(T, cap, -1)                       # [T, C, D]
    back = jax.lax.all_to_all(rows, TABLE_AXIS, 0, 0, tiled=False)

    flat_pos = send_pos.reshape(-1)
    flat_rows = back.reshape(T * cap, -1) * send_valid.reshape(-1, 1)
    out = jnp.zeros((n, table_shard.shape[1]), flat_rows.dtype)
    # duplicate ids never collide here (send_pos is a permutation of request
    # slots); invalid slots carry zero rows and scatter to position 0.
    return out.at[flat_pos].add(flat_rows)


def make_sharded_lookup(mesh: Mesh, capacity_factor: float = 0.0):
    """Returns a LookupFn (table, ids) -> rows running the all-to-all
    exchange on `mesh`. ids may be any shape; flattened internally."""
    t_model = mesh.shape[TABLE_AXIS]
    t_data = mesh.shape[DATA_AXIS]

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(TABLE_AXIS, None), P(DATA_AXIS)),
        out_specs=P((DATA_AXIS, TABLE_AXIS), None),
    )
    def _lookup_flat(table, flat_ids):
        n = flat_ids.shape[0]                 # divisible by t_model (padded)
        chunk = n // t_model
        me = jax.lax.axis_index(TABLE_AXIS)
        my_ids = jax.lax.dynamic_slice(flat_ids, (me * chunk,), (chunk,))
        return _exchange_lookup(table, my_ids, capacity_factor)

    def lookup(table, ids):
        flat = ids.reshape(-1)
        n = flat.shape[0]
        mult = t_model * t_data
        n_pad = -(-n // mult) * mult
        flat = jnp.pad(flat, (0, n_pad - n))
        rows = _lookup_flat(table, flat)[:n]
        return rows.reshape(*ids.shape, table.shape[1])

    return lookup


def make_gspmd_lookup():
    """Baseline alternative (MeshConfig.lookup='gspmd'): plain jnp.take with
    GSPMD-annotated operands — XLA chooses the collectives. Kept for perf
    comparison and as a correctness cross-check."""
    def lookup(table, ids):
        return jnp.take(table, ids, axis=0, mode="clip")
    return lookup
