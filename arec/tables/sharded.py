"""Row-sharded embedding lookup with explicit all-to-all ID exchange.

The EP-analog core of the rebuild (BASELINE.json:5: "row-sharded across a
multi-host TPU mesh with all-to-all ID exchange and gathered activations fed
into a data-parallel dense path"; SURVEY.md §2.3/§2.4). No counterpart in the
single-device reference.

Protocol (classic DLRM-style exchange, per data-parallel shard):
  0. The request list (replicated across the "model" axis) is split T ways:
     model-device m exchanges only slice m — comm and gather work are 1/T
     per device instead of redundantly repeated.
  1. (dedup=True, the default) the slice's ids are uniqued per step
     (SURVEY.md §7 step 5 "dedupe IDs per step before exchange"): one sort +
     cumsum compaction; only unique ids enter the exchange, and the result
     rows are broadcast back through the inverse map. The gradient benefit
     is structural: the inverse-map transpose SEGMENT-SUMS duplicate-id
     cotangents locally BEFORE the reverse all-to-all, so the owner-side
     scatter-add sees collision-free indices.
  2. Each id is bucketed by owner shard via one stable sort + rank-in-group.
     Ownership is contiguous over STORED rows (owner = stored_row //
     rows_per_shard); with MeshConfig.row_shard="shuffle" the caller passes
     a RowPerm (arec.tables.layout) so stored rows are a fixed permutation
     of natural rows and hot frequency-ranked ids spread ~uniformly across
     shards instead of all landing on shard 0.
  3. Request buckets [T, C] are exchanged with all_to_all over the "model"
     axis (rides ICI).
  4. Each shard gathers its local rows for the requests it received.
  5. Rows [T, C, D] are all_to_all'd back and scattered to request order.
  6. Each device returns its result slice; the out_spec
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
slots (n = local lookup count). ONLY capacity_factor=0 (C = n, the default)
is overflow-proof for arbitrary id skew: factor 1.0 silently zeroed 39% of
zipf(1.3) lookups on a (2,4) mesh with contiguous placement
(tests/test_sharded.py::test_capacity_overflow_regression). Factors > 0
trade comm volume for that risk; every overflowed request is COUNTED —
jax.debug.callback into EXCHANGE_DROPS, surfaced as `exchange_dropped` in
the Trainer's step metrics and warned about on first occurrence — never
silent.

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
from arec.tables.layout import RowPerm


class _DropCounter:
    """Host-side accumulator for overflowed exchange requests (fed by
    jax.debug.callback, one callback per device per step; callbacks are
    emitted only when capacity_factor > 0, so the overflow-proof default
    pays zero instrumentation cost)."""

    def __init__(self):
        self.total = 0
        self._warned = False

    def add(self, n) -> None:
        n = int(n)
        if n and not self._warned:
            self._warned = True
            print(f"[exchange] WARNING: {n} lookup request(s) overflowed "
                  f"their all-to-all capacity bucket and returned ZERO rows "
                  f"this step. Raise mesh.capacity_factor (0 = overflow-"
                  f"proof). Total is tracked in step metrics as "
                  f"'exchange_dropped'.", flush=True)
        self.total += n

    def read_and_reset(self) -> int:
        n, self.total = self.total, 0
        return n


EXCHANGE_DROPS = _DropCounter()


def round_up_rows(rows: int, model_size: int) -> int:
    """Tables are padded to a model-axis multiple so shard_map sees equal
    row shards (extra rows are never addressed: ids < rows)."""
    return -(-rows // model_size) * model_size


def pad_table_rows(table: jnp.ndarray, model_size: int) -> jnp.ndarray:
    pad = round_up_rows(table.shape[0], model_size) - table.shape[0]
    if pad:
        table = jnp.pad(table, ((0, pad), (0, 0)))
    return table


def _bucket_by_owner(ids: jnp.ndarray, valid: jnp.ndarray | None,
                     num_shards: int, rows_per: int, capacity: int):
    """ids [n] → (send_local [T,C], send_valid [T,C], send_pos [T,C],
    dropped [n] bool — True where a VALID request found no bucket slot)."""
    n = ids.shape[0]
    owner = ids // rows_per
    if valid is not None:
        owner = jnp.where(valid, owner, num_shards)   # invalid → OOB group
    local = ids % rows_per
    order = jnp.argsort(owner, stable=True)
    so = owner[order]
    # rank within each owner group (so is sorted)
    rank = jnp.arange(n) - jnp.searchsorted(so, so, side="left")
    send_local = jnp.zeros((num_shards, capacity), jnp.int32)
    send_valid = jnp.zeros((num_shards, capacity), jnp.bool_)
    send_pos = jnp.zeros((num_shards, capacity), jnp.int32)
    # mode="drop": both the OOB owner group (invalid/dedup-pad slots) and
    # rank >= capacity (bucket overflow) fall out here
    send_local = send_local.at[so, rank].set(local[order], mode="drop")
    send_valid = send_valid.at[so, rank].set(True, mode="drop")
    send_pos = send_pos.at[so, rank].set(order.astype(jnp.int32), mode="drop")
    overflow = (so < num_shards) & (rank >= capacity)
    dropped = jnp.zeros((n,), jnp.bool_).at[order].set(overflow)
    return send_local, send_valid, send_pos, dropped


def _dedup_ids(ids: jnp.ndarray):
    """Static-shape unique: (uniq [n], valid [n], inv [n]) with
    ids == uniq[inv]; trailing uniq slots are value-0 with valid=False.
    One sort + a cumsum compaction (duplicate occurrences write the SAME
    value to the same slot, so the scatter is order-independent)."""
    n = ids.shape[0]
    order = jnp.argsort(ids)
    s = ids[order]
    first = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    slot = jnp.cumsum(first) - 1
    uniq = jnp.zeros((n,), ids.dtype).at[slot].set(s)
    valid = jnp.arange(n) < slot[-1] + 1
    inv = jnp.zeros((n,), jnp.int32).at[order].set(slot.astype(jnp.int32))
    return uniq, valid, inv


def _exchange_lookup(table_shard: jnp.ndarray, ids: jnp.ndarray,
                     capacity_factor: float, dedup: bool):
    """Runs per-device inside shard_map. table_shard [Vp/T, D], ids [n]."""
    T = jax.lax.axis_size(TABLE_AXIS)
    n = ids.shape[0]
    rows_per = table_shard.shape[0]
    if capacity_factor <= 0:
        cap = n
    else:
        cap = max(1, -(-int(n * capacity_factor) // T))

    valid = inv = None
    if dedup:
        ids, valid, inv = _dedup_ids(ids)

    send_local, send_valid, send_pos, dropped = _bucket_by_owner(
        ids, valid, T, rows_per, cap)
    if capacity_factor > 0:
        # overflow accounting in REQUEST units (a dropped unique id drops
        # every duplicate request behind it)
        n_drop = jnp.sum(dropped[inv]) if dedup else jnp.sum(dropped)
        jax.debug.callback(EXCHANGE_DROPS.add, n_drop)

    recv_local = jax.lax.all_to_all(send_local, TABLE_AXIS, 0, 0, tiled=False)
    # mode="clip": recv_local is `stored_row % rows_per` or 0 for pad slots —
    # always in range; avoids the fill-mode select pass over gathered rows.
    rows = jnp.take(table_shard, recv_local.reshape(-1), axis=0, mode="clip")
    rows = rows.reshape(T, cap, -1)                       # [T, C, D]
    back = jax.lax.all_to_all(rows, TABLE_AXIS, 0, 0, tiled=False)

    flat_pos = send_pos.reshape(-1)
    flat_rows = back.reshape(T * cap, -1) * send_valid.reshape(-1, 1)
    out = jnp.zeros((n, table_shard.shape[1]), flat_rows.dtype)
    # ids are distinct per slot here (post-dedup) or send_pos is a
    # permutation of request slots; invalid slots carry zero rows and
    # scatter to position 0.
    out = out.at[flat_pos].add(flat_rows)
    if dedup:
        # broadcast unique rows back to request order; the transpose of this
        # gather segment-sums duplicate-id cotangents BEFORE the reverse
        # exchange — the sharded-gradient compaction half of dedup's win
        out = jnp.take(out, inv, axis=0)
    return out


def make_sharded_lookup(mesh: Mesh, capacity_factor: float = 0.0,
                        dedup: bool = True, perm: RowPerm | None = None):
    """Returns a LookupFn (table, ids) -> rows running the all-to-all
    exchange on `mesh`. ids may be any shape; flattened internally.
    `perm`: table rows are STORED in RowPerm layout (row_shard="shuffle");
    request ids are remapped arithmetically before bucketing."""
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
        return _exchange_lookup(table, my_ids, capacity_factor, dedup)

    def lookup(table, ids):
        flat = ids.reshape(-1)
        if perm is not None:
            flat = perm.apply_ids(flat)
        n = flat.shape[0]
        mult = t_model * t_data
        n_pad = -(-n // mult) * mult
        flat = jnp.pad(flat, (0, n_pad - n))
        rows = _lookup_flat(table, flat)[:n]
        return rows.reshape(*ids.shape, table.shape[1])

    return lookup


def make_perm_dense_lookup(perm: RowPerm):
    """Single-pass jnp.take through a RowPerm — the eval/GSPMD-path
    counterpart of dense_lookup for tables stored in shuffle layout."""
    def lookup(table, ids):
        pid = perm.apply_ids(ids.reshape(-1)).reshape(ids.shape)
        return jnp.take(table, pid, axis=0, mode="clip")
    return lookup


def make_gspmd_lookup():
    """Baseline alternative (MeshConfig.lookup='gspmd'): plain jnp.take with
    GSPMD-annotated operands — XLA chooses the collectives. Kept for perf
    comparison and as a correctness cross-check."""
    def lookup(table, ids):
        return jnp.take(table, ids, axis=0, mode="clip")
    return lookup
