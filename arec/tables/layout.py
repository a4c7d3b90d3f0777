"""Row→shard placement for row-sharded embedding tables.

With contiguous-range ownership (owner = row // rows_per_shard) and
frequency-ranked entity ids, EVERY hot row of a table lands on shard 0 —
worst-case request skew exactly where a finite exchange capacity bites
hardest, and a real multi-chip gather/comm ceiling (SURVEY.md §2.3 lists
"by ID mod/contiguous-range" as the two placements to support).

This module implements the balanced placement as a FIXED MULTIPLICATIVE
PERMUTATION of the gather-region rows:

    pi(j) = prefix + (j - prefix) * a  mod R        for j in [prefix, prefix+R)
    pi(j) = j                                        for j <  prefix

with a ~= golden_ratio * R chosen coprime to R. Properties that make this
the right mechanism on TPU:

  * Mesh-shape independent: (a, R) depend only on the table's static layout,
    so a checkpoint-resident table permutes identically on any mesh — and
    the canonical on-disk layout stays NATURAL (the Trainer un-permutes at
    save, re-permutes at restore), so checkpoints move freely between mesh
    shapes, single-device runs, and both row_shard modes.
  * Arithmetic, not a lookup array: the id remap is computed in-kernel by a
    constant-unrolled double-and-add mulmod in uint32 (exact for R < 2^31 —
    a plain 32-bit multiply would overflow for R > ~46k). No [V]-sized
    permutation array exists, so nothing is inlined into the HLO (remote
    compile keeps payloads small) and nothing new needs checkpointing.
  * Golden-stride scattering: a contiguous hot head j = 0..H-1 maps to the
    low-discrepancy sequence {j*a mod R}, so each of T shards owns ~H/T hot
    rows for ANY T (an `id % T` placement achieves this too, but bakes T
    into the layout; a small-stride permutation would leave short heads
    clustered on one shard).
  * The dense small-vocab prefix (engine.py fused-layout contract) stays
    identity: its rows are served by STATIC slices of the table, never by
    the row gather, so only the gather region is permuted.

Balance on zipf ids is A/B-measured in tests/test_layout.py and
BASELINE.md; contiguous placement remains available (MeshConfig.row_shard
= "contiguous") as the differential-testing oracle.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

_GOLDEN = 0.6180339887498949


def _pick_multiplier(r: int) -> int:
    """Odd multiplier near golden_ratio * r, coprime to r."""
    a = max(1, int(r * _GOLDEN)) | 1
    while math.gcd(a, r) != 1:
        a += 2
    return a % r if r > 1 else 0


@dataclass(frozen=True)
class RowPerm:
    """Static description of one table's row permutation.

    prefix: identity region (the engine's dense small-vocab prefix rows).
    r:      permuted region length (gather-region rows).
    a:      multiplier, gcd(a, r) == 1.
    """

    prefix: int
    r: int
    a: int

    @staticmethod
    def for_rows(total_rows: int, prefix_rows: int = 0) -> "RowPerm | None":
        r = total_rows - prefix_rows
        if r <= 2:
            return None
        return RowPerm(prefix_rows, r, _pick_multiplier(r))

    # ---- device-side id remap (inside jit) --------------------------------
    def apply_ids(self, ids: jnp.ndarray) -> jnp.ndarray:
        """Natural fused row ids -> permuted row ids. Exact for any
        r < 2^31: the (id * a) mod r product is evaluated by a
        double-and-add chain unrolled over the STATIC multiplier's bits,
        every intermediate < 2r <= 2^32 (uint32)."""
        tail = (ids - self.prefix).astype(jnp.uint32)
        acc = _mulmod_const(tail, self.a, self.r)
        out = self.prefix + acc.astype(ids.dtype)
        return jnp.where(ids < self.prefix, ids, out)

    # ---- host-side whole-table permutes (init / checkpoint boundary) ------
    def perm_index(self) -> np.ndarray:
        """pi as an int64 index array over [0, prefix + r)."""
        j = np.arange(self.r, dtype=np.int64)
        tail = self.prefix + (j * self.a) % self.r
        return np.concatenate([np.arange(self.prefix, dtype=np.int64), tail])

    def inv_index(self) -> np.ndarray:
        p = self.perm_index()
        inv = np.empty_like(p)
        inv[p] = np.arange(p.shape[0], dtype=np.int64)
        return inv

    def permute_table(self, table, inverse: bool = False):
        """Rearrange table rows natural->permuted layout (or back).
        Rows beyond prefix+r (mesh padding) stay in place. Works on numpy
        or jax arrays; one whole-table gather — init/checkpoint-time only."""
        n = self.prefix + self.r
        # new[pi(i)] = old[i]  <=>  new = old[pi^{-1}]
        idx = self.perm_index() if inverse else self.inv_index()
        if isinstance(table, np.ndarray):
            head = table[:n][idx]
            return np.concatenate([head, table[n:]], axis=0)
        head = jnp.take(table[:n], jnp.asarray(idx, jnp.int32), axis=0)
        if table.shape[0] == n:
            return head
        return jnp.concatenate([head, table[n:]], axis=0)


def _mulmod_const(x: jnp.ndarray, a: int, r: int) -> jnp.ndarray:
    """(x * a) mod r for uint32 x < r, static ints a < r < 2^31.

    Unrolled double-and-add over a's bits: acc, sh < r at every step, so
    acc + sh < 2r <= 2^32 and 2*sh < 2^32 never overflow uint32. The
    trace-time unroll is <= 31 cheap VPU ops on an id vector — noise next
    to the D-wide row movement it load-balances."""
    r32 = jnp.uint32(r)
    acc = jnp.zeros_like(x)
    sh = jnp.where(x >= r32, x - r32, x)  # tolerate x == r (OOB sentinels)
    while a:
        if a & 1:
            s = acc + sh
            acc = jnp.where(s >= r32, s - r32, s)
        a >>= 1
        if a:
            d = sh + sh
            sh = jnp.where(d >= r32, d - r32, d)
    return acc
