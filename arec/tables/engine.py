"""Embedding-table engine: tables, lookup, mulhot pooling, entity encoding.

Rebuild of the heart of the reference — the `EmbeddingAttribute` class
(SURVEY.md §2.1 "Attribute-embedding engine"): one embedding table per
(entity-type, attribute); batch of entity ids → per-attribute embeddings;
mulhot pooling; fusion into a single entity latent.

TPU-first departures from the TF1 design:
  * All state is a flat pytree of arrays (no tf.Variable graph state); the
    whole encode is pure and jit-traceable.
  * **Fused storage**: all of an entity's attribute tables live in ONE
    row-concatenated table with static per-field row offsets. The reference
    does one embedding_lookup per attribute; on TPU each gather/scatter is
    op overhead, so one fused [B, n_cat]-gather serves every cat attribute
    and one [B, total_deg]-gather serves every mulhot attribute (measured
    2.5× step-time win at 8 attrs). The backward is correspondingly two
    scatter-adds, and the sharded path needs one all-to-all exchange per
    entity instead of one per attribute.
  * Mulhot pooling is a dense gather over padded-dense values + mask-mean
    (segment_sum over CSR in the reference, SURVEY.md §3.5) — static shapes,
    XLA-tileable.
  * **Dense fast path for small vocabularies**: for any field (cat OR
    mulhot) with vocab ≤ dense_mulhot_threshold, the lookup/pooling is
    algebraically a (one-hot / normalized-multihot) row times the
    sub-table: pooled = M[ids] @ T_f. All such fields share ONE combined
    constant map [N+1, Σ vocab_f], so the whole small-vocab side is one
    data-row gather plus per-field MXU matmuls, and every table gradient
    becomes Mᵀ@dout — no scatter at all. (The per-value gather + scatter-add
    transpose was the measured 3.3 ms/step hot spot at batch 16k; this path
    removed it: 6.84 → 3.71 ms.) Large vocabularies — entity IDs, XING
    tags — keep the gather path.
  * The row-gather itself is pluggable (`lookup_fn`): the single-device path
    uses jnp.take; the multi-chip path swaps in the all-to-all sharded
    lookup (arec/tables/sharded.py) without touching any model code.

One embedding forward (SURVEY.md §3.5):
    ids[B] → cat attrs:    one gather of table rows at [B, n_cat] fused ids
           → mulhot attrs: one gather at [B, total_deg] + per-field mask-mean
           → fuse: concat(+proj) | sum  → entity latent [B, D]
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from arec.data.schema import CAT, MULHOT, AttributeData, EntitySchema
from arec.fusion.fuse import apply_fusion, init_fusion

Params = dict
LookupFn = Callable[[jnp.ndarray], jnp.ndarray]

FUSED = "__fused__"


@dataclass(frozen=True)
class EncoderSpec:
    """Static configuration of one entity encoder (user-side or item-side)."""

    schema: EntitySchema
    dim: int
    fusion: str = "concat"      # {concat, sum}
    nonlinear: bool = False
    with_bias: bool = False     # candidate-side encoders: a per-entity bias
                                # scalar lives in COLUMN `dim` of the fused
                                # table (meaningful only on the entity-ID
                                # field's rows), so bias lookup + gradient
                                # ride the existing row gather/scatter. A
                                # separate [V] bias array costs a 1-D gather
                                # + scatter that is row-op-bound on TPU
                                # (measured 0.23 ms/step at batch 16k — as
                                # much as the whole table scatter).
    dense_mulhot_threshold: int = 512   # vocab ≤ this → multihot-matmul pooling
    # The dense map costs 4·(N+1)·vocab_f bytes of HBM per field; cap it so
    # huge entity counts (XING: ~1.5M users) never trade a gather for GBs.
    dense_map_max_bytes: int = 256 << 20

    @property
    def needs_proj(self) -> bool:
        # Single-attribute concat without nonlinearity is the identity —
        # config 1/3 (ID-only, BASELINE.json:7,9) then reduces to classic MF.
        return self.fusion == "concat" and (
            len(self.schema.fields) > 1 or self.nonlinear
        )

    # ---- fused-table layout (static) -------------------------------------
    # Dense (small-vocab) fields occupy a contiguous PREFIX of the fused
    # table, gather fields the tail. This makes the sparse-update path
    # (arec/train/sparse.py) trivial: the prefix is updated densely (it is
    # small and touched every step), and only the batch's unique gather rows
    # are touched in the tail — per-step optimizer cost O(touched·D), not
    # O(vocab·D).
    @property
    def layout_fields(self):
        """Schema fields in fused-table layout order (dense prefix first)."""
        return self.dense_fields + [
            f for f in self.schema.fields if not self._is_dense(f)]

    @property
    def dense_region_rows(self) -> int:
        """Rows of the dense prefix (0 when no field is dense)."""
        return sum(f.table_rows for f in self.dense_fields)

    def field_offsets(self) -> dict[str, int]:
        """Row offset of each field's sub-table inside the fused table."""
        off, out = 0, {}
        for f in self.layout_fields:
            out[f.name] = off
            off += f.table_rows
        return out

    @property
    def total_rows(self) -> int:
        return sum(f.table_rows for f in self.schema.fields)

    @property
    def width(self) -> int:
        """Fused-table row width: dim (+1 bias column when with_bias)."""
        return self.dim + (1 if self.with_bias else 0)

    @property
    def cat_fields(self):
        return [f for f in self.schema.fields if f.kind == CAT]

    @property
    def mulhot_fields(self):
        return [f for f in self.schema.fields if f.kind == MULHOT]

    def _is_dense(self, f) -> bool:
        map_bytes = 4 * (self.schema.num_entities + 1) * f.vocab_size
        return (f.vocab_size <= self.dense_mulhot_threshold
                and map_bytes <= self.dense_map_max_bytes)

    @property
    def dense_fields(self):
        """Small-vocab fields (any kind) served by the dense map."""
        return [f for f in self.schema.fields if self._is_dense(f)]

    @property
    def gather_cat_fields(self):
        return [f for f in self.cat_fields if not self._is_dense(f)]

    def is_identity(self, f) -> bool:
        """True for the entity-ID field: its entity→value map is the
        identity (prep contract — schema.py AttributeData.id_identity), so
        its fused row ids are computed ARITHMETICALLY (flat + offset) instead
        of through an indirection gather. On TPU the 1-wide s32 gather was a
        measured 0.12 ms/step at batch 16k — as expensive as a full table
        scatter — and this removes it entirely. attrs_to_device asserts the
        data really is the identity before the column is dropped."""
        return (f is self.schema.fields[0] and f.kind == CAT
                and f.vocab_size == self.schema.num_entities)

    @property
    def identity_cat_fields(self):
        return [f for f in self.gather_cat_fields if self.is_identity(f)]

    @property
    def gathered_cat_fields(self):
        """Large-vocab cat fields that still need the indirection gather
        (columns of attr_dev["cat"], in this order)."""
        return [f for f in self.gather_cat_fields if not self.is_identity(f)]

    @property
    def gather_mulhot_fields(self):
        return [f for f in self.mulhot_fields if not self._is_dense(f)]


def init_encoder(key: jax.Array, spec: EncoderSpec) -> Params:
    """One fused table ~ N(0, 1/sqrt(dim)) with every PAD row zeroed
    (and the bias column, when present, zero-initialized)."""
    k_table, k_fuse = jax.random.split(key)
    t = jax.random.normal(k_table, (spec.total_rows, spec.width), jnp.float32)
    t = t / jnp.sqrt(spec.dim)
    if spec.with_bias:
        t = t.at[:, spec.dim].set(0.0)
    offsets = spec.field_offsets()
    pad_rows = np.array([offsets[f.name] + f.pad_index
                         for f in spec.schema.fields])
    t = t.at[pad_rows].set(0.0)
    params: Params = {"tables": {FUSED: t}}
    if spec.needs_proj:
        params["fusion"] = init_fusion(
            k_fuse, len(spec.schema.fields), spec.dim, spec.nonlinear)
    return params


def attrs_to_device(attrs: AttributeData,
                    spec: EncoderSpec | None = None) -> dict[str, jnp.ndarray]:
    """Device-resident attribute value maps in the fused-table id space,
    with ONE EXTRA pad entity row (entity id == num_entities) so
    sequence-pad ids are safe to look up: the pad entity maps every
    attribute to its (zeroed) PAD row / an all-invalid mulhot row.

    Returns {"cat":   int32 [N+1, n_big_cat]     (large-vocab cat fields),
             "mul":   int32 [N+1, total_deg]     (large-vocab mulhot fields),
             "dense": float32 [N+1, Σ vocab_f]}  (ALL small-vocab fields:
    one-hot / normalized-multihot rows — lookup+pooling as a linear map).
    Keys are present only when their field group is non-empty.
    """
    if spec is None:
        spec = EncoderSpec(attrs.schema, dim=1)
    offsets = spec.field_offsets()
    n = attrs.schema.num_entities
    out: dict[str, jnp.ndarray] = {}

    for f in spec.identity_cat_fields:
        assert np.array_equal(attrs.values[f.name],
                              np.arange(n, dtype=np.int32)), (
            f"{f.name}: schema position 0 with vocab == num_entities must be "
            f"the identity map (schema.py id_identity prep contract)")
    if spec.gathered_cat_fields:
        cat_cols = []
        for f in spec.gathered_cat_fields:
            v = attrs.values[f.name].astype(np.int64) + offsets[f.name]
            v = np.concatenate([v, [offsets[f.name] + f.pad_index]])
            cat_cols.append(v)
        out["cat"] = jnp.asarray(np.stack(cat_cols, axis=1).astype(np.int32))

    if spec.gather_mulhot_fields:
        mul_cols = []
        for f in spec.gather_mulhot_fields:
            v = attrs.values[f.name].astype(np.int64)
            v = np.where(v >= 0, v + offsets[f.name], -1)
            pad_row = np.full((1, f.max_degree), -1, np.int64)
            mul_cols.append(np.concatenate([v, pad_row], axis=0))
        out["mul"] = jnp.asarray(
            np.concatenate(mul_cols, axis=1).astype(np.int32))

    if spec.dense_fields:
        blocks = []
        for f in spec.dense_fields:
            m = np.zeros((n + 1, f.vocab_size), np.float32)
            if f.kind == CAT:
                m[np.arange(n), attrs.values[f.name]] = 1.0
                # pad-entity row (index n) stays all-zero → zero embedding
            else:
                v = attrs.values[f.name]
                rows = np.repeat(np.arange(n), f.max_degree).reshape(
                    n, f.max_degree)
                valid = v >= 0
                np.add.at(m, (rows[valid], v[valid]), 1.0)
                denom = np.maximum(m.sum(axis=1, keepdims=True), 1.0)
                m = m / denom
            blocks.append(m)
        out["dense"] = jnp.asarray(np.concatenate(blocks, axis=1))
    return out


def dense_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Single-device row gather (the reference's embedding_lookup analog).

    mode="clip": ids are in-range by construction (pad ids address a real
    zeroed pad row, engine tables always carry one), and jnp.take's default
    "fill" mode lowers on TPU to clamp + gather + a full-width select over
    the gathered [N, D] rows — a pure extra read+write of every gathered
    byte (measured 103 µs/step on the flagship LSTM, 21 µs on MF)."""
    return jnp.take(table, ids, axis=0, mode="clip")


def make_compact_lookup() -> LookupFn:
    """Gradient-compacting lookup (TrainConfig.compact_table_grads): sort +
    unique the request ids, gather UNIQUE rows with the sorted/unique XLA
    hints, broadcast back through the inverse map.

    Forward result is bit-identical to dense_lookup. The point is the
    BACKWARD shape: the inverse-map transpose segment-sums duplicate-id
    cotangents into a compact [n, D] buffer, and the table scatter-add then
    sees sorted, collision-free indices (unique_indices=True,
    indices_are_sorted=True) — the "in-step unique + segment-sum grad
    compaction feeding one conflict-free scatter" attack on the table-grad
    frontier (BASELINE.md xplane section: scatters are 27%/24% of the
    flagship MF/LSTM steps, with ~3× duplication at the LSTM shape).
    Costs one sort of the id vector per lookup call; A/B against the plain
    path on the real chip is recorded in BASELINE.md (tools/ab_compact.py),
    and the plain path stays the default where it wins."""
    def lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
        flat = ids.reshape(-1)
        n = flat.shape[0]
        total = table.shape[0]
        order = jnp.argsort(flat)
        s = flat[order]
        first = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
        slot = jnp.cumsum(first) - 1
        # trailing slots → OOB sentinel: gather zero-fills them and their
        # scatter-transpose DROPS (never aliases a real row — an in-range
        # sentinel would violate the unique_indices contract)
        uniq = jnp.full((n,), total, flat.dtype).at[slot].set(s)
        inv = jnp.zeros((n,), jnp.int32).at[order].set(
            slot.astype(jnp.int32))
        rows_u = table.at[uniq].get(mode="fill", fill_value=0,
                                    unique_indices=True,
                                    indices_are_sorted=True)
        return jnp.take(rows_u, inv, axis=0).reshape(
            *ids.shape, table.shape[1])
    return lookup


def encode(
    params: Params,
    spec: EncoderSpec,
    attr_dev: dict[str, jnp.ndarray],
    ids: jnp.ndarray,
    lookup_fn: LookupFn = dense_lookup,
    dropout_rng: jax.Array | None = None,
    keep_prob: float = 1.0,
    act_dtype=None,
) -> jnp.ndarray:
    """ids int32 [...] (values in [0, num_entities]; num_entities = pad)
    → entity latents float32 [..., dim]. Pad ids encode to exactly zero.

    act_dtype: activation dtype for the TRAIN path (TrainConfig.act_dtype).
    When set (bf16), every batch-side intermediate after the row gathers —
    gathered rows, pooled mulhot means, the fusion concat/proj — is cast to
    it, halving the HBM traffic of the ~8 MB [32768, 64] intermediates the
    round-3 closing profile names as the top busy-time lever (BASELINE.md).
    Tables and their gradients stay float32 (optimizer precision). None =
    float32 throughout — the eval/serving default and the A/B oracle."""
    latent, _ = _encode_impl(params, spec, attr_dev, ids, lookup_fn,
                             dropout_rng, keep_prob, act_dtype)
    return latent


def encode_with_bias(
    params: Params,
    spec: EncoderSpec,
    attr_dev: dict[str, jnp.ndarray],
    ids: jnp.ndarray,
    lookup_fn: LookupFn = dense_lookup,
    dropout_rng: jax.Array | None = None,
    keep_prob: float = 1.0,
    act_dtype=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(latents [..., dim], bias [...]) — candidate-side encode. The bias
    scalar is column `dim` of the entity-ID field's row (EncoderSpec
    with_bias), so it arrives in the SAME row gather as the embedding: no
    separate 1-D bias gather/scatter exists anywhere in the step."""
    assert spec.with_bias, "encode_with_bias needs EncoderSpec.with_bias"
    return _encode_impl(params, spec, attr_dev, ids, lookup_fn,
                        dropout_rng, keep_prob, act_dtype)


def _encode_impl(
    params: Params,
    spec: EncoderSpec,
    attr_dev: dict[str, jnp.ndarray],
    ids: jnp.ndarray,
    lookup_fn: LookupFn = dense_lookup,
    dropout_rng: jax.Array | None = None,
    keep_prob: float = 1.0,
    act_dtype=None,
):
    batch_shape = ids.shape
    flat = ids.reshape(-1)
    table = params["tables"][FUSED]
    d = spec.width
    # activation cast, fused by XLA into each gather/matmul producer so the
    # f32 row values never materialize batch-side (see encode docstring)
    acast = (lambda a: a.astype(act_dtype)) if act_dtype is not None else (
        lambda a: a)

    # one gather for every large-vocab cat attribute. Entity-ID fields skip
    # the indirection map: their fused row id is flat + offset (see
    # EncoderSpec.is_identity).
    cat_rows = None
    if spec.gather_cat_fields:
        offsets = spec.field_offsets()
        gathered = attr_dev["cat"][flat] if spec.gathered_cat_fields else None
        cols, gi = [], 0
        for f in spec.gather_cat_fields:
            if spec.is_identity(f):
                off = offsets[f.name]
                cols.append(jnp.where(flat < f.vocab_size, flat + off,
                                      off + f.pad_index).astype(jnp.int32))
            else:
                cols.append(gathered[:, gi])
                gi += 1
        cat_ids = jnp.stack(cols, axis=1)                   # [N, n_cat]
        cat_rows = acast(lookup_fn(table, cat_ids.reshape(-1)))
        cat_rows = cat_rows.reshape(*cat_ids.shape, d)      # [N, n_cat, D]

    # large-vocab mulhot: one gather + per-field mask-mean
    pooled: dict[str, jnp.ndarray] = {}
    if spec.gather_mulhot_fields:
        mul_ids = attr_dev["mul"][flat]                     # [N, total_deg]
        safe = jnp.where(mul_ids >= 0, mul_ids, 0)
        rows = acast(lookup_fn(table, safe.reshape(-1)))
        rows = rows.reshape(*mul_ids.shape, d)              # [N, deg, D]
        mask = (mul_ids >= 0).astype(rows.dtype)[..., None]
        rows = rows * mask
        col = 0
        for f in spec.gather_mulhot_fields:
            sl_rows = rows[:, col:col + f.max_degree]
            sl_mask = mask[:, col:col + f.max_degree]
            denom = jnp.maximum(sl_mask.sum(axis=-2), 1.0)
            pooled[f.name] = acast(sl_rows.sum(axis=-2) / denom)
            col += f.max_degree

    # small-vocab fields (cat + mulhot): one-hot/multihot rows × sub-table —
    # per-field MXU matmuls, no gather; the table gradient is Mᵀ@dout, no
    # scatter. The sub-table slices are static, so under a row-sharded table
    # GSPMD resolves them with at most a tiny all-gather of the touched rows.
    if spec.dense_fields:
        offsets = spec.field_offsets()
        mrow = attr_dev["dense"][flat]                      # [N, Σ vocab_f]
        col = 0
        for f in spec.dense_fields:
            m = mrow[:, col:col + f.vocab_size]
            sub = jax.lax.slice_in_dim(table, offsets[f.name],
                                       offsets[f.name] + f.vocab_size)
            pooled[f.name] = acast(jnp.dot(
                acast(m), acast(sub), preferred_element_type=jnp.float32))
            col += f.vocab_size

    # per-attribute embeddings in schema field order (fusion contract);
    # with_bias rows carry the bias scalar in column spec.dim (the entity-ID
    # field — field 0 — owns it), sliced off before fusion
    per_attr: list[jnp.ndarray] = []
    bias = None
    ci = 0
    for fi, f in enumerate(spec.schema.fields):
        row = pooled[f.name] if f.name in pooled else cat_rows[:, ci]
        if f.name not in pooled:
            ci += 1
        if spec.with_bias:
            if fi == 0:
                bias = row[:, spec.dim]
            row = row[:, : spec.dim]
        per_attr.append(row)

    latent = apply_fusion(
        params.get("fusion"), per_attr,
        kind=spec.fusion, nonlinear=spec.nonlinear,
        dropout_rng=dropout_rng, keep_prob=keep_prob,
        act_dtype=act_dtype,
    )
    # pad entities (id == num_entities) encode to zero
    valid = (flat < spec.schema.num_entities).astype(latent.dtype)[:, None]
    latent = (latent * valid).reshape(*batch_shape, spec.dim)
    if bias is not None:
        # bias is a per-row scalar (negligible traffic) consumed in f32 by
        # every loss — return it f32 regardless of the activation dtype
        bias = (bias.astype(jnp.float32)
                * valid[:, 0].astype(jnp.float32)).reshape(batch_shape)
    return latent, bias


# ---------------------------------------------------------------------------
# Sparse-update support (arec/train/sparse.py): work on a SUBSET table
# [dense prefix ++ the step's unique gather rows] so gradients and optimizer
# traffic are O(touched rows), not O(vocab). The fused layout puts dense
# fields in a prefix (EncoderSpec.layout_fields), so encode's dense fast
# path (static slices) works on the subset unchanged.
# ---------------------------------------------------------------------------

def gather_row_ids(spec: EncoderSpec, attr_dev: dict, ids: jnp.ndarray
                   ) -> jnp.ndarray:
    """Every fused-table row id the GATHER path touches for entity `ids`.

    Invalid mulhot slots map to the OOB sentinel `total_rows`, NOT to the
    row 0 that encode's masked gather requests: their contribution is
    mask-zeroed (zero gradient), so they are not touched rows. Mapping
    them to 0 was a real bug when a dense prefix exists — row 0 is then a
    prefix row, and the touched-rows scatter of its (zero-grad) update
    slot OVERWROTE the prefix update of row 0 every step
    (tests/test_sparse.py mixed-threshold parametrizations)."""
    flat = ids.reshape(-1)
    parts = []
    if spec.gather_cat_fields:
        offsets = spec.field_offsets()
        for f in spec.identity_cat_fields:
            off = offsets[f.name]
            parts.append(jnp.where(flat < f.vocab_size, flat + off,
                                   off + f.pad_index).astype(jnp.int32))
        if spec.gathered_cat_fields:
            parts.append(attr_dev["cat"][flat].reshape(-1))
    if spec.gather_mulhot_fields:
        m = attr_dev["mul"][flat].reshape(-1)
        parts.append(jnp.where(m >= 0, m, spec.total_rows))
    if not parts:
        return jnp.zeros((0,), jnp.int32)
    return jnp.concatenate(parts)


def unique_rows(ids: jnp.ndarray, sentinel: int,
                cap: int | None = None) -> jnp.ndarray:
    """Sorted-unique with static shape: trailing slots become `sentinel`
    (pass total_rows — OOB, so scatters drop and gathers zero-fill).

    One sort + a cumsum compaction (no second sort: every duplicate
    occurrence writes the SAME value to the same slot, so the compaction
    scatter is order-independent).

    cap: PROVABLE static upper bound on the unique count (see
    gather_unique_bound) — the output is truncated to [cap]. TPU row
    scatters/gathers are descriptor-bound, so every downstream touched-rows
    op pays per SLOT, not per live row: at the XING rehearsal shape the
    id vector is 133k slots but the provable unique bound is ~14k (tag
    vocab 4096 + candidates), and the uncapped vector made the packed
    scatter the #1 op in the step trace (7.1 ms of a 39 ms step)."""
    if ids.shape[0] == 0:
        return ids
    s = jnp.sort(ids)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), s[1:] != s[:-1]])
    slot = jnp.cumsum(first) - 1                  # unique-group index
    out = jnp.full_like(s, sentinel)
    out = out.at[slot].set(s)
    if cap is not None and cap < out.shape[0]:
        # sound by construction: slot < unique count ≤ cap, so no live
        # unique value can land beyond out[:cap]
        out = out[:cap]
    return out


def gather_unique_bound(spec: EncoderSpec, n_ids: int) -> int:
    """Static upper bound on the number of UNIQUE fused-table rows the
    gather path can touch for a batch of `n_ids` entity ids: per field,
    at most min(#ids drawn for it, its table rows). Tight for small-vocab
    gather fields (XING tags), where it shrinks every touched-rows
    scatter/gather by ~10× (see unique_rows)."""
    b = 0
    for f in spec.identity_cat_fields:
        b += min(n_ids, f.table_rows)
    for f in spec.gathered_cat_fields:
        b += min(n_ids, f.table_rows)
    for f in spec.gather_mulhot_fields:
        b += min(n_ids * f.max_degree, f.table_rows)
    return b


def build_subset(table: jnp.ndarray, uids: jnp.ndarray, prefix_rows: int
                 ) -> jnp.ndarray:
    """[prefix ++ table[uids]] — the differentiable sub-table. OOB sentinel
    uids produce zero rows (never addressed by lookups). Degenerate cases
    (no gather fields / no dense prefix) skip the empty op entirely."""
    if uids.shape[0] == 0:
        return table[:prefix_rows]
    tail = table.at[uids].get(mode="fill", fill_value=0,
                              unique_indices=True, indices_are_sorted=True)
    if prefix_rows == 0:
        return tail
    return jnp.concatenate([table[:prefix_rows], tail], axis=0)


def subset_pos_map(uids: jnp.ndarray, total_rows: int,
                   prefix_rows: int) -> jnp.ndarray:
    """Dense id→subset-position map [total_rows] int32. One 4-byte-per-row
    pass — 64×+ cheaper than any table-width pass, and it turns every
    subsequent lookup into a single O(1) gather instead of a binary search
    (searchsorted cost ~2.7 ms/step at batch 16k, measured)."""
    base = jnp.arange(total_rows, dtype=jnp.int32)
    pos = jnp.where(base < prefix_rows, base, 0)
    slots = prefix_rows + jnp.arange(uids.shape[0], dtype=jnp.int32)
    return pos.at[uids].set(slots, mode="drop",
                            unique_indices=True, indices_are_sorted=True)


def make_subset_lookup(pos_map: jnp.ndarray, prefix_rows: int) -> LookupFn:
    """LookupFn over the subset table via the dense position map."""
    def lookup(sub: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
        return sub[pos_map[ids.reshape(-1)]].reshape(
            *ids.shape, sub.shape[1])
    return lookup


def encode_all_items(
    params: Params,
    spec: EncoderSpec,
    attr_dev: dict[str, jnp.ndarray],
    block: int = 8192,
    lookup_fn: LookupFn = dense_lookup,
) -> jnp.ndarray:
    """All-item latent matrix V [num_items, D] for full-softmax eval and
    retrieval (SURVEY.md §3.3). Blocked with lax.map to bound peak memory on
    large vocabularies; pads the vocab up to a block multiple then trims."""
    n = spec.schema.num_entities
    nb = -(-n // block)
    ids = jnp.arange(nb * block, dtype=jnp.int32)
    ids = jnp.minimum(ids, n)  # tail pads encode to zero, trimmed below
    out = jax.lax.map(
        lambda b: encode(params, spec, attr_dev, b, lookup_fn),
        ids.reshape(nb, block),
    )
    return out.reshape(nb * block, spec.dim)[:n]


def encode_all_items_with_bias(
    params: Params,
    spec: EncoderSpec,
    attr_dev: dict[str, jnp.ndarray],
    block: int = 8192,
    lookup_fn: LookupFn = dense_lookup,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(V [num_items, D], bias [num_items]) — with_bias counterpart of
    encode_all_items for full-softmax eval / retrieval."""
    n = spec.schema.num_entities
    nb = -(-n // block)
    ids = jnp.arange(nb * block, dtype=jnp.int32)
    ids = jnp.minimum(ids, n)
    v, b = jax.lax.map(
        lambda blk: encode_with_bias(params, spec, attr_dev, blk, lookup_fn),
        ids.reshape(nb, block),
    )
    return (v.reshape(nb * block, spec.dim)[:n],
            b.reshape(nb * block)[:n])
