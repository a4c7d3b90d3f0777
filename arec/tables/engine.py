"""Embedding-table engine: tables, lookup, mulhot pooling, entity encoding.

Rebuild of the heart of the reference — the `EmbeddingAttribute` class
(SURVEY.md §2.1 "Attribute-embedding engine"): one embedding table per
(entity-type, attribute); batch of entity ids → per-attribute embeddings;
mulhot pooling; fusion into a single entity latent.

TPU-first departures from the TF1 design:
  * All state is a flat pytree of arrays (no tf.Variable graph state); the
    whole encode is pure and jit-traceable.
  * Mulhot pooling is a dense gather over padded-dense values + mask-mean
    (segment_sum over CSR in the reference, SURVEY.md §3.5) — static shapes,
    XLA-tileable.
  * The row-gather itself is pluggable (`lookup_fn`): the single-device path
    uses jnp.take; the multi-chip path swaps in the all-to-all sharded lookup
    (arec/tables/sharded.py) without touching any model code.

One embedding forward (SURVEY.md §3.5):
    ids[B] → per cat attr:    table[attr_value[id]]              (gather)
           → per mulhot attr: mean over valid of table[values[id, :]]
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
LookupFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


@dataclass(frozen=True)
class EncoderSpec:
    """Static configuration of one entity encoder (user-side or item-side)."""

    schema: EntitySchema
    dim: int
    fusion: str = "concat"      # {concat, sum}
    nonlinear: bool = False

    @property
    def needs_proj(self) -> bool:
        # Single-attribute concat without nonlinearity is the identity —
        # config 1/3 (ID-only, BASELINE.json:7,9) then reduces to classic MF.
        return self.fusion == "concat" and (
            len(self.schema.fields) > 1 or self.nonlinear
        )


def init_encoder(key: jax.Array, spec: EncoderSpec) -> Params:
    """Tables ~ N(0, 1/sqrt(dim)) with the PAD row zeroed; fusion params."""
    keys = jax.random.split(key, len(spec.schema.fields) + 1)
    tables = {}
    for f, k in zip(spec.schema.fields, keys[:-1]):
        t = jax.random.normal(k, (f.table_rows, spec.dim), jnp.float32)
        t = t / jnp.sqrt(spec.dim)
        tables[f.name] = t.at[f.pad_index].set(0.0)
    params: Params = {"tables": tables}
    if spec.needs_proj:
        params["fusion"] = init_fusion(
            keys[-1], len(spec.schema.fields), spec.dim, spec.nonlinear
        )
    return params


def attrs_to_device(attrs: AttributeData) -> dict[str, jnp.ndarray]:
    """Device-resident attribute value maps, with ONE EXTRA pad entity row
    (entity id == num_entities) so sequence-pad ids are safe to look up:
    the pad entity maps every attribute to its PAD table row / zero length.
    """
    out: dict[str, jnp.ndarray] = {}
    for f in attrs.schema.fields:
        v = attrs.values[f.name]
        if f.kind == CAT:
            out[f"{f.name}/values"] = jnp.asarray(
                np.concatenate([v, [f.pad_index]]).astype(np.int32))
        else:
            pad_row = np.full((1, f.max_degree), -1, np.int32)
            out[f"{f.name}/values"] = jnp.asarray(
                np.concatenate([v, pad_row], axis=0))
            out[f"{f.name}/lengths"] = jnp.asarray(
                np.concatenate([attrs.lengths[f.name], [0]]).astype(np.int32))
    return out


def dense_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Single-device row gather (the reference's embedding_lookup analog)."""
    return jnp.take(table, ids, axis=0)


def encode(
    params: Params,
    spec: EncoderSpec,
    attr_dev: dict[str, jnp.ndarray],
    ids: jnp.ndarray,
    lookup_fn: LookupFn = dense_lookup,
    dropout_rng: jax.Array | None = None,
    keep_prob: float = 1.0,
) -> jnp.ndarray:
    """ids int32 [...] (values in [0, num_entities]; num_entities = pad)
    → entity latents float32 [..., dim]. Pad ids encode to exactly zero."""
    batch_shape = ids.shape
    flat = ids.reshape(-1)
    per_attr: list[jnp.ndarray] = []
    for f in spec.schema.fields:
        vals = attr_dev[f"{f.name}/values"][flat]
        table = params["tables"][f.name]
        if f.kind == CAT:
            emb = lookup_fn(table, vals)                        # [N, D]
        else:
            safe = jnp.where(vals >= 0, vals, f.pad_index)      # [N, deg]
            rows = lookup_fn(table, safe.reshape(-1))
            rows = rows.reshape(*vals.shape, spec.dim)          # [N, deg, D]
            mask = (vals >= 0).astype(rows.dtype)[..., None]
            denom = jnp.maximum(mask.sum(axis=-2), 1.0)         # [N, 1]
            emb = (rows * mask).sum(axis=-2) / denom            # mask-mean
        per_attr.append(emb)

    latent = apply_fusion(
        params.get("fusion"), per_attr,
        kind=spec.fusion, nonlinear=spec.nonlinear,
        dropout_rng=dropout_rng, keep_prob=keep_prob,
    )
    # pad entities (id == num_entities) encode to zero
    valid = (flat < spec.schema.num_entities).astype(latent.dtype)[:, None]
    latent = latent * valid
    return latent.reshape(*batch_shape, spec.dim)


def encode_all_items(
    params: Params,
    spec: EncoderSpec,
    attr_dev: dict[str, jnp.ndarray],
    block: int = 8192,
) -> jnp.ndarray:
    """All-item latent matrix V [num_items, D] for full-softmax eval and
    retrieval (SURVEY.md §3.3). Blocked with lax.map to bound peak memory on
    large vocabularies; pads the vocab up to a block multiple then trims."""
    n = spec.schema.num_entities
    nb = -(-n // block)
    ids = jnp.arange(nb * block, dtype=jnp.int32)
    ids = jnp.minimum(ids, n)  # tail pads encode to zero, trimmed below
    out = jax.lax.map(
        lambda b: encode(params, spec, attr_dev, b),
        ids.reshape(nb, block),
    )
    return out.reshape(nb * block, spec.dim)[:n]
