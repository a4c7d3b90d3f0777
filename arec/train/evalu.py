"""Evaluation: Recall@K with seen-item masking.

Rebuild of the reference's `Evaluate` path (SURVEY.md §2.1 "Evaluation",
§3.3): scores = query · V_allᵀ + b over ALL items, already-interacted items
masked out of the candidate set, top-K (K=30 is the graded metric,
BASELINE.json:2), recall = fraction of held-out positives inside the top-K.

The scoring matmul is the full-softmax eval path ([B, D] × [D, V] on the
MXU). Seen-item masking is a batched scatter-add of −1e9 over padded seen
lists (dedup'd at prep time). For the sharded eval-over-item-shards variant
see arec/retrieval/mips.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


BLOCKED_EVAL_MIN_V = 131072  # above this, stream item blocks


def topk_with_mask(
    query, item_latents, item_bias, seen, k: int = 30,
    compute_dtype=jnp.bfloat16, recall_target: float = 1.0,
    score_mem_mb: int = 512,
):
    """Dispatch by vocabulary size. Small V: materialize [B, V] scores,
    scatter the seen penalty, one top_k. Production V: the query-blocked
    path (arec.retrieval.mips.blocked_topk_mips) — peak score memory
    bounded by its score_mem_mb budget where the full [B, V] matrix would
    be tens of GB (XING: V ≈ 1.3M). The two are exactly equal
    (tests/test_retrieval.py).

    recall_target < 1 opts into the approx_max_k serving mode (~10× qps at
    V=300k — see blocked_topk_mips); graded eval always stays exact."""
    if recall_target < 1.0 or item_latents.shape[0] > BLOCKED_EVAL_MIN_V:
        from arec.retrieval.mips import blocked_topk_mips
        return blocked_topk_mips(query, item_latents, item_bias, seen, k=k,
                                 compute_dtype=compute_dtype,
                                 recall_target=recall_target,
                                 score_mem_mb=score_mem_mb)
    return _topk_full(query, item_latents, item_bias, seen, k=k,
                      compute_dtype=compute_dtype)


@partial(jax.jit, static_argnames=("k", "compute_dtype"))
def _topk_full(
    query: jnp.ndarray,        # [B, D]
    item_latents: jnp.ndarray, # [V, D]
    item_bias: jnp.ndarray,    # [V]
    seen: jnp.ndarray,         # int32 [B, max_seen], PAD = -1
    k: int = 30,
    compute_dtype=jnp.bfloat16,
):
    """Returns (topk_scores [B, k], topk_ids [B, k])."""
    scores = jax.lax.dot_general(
        query.astype(compute_dtype), item_latents.astype(compute_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + item_bias[None, :]
    b = query.shape[0]
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], seen.shape)
    safe = jnp.where(seen >= 0, seen, 0)
    penalty = jnp.where(seen >= 0, -1e9, 0.0)
    scores = scores.at[rows, safe].add(penalty)
    return jax.lax.top_k(scores, k)


@partial(jax.jit, static_argnames=("k", "recall_target"))
def recall_hits(
    query, item_latents, item_bias, seen, pos_item, valid, k: int = 30,
    recall_target: float = 1.0,
):
    """Per-batch (hits, count) for Recall@K, honoring the eval-padding
    mask. recall_target < 1 = approx periodic-eval mode
    (train.eval_recall_target); the default is exact."""
    _, ids = topk_with_mask(query, item_latents, item_bias, seen, k=k,
                            recall_target=recall_target)
    hit = (ids == pos_item[:, None]).any(axis=1).astype(jnp.float32)
    return jnp.sum(hit * valid), jnp.sum(valid)
