"""Serving-time candidate retrieval: top-k MIPS over the (sharded) item table.

Rebuild of the reference's recommend path (SURVEY.md §3.3: full scoring, mask
seen, top-30), redesigned per BASELINE.json:5/11: "serving-time candidate
retrieval is a chip-local top-k MIPS over the sharded item table" with
"full-softmax eval + top-k retrieval" on the mesh.

Sharded protocol (SURVEY.md §2.3 "Full-softmax eval sharding"):
  * item latents are row-sharded over "model"; queries are batch-sharded
    over "data" and replicated over "model".
  * each chip scores its item shard ([Bl, D] × [D, Vs] on the MXU), applies
    the seen-item penalty for ids in its range, takes a LOCAL top-k;
  * the k-per-shard candidates (score, global id) are all_gather'd over
    "model" (k·T ≪ V values over ICI) and merged with a final top-k.

Exactness: top-k of a union of per-shard top-ks is the global top-k —
no approximation anywhere by default. The per-shard body is query-blocked
(peak score memory capped by score_mem_mb at any vocab) and optionally
selects with `approx_max_k` (recall_target < 1) — the serving trade the
single-device blocked path offers, now on the mesh too.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from arec.dist.specs import DATA_AXIS, TABLE_AXIS


def topk_mips(query, item_latents, item_bias, seen, k: int = 30,
              compute_dtype=jnp.bfloat16):
    """Single-device reference path (== arec.train.evalu.topk_with_mask)."""
    from arec.train.evalu import topk_with_mask
    return topk_with_mask(query, item_latents, item_bias, seen, k=k,
                          compute_dtype=compute_dtype)


def _local_score_topk(q, v_shard, b_shard, seen, k, compute_dtype,
                      score_mem_mb=512, recall_target=1.0, qblock=0):
    """Per-device body: score my item shard QUERY-BLOCKED (peak score
    memory ≤ score_mem_mb — at XING scale a [Bl, Vs] matrix can still be
    GBs per chip), mask my slice of seen ids, local top-k in GLOBAL id
    space. recall_target < 1 selects per chunk with `approx_max_k` over
    top-(k+S) candidates (seen-masking on the candidate set, as in
    blocked_topk_mips); the k·T merge stays exact either way."""
    vs = v_shard.shape[0]
    shard_idx = jax.lax.axis_index(TABLE_AXIS)
    offset = shard_idx * vs
    # a shard smaller than k can contribute at most vs candidates; the
    # union of per-shard top-min(k, vs) still contains the global top-k
    kl = min(k, vs)

    bl, d = q.shape
    s_width = seen.shape[1]
    if not qblock:
        qblock = max(1, min(bl, (score_mem_mb << 20) // max(4 * vs, 1)))
        nb = -(-bl // qblock)
        qblock = -(-bl // nb)
    nb = -(-bl // qblock)
    bp = nb * qblock
    if bp != bl:
        q = jnp.pad(q, ((0, bp - bl), (0, 0)))
        seen = jnp.pad(seen, ((0, bp - bl), (0, 0)), constant_values=-1)
    qs = q.astype(compute_dtype).reshape(nb, qblock, d)
    vb = v_shard.astype(compute_dtype)
    exact = recall_target >= 1.0
    if exact:
        ss = seen.reshape(nb, qblock, s_width)
    else:
        # sorted GLOBAL ids (pad → int32 max) for candidate-set membership
        ss = jnp.sort(jnp.where(seen >= 0, seen, jnp.iinfo(jnp.int32).max),
                      axis=1).reshape(nb, qblock, s_width)
        kb = min(k + s_width, vs)   # ≥ k unseen survivors per shard

    def body(_, xs):
        qq, sn = xs
        scores = jax.lax.dot_general(
            qq, vb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_shard[None, :]
        if exact:
            # seen ids are global: penalize those owned by this shard
            local = sn - offset
            mine = (local >= 0) & (local < vs) & (sn >= 0)
            rows = jnp.broadcast_to(
                jnp.arange(qblock)[:, None], sn.shape)
            scores = scores.at[rows, jnp.clip(local, 0, vs - 1)].add(
                jnp.where(mine, -1e9, 0.0))
            tv, ti = jax.lax.top_k(scores, kl)
            return None, (tv, ti + offset)
        cv, ci = jax.lax.approx_max_k(scores, kb,
                                      recall_target=recall_target)
        gi = ci + offset
        if s_width > 0:  # width-0 seen: searchsorted over a size-0 axis
            pos = jnp.minimum(jax.vmap(jnp.searchsorted)(sn, gi), s_width - 1)
            hit = jnp.take_along_axis(sn, pos, axis=1) == gi
            # masked candidates lose their id too (sentinel -1): in the
            # degenerate k > #unseen-on-shard case a seen id must not
            # surface from the merge with a -inf score
            cv = jnp.where(hit, -jnp.inf, cv)
            gi = jnp.where(hit, -1, gi)
        tv, tp = jax.lax.top_k(cv, kl)
        return None, (tv, jnp.take_along_axis(gi, tp, axis=1))

    _, (vals, ids) = jax.lax.scan(body, None, (qs, ss))
    return vals.reshape(bp, kl)[:bl], ids.reshape(bp, kl)[:bl]


@partial(jax.jit, static_argnames=("k", "qblock", "compute_dtype",
                                   "recall_target", "score_mem_mb"))
def blocked_topk_mips(query, item_latents, item_bias, seen, k: int = 30,
                      qblock: int = 0, compute_dtype=jnp.bfloat16,
                      recall_target: float = 1.0, score_mem_mb: int = 512):
    """Production-vocab top-k MIPS, blocked over QUERIES: each query chunk
    scores the full vocab ([Qb, D] × [D, V] on the MXU), masks its seen
    items, and selects top-k; peak score memory is O(Qb·V), bounded by
    `score_mem_mb` (Qb auto-shrinks as V grows — at XING scale V ≈ 1.3M the
    [B, V] matrix would be ~21 GB; a chunk stays ≤ `score_mem_mb`, floored
    at one query row = V·4 bytes).

    Why query-blocked, not item-blocked: TPU top_k is sort-based and its
    cost scales with total elements scanned, so an item-blocked running
    merge pays a top-(k+S) sort per block PLUS the merge — measured 3.9×
    slower at V=300k (805 ms vs 207 ms for 4096 queries) than one full-V
    selection per query chunk.

    recall_target: 1.0 (default) = exact `lax.top_k` — identical results to
    topk_with_mask. < 1.0 = `lax.approx_max_k` serving mode (TPU PartialReduce,
    ~6× faster selection at V=300k) with per-element recall ≥ the target in
    expectation; seen-masking then happens on the top-(k+S) candidate set
    (a row's seen items occupy at most S of those slots, so ≥ k unseen
    survivors remain).

    Measured reality of the approx mode at V=1.3M, k=30, CONVERGED params
    (round 5, BASELINE.md agreement section): ~94% top-30 overlap with
    exact at 0.19% mean score-mass gap; the target value quantizes
    (0.95/0.98/0.99 select identically at that shape) and candidate-set
    oversampling does not recover the misses — treat the knob as a binary
    exact/approx choice and report converged metrics via exact selection.
    """
    b, d = query.shape
    v = item_latents.shape[0]
    s_width = seen.shape[1]
    if not qblock:
        # budget → chunk count first, then even chunks: qblock·v·4B stays
        # ≤ score_mem_mb (down to qblock=1) and padding is < nb rows
        qblock = max(1, min(b, (score_mem_mb << 20) // max(4 * v, 1)))
        nb = -(-b // qblock)
        qblock = -(-b // nb)
    nb = -(-b // qblock)
    bp = nb * qblock
    if bp != b:
        query = jnp.pad(query, ((0, bp - b), (0, 0)))
        seen = jnp.pad(seen, ((0, bp - b), (0, 0)), constant_values=-1)
    qs = query.astype(compute_dtype).reshape(nb, qblock, d)
    vb = item_latents.astype(compute_dtype)
    exact = recall_target >= 1.0
    if exact:
        ss = seen.reshape(nb, qblock, s_width)
    else:
        ss = jnp.sort(jnp.where(seen >= 0, seen, v + 1),
                      axis=1).reshape(nb, qblock, s_width)
        kb = min(k + s_width, v)

    def body(_, xs):
        qq, sn = xs
        scores = jax.lax.dot_general(
            qq, vb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + item_bias[None, :]
        if exact:
            # -1e9 penalty (not -inf): matches _topk_full exactly, including
            # the degenerate k > #unseen case where penalized seen items
            # re-enter the tail of the top-k by score order
            rows = jnp.broadcast_to(jnp.arange(qblock)[:, None], sn.shape)
            scores = scores.at[rows, jnp.clip(sn, 0, v - 1)].add(
                jnp.where(sn >= 0, -1e9, 0.0))
            tv, ti = jax.lax.top_k(scores, k)
        else:
            cv, ci = jax.lax.approx_max_k(scores, kb,
                                          recall_target=recall_target)
            if s_width > 0:  # width-0 seen: nothing to mask
                pos = jnp.minimum(
                    jax.vmap(jnp.searchsorted)(sn, ci), s_width - 1)
                hit = jnp.take_along_axis(sn, pos, axis=1) == ci
                cv = jnp.where(hit, -jnp.inf, cv)
                ci = jnp.where(hit, -1, ci)  # see _local_score_topk
            tv, tp = jax.lax.top_k(cv, k)
            ti = jnp.take_along_axis(ci, tp, axis=1)
        return None, (tv, ti)

    _, (vals, ids) = jax.lax.scan(body, None, (qs, ss))
    return vals.reshape(bp, k)[:b], ids.reshape(bp, k)[:b]


def make_sharded_topk(mesh: Mesh, k: int = 30, compute_dtype=jnp.bfloat16,
                      score_mem_mb: int = 512, recall_target: float = 1.0,
                      qblock: int = 0):
    """Returns topk(query, item_latents, item_bias, seen) -> (scores, ids),
    global top-k over the row-sharded item table — exact by default;
    recall_target < 1 switches the per-shard selection to the approx
    serving mode (the merge itself stays exact, so per-element recall
    matches the single-device approx path).

    The per-shard score+local-top-k runs in shard_map (out spec
    P("data","model") lays the T shards' k-candidates side by side); the
    k·T-wide merge is ordinary jnp under jit — XLA gathers the tiny
    candidate slab over ICI and the final top_k is negligible. Per-shard
    peak score memory is capped at score_mem_mb (query-blocked, same
    budget rule as blocked_topk_mips)."""

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(TABLE_AXIS, None), P(TABLE_AXIS),
                  P(DATA_AXIS, None)),
        out_specs=(P(DATA_AXIS, TABLE_AXIS), P(DATA_AXIS, TABLE_AXIS)),
    )
    def _local(q, v_shard, b_shard, seen):
        return _local_score_topk(q, v_shard, b_shard, seen, k, compute_dtype,
                                 score_mem_mb, recall_target, qblock)

    def topk(query, item_latents, item_bias, seen):
        all_vals, all_ids = _local(query, item_latents, item_bias, seen)
        # [B, T·kl] → [B, min(k, T·kl)]; the candidate slab can be narrower
        # than k only when the whole vocab is (degenerate small-V case) —
        # pad to the [B, k] output contract with -inf/-1
        km = min(k, all_vals.shape[1])
        m_vals, m_pos = jax.lax.top_k(all_vals, km)
        m_ids = jnp.take_along_axis(all_ids, m_pos, axis=1)
        if km < k:
            m_vals = jnp.pad(m_vals, ((0, 0), (0, k - km)),
                             constant_values=-jnp.inf)
            m_ids = jnp.pad(m_ids, ((0, 0), (0, k - km)),
                            constant_values=-1)
        return m_vals, m_ids

    return topk


def sharded_topk(mesh, query, item_latents, item_bias, seen, k: int = 30,
                 compute_dtype=jnp.bfloat16, score_mem_mb: int = 512,
                 recall_target: float = 1.0):
    """One-shot convenience wrapper. item_latents rows must be padded to a
    model-axis multiple (pad rows score ~0; push them below any real score
    by padding item_bias rows with -1e9 — see pad_item_shards)."""
    fn = make_sharded_topk(mesh, k=k, compute_dtype=compute_dtype,
                           score_mem_mb=score_mem_mb,
                           recall_target=recall_target)
    return fn(query, item_latents, item_bias, seen)


def pad_item_shards(item_latents, item_bias, model_size: int):
    """Pad V up to a model-axis multiple; pad bias with -1e9 so pad rows
    never enter a top-k."""
    v = item_latents.shape[0]
    vp = -(-v // model_size) * model_size
    if vp != v:
        item_latents = jnp.pad(item_latents, ((0, vp - v), (0, 0)))
        item_bias = jnp.pad(item_bias, (0, vp - v),
                            constant_values=-1e9)
    return item_latents, item_bias
