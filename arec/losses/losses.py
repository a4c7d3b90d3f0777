"""Loss family: sampled/full softmax CE, WARP, BPR + batch variants.

Rebuild of the reference's loss set (SURVEY.md §2.1 "MF losses": {ce, warp,
bpr} plus batch variants {mw, bbpr} from the AAAI'18 batch-ranking paper;
LSTM: sampled_softmax in training, full softmax at eval — SURVEY.md §3.2).

All losses are pure functions of (query latents, candidate latents + bias)
and run entirely on-device inside the jitted step. The big matmuls
(logits = Q·Vᵀ) are MXU-shaped: [N, D] × [D, S] in the caller-chosen compute
dtype (bfloat16 by default) with float32 accumulation.

Candidate-side encoding is abstracted as ONE `embed(ids) -> (v [n, D],
bias [n])` callable so the same losses serve both families — and so the
per-candidate bias arrives in the SAME row gather as the embedding (a
separate [V] bias array costs a row-op-bound 1-D gather + scatter on TPU,
measured 0.23 ms/step at batch 16k; see EncoderSpec.with_bias):
  * MF: embed = fused attribute encoder over candidate ids (hybrid scoring),
    bias = column D of the entity-ID row.
  * LSTM: embed = the dedicated item output table (TF1 sampled_softmax_loss
    weights analog), bias = its column D.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from arec.losses.sampling import draw

# embed(ids) -> (latents [n, D], bias [n])
EmbedBias = Callable[[jnp.ndarray], tuple[jnp.ndarray, jnp.ndarray]]

_NEG_INF = -1e9
# row count above which the Pallas fused CE kernel beats XLA's fusion on
# TPU (the [N, S] logit matrix stops fitting cheap HBM traffic) — see the
# use_kernel docstring in sampled_softmax_loss for the measurements
_KERNEL_MIN_ROWS = 32768


def _matmul(q: jnp.ndarray, v: jnp.ndarray, dtype) -> jnp.ndarray:
    """[N, D] × [S, D]ᵀ → [N, S], MXU-friendly, fp32 accumulation."""
    return jax.lax.dot_general(
        q.astype(dtype), v.astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _rowdot(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(q.astype(jnp.float32) * v.astype(jnp.float32), axis=-1)


# --------------------------------------------------------------------------
# Softmax-family
# --------------------------------------------------------------------------

def sampled_softmax_loss(
    query: jnp.ndarray,            # [N, D] user/state latents
    true_ids: jnp.ndarray,         # [N] int32
    embed: EmbedBias,
    rng: jax.Array,
    num_sampled: int,
    vocab: int,
    dist: str = "log_uniform",
    remove_accidental_hits: bool = True,
    weights: jnp.ndarray | None = None,   # [N] position mask (LSTM "mce")
    compute_dtype=jnp.bfloat16,
    sampled: tuple | None = None,  # pre-drawn (ids, p) — lets the sparse
                                   # train step know the candidate set upfront
    use_kernel: bool | None = None,  # None = row-count heuristic (measured
                                   # on TPU v5e at S=1024): XLA's own
                                   # fusion wins at small N (MF 16k batch:
                                   # 6.2M vs 3.2M ex/s/chip) but the Pallas
                                   # kernel wins once the [N, S] logit
                                   # materialization dominates HBM traffic
                                   # (LSTM 2048×30 = 61k rows: 324k vs
                                   # 246k seq/s, +31%) — so the kernel
                                   # turns on at N ≥ _KERNEL_MIN_ROWS
                                   # *per device* on real TPU. Pallas
                                   # custom-calls do not partition under
                                   # GSPMD, so a caller tracing this under
                                   # a mesh MUST pass `mesh` — the kernel
                                   # then runs per-shard via an inner
                                   # shard_map (rows split over every mesh
                                   # axis, sampled side replicated)
    mesh=None,                     # jax.sharding.Mesh when tracing under
                                   # GSPMD; selects the shard_map kernel
                                   # wrapper and makes the heuristic count
                                   # per-device rows
    pop=None,                      # (cdf, probs) from sampling.make_pop —
                                   # required when dist == "pop"
    embed_raw=None,                # optional ids -> RAW [n, D+1] table rows
                                   # (bias in lane D). When the kernel path
                                   # is taken, the TRUE side feeds these
                                   # straight into the kernel's aug mode:
                                   # no bias-column slice on the [N, D+1]
                                   # gather and the bias grad rides lane D
                                   # of d(v_true) — the exact update-row
                                   # shape the table scatter-add consumes
) -> jnp.ndarray:
    """TF1 `tf.nn.sampled_softmax_loss` semantics, rebuilt:
    S shared negatives per step, −log(S·P) logit correction, accidental-hit
    masking, CE with the true class prepended as class 0."""
    sampled_ids, p = sampled if sampled is not None else draw(
        rng, num_sampled, vocab, dist, pop)

    v_samp, b_samp = embed(sampled_ids)            # [S, D], [S]

    if use_kernel is None:
        per_device = query.shape[0] // (mesh.size if mesh is not None else 1)
        use_kernel = (per_device >= _KERNEL_MIN_ROWS
                      and remove_accidental_hits
                      and jax.default_backend() == "tpu")
    if use_kernel and remove_accidental_hits:
        from arec.kernels.sampled_softmax import (
            fused_sampled_ce_sums, fused_sampled_ce_sums_sharded)
        # v_samp rides the kernel grid as an f32 accumuland ([S, D] is tiny);
        # under bf16 activations the cast transpose returns its cotangent to
        # the encoder in bf16. q / v_true keep their (possibly bf16) dtype —
        # the kernel emits dq/dvt in the primal dtype.
        v_samp = v_samp.astype(jnp.float32)
        c_samp = b_samp - jnp.log(num_sampled * p)
        corr = jnp.log(num_sampled * _p_of(true_ids, vocab, dist, pop))
        if embed_raw is not None:
            v_true = embed_raw(true_ids)           # [N, D+1], aug dispatch
            tl_base = -corr
        else:
            v_true, b_true = embed(true_ids)       # [N, D], [N]
            tl_base = b_true - corr
        # sums-level kernel: the (weighted-)mean reduction happens inside
        # the kernel, so no [N,1] per-row cotangent / CE columns ever
        # materialize in HBM (each costs 128× its logical bytes under TPU
        # tiling — see arec/kernels/sampled_softmax.py)
        if mesh is not None:
            num, den = fused_sampled_ce_sums_sharded(
                mesh, query, v_true, v_samp, c_samp, tl_base,
                true_ids, sampled_ids, weights, 256, compute_dtype)
        else:
            num, den = fused_sampled_ce_sums(
                query, v_true, v_samp, c_samp, tl_base,
                true_ids, sampled_ids, weights, 256, compute_dtype)
        if weights is None:
            return num / query.shape[0]
        return num / jnp.maximum(den, 1.0)
    else:
        v_true, b_true = embed(true_ids)           # [N, D], [N]
        true_logit = _rowdot(query, v_true) + b_true
        true_logit = true_logit - jnp.log(
            num_sampled * _p_of(true_ids, vocab, dist, pop))

        samp_logits = _matmul(query, v_samp, compute_dtype) + b_samp[None, :]
        samp_logits = samp_logits - jnp.log(num_sampled * p)[None, :]

        if remove_accidental_hits:
            hit = sampled_ids[None, :] == true_ids[:, None]
            samp_logits = jnp.where(hit, _NEG_INF, samp_logits)

        logits = jnp.concatenate([true_logit[:, None], samp_logits], axis=1)
        ce = jax.nn.logsumexp(logits, axis=1) - logits[:, 0]
    if weights is None:
        return ce.mean()
    return jnp.sum(ce * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def _p_of(ids, vocab, dist, pop=None):
    """Proposal probability of arbitrary ids under the chosen sampler."""
    from arec.losses.sampling import log_uniform_prob, pop_prob
    if dist == "log_uniform":
        return log_uniform_prob(ids, vocab)
    if dist == "pop":
        return pop_prob(ids, pop)
    return jnp.full(ids.shape, 1.0 / vocab, jnp.float32)


def full_softmax_loss(
    query: jnp.ndarray,            # [N, D]
    true_ids: jnp.ndarray,         # [N]
    all_items: jnp.ndarray,        # [V, D] (precomputed latents)
    all_bias: jnp.ndarray,         # [V]
    weights: jnp.ndarray | None = None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Exact CE over the full vocabulary (eval / parity oracle for the
    sampled loss — SURVEY.md §4 "Parity tests")."""
    logits = _matmul(query, all_items, compute_dtype) + all_bias[None, :]
    ce = jax.nn.logsumexp(logits, axis=1) - jnp.take_along_axis(
        logits, true_ids[:, None], axis=1)[:, 0]
    if weights is None:
        return ce.mean()
    return jnp.sum(ce * weights) / jnp.maximum(jnp.sum(weights), 1.0)


# --------------------------------------------------------------------------
# Pairwise-ranking family (sampled negatives)
# --------------------------------------------------------------------------

def warp_loss(
    query, true_ids, embed: EmbedBias, rng, num_sampled, vocab,
    dist: str = "uniform", margin: float = 1.0, compute_dtype=jnp.bfloat16,
    pop=None,
    sampled: tuple | None = None,  # pre-drawn (ids, p) — the sparse train
                                   # steps derive the touched-row set from
                                   # this same draw, so passing it is what
                                   # keeps subset tables and negatives in
                                   # agreement (tests/test_sparse.py loss
                                   # sweep)
) -> jnp.ndarray:
    """WARP with parallel sampled rank estimation: S negative draws from
    `dist`, margin violations estimate the positive's rank, loss =
    Φ(rank)·mean hinge, Φ(r) = log(1+r) (Weston et al. 2011, batch
    approximation as in the reference's warp branch).

    Rank estimator by proposal:
      * uniform: the classic (V−1)·m/S (each draw "covers" (V−1)/S items) —
        kept verbatim for reference parity.
      * non-uniform (log_uniform/pop): (V−1)·m/S is badly biased — the
        proposal over-draws popular items, and popular items violate the
        margin at a different rate than the tail, so the estimated rank,
        the violating-hinge mean, and (through autodiff) the per-negative
        gradients are all popularity-skewed. The fix is the full
        Horvitz–Thompson correction: each draw j is weighted by the
        vocabulary mass it stands for, w_j = 1/(S·P(j)) — rank ≈
        Σ_j w_j·1{violation_j} (clipped to V−1), hinge mean ≈
        Σ w_j·hinge_j / Σ w_j·1{violation_j}. Unbiased for ANY proposal;
        reduces to the classic estimator under uniform. Measured on the
        real chip (BASELINE.md round-4 anchors, syn_mf to convergence):
        log_uniform warp Recall@30 0.102 biased → 0.108 with rank-only HT
        → **0.256 with the full correction**, matching uniform-sampler
        warp (0.255) — the 2.5× sampler-bias recall loss is closed and
        train.sampler is now semantics-preserving for warp.
        (tests/test_losses.py::test_warp_ht_rank_unbiased_under_log_uniform)
    """
    sampled_ids, p = sampled if sampled is not None else draw(
        rng, num_sampled, vocab, dist, pop)
    v_true, b_true = embed(true_ids)
    v_samp, b_samp = embed(sampled_ids)
    pos = _rowdot(query, v_true) + b_true                          # [N]
    neg = _matmul(query, v_samp, compute_dtype) + b_samp[None, :]
    hit = sampled_ids[None, :] == true_ids[:, None]
    hinge = jnp.maximum(0.0, margin + neg - pos[:, None])
    hinge = jnp.where(hit, 0.0, hinge)
    violations = (hinge > 0).astype(jnp.float32)
    m = violations.sum(axis=1)                                     # [N]
    if dist == "uniform":
        rank = (vocab - 1) * m / num_sampled
        mean_hinge = hinge.sum(axis=1) / jnp.maximum(m, 1.0)
    else:
        # full HT correction: the violating-item mean must also weight each
        # draw by the vocabulary mass it stands for, or head items (drawn
        # ~63% of the time under log-uniform) dominate both the hinge mean
        # and — through autodiff — the per-negative gradients
        inv = (1.0 / (num_sampled * p))[None, :]                   # [1, S]
        wm = (violations * inv).sum(axis=1)                        # ~rank
        rank = jnp.minimum(wm, vocab - 1.0)
        mean_hinge = (hinge * inv).sum(axis=1) / jnp.maximum(wm, 1e-6)
    phi = jnp.log1p(rank)
    return (phi * mean_hinge).mean()


def bpr_loss(
    query, true_ids, embed: EmbedBias, rng, num_sampled, vocab,
    dist: str = "uniform", compute_dtype=jnp.bfloat16, pop=None,
    sampled: tuple | None = None,  # pre-drawn (ids, p) — see warp_loss
) -> jnp.ndarray:
    """BPR (Rendle 2009): −log σ(pos − neg) over sampled negatives."""
    sampled_ids, _ = sampled if sampled is not None else draw(
        rng, num_sampled, vocab, dist, pop)
    v_true, b_true = embed(true_ids)
    v_samp, b_samp = embed(sampled_ids)
    pos = _rowdot(query, v_true) + b_true
    neg = _matmul(query, v_samp, compute_dtype) + b_samp[None, :]
    hit = sampled_ids[None, :] == true_ids[:, None]
    ll = jax.nn.log_sigmoid(pos[:, None] - neg)
    ll = jnp.where(hit, 0.0, ll)
    denom = jnp.maximum((~hit).sum(axis=1).astype(jnp.float32), 1.0)
    return -(ll.sum(axis=1) / denom).mean()


# --------------------------------------------------------------------------
# Batch-ranking family (AAAI'18 "A Batch Learning Framework for Scalable
# Personalized Ranking": reuse in-batch positives as shared negatives)
# --------------------------------------------------------------------------

# gather_cands(true_ids, v, b) -> (cand_ids [B], v_all [B, D], b_all [B],
# diag_offset): lifts the LOCALLY-encoded positive latents to the global
# in-batch candidate set. Used by the sparse-mesh step (an all_gather over
# the data axis inside shard_map) so a per-shard batch still scores against
# every global positive — matching the dense GSPMD path, where the [B, B]
# score matrix is logically global and XLA inserts the gather itself.
# diag_offset is this shard's row offset into the gathered axis (the own-
# positive column index of local row i is diag_offset + i).
#
# pop_probs (optional [V] f32, empirical train-interaction item probs from
# make_pop(item_freq, 1.0)[1]): turns on the Horvitz–Thompson correction
# for the in-batch proposal. In-batch negatives are NOT uniform draws —
# each candidate column is a batch positive, i.e. one draw from the
# empirical popularity distribution q — yet the paper's rank estimate
# (vocab−1)·m/(B−1) and the unweighted hinge/log-σ means all assume a
# uniform proposal, exactly the bias the round-4 WARP fix closed for the
# sampled losses (warp_loss docstring; 2.5× recall measured). With
# pop_probs given, draw j is weighted by the vocabulary mass it stands
# for, w_ij = (1−q_t)/(n_eff·q_j) (n_eff = the row's usable-negative
# count; the (1−q_t) factor conditions on cand≠true — _ht_weights),
# making rank and both means unbiased for the empirical proposal; it
# reduces to the paper's estimator when q is uniform. Default None keeps
# the AAAI'18 paper-faithful behavior (train.batch_ht=false).


def _ht_weights(cand_ids, same, true_ids, pop_probs):
    """[b, B] HT weights: vocabulary mass each usable draw stands for.

    Draws come from q over the FULL vocab, but a row only uses draws with
    cand_id != true_id (the `same` mask), so the usable draws follow the
    CONDITIONAL proposal q_j / (1 − q_t) — the importance weight for
    estimating a sum over V \\ {t} is therefore (1 − q_t) / (n_eff·q_j),
    not 1 / (n_eff·q_j) (the unconditioned form over-estimated by ~q_t on
    rows whose own positive is popular — round-5 exactness fix)."""
    q = jnp.maximum(pop_probs[cand_ids], 1e-12)                    # [B]
    q_t = pop_probs[true_ids][:, None]                             # [b, 1]
    n_eff = jnp.maximum((~same).sum(axis=1, keepdims=True), 1)     # [b, 1]
    return jnp.where(same, 0.0, (1.0 - q_t) / (n_eff * q[None, :]))


def _batch_scores(query, true_ids, embed, compute_dtype, gather_cands):
    """Shared in-batch scoring: (scores [b, B], own-positive column scores
    [b], duplicate-positive mask [b, B], candidate ids [B])."""
    v, b_bias = embed(true_ids)                                    # [b, D]
    if gather_cands is None:
        cand_ids, off = true_ids, 0
    else:
        cand_ids, v, b_bias, off = gather_cands(true_ids, v, b_bias)
    scores = _matmul(query, v, compute_dtype) + b_bias[None, :]
    n = query.shape[0]
    diag = off + jnp.arange(n)
    pos = jnp.take_along_axis(scores, diag[:, None], axis=1)[:, 0]
    same = cand_ids[None, :] == true_ids[:, None]                  # dup-pos
    return scores, pos, same, cand_ids


def batch_mw_loss(
    query, true_ids, embed: EmbedBias,
    vocab: int, margin: float = 1.0, compute_dtype=jnp.bfloat16,
    gather_cands=None, pop_probs=None,
) -> jnp.ndarray:
    """`mw`: margin + rank-weighted hinge over the in-batch score matrix;
    positives sit on the diagonal, every other column is a negative.
    `pop_probs` turns on the HT correction for the (popularity-skewed)
    in-batch proposal — see the module comment above _ht_weights."""
    scores, pos, same, cand_ids = _batch_scores(
        query, true_ids, embed, compute_dtype, gather_cands)
    hinge = jnp.maximum(0.0, margin + scores - pos[:, None])
    hinge = jnp.where(same, 0.0, hinge)
    if pop_probs is None:
        m = (hinge > 0).sum(axis=1).astype(jnp.float32)
        rank = (vocab - 1) * m / jnp.maximum(cand_ids.shape[0] - 1, 1)
        mean_hinge = hinge.sum(axis=1) / jnp.maximum(m, 1.0)
    else:
        w = _ht_weights(cand_ids, same, true_ids, pop_probs)
        wm = (w * (hinge > 0)).sum(axis=1)                         # ~rank
        rank = jnp.minimum(wm, vocab - 1.0)
        mean_hinge = (w * hinge).sum(axis=1) / jnp.maximum(wm, 1e-6)
    phi = jnp.log1p(rank)
    return (phi * mean_hinge).mean()


def batch_bpr_loss(
    query, true_ids, embed: EmbedBias, compute_dtype=jnp.bfloat16,
    gather_cands=None, pop_probs=None,
) -> jnp.ndarray:
    """`bbpr`: BPR over the in-batch score matrix. `pop_probs` turns on
    the HT correction (self-normalized: Σw·logσ / Σw estimates the
    uniform-over-vocab mean the unweighted form assumes)."""
    scores, pos, same, cand_ids = _batch_scores(
        query, true_ids, embed, compute_dtype, gather_cands)
    ll = jax.nn.log_sigmoid(pos[:, None] - scores)
    ll = jnp.where(same, 0.0, ll)
    if pop_probs is None:
        denom = jnp.maximum((~same).sum(axis=1).astype(jnp.float32), 1.0)
        return -(ll.sum(axis=1) / denom).mean()
    w = _ht_weights(cand_ids, same, true_ids, pop_probs)
    return -((w * ll).sum(axis=1)
             / jnp.maximum(w.sum(axis=1), 1e-12)).mean()
