"""On-device candidate sampling for sampled-softmax training.

Rebuild of the reference's negative-sampling machinery. The reference drew
negatives with TF1's log-uniform candidate sampler (the default companion of
`tf.nn.sampled_softmax_loss`) over a frequency-sorted item vocabulary, and
assembled them HOST-side in the feed_dict hot loop (SURVEY.md §3.1). Here
sampling runs on-device inside the jitted train step — the host never touches
negatives.

Log-uniform (Zipf) distribution over ids k ∈ [0, V):
    P(k) = log((k+2)/(k+1)) / log(V+1)
    CDF(k) = log(k+2) / log(V+1)
Inverse-CDF sampling: k = floor(exp(u · log(V+1))) − 1, u ~ U[0,1).

Because item ids are frequency ranks (arec/data/schema.py build_vocab), this
matches "sample negatives proportional to a Zipf fit of popularity" — the
distribution TF1 used, which the parity bar depends on (SURVEY.md §7
"Sampled-softmax parity").

Sampling is WITH replacement (independent draws), so the expected count of
candidate k in S draws is S·P(k), and the sampled-softmax correction is
−log(S·P(k)) (Bengio & Senécal 2008 / TF1 semantics up to the
with/without-replacement approximation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_uniform_prob(ids: jnp.ndarray, vocab: int) -> jnp.ndarray:
    k = ids.astype(jnp.float32)
    return jnp.log((k + 2.0) / (k + 1.0)) / jnp.log(vocab + 1.0)


def log_uniform_sample(
    rng: jax.Array, num_sampled: int, vocab: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (ids int32 [S], P(ids) float32 [S])."""
    u = jax.random.uniform(rng, (num_sampled,))
    k = jnp.floor(jnp.exp(u * jnp.log(vocab + 1.0))) - 1.0
    ids = jnp.clip(k.astype(jnp.int32), 0, vocab - 1)
    return ids, log_uniform_prob(ids, vocab)


def uniform_sample(
    rng: jax.Array, num_sampled: int, vocab: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    ids = jax.random.randint(rng, (num_sampled,), 0, vocab, dtype=jnp.int32)
    return ids, jnp.full((num_sampled,), 1.0 / vocab, jnp.float32)


def make_pop(item_freq, power: float = 1.0):
    """Empirical popularity^α proposal (the reference engine's third
    sampled-id option next to uniform/log-uniform — SURVEY.md §2.1
    "candidate sampling (uniform / popularity^α)"; TF1 analog:
    `tf.nn.fixed_unigram_candidate_sampler(distortion=α)`).

    Returns device arrays (cdf [V], probs [V]) consumed by `draw`/`pop_prob`.
    Zero-count ids are clamped to count 1 so a true id outside the train
    split keeps a finite −log(S·P) correction."""
    f = jnp.maximum(jnp.asarray(item_freq, jnp.float32), 1.0) ** power
    probs = f / jnp.sum(f)
    return jnp.cumsum(probs), probs


def pop_sample(rng, num_sampled, pop):
    """Inverse-CDF draw from the empirical popularity^α distribution."""
    cdf, probs = pop
    u = jax.random.uniform(rng, (num_sampled,))
    ids = jnp.searchsorted(cdf, u, side="right").astype(jnp.int32)
    ids = jnp.clip(ids, 0, probs.shape[0] - 1)
    return ids, probs[ids]


def pop_prob(ids, pop):
    return pop[1][ids]


def draw(rng, num_sampled, vocab, dist: str, pop=None):
    if dist == "log_uniform":
        return log_uniform_sample(rng, num_sampled, vocab)
    if dist == "uniform":
        return uniform_sample(rng, num_sampled, vocab)
    if dist == "pop":
        if pop is None:
            raise ValueError(
                "sampler='pop' needs (cdf, probs) from make_pop(item_freq)")
        return pop_sample(rng, num_sampled, pop)
    raise ValueError(f"unknown sampler {dist!r}")
