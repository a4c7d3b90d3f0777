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


def draw(rng, num_sampled, vocab, dist: str):
    if dist == "log_uniform":
        return log_uniform_sample(rng, num_sampled, vocab)
    if dist == "uniform":
        return uniform_sample(rng, num_sampled, vocab)
    raise ValueError(f"unknown sampler {dist!r}")
