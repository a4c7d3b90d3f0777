"""Attribute-to-embedding fusion.

Rebuild of the fusion step inside the reference's embedding engine
(SURVEY.md §2.1, §3.5: "fuses per-entity attribute embeddings by concat or
sum (+ optional projection)"; ref flags --use_concat / --nonlinear).

Two modes:
  concat: concat per-attribute embeddings [B, n*D] → linear proj → [B, D];
          with nonlinear=True a tanh hidden layer is inserted (the ref's
          --nonlinear). Single-attribute + linear is the identity and takes
          no parameters (see EncoderSpec.needs_proj).
  sum:    elementwise sum of per-attribute embeddings (all dim D).

The projection is the "attribute-fusion MLP" of BASELINE.json:5 — it is the
data-parallel dense path for the MF family; its matmul runs on the MXU in
the compute dtype chosen by the caller.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_fusion(key: jax.Array, n_attrs: int, dim: int, nonlinear: bool) -> dict:
    k1, k2 = jax.random.split(key)
    d_in = n_attrs * dim
    if nonlinear:
        return {
            "w1": jax.random.normal(k1, (d_in, dim)) * jnp.sqrt(2.0 / d_in),
            "b1": jnp.zeros((dim,)),
            "w2": jax.random.normal(k2, (dim, dim)) * jnp.sqrt(2.0 / dim),
            "b2": jnp.zeros((dim,)),
        }
    return {
        "w1": jax.random.normal(k1, (d_in, dim)) * jnp.sqrt(1.0 / d_in),
        "b1": jnp.zeros((dim,)),
    }


def apply_fusion(
    params: dict | None,
    per_attr: list[jnp.ndarray],
    kind: str,
    nonlinear: bool,
    dropout_rng: jax.Array | None = None,
    keep_prob: float = 1.0,
    act_dtype=None,    # train-path activation dtype (TrainConfig.act_dtype):
                       # when set, the projection weights are cast so the
                       # matmul runs act×act on the MXU and the [B, n·D]
                       # concat / [B, D] hidden intermediates stay in
                       # act_dtype — a mixed f32 weight would silently
                       # upcast (and materialize) the batch-side operand
) -> jnp.ndarray:
    cast = (lambda a: a.astype(act_dtype)) if act_dtype is not None else (
        lambda a: a)
    if kind == "sum":
        out = sum(per_attr[1:], start=per_attr[0])
    elif kind == "concat":
        x = per_attr[0] if len(per_attr) == 1 else jnp.concatenate(per_attr, -1)
        if params is None:
            out = x  # identity: single attribute, linear
        else:
            h = x @ cast(params["w1"]) + cast(params["b1"])
            if nonlinear:
                h = jnp.tanh(h)
                h = h @ cast(params["w2"]) + cast(params["b2"])
            out = h
    else:
        raise ValueError(f"unknown fusion kind {kind!r}")

    if dropout_rng is not None and keep_prob < 1.0:
        keep = jax.random.bernoulli(dropout_rng, keep_prob, out.shape)
        out = jnp.where(keep, out / keep_prob, 0.0)
    return out
