"""Hybrid matrix-factorization model family.

Rebuild of the reference's `LatentProductModel` (SURVEY.md §2.1 "Hybrid MF
model", §3.1): user latent = fusion of user-attribute embeddings (user ID is
attribute 0), item latent = fusion of item-attribute embeddings, score =
dot(u, v) + item_bias. "Hybrid" = IDs and attributes jointly embedded.

Model state is one flat pytree: {"user": encoder params, "item": encoder
params} so sharding annotations, optimizers, and checkpointing all operate
on plain arrays. The candidate-side `embed` used by every loss is the fused
item encoder itself — scoring a candidate always goes through attribute
fusion, which is what makes attribute-aware configs (BASELINE.json:8) learn.
The per-item score bias lives in the bias column of the item encoder's
fused table (EncoderSpec.with_bias) so its lookup and gradient ride the item
row gather — there is no separate [V] bias array anywhere in the step.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from arec.config import Config
from arec.data.schema import EntitySchema
from arec.losses.losses import (
    batch_bpr_loss, batch_mw_loss, bpr_loss, sampled_softmax_loss, warp_loss,
)
from arec.tables.engine import (
    EncoderSpec, dense_lookup, encode, encode_all_items_with_bias,
    encode_with_bias, init_encoder,
)


@dataclass(frozen=True)
class MFSpec:
    user: EncoderSpec
    item: EncoderSpec
    loss: str = "ce"
    num_sampled: int = 256
    sampler: str = "log_uniform"
    batch_ht: bool = False         # HT-correct mw/bbpr's in-batch proposal
                                   # (train.batch_ht; losses.py _ht_weights)
    keep_prob: float = 1.0
    compute_dtype: str = "bfloat16"
    act_dtype: str = "float32"     # TRAIN-path activation dtype
                                   # (TrainConfig.act_dtype); eval/serving
                                   # always encode in f32

    @staticmethod
    def from_config(cfg: Config, user_schema: EntitySchema,
                    item_schema: EntitySchema) -> "MFSpec":
        if not cfg.model.use_attributes:
            user_schema = user_schema.id_only()
            item_schema = item_schema.id_only()
        mk = lambda s, wb=False: EncoderSpec(
            s, cfg.model.dim, cfg.model.fusion, cfg.model.nonlinear,
            with_bias=wb,
            dense_mulhot_threshold=cfg.model.dense_vocab_threshold)
        return MFSpec(
            user=mk(user_schema), item=mk(item_schema, wb=True),
            loss=cfg.train.loss, num_sampled=cfg.train.num_sampled,
            sampler=cfg.train.sampler, batch_ht=cfg.train.batch_ht,
            keep_prob=cfg.model.keep_prob,
            compute_dtype=cfg.train.compute_dtype,
            act_dtype=cfg.train.act_dtype,
        )

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def act_dt(self):
        """jnp dtype for train-path activations; None = float32 (no cast)."""
        return None if self.act_dtype == "float32" else jnp.dtype(
            self.act_dtype)


def init_mf(key: jax.Array, spec: MFSpec) -> dict:
    ku, ki = jax.random.split(key)
    return {
        "user": init_encoder(ku, spec.user),
        "item": init_encoder(ki, spec.item),
    }


def mf_loss(
    params: dict,
    spec: MFSpec,
    user_dev: dict,
    item_dev: dict,
    batch: dict,
    rng: jax.Array,
    lookup_fn=dense_lookup,
    lookup_fns: dict | None = None,   # per-role override: {"user","item"}
    sampled: tuple | None = None,     # pre-drawn (neg_ids, neg_p) — sparse step
    use_kernel: bool | None = None,   # Pallas fused CE; None = size heuristic
    mesh=None,                        # Mesh when traced under GSPMD — routes
                                      # the fused CE through its shard_map
                                      # wrapper (arec/kernels/sampled_softmax)
    pop=None,                         # (cdf, probs) — sampler="pop" proposal
    gather_cands=None,                # mw/bbpr under shard_map: lift local
                                      # positives to the global in-batch
                                      # candidate set (losses.py contract)
) -> jnp.ndarray:
    """One training step's loss for a (user, positive-item) batch
    (SURVEY.md §3.1: u = fuse(user attrs); loss over sampled candidates)."""
    lk = lookup_fns or {}
    r_drop, r_neg = jax.random.split(rng)
    u = encode(params["user"], spec.user, user_dev, batch["user"],
               lk.get("user", lookup_fn),
               dropout_rng=r_drop, keep_prob=spec.keep_prob,
               act_dtype=spec.act_dt)
    embed = lambda ids: encode_with_bias(params["item"], spec.item, item_dev,
                                         ids, lk.get("item", lookup_fn),
                                         act_dtype=spec.act_dt)
    pos = batch["pos_item"]
    vocab = spec.item.schema.num_entities

    if spec.loss == "ce":
        return sampled_softmax_loss(
            u, pos, embed, r_neg, spec.num_sampled, vocab,
            dist=spec.sampler, compute_dtype=spec.dtype, sampled=sampled,
            use_kernel=use_kernel, mesh=mesh, pop=pop)
    # warp/bpr draw their negatives from the SAME spec.sampler proposal as
    # ce (train.sampler is the one negative-sampler knob — config.py), and
    # accept the pre-drawn `sampled` so the sparse steps' touched-row set
    # and the loss's candidate set always agree (the round-3 silent-
    # corruption bug was exactly this pair disagreeing).
    if spec.loss == "warp":
        return warp_loss(u, pos, embed, r_neg, spec.num_sampled, vocab,
                         dist=spec.sampler, compute_dtype=spec.dtype,
                         sampled=sampled, pop=pop)
    if spec.loss == "bpr":
        return bpr_loss(u, pos, embed, r_neg, spec.num_sampled, vocab,
                        dist=spec.sampler, compute_dtype=spec.dtype,
                        sampled=sampled, pop=pop)
    # mw/bbpr reuse in-batch positives as shared negatives (AAAI'18): no
    # sampled draw exists, so train.sampler does not apply to them.
    pp = None
    if spec.batch_ht and spec.loss in ("mw", "bbpr"):
        if pop is None:
            raise ValueError(
                "train.batch_ht needs the empirical item distribution: the "
                "trainer must pass pop=make_pop(item_freq, 1.0) (loop.py "
                "builds it whenever batch_ht is set with loss=mw|bbpr)")
        pp = pop[1]
    if spec.loss == "mw":
        return batch_mw_loss(u, pos, embed, vocab, compute_dtype=spec.dtype,
                             gather_cands=gather_cands, pop_probs=pp)
    if spec.loss == "bbpr":
        return batch_bpr_loss(u, pos, embed, compute_dtype=spec.dtype,
                              gather_cands=gather_cands, pop_probs=pp)
    raise ValueError(f"unknown mf loss {spec.loss!r}")


def mf_user_latents(params, spec: MFSpec, user_dev, user_ids, lookup_fn=dense_lookup):
    return encode(params["user"], spec.user, user_dev, user_ids, lookup_fn)


def mf_item_latents(params, spec: MFSpec, item_dev, block: int = 8192,
                    lookup_fn=dense_lookup):
    """All-item latent matrix + bias for full-softmax eval / retrieval.
    `lookup_fn` must match the table's row layout (shuffle-sharded tables
    pass a RowPerm-aware lookup — arec.tables.sharded.make_perm_dense_lookup)."""
    return encode_all_items_with_bias(params["item"], spec.item, item_dev,
                                      block=block, lookup_fn=lookup_fn)
