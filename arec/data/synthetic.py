"""Deterministic synthetic dataset generator.

No counterpart in the reference (it ships only ML-1M / XING prep —
SURVEY.md §2.1). Built because this environment has neither network access
nor raw dataset dumps; every test and bench needs a dataset with the same
*shape* as the real ones: cat + mulhot attributes on both entity sides,
Zipf-ish item popularity, per-user temporal structure, and enough latent
signal that Recall@30 visibly improves over random when training works.

Generative model (all from one seeded PRNG — fully reproducible):
  * K latent clusters; each user and item gets a cluster.
  * Item base popularity ~ Zipf(1.1).
  * A user's interactions are drawn from a mixture: with prob `affinity`
    an item from the user's cluster (popularity-weighted within cluster),
    else a global popularity draw. Timestamps are per-user sequential.
  * Cat attributes correlate with the cluster (so attribute-aware configs
    have signal to exploit); mulhot attributes are cluster-flavored tag sets.
  * Item ids are then remapped to frequency rank (sampler contract,
    arec/data/schema.py build_vocab docstring).
"""

from __future__ import annotations

import numpy as np

from arec.config import DataConfig
from arec.data.schema import (
    CAT, MULHOT, AttrField, AttributeData, EntitySchema, pad_mulhot,
)
from arec.data.dataset import PreparedDataset, build_prepared


def generate(cfg: DataConfig) -> PreparedDataset:
    rng = np.random.default_rng(cfg.syn_seed)
    n_users, n_items, n_inter = cfg.syn_users, cfg.syn_items, cfg.syn_interactions
    n_clusters = 8
    affinity = 0.75

    user_cluster = rng.integers(0, n_clusters, n_users)
    item_cluster = rng.integers(0, n_clusters, n_items)

    # Zipf-ish base popularity
    base_pop = 1.0 / np.power(np.arange(1, n_items + 1), 1.1)
    base_pop = rng.permutation(base_pop)
    base_pop /= base_pop.sum()

    # per-cluster popularity distributions
    cluster_pop = np.zeros((n_clusters, n_items))
    for c in range(n_clusters):
        in_c = item_cluster == c
        p = np.where(in_c, base_pop, 0.0)
        cluster_pop[c] = p / max(p.sum(), 1e-12)

    # interactions: users drawn proportional to a light activity skew
    user_act = rng.gamma(2.0, 1.0, n_users)
    user_act /= user_act.sum()
    users = rng.choice(n_users, size=n_inter, p=user_act).astype(np.int32)
    use_cluster = rng.random(n_inter) < affinity
    items = np.empty(n_inter, np.int32)
    glob = rng.choice(n_items, size=n_inter, p=base_pop)
    for c in range(n_clusters):
        m = use_cluster & (user_cluster[users] == c)
        items[m] = rng.choice(n_items, size=int(m.sum()), p=cluster_pop[c])
    items[~use_cluster] = glob[~use_cluster]

    # timestamps: global order index (per-user order follows from lexsort)
    times = np.arange(n_inter, dtype=np.int64)

    # ---- frequency-rank remap of item ids --------------------------------
    freq = np.bincount(items, minlength=n_items)
    rank_of = np.argsort(np.argsort(-freq, kind="stable"), kind="stable")
    items = rank_of[items].astype(np.int32)
    item_cluster = item_cluster[np.argsort(rank_of, kind="stable")]

    # ---- attributes ------------------------------------------------------
    # user: id + cat(group≈cluster, noisy) + cat(age-band) + mulhot(tags)
    n_groups = n_clusters
    noisy_group = np.where(
        rng.random(n_users) < 0.9, user_cluster, rng.integers(0, n_groups, n_users)
    ).astype(np.int32)
    age = rng.integers(0, 7, n_users).astype(np.int32)
    n_user_tags = 24
    user_tag_lists = [
        sorted(set(rng.choice(n_user_tags, size=rng.integers(1, 5)).tolist()
                   + [int(user_cluster[u]) * 3 % n_user_tags]))
        for u in range(n_users)
    ]
    ut_vals, ut_len = pad_mulhot(user_tag_lists, 6)

    user_schema = EntitySchema(
        "user", n_users,
        (
            EntitySchema.id_field("user", n_users),
            AttrField("group", CAT, n_groups),
            AttrField("age", CAT, 7),
            AttrField("user_tags", MULHOT, n_user_tags, max_degree=6),
        ),
    )
    user_attrs = AttributeData(
        schema=user_schema,
        values={
            "user_id": np.arange(n_users, dtype=np.int32),
            "group": noisy_group,
            "age": age,
            "user_tags": ut_vals,
        },
        lengths={"user_tags": ut_len},
    )

    # item: id + cat(category≈cluster) + cat(year) + mulhot(genres)
    year = rng.integers(0, 10, n_items).astype(np.int32)
    n_genres = 18
    genre_lists = [
        sorted(set(rng.choice(n_genres, size=rng.integers(1, 4)).tolist()
                   + [int(item_cluster[i]) * 2 % n_genres]))
        for i in range(n_items)
    ]
    g_vals, g_len = pad_mulhot(genre_lists, 5)

    item_schema = EntitySchema(
        "item", n_items,
        (
            EntitySchema.id_field("item", n_items),
            AttrField("category", CAT, n_clusters),
            AttrField("year", CAT, 10),
            AttrField("genres", MULHOT, n_genres, max_degree=5),
        ),
    )
    item_attrs = AttributeData(
        schema=item_schema,
        values={
            "item_id": np.arange(n_items, dtype=np.int32),
            "category": item_cluster.astype(np.int32),
            "year": year,
            "genres": g_vals,
        },
        lengths={"genres": g_len},
    )

    ds = build_prepared(
        name="synthetic",
        user_schema=user_schema,
        item_schema=item_schema,
        user_attrs=user_attrs,
        item_attrs=item_attrs,
        users=users,
        items=items,
        times=times,
    )
    ds.validate()
    return ds
