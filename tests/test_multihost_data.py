"""Multi-host input pipeline (SURVEY.md §7 "Multi-host input pipeline":
per-host shard of users with deterministic epoch shuffles; an off-by-one
here corrupts eval, not just perf). Each host takes a strided slice of the
same deterministic epoch permutation, so host shards must be pairwise
disjoint and their union must cover the epoch exactly (up to per-host
batch-multiple drops)."""

import numpy as np

from arec.config import DataConfig
from arec.data.dataset import mf_batches, seq_batches
from arec.data.synthetic import generate

DS = generate(DataConfig(syn_users=160, syn_items=120,
                         syn_interactions=3000, data_dir="/tmp/arec_test_mh"))


def _mf_pairs(host_id, num_hosts, batch_size=10, epoch=1):
    pairs = []
    for b in mf_batches(DS, batch_size, seed=3, epoch=epoch,
                        host_id=host_id, num_hosts=num_hosts):
        pairs += list(zip(b["user"].tolist(), b["pos_item"].tolist()))
    return pairs


def test_mf_host_shards_partition_the_epoch():
    num_hosts, batch = 3, 10
    total = len(DS.train_users)
    per_host = [_mf_pairs(h, num_hosts, batch) for h in range(num_hosts)]
    # each host drops < batch tail examples (drop_remainder)
    for pairs in per_host:
        assert len(pairs) >= (total // num_hosts // batch) * batch
    # pairwise disjoint by interaction slot: rebuild each host's index set
    # from the shared permutation property — (user, item) pairs can repeat
    # in the data, so compare counts: union multiset ⊆ full multiset and
    # sizes add up without overlap beyond duplicates present in the data
    from collections import Counter
    full = Counter(zip(DS.train_users.tolist(), DS.train_items.tolist()))
    union = Counter()
    for pairs in per_host:
        union.update(pairs)
    assert all(union[p] <= full[p] for p in union), "host shards overlap"
    assert sum(len(p) for p in per_host) == sum(union.values())


def test_mf_epoch_shuffles_are_deterministic_and_distinct():
    a = _mf_pairs(0, 2, epoch=1)
    b = _mf_pairs(0, 2, epoch=1)
    c = _mf_pairs(0, 2, epoch=2)
    assert a == b, "same (seed, epoch) must replay identically"
    assert a != c, "different epochs must reshuffle"


def test_seq_host_shards_partition_users():
    num_hosts, batch, L = 2, 8, 6
    eligible = set(np.flatnonzero(DS.hist_lengths >= 2).tolist())
    seen_by_host = []
    for h in range(num_hosts):
        us = []
        for b in seq_batches(DS, batch, L, seed=0, epoch=0,
                             host_id=h, num_hosts=num_hosts):
            us += b["user"].tolist()
        assert len(us) == len(set(us)), "a user repeated within an epoch"
        seen_by_host.append(set(us))
    assert not (seen_by_host[0] & seen_by_host[1]), "host shards overlap"
    union = seen_by_host[0] | seen_by_host[1]
    assert union <= eligible
    # per-host tail drop is < batch users
    assert len(union) > len(eligible) - num_hosts * batch
