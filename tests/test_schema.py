"""Schema, vocab, and synthetic-prep tests (SURVEY.md §4 unit tests +
"deterministic artifacts, golden-hashed" from the §7 build order)."""

import hashlib

import numpy as np
import pytest

from arec.config import DataConfig
from arec.data.schema import (
    CAT, MULHOT, AttrField, AttributeData, EntitySchema, apply_vocab,
    build_vocab, pad_mulhot,
)
from arec.data.synthetic import generate


def test_build_vocab_freq_sorted():
    raw = ["a"] * 5 + ["b"] * 3 + ["c"] * 3 + ["d"] * 1
    mapping, size = build_vocab(raw, min_count=2)
    assert mapping["a"] == 0
    assert mapping["b"] == 1  # tie with c broken by first appearance
    assert mapping["c"] == 2
    assert "d" not in mapping
    assert size == 4  # a, b, c + OOV
    ids = apply_vocab(mapping, ["a", "d", "zzz"])
    assert ids.tolist() == [0, 3, 3]  # d and unseen both → OOV


def test_build_vocab_max_size():
    raw = ["a"] * 5 + ["b"] * 3 + ["c"] * 2
    mapping, size = build_vocab(raw, min_count=1, max_size=2)
    assert size == 2 and mapping["a"] == 0 and "b" not in mapping


def test_pad_mulhot():
    vals, lengths = pad_mulhot([[1, 2], [], [3, 4, 5, 6]], max_degree=3)
    assert vals.shape == (3, 3)
    assert lengths.tolist() == [2, 0, 3]
    assert vals[0].tolist() == [1, 2, -1]
    assert vals[2].tolist() == [3, 4, 5]  # truncated


def test_attribute_data_validate_catches_bad_values():
    schema = EntitySchema(
        "item", 3,
        (EntitySchema.id_field("item", 3), AttrField("g", MULHOT, 4, max_degree=2)),
    )
    vals, lengths = pad_mulhot([[0], [1, 3], [2]], 2)
    data = AttributeData(schema, {"item_id": np.arange(3, dtype=np.int32),
                                  "g": vals}, {"g": lengths})
    data.validate()
    bad = vals.copy()
    bad[0, 0] = 9  # out of vocab
    data_bad = AttributeData(schema, {"item_id": np.arange(3, dtype=np.int32),
                                      "g": bad}, {"g": lengths})
    with pytest.raises(AssertionError):
        data_bad.validate()


def _fingerprint(ds):
    h = hashlib.sha256()
    for arr in (ds.train_users, ds.train_items, ds.valid_users, ds.valid_items,
                ds.seen_items, ds.item_freq, ds.hist_items):
        h.update(np.ascontiguousarray(arr).tobytes())
    for name in sorted(ds.item_attrs.values):
        h.update(np.ascontiguousarray(ds.item_attrs.values[name]).tobytes())
    return h.hexdigest()


def test_synthetic_deterministic_and_valid():
    cfg = DataConfig(syn_users=200, syn_items=150, syn_interactions=4000)
    a, b = generate(cfg), generate(cfg)
    assert _fingerprint(a) == _fingerprint(b)
    a.validate()
    # temporal leave-one-out: valid users unique, not in train as last element
    assert len(np.unique(a.valid_users)) == len(a.valid_users)
    # freq-sorted contract
    assert (np.diff(a.item_freq) <= 0).all()


def test_synthetic_split_holds_out_last():
    cfg = DataConfig(syn_users=100, syn_items=80, syn_interactions=2000)
    ds = generate(cfg)
    # every valid user's held-out item must NOT appear after any of their
    # train items in time — by construction it's the last interaction
    for u, it in zip(ds.valid_users[:20], ds.valid_items[:20]):
        assert ds.hist_lengths[u] >= 1
