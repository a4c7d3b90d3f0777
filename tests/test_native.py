"""Native C++ packer vs numpy oracle + prefetcher semantics."""

import numpy as np
import pytest

from arec import native
from arec.data.prefetch import prefetch


@pytest.fixture(scope="module")
def hist():
    rng = np.random.default_rng(0)
    U, H = 60, 25
    h = np.full((U, H), -1, np.int32)
    hlen = rng.integers(0, H + 1, U).astype(np.int32)
    for u in range(U):
        h[u, : hlen[u]] = rng.integers(0, 500, hlen[u])
    return h, hlen


def test_native_builds():
    assert native.available(), "g++ build of arec/native/packer.cpp failed"


@pytest.mark.parametrize("L", [1, 8, 40])
def test_pack_train_matches_numpy(hist, L):
    h, hlen = hist
    users = np.random.default_rng(1).integers(0, len(h), 33).astype(np.int32)
    got = native.pack_train_sequences(h, hlen, users, L, 999)
    want = native.pack_train_sequences_np(h, hlen, users, L, 999)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("L", [1, 8, 40])
def test_pack_eval_matches_numpy(hist, L):
    h, hlen = hist
    users = np.random.default_rng(2).integers(0, len(h), 17).astype(np.int32)
    got = native.pack_eval_sequences(h, hlen, users, L, 999)
    want = native.pack_eval_sequences_np(h, hlen, users, L, 999)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_pack_edge_cases(hist):
    h, hlen = hist
    # user with empty history → all pad, zero mask
    hlen2 = hlen.copy()
    hlen2[0] = 0
    inp, tgt, msk = native.pack_train_sequences(
        h, hlen2, np.array([0], np.int32), 5, 42)
    assert (inp == 42).all() and (tgt == 42).all() and msk.sum() == 0
    # user with a single item → no (input, target) pair
    hlen2[1] = 1
    inp, tgt, msk = native.pack_train_sequences(
        h, hlen2, np.array([1], np.int32), 5, 42)
    assert msk.sum() == 0


def test_prefetch_preserves_order_and_content():
    batches = [{"x": np.full((2,), i)} for i in range(7)]
    out = list(prefetch(iter(batches), depth=3))
    assert len(out) == 7
    for i, b in enumerate(out):
        np.testing.assert_array_equal(b["x"], np.full((2,), i))


def test_prefetch_transform_runs():
    out = list(prefetch(iter([{"x": np.arange(3)}]),
                        transform=lambda b: {k: v * 2 for k, v in b.items()}))
    np.testing.assert_array_equal(out[0]["x"], np.array([0, 2, 4]))
