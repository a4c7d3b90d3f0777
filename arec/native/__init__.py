"""ctypes bindings for the native batch packer, with numpy fallback.

See packer.cpp for why this exists (host-side hot loop, SURVEY.md §3.1).
`available()` reports whether the native path is active; every entry point
has a pure-numpy twin used both as fallback and as the test oracle
(tests/test_native.py).
"""

from __future__ import annotations

import ctypes

import numpy as np

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    from arec.native.build import build
    path = build()
    if path is None:
        _lib = False
        return _lib
    try:
        lib = ctypes.CDLL(path)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64 = ctypes.c_int64
        i32 = ctypes.c_int32
        lib.arec_pack_train_sequences.argtypes = [
            i32p, i32p, i64, i32p, i64, i64, i32, i32p, i32p, f32p]
        lib.arec_pack_eval_sequences.argtypes = [
            i32p, i32p, i64, i32p, i64, i64, i32, i32p, f32p]
        lib.arec_gather_rows_i32.argtypes = [i32p, i64, i64p, i64, i32p]
        lib.arec_abi_version.restype = i32
        assert lib.arec_abi_version() == 1
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def available() -> bool:
    return bool(_load())


def _p(a, t):
    return a.ctypes.data_as(t)


_I32P = ctypes.POINTER(ctypes.c_int32)
_I64P = ctypes.POINTER(ctypes.c_int64)
_F32P = ctypes.POINTER(ctypes.c_float)


def pack_train_sequences(hist, hist_len, users, L, pad_item):
    """→ (inputs [B,L] i32, targets [B,L] i32, mask [B,L] f32)."""
    hist = np.ascontiguousarray(hist, np.int32)
    hist_len = np.ascontiguousarray(hist_len, np.int32)
    users = np.ascontiguousarray(users, np.int32)
    b = len(users)
    lib = _load()
    if lib:
        inputs = np.empty((b, L), np.int32)
        targets = np.empty((b, L), np.int32)
        mask = np.empty((b, L), np.float32)
        lib.arec_pack_train_sequences(
            _p(hist, _I32P), _p(hist_len, _I32P),
            ctypes.c_int64(hist.shape[1]),
            _p(users, _I32P), ctypes.c_int64(b), ctypes.c_int64(L),
            ctypes.c_int32(pad_item),
            _p(inputs, _I32P), _p(targets, _I32P), _p(mask, _F32P))
        return inputs, targets, mask
    return pack_train_sequences_np(hist, hist_len, users, L, pad_item)


def pack_train_sequences_np(hist, hist_len, users, L, pad_item):
    b = len(users)
    inputs = np.full((b, L), pad_item, np.int32)
    targets = np.full((b, L), pad_item, np.int32)
    mask = np.zeros((b, L), np.float32)
    for r, u in enumerate(users):
        h = hist[u, : hist_len[u]]
        h = h[-(L + 1):]
        t = max(len(h) - 1, 0)
        if t:
            inputs[r, L - t:] = h[:-1]
            targets[r, L - t:] = h[1:]
            mask[r, L - t:] = 1.0
    return inputs, targets, mask


def pack_eval_sequences(hist, hist_len, users, L, pad_item):
    """→ (inputs [B,L] i32, mask [B,L] f32)."""
    hist = np.ascontiguousarray(hist, np.int32)
    hist_len = np.ascontiguousarray(hist_len, np.int32)
    users = np.ascontiguousarray(users, np.int32)
    b = len(users)
    lib = _load()
    if lib:
        inputs = np.empty((b, L), np.int32)
        mask = np.empty((b, L), np.float32)
        lib.arec_pack_eval_sequences(
            _p(hist, _I32P), _p(hist_len, _I32P),
            ctypes.c_int64(hist.shape[1]),
            _p(users, _I32P), ctypes.c_int64(b), ctypes.c_int64(L),
            ctypes.c_int32(pad_item),
            _p(inputs, _I32P), _p(mask, _F32P))
        return inputs, mask
    return pack_eval_sequences_np(hist, hist_len, users, L, pad_item)


def pack_eval_sequences_np(hist, hist_len, users, L, pad_item):
    b = len(users)
    inputs = np.full((b, L), pad_item, np.int32)
    mask = np.zeros((b, L), np.float32)
    for r, u in enumerate(users):
        h = hist[u, : hist_len[u]][-L:]
        if len(h):
            inputs[r, L - len(h):] = h
            mask[r, L - len(h):] = 1.0
    return inputs, mask
