"""ctypes bindings for the native C++ batch sampler (native/sampler.cc).

Drop-in accelerated path for data.sampler.Sampler: identical output
structure and sampling semantics (rejection exclusions, reference SSL
interleave-then-halve layout), ~an order of magnitude faster than the numpy
path on large batches. Falls back silently when the library isn't built
(`make -C sagnn_tpu/native`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "libsampler.so")
_lib: Optional[ctypes.CDLL] = None


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def build_library(force: bool = False) -> bool:
    """Compile the .so with make; returns True on success.

    ALWAYS invokes make (incremental on sampler.cc's mtime): the .so is
    untracked, so a prebuilt library from before a C-ABI change would
    otherwise be loaded silently and called with a mismatched argument
    layout (garbage batches / OOB reads — the worst failure mode a
    sampler can have)."""
    del force  # make is incremental; an up-to-date .so is a no-op build
    try:
        subprocess.run(["make", "-C", os.path.dirname(_LIB_PATH)],
                       check=True, capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        # no toolchain: only trust an existing .so if it is newer than
        # its source (otherwise fall back to numpy rather than risk ABI
        # mismatch)
        src = os.path.join(os.path.dirname(_LIB_PATH), "sampler.cc")
        try:
            return (os.path.exists(_LIB_PATH)
                    and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src))
        except OSError:
            return False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not build_library():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sample_train_batch.restype = ctypes.c_int64
    lib.sample_ssl_batch.restype = ctypes.c_int64
    _lib = lib
    return lib


class NativeSamplerState:
    """Flattened dataset views shared with C++ (built once)."""

    def __init__(self, sequences: List[List[int]], trn_csr, sub_csrs,
                 tst_int):
        num_users = len(sequences)
        lens = np.array([len(s) for s in sequences], dtype=np.int64)
        self.seq_offsets = np.zeros(num_users + 1, dtype=np.int64)
        np.cumsum(lens, out=self.seq_offsets[1:])
        self.seq_items = np.concatenate(
            [np.asarray(s, dtype=np.int32) if len(s) else
             np.zeros(0, np.int32) for s in sequences]) if num_users else \
            np.zeros(0, np.int32)
        self.trn_indptr = trn_csr.indptr.astype(np.int64)
        self.trn_indices = np.ascontiguousarray(trn_csr.indices,
                                                dtype=np.int32)
        self.sub_indptr = [m.indptr.astype(np.int64) for m in sub_csrs]
        self.sub_indices = [np.ascontiguousarray(m.indices, dtype=np.int32)
                            for m in sub_csrs]
        self.tst_int = np.array(
            [t if t is not None else -1 for t in tst_int], dtype=np.int32)


def native_train_batch(lib, state: NativeSamplerState, bat_ids: np.ndarray,
                       batch_cap: int, samp_num: int, pred_num: int,
                       pos_length: int, num_items: int, seed: int):
    P = batch_cap * samp_num
    uids = np.empty(P, np.int32)
    pos_iids = np.empty(P, np.int32)
    neg_iids = np.empty(P, np.int32)
    useq_row = np.empty(P, np.int32)
    pair_mask = np.empty(P, np.float32)
    seq = np.empty((batch_cap, pos_length), np.int32)
    mask = np.empty((batch_cap, pos_length), np.float32)
    bat = np.ascontiguousarray(bat_ids, dtype=np.int32)
    lib.sample_train_batch(
        ctypes.c_uint64(seed), _i32p(bat), ctypes.c_int64(len(bat)),
        ctypes.c_int64(batch_cap), _i64p(state.seq_offsets),
        _i32p(state.seq_items), _i64p(state.trn_indptr),
        _i32p(state.trn_indices), _i32p(state.tst_int),
        ctypes.c_int32(num_items), ctypes.c_int32(samp_num),
        ctypes.c_int32(pred_num), ctypes.c_int32(pos_length),
        _i32p(uids), _i32p(pos_iids), _i32p(neg_iids), _i32p(useq_row),
        _f32p(pair_mask), _i32p(seq), _f32p(mask))
    return uids, pos_iids, neg_iids, useq_row, pair_mask, seq, mask


def native_ssl_batch(lib, state: NativeSamplerState, k: int,
                     bat_ids: np.ndarray, ssl_num: int, seed: int,
                     col_start: int, col_size: int):
    """Column window [col_start, col_start + col_size) of interval k's SSL
    pair arrays (full batch: col_start=0, col_size=batch*ssl_num) — see
    sample_ssl_batch's determinism contract in sampler.cc."""
    u_a = np.empty(col_size, np.int32)
    i_a = np.empty(col_size, np.int32)
    u_b = np.empty(col_size, np.int32)
    i_b = np.empty(col_size, np.int32)
    m = np.empty(col_size, np.float32)
    bat = np.ascontiguousarray(bat_ids, dtype=np.int32)
    lib.sample_ssl_batch(
        ctypes.c_uint64(seed), _i32p(bat), ctypes.c_int64(len(bat)),
        _i64p(state.sub_indptr[k]), _i32p(state.sub_indices[k]),
        ctypes.c_int32(ssl_num), ctypes.c_int64(col_start),
        ctypes.c_int64(col_size),
        _i32p(u_a), _i32p(i_a), _i32p(u_b), _i32p(i_b), _f32p(m))
    return u_a, i_a, u_b, i_b, m
