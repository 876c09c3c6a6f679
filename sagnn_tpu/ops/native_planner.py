"""ctypes bindings for the native SpMM planner (native/planner.cc).

Drop-in accelerated path for ops.spmm_pallas.plan_spmm's host loop: builds
byte-identical chunk schedules ~50-100x faster (the Python planner costs
~10 s at 16M edges — prohibitive for the 100M-edge out-of-core configs).
Falls back silently when the library isn't built
(`make -C sagnn_tpu/native`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "libplanner.so")
_lib: Optional[ctypes.CDLL] = None


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


_build_failed = False


def build_library(force: bool = False) -> bool:
    """ALWAYS invokes make (incremental on planner.cc's mtime): the .so is
    untracked, so a prebuilt library from before a C-ABI change must be
    rebuilt rather than loaded with a mismatched argument layout."""
    global _build_failed
    if _build_failed and not force:
        return False  # don't re-spawn make on every plan call
    try:
        subprocess.run(["make", "-C", os.path.dirname(_LIB_PATH),
                        "libplanner.so"], check=True, capture_output=True)
        ok = os.path.exists(_LIB_PATH)
    except Exception:
        # no toolchain: only trust an existing .so newer than its source
        src = os.path.join(os.path.dirname(_LIB_PATH), "planner.cc")
        try:
            ok = (os.path.exists(_LIB_PATH)
                  and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src))
        except OSError:
            ok = False
    _build_failed = not ok
    return ok


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not build_library():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.plan_count.restype = ctypes.c_int64
    lib.plan_count.argtypes = [ctypes.POINTER(ctypes.c_int32),
                               ctypes.c_int64, ctypes.c_int32,
                               ctypes.c_int32, ctypes.c_int32]
    lib.plan_fill.restype = ctypes.c_int64
    lib.plan_fill.argtypes = [ctypes.POINTER(ctypes.c_int32)] * 3 + [
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32] + [
        ctypes.POINTER(ctypes.c_int32)] * 5
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def native_count(tgt: np.ndarray, num_edges: int, num_tgt: int, r: int,
                 c: int) -> int:
    lib = load_library()
    assert lib is not None
    tgt = np.ascontiguousarray(tgt[:num_edges], np.int32)
    return int(lib.plan_count(_i32p(tgt), num_edges, num_tgt, r, c))


def native_fill(src: np.ndarray, tgt: np.ndarray,
                edge_ids: Optional[np.ndarray], num_edges: int,
                num_tgt: int, r: int, c: int, num_chunks: int,
                pad_id: int, sort_sources: bool, track_edges: bool):
    """Allocate + fill the schedule arrays; returns
    (src, tgt_local, chunk_block, chunk_first, edge_slot|None)."""
    lib = load_library()
    assert lib is not None
    src = np.ascontiguousarray(src[:num_edges], np.int32)
    tgt = np.ascontiguousarray(tgt[:num_edges], np.int32)
    out_src = np.empty(num_chunks * c, np.int32)
    out_tl = np.empty((num_chunks, c), np.int32)
    out_cb = np.empty(num_chunks, np.int32)
    out_cf = np.empty(num_chunks, np.int32)
    out_eslot = np.empty(num_chunks * c, np.int32) if track_edges else None
    # keep a reference so the contiguous copy outlives the call
    eid_arr = (np.ascontiguousarray(edge_ids, np.int32)
               if edge_ids is not None else None)
    eid_p = (_i32p(eid_arr) if eid_arr is not None else
             ctypes.cast(None, ctypes.POINTER(ctypes.c_int32)))
    real = lib.plan_fill(
        _i32p(src), _i32p(tgt), eid_p, num_edges, num_tgt, r, c,
        num_chunks, pad_id, 1 if sort_sources else 0,
        _i32p(out_src), _i32p(out_tl), _i32p(out_cb), _i32p(out_cf),
        _i32p(out_eslot) if track_edges else
        ctypes.cast(None, ctypes.POINTER(ctypes.c_int32)))
    assert real >= 0, "planner: num_chunks too small"
    return out_src, out_tl, out_cb, out_cf, out_eslot
