"""ctypes bindings for the native event-IO library (native/event_io.cpp).

Compiled on demand with g++ into the user cache dir; every entry point has
a pure-numpy fallback so the package works without a toolchain. The packer
turns the device's SoA event buffers into the reference's 13-byte AoS
structured records (scripts/LDATI.py:308-309) in one multithreaded pass.
"""

from __future__ import annotations

import ctypes
import logging
import os
import os.path as op
import subprocess
from typing import List, Optional

import numpy as np

from v2ce_toolbox_tpu.events import EVENT_DTYPE

logger = logging.getLogger(__name__)

_SRC = op.join(op.dirname(op.dirname(op.dirname(op.abspath(__file__)))),
               "native", "event_io.cpp")
_CACHE = os.path.expanduser("~/.cache/v2ce_native")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so_path = op.join(_CACHE, "libv2ce_events.so")
    try:
        if (not op.exists(so_path) or
                os.stat(so_path).st_mtime < os.stat(_SRC).st_mtime):
            os.makedirs(_CACHE, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", so_path, _SRC, "-lpthread"],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        lib.v2ce_pack_event_stream.restype = ctypes.c_int64
        lib.v2ce_pack_event_stream.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int32,
        ]
        lib.v2ce_first_inversion.restype = ctypes.c_int64
        lib.v2ce_first_inversion.argtypes = [ctypes.c_void_p,
                                             ctypes.c_int64]
        lib.v2ce_voxel_splat.restype = None
        lib.v2ce_voxel_splat.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
        ]
        _LIB = lib
    except Exception as e:  # toolchain missing / compile failure
        logger.warning("native event IO unavailable (%s); numpy fallback", e)
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def pack_event_stream(
    t_us: np.ndarray,         # (B, E) int32
    x: np.ndarray,            # (B, E) int16
    y: np.ndarray,            # (B, E) int16
    p: np.ndarray,            # (B, E) int8
    counts: np.ndarray,       # (B,) int32
    frame_offsets_us: np.ndarray,  # (B,) int64
    num_threads: int = 4,
) -> np.ndarray:
    """SoA buffers + per-frame offsets -> one concatenated structured event
    stream (the v2ce.py:363-367 merge)."""
    b, e = t_us.shape
    total = int(counts.sum())
    out = np.empty(total, dtype=EVENT_DTYPE)
    lib = _load()
    if lib is not None and total:
        t_us = np.ascontiguousarray(t_us, np.int32)
        x = np.ascontiguousarray(x, np.int16)
        y = np.ascontiguousarray(y, np.int16)
        p = np.ascontiguousarray(p, np.int8)
        counts = np.ascontiguousarray(counts, np.int32)
        offs = np.ascontiguousarray(frame_offsets_us, np.int64)
        n = lib.v2ce_pack_event_stream(
            t_us.ctypes.data, x.ctypes.data, y.ctypes.data, p.ctypes.data,
            counts.ctypes.data, offs.ctypes.data,
            b, e, out.ctypes.data_as(ctypes.c_void_p), num_threads)
        assert n == total, (n, total)
        return out
    # numpy fallback
    pos = 0
    for f in range(b):
        n = int(counts[f])
        out["timestamp"][pos:pos + n] = (
            t_us[f, :n].astype(np.int64) + int(frame_offsets_us[f]))
        out["x"][pos:pos + n] = x[f, :n]
        out["y"][pos:pos + n] = y[f, :n]
        out["polarity"][pos:pos + n] = p[f, :n]
        pos += n
    return out


def voxel_splat(events: np.ndarray, vol: np.ndarray) -> bool:
    """Native discretized-volume splat into a zeroed (2*nb, H, W) float32
    `vol` from structured events; returns False when the library is
    unavailable (caller falls back to np.add.at). Bit-identical to the
    numpy recipe in data/voxelize.gen_discretized_event_volume_np."""
    lib = _load()
    if lib is None or vol.dtype != np.float32 or not vol.flags.c_contiguous:
        return False
    t = np.ascontiguousarray(events["timestamp"], np.int64)
    x = np.ascontiguousarray(events["x"], np.int16)
    y = np.ascontiguousarray(events["y"], np.int16)
    p = np.ascontiguousarray(events["polarity"], np.int8)
    nb2, h, w = vol.shape
    lib.v2ce_voxel_splat(
        t.ctypes.data, x.ctypes.data, y.ctypes.data, p.ctypes.data,
        len(events), nb2 // 2, h, w,
        vol.ctypes.data_as(ctypes.c_void_p))
    return True


def first_inversion(stream: np.ndarray) -> int:
    """Index of the first timestamp inversion, -1 if sorted."""
    lib = _load()
    if lib is not None:
        s = np.ascontiguousarray(stream)
        return int(lib.v2ce_first_inversion(
            s.ctypes.data_as(ctypes.c_void_p), len(s)))
    ts = stream["timestamp"]
    bad = np.nonzero(np.diff(ts) < 0)[0]
    return int(bad[0] + 1) if len(bad) else -1
