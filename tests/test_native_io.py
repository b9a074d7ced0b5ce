"""Tests for the native (C++) event-stream packer and its numpy fallback."""

import numpy as np

from tests import conftest as _cf  # noqa: F401

from v2ce_toolbox_tpu.io import native


def _soa(b=4, e=64, seed=0):
    rng = np.random.RandomState(seed)
    counts = rng.randint(0, e, b).astype(np.int32)
    t = np.full((b, e), np.iinfo(np.int32).max, np.int32)
    x = np.zeros((b, e), np.int16)
    y = np.zeros((b, e), np.int16)
    p = np.zeros((b, e), np.int8)
    for f in range(b):
        n = counts[f]
        t[f, :n] = np.sort(rng.randint(0, 33000, n)).astype(np.int32)
        x[f, :n] = rng.randint(0, 346, n)
        y[f, :n] = rng.randint(0, 260, n)
        p[f, :n] = rng.randint(0, 2, n)
    offs = (np.arange(b) * 33333).astype(np.int64)
    return t, x, y, p, counts, offs


def _numpy_reference(t, x, y, p, counts, offs):
    from v2ce_toolbox_tpu.events import EVENT_DTYPE

    parts = []
    for f in range(len(counts)):
        n = int(counts[f])
        rec = np.zeros(n, EVENT_DTYPE)
        rec["timestamp"] = t[f, :n].astype(np.int64) + offs[f]
        rec["x"], rec["y"], rec["polarity"] = x[f, :n], y[f, :n], p[f, :n]
        parts.append(rec)
    return np.concatenate(parts)


def test_native_library_compiles():
    assert native.native_available(), "g++ is baked in; compile must work"


def test_pack_event_stream_matches_numpy():
    args = _soa()
    ref = _numpy_reference(*args)
    out = native.pack_event_stream(*args)
    assert out.dtype == ref.dtype
    np.testing.assert_array_equal(out, ref)
    # sortedness check: per-frame sorted + increasing offsets -> sorted
    assert native.first_inversion(out) == -1


def test_first_inversion_detects():
    args = _soa(seed=3)
    out = native.pack_event_stream(*args)
    if len(out) > 2:
        out["timestamp"][1] = out["timestamp"][0] - 5
        assert native.first_inversion(out) in (1, 2)


def test_pack_multithreaded_equivalence():
    args = _soa(b=16, e=512, seed=4)
    a = native.pack_event_stream(*args, num_threads=1)
    b = native.pack_event_stream(*args, num_threads=8)
    np.testing.assert_array_equal(a, b)
