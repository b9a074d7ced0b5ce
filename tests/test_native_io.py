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


def _np_splat(events, vol_size):
    """The pure-numpy reference path (np.add.at), bypassing the native
    dispatch in gen_discretized_event_volume_np."""
    from v2ce_toolbox_tpu.data.voxelize import _floor_ceil_delta

    volume = np.zeros(vol_size, np.float32)
    x = events["x"].astype(np.int64)
    y = events["y"].astype(np.int64)
    t = events["timestamp"].astype(np.float64)
    p = np.where(events["polarity"] == 0, -1,
                 events["polarity"]).astype(np.int64)
    nb = vol_size[0] // 2
    t_min, t_max = t.min(), t.max()
    denom = max(t_max - t_min, 1e-12)
    t_scaled = np.clip((t - t_min) * ((nb - 1) / denom), 0, nb - 1)
    (t_fl, dt_fl), (t_ce, dt_ce) = _floor_ceil_delta(t_scaled)
    vol_mul = np.where(p < 0, nb, 0)
    flat = volume.reshape(-1)
    for tt, dt in ((t_fl, dt_fl), (t_ce, dt_ce)):
        inds = (vol_size[1] * vol_size[2]) * (tt + vol_mul) \
            + vol_size[2] * y + x
        np.add.at(flat, inds, dt.astype(np.float32))
    return volume


def _events(n, h, w, seed, span_us=500_000, integer_bins=False):
    from v2ce_toolbox_tpu.events import EVENT_DTYPE

    rng = np.random.RandomState(seed)
    ev = np.zeros(n, EVENT_DTYPE)
    if integer_bins:
        # timestamps exactly on bin edges: exercises the +-1e-8 epsilons
        ev["timestamp"] = rng.randint(0, 10, n) * (span_us // 9)
    else:
        ev["timestamp"] = np.sort(rng.randint(0, span_us, n))
    ev["x"] = rng.randint(0, w, n)
    ev["y"] = rng.randint(0, h, n)
    ev["polarity"] = rng.randint(0, 2, n)
    return ev


def test_voxel_splat_matches_numpy_bit_exact():
    from v2ce_toolbox_tpu.data.voxelize import gen_discretized_event_volume_np

    assert native.native_available()
    for seed, integer_bins in ((0, False), (1, True)):
        ev = _events(20_000, 64, 80, seed, integer_bins=integer_bins)
        want = _np_splat(ev, (20, 64, 80))
        vol = np.zeros((20, 64, 80), np.float32)
        assert native.voxel_splat(ev, vol)
        np.testing.assert_array_equal(vol, want)
        # and the public converter dispatches to the same result
        np.testing.assert_array_equal(
            gen_discretized_event_volume_np(ev, (20, 64, 80)), want)


def test_voxel_splat_single_timestamp_degenerate():
    ev = _events(5000, 32, 32, seed=2)
    ev["timestamp"] = 777                      # t_max == t_min
    want = _np_splat(ev, (6, 32, 32))
    vol = np.zeros((6, 32, 32), np.float32)
    assert native.voxel_splat(ev, vol)
    np.testing.assert_array_equal(vol, want)
