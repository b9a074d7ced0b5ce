"""Golden/distributional tests for the stage-2 ablation samplers."""

import numpy as np
import pytest

from tests import conftest as _cf

torch = pytest.importorskip("torch")


def _ref_baseline():
    return _cf.load_reference_module(
        "train/scripts/stage2/sample_methods/random_even_sample.py",
        "ref_random_even")


def _int_voxels(shape=(2, 2, 10, 8, 9), seed=0, hi=4, sparsity=0.4):
    rng = np.random.RandomState(seed)
    v = rng.randint(0, hi, shape).astype(np.float32)
    return (v * (rng.rand(*shape) < sparsity)).astype(np.float32)


def _rec_tuples(rec):
    return sorted(zip(rec["x"].tolist(), rec["y"].tolist(),
                      rec["polarity"].tolist(), rec["timestamp"].tolist()))


def test_even_integer_voxels_exact_parity():
    """With integer voxels the fractional Bernoulli part is empty and the
    'even' baseline is fully deterministic -> exact event-set parity with
    the reference (random_even_sample.py:131-139)."""
    from v2ce_toolbox_tpu.ops.samplers import sample_voxel_baseline

    y = _int_voxels(seed=11)
    ref = _ref_baseline().sample_voxel_baseline(torch.from_numpy(y), even=True)
    ours = sample_voxel_baseline(y, even=True, capacity=1 << 13,
                                 max_events_per_voxel=8)
    assert len(ref) == len(ours)
    for r, o in zip(ref, ours):
        assert len(r) == len(o)
        for (rx, ry, rp, rt), (ox, oy, op_, ot) in zip(_rec_tuples(r),
                                                       _rec_tuples(o)):
            assert (rx, ry, rp) == (ox, oy, op_)
            assert abs(rt - ot) <= 1


@pytest.mark.parametrize("mode", ["random", "even"])
def test_baseline_counts_bounded_by_voxel(mode):
    """Each voxel emits floor(y) or floor(y)+1 events (Bernoulli frac)."""
    import jax

    from v2ce_toolbox_tpu.ops.samplers import sample_events_baseline

    rng = np.random.RandomState(3)
    y = (rng.rand(1, 2, 10, 8, 9) * 3 * (rng.rand(1, 2, 10, 8, 9) < 0.5)
         ).astype(np.float32)
    stream = sample_events_baseline(y, jax.random.key(0), mode=mode,
                                    capacity=1 << 13,
                                    max_events_per_voxel=8)
    n = int(stream.count[0])
    assert int(stream.dropped[0]) == 0
    lo = np.floor(y).sum()
    hi = np.ceil(y).sum()
    assert lo <= n <= hi
    # per-pixel-per-polarity bound via re-binning
    t = np.asarray(stream.t_us[0][:n])
    x = np.asarray(stream.x[0][:n])
    yy = np.asarray(stream.y[0][:n])
    p = np.asarray(stream.p[0][:n])
    c = 10
    # +1 µs: events at a bin start are truncated to floor(k*3333.33) µs,
    # which re-bins to k-1 without the nudge
    bins = np.clip(((t + 1) * 30 * c / 1e6).astype(int), 0, c - 1)
    grid = np.zeros((2, c, 8, 9), np.int64)
    # polarity 1 = ON = reference P index 0
    np.add.at(grid, (1 - p, bins, yy, x), 1)
    assert np.all(grid >= np.floor(y[0]))
    assert np.all(grid <= np.floor(y[0]) + 1)


def test_pure_slope_counts_and_fold():
    """Pure-slope: bin 9 folds into bin 8 and per-voxel counts stay within
    [floor, floor+1] of the folded voxel (pure_slope_sample.py:93-99)."""
    import jax

    from v2ce_toolbox_tpu.ops.samplers import sample_events_pure_slope

    rng = np.random.RandomState(5)
    y = (rng.rand(1, 2, 10, 8, 9) * 2).astype(np.float32)
    folded = y.copy()
    folded[:, :, 8] += folded[:, :, 9]
    folded[:, :, 9] = 0
    stream = sample_events_pure_slope(y, jax.random.key(1),
                                      capacity=1 << 13,
                                      max_events_per_voxel=8)
    n = int(stream.count[0])
    assert np.floor(folded).sum() <= n <= np.ceil(folded).sum()
    t = np.asarray(stream.t_us[0][:n])
    assert np.all(np.diff(t) >= 0)
    # no event should land in the (emptied) last bin beyond slope spill
    c = 10
    delta_us = 1e6 / 30 / c
    bins = (t / delta_us).astype(int)
    assert (bins >= 9).mean() < 0.01


def test_random_mode_uniform_in_bin():
    import jax

    from v2ce_toolbox_tpu.ops.samplers import sample_events_baseline

    y = np.full((1, 2, 10, 16, 16), 2.0, np.float32)
    stream = sample_events_baseline(y, jax.random.key(2), mode="random",
                                    capacity=1 << 15,
                                    max_events_per_voxel=8)
    n = int(stream.count[0])
    t = np.asarray(stream.t_us[0][:n])
    c = 10
    delta_us = 1e6 / 30 / c
    sub = t % delta_us
    # uniform within bin: mean ~ delta/2
    assert abs(sub.mean() - delta_us / 2) < 0.03 * delta_us
