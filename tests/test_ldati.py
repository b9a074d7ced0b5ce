"""Golden tests: TPU LDATI sampler vs the torch reference.

Deterministic sub-stages (relocation, slope fit, chain timestamps, event
counts) must match the reference exactly; the stochastic additional-event
timestamps are validated distributionally (the north star is
distribution-matched streams — torch and jax RNGs cannot match bitwise).
"""

import numpy as np
import pytest

from tests import conftest as _cf

torch = pytest.importorskip("torch")

_cf.add_reference_to_path()


def _rand_voxels(shape, seed=0, scale=3.0, sparsity=0.5):
    """Non-negative, somewhat sparse voxels resembling relu outputs."""
    rng = np.random.RandomState(seed)
    v = rng.rand(*shape).astype(np.float32) * scale
    mask = rng.rand(*shape) < sparsity
    return (v * mask).astype(np.float32)


@pytest.mark.parametrize("bidirectional", [False, True])
def test_relocate_counts_parity(bidirectional):
    from scripts.LDATI import y_relocate as torch_relocate

    from v2ce_toolbox_tpu.ops.ldati import relocate_counts

    y = _rand_voxels((4, 10, 12, 17), seed=3)
    ref_counts, ref_tend = torch_relocate(
        torch.from_numpy(y), bidirectional=bidirectional
    )
    counts, tend = relocate_counts(
        np.asarray(y), bidirectional=bidirectional
    )
    np.testing.assert_array_equal(np.asarray(counts), ref_counts.numpy())
    np.testing.assert_allclose(
        np.asarray(tend), ref_tend.numpy(), rtol=1e-5, atol=1e-6
    )


def test_relocate_erase_beginning():
    from scripts.LDATI import y_relocate as torch_relocate

    from v2ce_toolbox_tpu.ops.ldati import relocate_counts

    y = _rand_voxels((2, 10, 6, 7), seed=9, scale=0.02, sparsity=1.0)
    ref_counts, _ = torch_relocate(torch.from_numpy(y), erase_beginning=True)
    counts, _ = relocate_counts(np.asarray(y), erase_beginning=True)
    np.testing.assert_array_equal(np.asarray(counts), ref_counts.numpy())


@pytest.mark.parametrize("pooling", ["none", "avg", "weighted"])
def test_slope_params_parity(pooling):
    """Our closed-form slope equals the reference's conv1d least squares,
    including its normalization (reference: LDATI.py:176-190)."""
    import torch.nn as nn
    import torch.nn.functional as F

    from scripts.LDATI import calculate_statistical_linear_params_for_stage2

    from v2ce_toolbox_tpu.ops.ldati import slope_params

    fps = 30
    counts = _rand_voxels((2, 9, 10, 13), seed=5, scale=6.0).round()
    voxel_step = 1.0 / fps / counts.shape[1]

    ty = torch.from_numpy(counts)
    if pooling == "weighted":
        kern = torch.tensor([[1, 2, 1], [2, 4, 2], [1, 2, 1]], dtype=torch.float) / 16
        kern = kern.unsqueeze(0).unsqueeze(0)
        n, c, h, w = ty.shape
        y_pooled = F.conv2d(ty.reshape(n * c, 1, h, w), kern, padding=1).reshape(
            n, c, h, w
        )
    elif pooling == "avg":
        y_pooled = nn.AvgPool2d(kernel_size=3, stride=1, padding=1)(ty)
    else:
        y_pooled = ty
    ref_k = (
        calculate_statistical_linear_params_for_stage2(y_pooled)
        / (voxel_step ** 2)
        / (y_pooled + 1e-8)
    ).numpy()
    ref_b = 1.0 / voxel_step - voxel_step * ref_k / 2.0

    k, b = slope_params(np.asarray(counts), fps, pooling_type=pooling)
    np.testing.assert_allclose(np.asarray(k), ref_k, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(b), ref_b, rtol=1e-4, atol=1e-2)


def _ref_sample(y, **kw):
    from scripts.LDATI import sample_voxel_statistical as torch_sample

    return torch_sample(torch.from_numpy(y), **kw)


def _rec_tuples(rec):
    return sorted(
        zip(
            rec["x"].tolist(),
            rec["y"].tolist(),
            rec["polarity"].tolist(),
            rec["timestamp"].tolist(),
        )
    )


def test_strategy_none_exact_parity():
    """With additional_events_strategy='none' the sampler is fully
    deterministic: only count==1 chain events are emitted
    (reference: LDATI.py:228,241-245) — event sets must match exactly
    (timestamps within 1 µs: the reference computes them in float64)."""
    from v2ce_toolbox_tpu.ops.ldati import sample_voxel_statistical

    y = _rand_voxels((3, 2, 10, 9, 11), seed=21, scale=2.0)
    ref = _ref_sample(y, additional_events_strategy="none")
    ours = sample_voxel_statistical(y, additional_events_strategy="none",
                                    capacity=4096)
    assert len(ref) == len(ours)
    for r, o in zip(ref, ours):
        assert len(r) == len(o)
        rt = _rec_tuples(r)
        ot = _rec_tuples(o)
        for (rx, ry, rp, rts), (ox, oy, op_, ots) in zip(rt, ot):
            assert (rx, ry, rp) == (ox, oy, op_)
            assert abs(rts - ots) <= 1


@pytest.mark.parametrize("strategy", ["slope", "random"])
def test_count_conservation(strategy):
    """Event counts are deterministic given the voxels: per-frame totals and
    per-(x, y, polarity) counts must match the reference exactly."""
    from v2ce_toolbox_tpu.ops.ldati import sample_voxel_statistical

    y = _rand_voxels((2, 2, 10, 9, 11), seed=33, scale=4.0)
    torch.manual_seed(0)
    ref = _ref_sample(y, additional_events_strategy=strategy)
    ours = sample_voxel_statistical(y, additional_events_strategy=strategy,
                                    capacity=1 << 14, max_events_per_voxel=32)
    h, w = y.shape[-2:]
    for r, o in zip(ref, ours):
        assert len(r) == len(o)
        ref_grid = np.zeros((2, h, w), np.int64)
        our_grid = np.zeros((2, h, w), np.int64)
        np.add.at(ref_grid, (r["polarity"], r["y"], r["x"]), 1)
        np.add.at(our_grid, (o["polarity"], o["y"], o["x"]), 1)
        np.testing.assert_array_equal(our_grid, ref_grid)


def test_slope_timestamps_in_bin_and_sorted():
    from v2ce_toolbox_tpu.ops.ldati import sample_voxel_statistical

    fps = 30
    y = _rand_voxels((2, 2, 10, 9, 11), seed=7, scale=5.0)
    ours = sample_voxel_statistical(y, fps=fps, capacity=1 << 14,
                                    max_events_per_voxel=32)
    for rec in ours:
        ts = rec["timestamp"]
        assert np.all(np.diff(ts) >= 0), "stream must be time-sorted"
        assert ts.min() >= 0
        # all events inside the frame window (9 bins of 1/fps/9 each)
        assert ts.max() <= int(1e6 / fps) + 2


def test_timestamp_distribution_slope():
    """Distributional check: with a strong positive slope, later sub-bin
    times must be denser than earlier ones (linear density k*t + b)."""
    from v2ce_toolbox_tpu.ops.ldati import sample_events

    import jax
    import jax.numpy as jnp

    fps = 30
    # Voxels shaped to give bin 4 a large positive slope: ramp over bins.
    h = w = 24
    c = 10
    y = np.zeros((1, 2, c, h, w), np.float32)
    y[:, :, :, :, :] = np.linspace(0, 8, c)[None, None, :, None, None]
    stream = sample_events(jnp.asarray(y), jax.random.key(1), fps=fps,
                           capacity=1 << 16, max_events_per_voxel=32)
    t = np.asarray(stream.t_us[0][: int(stream.count[0])])
    cb = c - 1
    voxel_step_us = 1e6 / fps / cb
    # Take events of an interior bin and check within-bin skew: mean of the
    # sub-bin offset should exceed voxel_step/2 for a positive slope.
    bin_idx = (t / voxel_step_us).astype(int).clip(0, cb - 1)
    sub = t - bin_idx * voxel_step_us
    interior = (bin_idx >= 2) & (bin_idx <= 6)
    assert interior.sum() > 1000
    # Expected relative mean for the ramp is ~0.515-0.52 of a bin; a uniform
    # sampler gives 0.50. 0.51 separates the two by many standard errors.
    assert sub[interior].mean() > 0.51 * voxel_step_us


def test_overflow_accounting():
    """Voxels above the per-voxel cap report dropped events instead of
    silently truncating."""
    from v2ce_toolbox_tpu.ops.ldati import sample_events

    import jax
    import jax.numpy as jnp

    y = np.zeros((1, 2, 10, 4, 5), np.float32)
    y[0, 0, 3, 2, 2] = 9.0   # 9 events in one voxel
    stream = sample_events(jnp.asarray(y), jax.random.key(0),
                           max_events_per_voxel=4, capacity=1024)
    assert int(stream.dropped[0]) == 5
    assert int(stream.count[0]) >= 4


def test_bidirectional_sampler_end_to_end():
    """Bidirectional relocation through the full sampler: runs, conserves
    the relocated counts, stays sorted (the ablation path of LDATI.py:89)."""
    import jax

    from v2ce_toolbox_tpu.ops.ldati import relocate_counts, sample_events

    y = _rand_voxels((2, 2, 10, 9, 11), seed=51, scale=3.0)
    stream = sample_events(jax.numpy.asarray(y), jax.random.key(3),
                           bidirectional=True, capacity=1 << 14,
                           max_events_per_voxel=32)
    counts, _ = relocate_counts(
        jax.numpy.asarray(y.reshape(4, 10, 9, 11)), bidirectional=True)
    counts = np.maximum(np.asarray(counts), 0)
    expected = int((counts == 1).sum() + counts[counts >= 2].sum())
    got = int(np.asarray(stream.count).sum()) + int(
        np.asarray(stream.dropped).sum())
    assert got == expected
    for f in range(2):
        n = int(stream.count[f])
        t = np.asarray(stream.t_us[f][:n])
        assert np.all(np.diff(t) >= 0)


def test_dropped_exact_in_block_pool_path():
    """`dropped` must be EXACT — equal to the analytic loss — on a dense
    multi-voxel worst case where multis exceed both the 16-voxel block pool
    and max_events_per_voxel (ops/ldati.compact_frame_events block path)."""
    import jax
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.ldati import compact_frame_events

    V, pool, mepv = 256, 32, 4
    emit = np.ones(V, np.int32)
    emit[48:64] = 5          # block 3: extra 4 (capped to 3 per voxel)
    emit[48] = 20            # extra 19, capped to 3
    emit[112:128] = 3        # block 7: extra 2
    emit[180] = 2            # block 11: score 1 < blocks 3/7 -> outside pool

    def ts_fn(j, u, vox_idx):
        return (u * 1000).astype(jnp.int32)

    total = int(emit.sum())                      # 368
    chains = int((emit > 0).sum())               # 256
    in_pool_extras = 15 * 3 + 3 + 16 * 2         # 45 + 3 + 32 = 80
    expect_emitted = chains + in_pool_extras     # 336

    for capacity, expect_count in ((512, expect_emitted), (300, 300)):
        t_us, vox, count, dropped = compact_frame_events(
            jnp.asarray(emit), ts_fn, jax.random.key(0),
            max_events_per_voxel=mepv, max_multi_voxels=pool,
            capacity=capacity)
        assert int(count) == expect_count
        assert int(dropped) == total - expect_count
        # the buffer really holds `count` valid events, sorted
        keys = np.asarray(t_us)
        n_valid = int((keys < np.iinfo(np.int32).max).sum())
        assert n_valid == min(expect_emitted, capacity)
        assert (np.diff(keys[:n_valid]) >= 0).all()


def test_dropped_exact_end_to_end_dense():
    """Full sampler: count + dropped == the analytic relocated totals on a
    dense grid with a small pool and per-voxel cap (VERDICT r1 weak #6)."""
    import jax
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.ldati import relocate_counts, sample_events

    rng = np.random.RandomState(7)
    bb, p, c, h, w = 2, 2, 10, 8, 8
    voxels = rng.uniform(3.0, 6.0, (bb, p, c, h, w)).astype(np.float32)

    counts, _ = relocate_counts(
        jnp.asarray(voxels).reshape(bb * p, c, h, w))
    counts = np.asarray(counts).reshape(bb, p, 9, h, w)
    total_per_frame = counts.sum(axis=(1, 2, 3, 4))

    stream = sample_events(
        jnp.asarray(voxels), jax.random.key(3),
        max_events_per_voxel=3, max_multi_voxels=64, capacity=4096)
    got = np.asarray(stream.count) + np.asarray(stream.dropped)
    np.testing.assert_array_equal(got, total_per_frame)


def test_sort_cap_exact_when_no_overflow():
    """The pre-sort width compaction (sort_cap) must produce a stream
    IDENTICAL to the uncompacted sort when no (frame, bin) row overflows
    it — the compaction only strips INVALID padding before ordering."""
    import jax
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.ldati import sample_events

    rng = np.random.RandomState(11)
    bb, p, c, h, w = 1, 2, 10, 16, 16
    voxels = (rng.rand(bb, p, c, h, w) < 0.3).astype(np.float32) * \
        rng.randint(1, 5, (bb, p, c, h, w))

    kwargs = dict(fps=30, max_events_per_voxel=8, capacity=1 << 14,
                  cap_bin=2048, multi_cap=512)
    a = sample_events(jnp.asarray(voxels), jax.random.key(5),
                      sort_cap=None, **kwargs)
    b = sample_events(jnp.asarray(voxels), jax.random.key(5),
                      sort_cap=2048, **kwargs)
    np.testing.assert_array_equal(np.asarray(a.count), np.asarray(b.count))
    np.testing.assert_array_equal(np.asarray(a.dropped),
                                  np.asarray(b.dropped))
    n = int(a.count[0])
    assert n > 100
    np.testing.assert_array_equal(np.asarray(a.t_us)[:, :n],
                                  np.asarray(b.t_us)[:, :n])
    np.testing.assert_array_equal(np.asarray(a.x)[:, :n],
                                  np.asarray(b.x)[:, :n])
    np.testing.assert_array_equal(np.asarray(a.y)[:, :n],
                                  np.asarray(b.y)[:, :n])
    np.testing.assert_array_equal(np.asarray(a.p)[:, :n],
                                  np.asarray(b.p)[:, :n])


def test_sort_cap_overflow_is_accounted():
    """When sort_cap is small enough to drop events, count + dropped must
    still equal the analytic relocated totals (exact accounting)."""
    import jax
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.ldati import relocate_counts, sample_events

    rng = np.random.RandomState(7)
    bb, p, c, h, w = 1, 2, 10, 12, 12
    voxels = rng.uniform(2.0, 5.0, (bb, p, c, h, w)).astype(np.float32)

    counts, _ = relocate_counts(
        jnp.asarray(voxels).reshape(bb * p, c, h, w))
    counts = np.asarray(counts).reshape(bb, p, 9, h, w)
    total_per_frame = counts.sum(axis=(1, 2, 3, 4))

    stream = sample_events(
        jnp.asarray(voxels), jax.random.key(3),
        max_events_per_voxel=4, capacity=1 << 14,
        cap_bin=2048, multi_cap=256, sort_cap=256)
    got = np.asarray(stream.count) + np.asarray(stream.dropped)
    np.testing.assert_array_equal(got, total_per_frame)
    t = np.asarray(stream.t_us[0][: int(stream.count[0])])
    assert np.all(np.diff(t) >= 0)
