"""North-star validation: distribution-matched event streams vs the torch
reference (BASELINE.md). Counts are exact (tested in test_ldati); here the
stochastic timestamp distributions are compared via empirical-CDF distance
on identical voxel inputs."""

import numpy as np
import pytest

from tests import conftest as _cf

torch = pytest.importorskip("torch")

_cf.add_reference_to_path()


def _ks_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Two-sample Kolmogorov-Smirnov statistic."""
    a = np.sort(a)
    b = np.sort(b)
    grid = np.concatenate([a, b])
    cdf_a = np.searchsorted(a, grid, side="right") / max(len(a), 1)
    cdf_b = np.searchsorted(b, grid, side="right") / max(len(b), 1)
    return float(np.abs(cdf_a - cdf_b).max())


@pytest.mark.parametrize("strategy", ["slope", "random"])
def test_ldati_timestamp_distribution_matches_reference(strategy):
    """Same voxels through both samplers: per-event timestamp populations
    must match distributionally (KS < 0.02 over ~100k events)."""
    from scripts.LDATI import sample_voxel_statistical as torch_sample

    from v2ce_toolbox_tpu.ops.ldati import sample_voxel_statistical

    rng = np.random.RandomState(7)
    shape = (2, 2, 10, 32, 44)
    y = (rng.rand(*shape) * 4 * (rng.rand(*shape) < 0.6)).astype(np.float32)

    torch.manual_seed(0)
    ref = torch_sample(torch.from_numpy(y),
                       additional_events_strategy=strategy)
    ours = sample_voxel_statistical(y, additional_events_strategy=strategy,
                                    capacity=1 << 16,
                                    max_events_per_voxel=32)
    ref_ts = np.concatenate([r["timestamp"] for r in ref]).astype(np.float64)
    our_ts = np.concatenate([o["timestamp"] for o in ours]).astype(np.float64)
    assert len(ref_ts) == len(our_ts)          # counts exact
    assert len(ref_ts) > 50000                 # statistically meaningful
    ks = _ks_distance(ref_ts, our_ts)
    assert ks < 0.02, f"timestamp KS distance {ks}"

    # per-polarity distribution too
    for pol in (0, 1):
        r = np.concatenate([x["timestamp"][x["polarity"] == pol]
                            for x in ref]).astype(np.float64)
        o = np.concatenate([x["timestamp"][x["polarity"] == pol]
                            for x in ours]).astype(np.float64)
        assert _ks_distance(r, o) < 0.03


def test_baseline_even_distribution_matches_reference():
    """Even baseline with fractional voxels: Bernoulli selections differ
    per-voxel but the aggregate timestamp distribution must match."""
    ref_mod = _cf.load_reference_module(
        "train/scripts/stage2/sample_methods/random_even_sample.py",
        "ref_random_even2")

    from v2ce_toolbox_tpu.ops.samplers import sample_voxel_baseline

    rng = np.random.RandomState(9)
    shape = (2, 2, 10, 24, 30)
    y = (rng.rand(*shape) * 3).astype(np.float32)
    torch.manual_seed(1)
    ref = ref_mod.sample_voxel_baseline(torch.from_numpy(y), even=True)
    ours = sample_voxel_baseline(y, even=True, capacity=1 << 16,
                                 max_events_per_voxel=16)
    ref_ts = np.concatenate([r["timestamp"] for r in ref]).astype(np.float64)
    our_ts = np.concatenate([o["timestamp"] for o in ours]).astype(np.float64)
    # counts are Bernoulli -> equal in expectation, within 4 sigma
    n_frac = (y - np.floor(y)).sum()
    sigma = np.sqrt(max(n_frac, 1.0))
    assert abs(len(ref_ts) - len(our_ts)) < 4 * sigma + 1
    assert _ks_distance(ref_ts, our_ts) < 0.02
