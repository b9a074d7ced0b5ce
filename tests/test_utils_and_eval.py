"""Tests for the auxiliary utilities: physical attention, extra voxel
converters, baseline-stream scoring, runtime helpers."""

import numpy as np

from tests import conftest as _cf  # noqa: F401

from v2ce_toolbox_tpu.events import EVENT_DTYPE


def _events(n, h, w, seed=0, t_lo=0, t_hi=100000):
    rng = np.random.RandomState(seed)
    ev = np.zeros((n,), dtype=EVENT_DTYPE)
    ev["timestamp"] = np.sort(rng.randint(t_lo, t_hi, (n,)))
    ev["x"] = rng.randint(0, w, (n,))
    ev["y"] = rng.randint(0, h, (n,))
    ev["polarity"] = rng.randint(0, 2, (n,))
    return ev


def test_physical_attention_shapes_and_range():
    from v2ce_toolbox_tpu.utils.physical_att import (
        gen_event_frame,
        gen_mosaic_frame,
        physical_attention_batch_generation,
        physical_attention_generation,
    )

    h, w = 64, 80
    ev = _events(2000, h, w, seed=1)
    frames = np.random.RandomState(2).randint(
        0, 255, (2, h, w)).astype(np.float64)
    att = physical_attention_generation(ev, frames, pool_size=8)
    assert att.shape == (8, 10)
    assert 0 <= att.min() and att.max() <= 1.0

    ef = gen_event_frame(ev, (h, w))
    assert ef.sum() == len(ev)
    m = gen_mosaic_frame(ef.astype(np.float32), 8)
    np.testing.assert_allclose(m.mean(), ef.mean(), rtol=1e-5)

    batch = physical_attention_batch_generation(
        [ev, ev], np.stack([frames, frames]), pool_size=8)
    assert batch.shape == (2, 8, 10)


def test_structured_voxel_grid_polarity_split():
    from v2ce_toolbox_tpu.data.voxelize import structured_events_to_voxel_grid

    ev = _events(500, 16, 20, seed=3)
    vox = structured_events_to_voxel_grid(ev, 10, 20, 16)
    assert vox.shape == (2, 10, 16, 20)
    signed_total = vox.sum()
    expected = (ev["polarity"] == 1).sum() - (ev["polarity"] == 0).sum()
    np.testing.assert_allclose(signed_total, expected, rtol=1e-4)


def test_voxel_stat_counts():
    from v2ce_toolbox_tpu.data.voxelize import structured_events_to_voxel_stat

    ev = _events(400, 12, 14, seed=4)
    count, mean, std = structured_events_to_voxel_stat(ev, 10, 14, 12)
    assert count.sum() == len(ev)
    assert np.all(std >= 0)


def test_accumulate_frame_clipping():
    from v2ce_toolbox_tpu.data.voxelize import accumulate_frame

    ev = _events(1000, 4, 4, seed=5)
    frame = accumulate_frame(ev, 4, 4, clip=2)
    assert frame.shape == (4, 4)
    assert frame.max() <= 2 and frame.min() >= -2


def test_baseline_stream_scoring_self_consistency():
    """A stream scored against its own voxelization is near-perfect."""
    from v2ce_toolbox_tpu.eval.baseline_metrics import (
        score_stream_against_gt,
        voxelize_stream,
    )

    h, w = 16, 20
    ev = _events(3000, h, w, seed=6)
    gt = voxelize_stream(ev, num_frames=4, num_bins=10, frame_size=(h, w))
    out = score_stream_against_gt(ev, gt)
    assert out["BinaryMatchF1_sum_cp"] > 0.99
    assert out["PoolMSE_2"] < 1e-6


def test_runtime_utils(tmp_path):
    from v2ce_toolbox_tpu.utils.runtime import (
        Timer,
        build_working_tree,
        init_logging,
        tic_toc,
    )

    init_logging(str(tmp_path))
    tree = build_working_tree(str(tmp_path), "exp")
    import os

    assert os.path.isdir(tree["checkpoints"])

    with Timer("t"):
        pass

    @tic_toc
    def f(x):
        return x + 1

    assert f(1) == 2


def test_mvsec_converter_roundtrip(tmp_path):
    """Build a synthetic MVSEC-format h5, convert, load via the dataset."""
    import h5py

    from v2ce_toolbox_tpu.data.event_pack_dataset import EventPackDataset
    from v2ce_toolbox_tpu.data.mvsec import convert_mvsec_h5

    rng = np.random.RandomState(0)
    n_frames, h, w = 35, 32, 40
    n_events = 20000
    path = str(tmp_path / "synthetic_data.hdf5")
    with h5py.File(path, "w") as f:
        g = f.create_group("davis/left")
        g.create_dataset("image_raw",
                         data=rng.randint(0, 255, (n_frames, h, w),
                                          dtype=np.uint8))
        ts = np.arange(n_frames) / 30.0
        g.create_dataset("image_raw_ts", data=ts)
        ev = np.zeros((n_events, 4))
        ev[:, 0] = rng.randint(0, w, n_events)
        ev[:, 1] = rng.randint(0, h, n_events)
        ev[:, 2] = np.sort(rng.rand(n_events)) * ts[-1]
        ev[:, 3] = rng.choice([-1, 1], n_events)
        g.create_dataset("events", data=ev)
        g.create_dataset("image_raw_event_inds",
                         data=np.searchsorted(ev[:, 2], ts))
        g.create_dataset("imu", data=rng.randn(100, 6))
        g.create_dataset("imu_ts", data=np.linspace(0, ts[-1], 100))

    out_dir = str(tmp_path / "packets")
    n = convert_mvsec_h5(path, out_dir, max_sequences=2)
    assert n == 2

    ds = EventPackDataset("train", out_dir, include_flows=False)
    item = ds[0]
    assert item["image_units"].shape == (16, h, w, 2)
    assert item["voxels"].shape == (16, h, w, 20)


def test_image_gradient_matches_scipy():
    """Sobel magnitude matches a scipy transcription of the reference
    (image_derivative.py:59-77, zero-padded conv)."""
    from scipy.signal import convolve2d

    import jax.numpy as jnp

    from v2ce_toolbox_tpu.utils.image_derivative import batch_img_gradient

    rng = np.random.RandomState(0)
    img = rng.rand(12, 14).astype(np.float32)
    sx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
    # torch F.conv2d is cross-correlation with zero padding
    gx = convolve2d(img, sx[::-1, ::-1], mode="same")
    gy = convolve2d(img, sx.T[::-1, ::-1], mode="same")
    ref = np.sqrt(gx ** 2 + gy ** 2)
    ours = np.asarray(batch_img_gradient(
        jnp.asarray(img)[None, :, :, None]))[0, :, :, 0]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_double_blurred_gradient_shape():
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.utils.image_derivative import (
        get_batch_double_blurred_image_gradient,
    )

    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.rand(2, 16, 18, 1).astype(np.float32))
    b = jnp.asarray(rng.rand(2, 16, 18, 1).astype(np.float32))
    g = get_batch_double_blurred_image_gradient(a, b)
    assert g.shape == (2, 16, 18, 1)
    assert np.all(np.asarray(g) >= 0)


def test_resnet_discriminator_logits():
    import jax
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.models.resnet import ResNetDiscriminator

    disc = ResNetDiscriminator()
    x = jnp.zeros((2, 64, 80, 20))
    variables = disc.init(jax.random.key(0), x)
    out = disc.apply(variables, x, train=False)
    assert out.shape == (2, 2)


def test_flow_to_color_properties():
    import sys

    sys.path.insert(0, _cf.REPO_ROOT)
    from tools.vis_tools import flow_to_color

    rng = np.random.RandomState(0)
    flow = rng.randn(16, 20, 2).astype(np.float32)
    img = flow_to_color(flow)
    assert img.shape == (16, 20, 3) and img.dtype == np.uint8
    # zero flow renders (nearly) white
    white = flow_to_color(np.zeros((4, 4, 2), np.float32))
    assert white.min() >= 250


def test_confusion_matrix_figure(tmp_path):
    import sys

    sys.path.insert(0, _cf.REPO_ROOT)
    from tools.vis_tools import plot_confusion_matrix

    cm = np.array([[5, 1], [2, 7]])
    p = plot_confusion_matrix(cm, ["a", "b"], save_path=str(tmp_path / "cm.png"))
    import os

    assert os.path.exists(p)
