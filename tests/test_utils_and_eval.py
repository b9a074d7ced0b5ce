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


def test_video_reader_helpers(tmp_path):
    """Sampling/export helpers (reference: scripts/video_reader.py:153-333):
    to_images dumps every frame as <n>.png, read_frames spaces evenly,
    read_middle_frame / read_frame_at_index pick the right frames, and
    insets crop symmetrically (with the reference's H/W mixup fixed)."""
    import cv2

    from tools.make_test_video import make_frames
    from v2ce_toolbox_tpu.io.video import VideoReader

    frames = make_frames(num_frames=12, height=64, width=80)
    path = str(tmp_path / "clip.mp4")
    video = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                            (80, 64))
    for f in frames:
        video.write(cv2.cvtColor(f, cv2.COLOR_GRAY2BGR))
    video.release()

    reader = VideoReader(path, color_mode="GRAY")
    assert reader.frame_count == 12

    out_dir = reader.to_images(str(tmp_path / "pngs"))
    dumped = sorted(int(p.stem) for p in (tmp_path / "pngs").glob("*.png"))
    assert dumped == list(range(12))
    png5 = cv2.imread(str(tmp_path / "pngs" / "5.png"), cv2.IMREAD_GRAYSCALE)

    f5 = reader.read_frame_at_index(5)
    assert f5.shape == (64, 80)
    np.testing.assert_array_equal(f5, png5)

    mid = reader.read_middle_frame()
    np.testing.assert_array_equal(mid, reader.read_frame_at_index(6))

    sampled = reader.read_frames(4)
    assert sampled.shape == (4, 64, 80)
    np.testing.assert_array_equal(sampled[0], reader.read_frame_at_index(0))
    np.testing.assert_array_equal(sampled[-1], reader.read_frame_at_index(11))

    rnd = reader.read_random_frames(3, seed=0)
    assert rnd.shape == (3, 64, 80)
    assert reader.read_all_frames().shape == (12, 64, 80)

    cropped = VideoReader(path, color_mode="GRAY",
                          insets=(0.1, 0.25)).read_frame_at_index(0)
    assert cropped.shape == (64 - 2 * 16, 80 - 2 * 8)
    reader.close()


def test_mvsec_flow_fields_and_exporters(tmp_path):
    """Converter parity extras (reference MVSEC_data_utils.py:70-340):
    FastFlowNet-backed optical_flow / acc_flow packet fields, events->txt
    exporter, HDRnet input dump, and the linearize helper."""
    import pickle

    import h5py

    from v2ce_toolbox_tpu.data.mvsec import (
        convert_mvsec_h5, events_to_txt, fastflownet_pair_flow,
        linearize_image, raw_to_hdrnet_input)

    rng = np.random.RandomState(1)
    n_frames, h, w = 18, 32, 40
    n_events = 500
    path = str(tmp_path / "synth_data.hdf5")
    ts = np.arange(n_frames) / 30.0
    with h5py.File(path, "w") as f:
        g = f.create_group("davis/left")
        g.create_dataset("image_raw",
                         data=rng.randint(0, 255, (n_frames, h, w),
                                          dtype=np.uint8))
        g.create_dataset("image_raw_ts", data=ts)
        ev = np.zeros((n_events, 4))
        ev[:, 0] = rng.randint(0, w, n_events)
        ev[:, 1] = rng.randint(0, h, n_events)
        ev[:, 2] = np.sort(rng.rand(n_events)) * ts[-1]
        ev[:, 3] = rng.choice([-1, 1], n_events)
        g.create_dataset("events", data=ev)
        g.create_dataset("image_raw_event_inds",
                         data=np.searchsorted(ev[:, 2], ts))
        g.create_dataset("imu", data=rng.randn(50, 6))
        g.create_dataset("imu_ts", data=np.linspace(0, ts[-1], 50))

    out_dir = str(tmp_path / "packets")
    n = convert_mvsec_h5(path, out_dir, max_sequences=1,
                         pair_flow_fn=fastflownet_pair_flow())
    assert n == 1
    pkt_path = [p for p in (tmp_path / "packets").iterdir()][0]
    with open(pkt_path, "rb") as f:
        pkt = pickle.load(f)
    assert pkt["optical_flow"].shape == (16, 2, h, w)
    assert pkt["acc_flow"].shape == (16, 2, h, w)
    assert np.isfinite(pkt["optical_flow"]).all()
    # first frame of the file has no predecessor: acc_flow == forward flow
    np.testing.assert_allclose(pkt["acc_flow"][0], pkt["optical_flow"][0])
    assert not np.allclose(pkt["acc_flow"][1], pkt["optical_flow"][1])

    # events->txt golden: header + one line per event, t x y p order
    txt = events_to_txt(path, str(tmp_path), which="left")
    lines = open(txt).read().splitlines()
    assert lines[0] == "346 260"
    assert len(lines) == 1 + n_events
    t0, x0, y0, p0 = lines[1].split()
    assert float(t0) == ev[0, 2]
    assert (int(x0), int(y0), int(p0)) == (int(ev[0, 0]), int(ev[0, 1]),
                                           int(ev[0, 3]))

    hdr_dir = str(tmp_path / "hdr")
    assert raw_to_hdrnet_input(path, hdr_dir) == n_frames
    assert len(list((tmp_path / "hdr").glob("*.jpg"))) == n_frames
    assert open(tmp_path / "hdr" / "Exposures.txt").read() == "-3\n0\n3\n"

    lin = linearize_image(np.array([[0.0, 127.5, 255.0]]))
    assert lin[0, 0] == 0.0 and abs(lin[0, 2] - 1.0) < 1e-6
    assert lin[0, 1] < 0.5 ** 1.0  # gamma expansion darkens midtones


def test_xyt_html_viewer(tmp_path):
    """The plotly-parity HTML export is self-contained and embeds the
    filtered event data (reference: tools/vis_tools.py:268-326)."""
    from v2ce_toolbox_tpu.events import EVENT_DTYPE
    from tools.vis_tools import plot_raw_events_xyt_html

    rng = np.random.RandomState(0)
    ev = np.zeros(1000, EVENT_DTYPE)
    ev["timestamp"] = np.sort(rng.randint(0, 3000, 1000))
    ev["x"] = rng.randint(0, 346, 1000)
    ev["y"] = rng.randint(0, 260, 1000)
    ev["polarity"] = rng.randint(0, 2, 1000)

    out = plot_raw_events_xyt_html(ev, str(tmp_path / "xyt.html"),
                                   timespan=1500)
    html = open(out).read()
    assert html.startswith("<!DOCTYPE html>")
    assert "__DATA__" not in html and '"t":' in html
    # timespan filter applied: no embedded timestamp beyond 1500 of min
    import json, re
    data = json.loads(re.search(r"const DATA = (\{.*?\});", html).group(1))
    assert max(data["t"]) - min(data["t"]) < 1500
    assert set(data["p"]) <= {0, 1}
