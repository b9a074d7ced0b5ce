"""Pipeline-layer tests: window scheduling/merge parity, preprocessing
parity, tiling math, rendering parity, and a small end-to-end smoke run."""

import os

import numpy as np
import pytest

from tests import conftest as _cf


# ---------------------------------------------------------------------------
# window scheduling + merge
# ---------------------------------------------------------------------------

def _ref_merge_voxels(voxel_list, height, width, mode):
    """Transcription of the reference merge_voxels (v2ce.py:211-239); the
    reference module itself cannot be imported here (pathlib2/torchvision
    are not available in this environment)."""
    if len(voxel_list) > 1:
        pred_voxel = np.concatenate(voxel_list[:-1], axis=0).reshape(
            -1, 2, 10, height, width)
    else:
        pred_voxel = None
    if voxel_list[-1].shape[0] > 1:
        temp = voxel_list[-1][:-1].reshape(-1, 2, 10, height, width)
        pred_voxel = temp if pred_voxel is None else np.concatenate(
            [pred_voxel, temp], axis=0)
    if mode != 0:
        temp = voxel_list[-1][-1][-mode:].reshape(-1, 2, 10, height, width)
    else:
        temp = voxel_list[-1][-1].reshape(-1, 2, 10, height, width)
    pred_voxel = temp if pred_voxel is None else np.concatenate(
        [pred_voxel, temp], axis=0)
    return pred_voxel


@pytest.mark.parametrize("frame_count", [17, 33, 40, 2, 16, 321])
def test_plan_and_merge_match_reference(frame_count):
    from v2ce_toolbox_tpu.pipeline.windows import merge_window_voxels, plan_windows

    seq_len = 16
    if 2 <= frame_count < seq_len + 1:
        # the reference arithmetic (v2ce.py:150-154) yields a negative
        # start here and reads garbage frames; we fail loudly instead
        with pytest.raises(ValueError, match="too short"):
            plan_windows(frame_count, seq_len)
        return
    starts, mode = plan_windows(frame_count, seq_len)
    # reference window plan (v2ce.py:150-154)
    ref_num = int(np.ceil((frame_count - 1) / seq_len))
    ref_starts = np.arange(ref_num) * seq_len
    ref_mode = (frame_count - 1) % seq_len
    if ref_mode != 0:
        ref_starts[-1] -= seq_len - ref_mode
    np.testing.assert_array_equal(starts, ref_starts)
    assert mode == ref_mode

    # Merge parity on random window outputs, reference layout (S,16,2,10,H,W)
    rng = np.random.RandomState(0)
    h, w = 4, 5
    windows = rng.rand(len(starts), seq_len, 2, 10, h, w).astype(np.float32)
    # the reference merges a list of per-batch arrays; single batches of 1
    ref = _ref_merge_voxels([windows[i:i + 1] for i in range(len(starts))],
                            height=h, width=w, mode=mode)
    ours = merge_window_voxels(windows, mode)
    assert ours.shape[0] == frame_count - 1
    np.testing.assert_allclose(ours, ref.reshape(ours.shape))


def test_preprocess_parity():
    """resize + pair-stack + normalize equals the reference's
    image_pre_processing, transcribed from v2ce.py:45-64 (the reference
    module needs torchvision, unavailable here; Normalize is (x-m)/s)."""
    import cv2
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.pipeline.preprocess import normalize_pairs, resize_frames

    rng = np.random.RandomState(1)
    images = rng.randint(0, 256, (5, 130, 200), np.uint8)
    height = 64
    imgs = images.astype(np.float32) / 255
    imgs = np.stack(
        [cv2.resize(im, (int(im.shape[1] / im.shape[0] * height), height))
         for im in imgs], axis=0)
    ref = np.stack([imgs[:-1], imgs[1:]], axis=1)     # (4, 2, 64, W')
    ref = (ref - 0.153) / 0.165

    resized = resize_frames(images, height=height)    # (5, 64, W')
    ours = normalize_pairs(jnp.asarray(resized)[None])[0]  # (4, 64, W', 2)
    ours = np.moveaxis(np.asarray(ours), -1, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# tiling math (center / pano) with a transparent stub model
# ---------------------------------------------------------------------------

class _StubModel:
    """Identity 'model': returns the input broadcast to 20 channels, so the
    tiling logic is directly observable in the output."""

    def apply(self, variables, x, train=False):
        import jax.numpy as jnp

        return jnp.tile(x[..., :1], (1, 1, 1, 1, 20))


@pytest.mark.parametrize("resized_width", [346, 692, 700, 500, 87])
def test_pano_tiling_covers_width(resized_width):
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.config import FRAME_MEAN, FRAME_STD
    from v2ce_toolbox_tpu.pipeline.infer import make_forward_fn

    width = min(346, resized_width)
    rng = np.random.RandomState(2)
    frames = rng.rand(1, 3, 8, resized_width).astype(np.float32)
    fwd = make_forward_fn(_StubModel(), {}, infer_type="pano", width=width,
                          resized_width=resized_width)
    out = np.asarray(fwd(jnp.asarray(frames)))
    assert out.shape == (1, 2, 8, resized_width, 20)
    # Pano reassembly must reproduce the normalized frame_t exactly at every
    # column (strips overlap-trimmed like v2ce.py:103-126).
    expected = (frames[:, :-1] - FRAME_MEAN) / FRAME_STD
    np.testing.assert_allclose(out[..., 0], expected, rtol=1e-5, atol=1e-5)


def test_center_crop_matches_reference_slice():
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.config import FRAME_MEAN, FRAME_STD
    from v2ce_toolbox_tpu.pipeline.infer import make_forward_fn

    rng = np.random.RandomState(3)
    w_in, width = 500, 346
    frames = rng.rand(1, 3, 8, w_in).astype(np.float32)
    fwd = make_forward_fn(_StubModel(), {}, infer_type="center", width=width)
    out = np.asarray(fwd(jnp.asarray(frames)))
    lo = w_in // 2 - width // 2  # reference: v2ce.py:78
    expected = (frames[:, :-1, :, lo:lo + width] - FRAME_MEAN) / FRAME_STD
    np.testing.assert_allclose(out[..., 0], expected, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# event-frame rendering
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("keep_polarity", [True, False])
def test_render_parity(keep_polarity):
    """Rendering math matches write_event_frame_video's array pipeline
    (v2ce.py:253-276) before the mp4 encode."""
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.pipeline.render import render_event_frames

    rng = np.random.RandomState(4)
    t, h, w = 3, 6, 7
    ceil, u = 10, 98
    vox_ref = rng.rand(t, 2, 10, h, w).astype(np.float32) * 3
    vox_ref[vox_ref < 1] = 0

    # reference computation (numpy transcription of v2ce.py:253-276)
    if keep_polarity:
        efs = np.sum(vox_ref, axis=2)
        efs = np.concatenate([efs, np.zeros((t, 1, h, w))], axis=1)
    else:
        efs = np.sum(vox_ref, axis=(1, 2))[:, np.newaxis, ...]
        efs = np.repeat(efs, 3, axis=1)
    flat = efs.flatten()
    flat = flat[flat > 0]
    bound = min(np.percentile(flat, u), ceil)
    efs = np.clip(efs, 0, bound) / bound
    efs = np.moveaxis(efs, 1, -1)
    ref = (efs * 255).astype(np.uint8)

    vox_ours = jnp.asarray(
        np.moveaxis(vox_ref.reshape(t, 20, h, w), 1, -1)
    )
    ours = np.asarray(render_event_frames(
        vox_ours, ceil=float(ceil), upper_bound_percentile=u,
        keep_polarity=keep_polarity,
    ))
    # uint8 rounding at the boundary may differ by 1
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


@pytest.mark.parametrize("keep_polarity", [True, False])
def test_render_driver_paths_parity(keep_polarity):
    """The driver's channel-major render and the streaming driver's
    from-sums render (both fetch CONTENT channels only — the zero B plane
    / gray replication is assembled host-side) produce the same frames as
    the channels-last device render."""
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.pipeline.render import (
        render_event_frames,
        render_event_frames_cmajor,
        render_event_frames_from_sums,
    )

    rng = np.random.RandomState(11)
    t, h, w = 4, 6, 7
    # integer-valued voxels: the three paths sum bins in different orders
    vox_cm = np.floor(rng.rand(t, 20, h, w).astype(np.float32) * 4)

    base = np.asarray(render_event_frames(
        jnp.asarray(np.moveaxis(vox_cm, 1, -1)), ceil=10.0,
        upper_bound_percentile=98, keep_polarity=keep_polarity))
    cm = render_event_frames_cmajor(
        jnp.asarray(vox_cm), ceil=10.0, upper_bound_percentile=98,
        keep_polarity=keep_polarity)
    sums = render_event_frames_from_sums(
        jnp.asarray(vox_cm.reshape(t, 2, 10, h, w).sum(axis=2)),
        ceil=10.0, upper_bound_percentile=98, keep_polarity=keep_polarity)

    assert cm.shape == base.shape == sums.shape == (t, h, w, 3)
    assert cm.dtype == np.uint8 and sums.dtype == np.uint8
    np.testing.assert_array_equal(cm, base)
    np.testing.assert_array_equal(sums, base)
    if keep_polarity:
        assert (cm[..., 2] == 0).all()


# ---------------------------------------------------------------------------
# end-to-end smoke (small geometry, random init)
# ---------------------------------------------------------------------------

def test_end_to_end_smoke(tmp_path):
    import cv2

    from tools.make_test_video import make_frames

    from v2ce_toolbox_tpu.config import PipelineConfig, SamplerConfig
    from v2ce_toolbox_tpu.pipeline.driver import V2cePipeline

    h, w = 64, 86
    frames = make_frames(num_frames=18, height=h, width=w)
    video_path = str(tmp_path / "clip.mp4")
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    vw = cv2.VideoWriter(video_path, fourcc, 30, (w, h))
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_GRAY2BGR))
    vw.release()

    cfg = PipelineConfig(
        infer_type="center", height=h, width=w, batch_size=2,
        max_frame_num=18, stage2_batch_size=8,
        sampler=SamplerConfig(event_capacity=1 << 14),
    )
    pipe = V2cePipeline(cfg, model_path=None)
    result = pipe.run(input_video_path=video_path, out_folder=str(tmp_path))
    assert result["voxels_shape"] == (17, h, w, 20)
    assert os.path.exists(result["event_stream_path"])
    assert os.path.exists(result["event_frame_video"])
    ev = np.load(result["event_stream_path"])["event_stream"]
    assert ev.dtype.names == ("timestamp", "x", "y", "polarity")
    if len(ev):
        assert ev["x"].max() < w and ev["y"].max() < h
        # absolute timestamps must span multiple frames
        assert ev["timestamp"].max() > 1e6 / 30


def test_multichip_inference_sharding(tmp_path):
    """Pipeline forward sharded over the 8-device CPU mesh: same voxels as
    the single-device run (windows are embarrassingly parallel)."""
    import cv2
    import numpy as np

    from tools.make_test_video import make_frames

    from v2ce_toolbox_tpu.config import PipelineConfig, SamplerConfig
    from v2ce_toolbox_tpu.parallel.mesh import make_mesh
    from v2ce_toolbox_tpu.pipeline.driver import V2cePipeline

    h, w = 32, 44
    frames = make_frames(num_frames=10, height=h, width=w)
    video_path = str(tmp_path / "clip.mp4")
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    vw = cv2.VideoWriter(video_path, fourcc, 30, (w, h))
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_GRAY2BGR))
    vw.release()

    cfg = PipelineConfig(
        infer_type="center", height=h, width=w, batch_size=3, seq_len=2,
        max_frame_num=10, stage2_batch_size=4,
        sampler=SamplerConfig(event_capacity=1 << 12),
    )
    from v2ce_toolbox_tpu.io.video import VideoReader

    pipe1 = V2cePipeline(cfg, model_path=None)
    vox1 = np.asarray(pipe1.video_to_voxels(
        vidcap=VideoReader(video_path, color_mode="GRAY")))

    mesh = make_mesh(8)
    pipe8 = V2cePipeline(cfg, model_path=None, mesh=mesh)
    vox8 = np.asarray(pipe8.video_to_voxels(
        vidcap=VideoReader(video_path, color_mode="GRAY")))
    assert vox8.shape == vox1.shape
    np.testing.assert_allclose(vox8, vox1, rtol=2e-4, atol=2e-5)


def test_streaming_run_matches_batch_counts(tmp_path):
    """run_streaming emits the same event totals and preview geometry as
    run(): emission counts are deterministic given the voxels, and the
    last window re-emits only its non-overlapping tail like merge_voxels."""
    import cv2

    from tools.make_test_video import make_frames
    from v2ce_toolbox_tpu.config import PipelineConfig, SamplerConfig
    from v2ce_toolbox_tpu.pipeline.driver import V2cePipeline

    h, w = 64, 80
    frames = make_frames(num_frames=20, height=h, width=w)
    video_path = str(tmp_path / "clip.mp4")
    vw = cv2.VideoWriter(video_path, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                         (w, h))
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_GRAY2BGR))
    vw.release()

    cfg = PipelineConfig(
        infer_type="center", height=h, width=w, batch_size=2,
        max_frame_num=20, stage2_batch_size=8,
        sampler=SamplerConfig(event_capacity=1 << 14),
    )
    pipe = V2cePipeline(cfg, model_path=None)
    r_batch = pipe.run(input_video_path=video_path,
                       out_folder=str(tmp_path / "b"))
    r_stream = pipe.run_streaming(input_video_path=video_path,
                                  out_folder=str(tmp_path / "s"))

    assert r_stream["voxels_shape"] == r_batch["voxels_shape"]
    assert r_stream["num_events"] == r_batch["num_events"]
    ev = np.load(r_stream["event_stream_path"])["event_stream"]
    assert (np.diff(ev["timestamp"]) >= 0).all()       # globally sorted
    assert os.path.exists(r_stream["event_frame_video"])


def test_delta_wire_format_roundtrip():
    """The bit-packed device->host event wire format reconstructs the
    exact absolute timestamps and (x, y, p) of the direct recarray path,
    including >=7 µs gaps and window-start jumps (side-list path)."""
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.events import EventStream
    from v2ce_toolbox_tpu.pipeline.driver import (
        _decode_packed_events,
        _flatten_chunk_stream,
    )

    rng = np.random.RandomState(3)
    frames, cap = 4, 4096
    counts = np.array([3000, 0, 1, 2500], np.int32)  # empty frame -> gap
    t = np.full((frames, cap), np.iinfo(np.int32).max, np.int32)
    x = np.zeros((frames, cap), np.int16)
    y = np.zeros((frames, cap), np.int16)
    p = np.zeros((frames, cap), np.int8)
    for f in range(frames):
        n = counts[f]
        if n:
            # mixed dense + sparse tails inside the 33.3 ms frame window
            tt = np.sort(rng.randint(0, 33334, n)).astype(np.int32)
            t[f, :n] = tt
            x[f, :n] = rng.randint(0, 346, n)
            y[f, :n] = rng.randint(0, 260, n)
            p[f, :n] = rng.randint(0, 2, n)
    s = EventStream(jnp.asarray(t), jnp.asarray(x), jnp.asarray(y),
                    jnp.asarray(p), jnp.asarray(counts),
                    jnp.zeros_like(jnp.asarray(counts)))
    offsets = (np.arange(frames) / 30 * 1e6).astype(np.int32)

    words, kept, side_key, n_side, side_total = (
        _flatten_chunk_stream(s, jnp.asarray(offsets), frames))
    n = int(kept)
    m = int(n_side)
    assert n == counts.sum()
    assert int(side_total) == m
    assert m >= 2      # at least the first event and the empty-frame gap
    ts, xd, yd, pd = _decode_packed_events(
        np.asarray(words[:, :-(-n // 32)]), np.asarray(side_key[:m]), n)

    # reference: direct flatten on host
    ref_t, ref_x, ref_y, ref_p = [], [], [], []
    for f in range(frames):
        n_f = counts[f]
        ref_t.append(t[f, :n_f].astype(np.int64) + offsets[f])
        ref_x.append(x[f, :n_f])
        ref_y.append(y[f, :n_f])
        ref_p.append(p[f, :n_f])
    np.testing.assert_array_equal(ts, np.concatenate(ref_t))
    np.testing.assert_array_equal(xd, np.concatenate(ref_x))
    np.testing.assert_array_equal(yd, np.concatenate(ref_y))
    np.testing.assert_array_equal(pd, np.concatenate(ref_p))


def test_delta_wire_format_skip_lead():
    """skip_lead drops exactly the leading frames' events."""
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.events import EventStream
    from v2ce_toolbox_tpu.pipeline.driver import (
        _decode_packed_events,
        _flatten_chunk_stream,
    )

    frames, cap = 3, 2048
    counts = np.array([10, 20, 30], np.int32)
    t = np.full((frames, cap), np.iinfo(np.int32).max, np.int32)
    for f in range(frames):
        t[f, :counts[f]] = np.arange(counts[f], dtype=np.int32) * 7
    zeros16 = np.zeros((frames, cap), np.int16)
    s = EventStream(jnp.asarray(t), jnp.asarray(zeros16),
                    jnp.asarray(zeros16),
                    jnp.asarray(zeros16.astype(np.int8)),
                    jnp.asarray(counts),
                    jnp.zeros_like(jnp.asarray(counts)))
    offsets = (np.arange(frames) * 33333).astype(np.int32)
    words, kept, side_key, n_side, _ = _flatten_chunk_stream(
        s, jnp.asarray(offsets), frames, skip_lead=2)
    n, m = int(kept), int(n_side)
    assert n == 30
    ts, _, _, _ = _decode_packed_events(
        np.asarray(words[:, :-(-n // 32)]), np.asarray(side_key[:m]), n)
    np.testing.assert_array_equal(
        ts, np.arange(30, dtype=np.int64) * 7 + 2 * 33333)


def test_adaptive_wire_format_switches_to_12bit_on_sparse():
    """Sparse streams (most gaps >= 7 µs) would pay 4 B/marker on nearly
    every event under 3-bit deltas; _fetch_chunk_events must re-dispatch
    at delta_bits=12 and still reconstruct the exact stream."""
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.events import EventStream
    from v2ce_toolbox_tpu.pipeline.driver import (
        _SPARSE_SWITCH,
        _fetch_chunk_events,
        _flatten_chunk_stream,
    )

    rng = np.random.RandomState(5)
    frames, cap = 4, 512
    counts = np.full(frames, 40, np.int32)    # ~40 events / 33 ms frame
    t = np.full((frames, cap), np.iinfo(np.int32).max, np.int32)
    x = np.zeros((frames, cap), np.int16)
    y = np.zeros((frames, cap), np.int16)
    p = np.zeros((frames, cap), np.int8)
    for f in range(frames):
        n = counts[f]
        t[f, :n] = np.sort(rng.randint(0, 33334, n)).astype(np.int32)
        x[f, :n] = rng.randint(0, 346, n)
        y[f, :n] = rng.randint(0, 260, n)
        p[f, :n] = rng.randint(0, 2, n)
    s = EventStream(jnp.asarray(t), jnp.asarray(x), jnp.asarray(y),
                    jnp.asarray(p), jnp.asarray(counts),
                    jnp.zeros_like(jnp.asarray(counts)))
    offsets = jnp.asarray((np.arange(frames) / 30 * 1e6).astype(np.int32))

    # precondition: the 3-bit format really is marker-dominated here
    _, kept3, _, n_side3, _ = _flatten_chunk_stream(s, offsets, frames)
    assert int(n_side3) > int(kept3) * _SPARSE_SWITCH

    out = _fetch_chunk_events(s, offsets, frames, fps=30)
    ref_t = np.concatenate(
        [t[f, :counts[f]].astype(np.int64) + int(offsets[f])
         for f in range(frames)])
    assert len(out) == counts.sum()
    np.testing.assert_array_equal(out["timestamp"], ref_t)
    np.testing.assert_array_equal(
        out["x"], np.concatenate([x[f, :counts[f]] for f in range(frames)]))


def test_adaptive_wire_format_dense_stays_3bit_and_roundtrips():
    """Dense streams keep the 22-bit records; _fetch_chunk_events output
    equals the direct host flatten."""
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.events import EventStream
    from v2ce_toolbox_tpu.pipeline.driver import (
        _SPARSE_SWITCH,
        _fetch_chunk_events,
        _flatten_chunk_stream,
    )

    rng = np.random.RandomState(6)
    frames, cap = 3, 1 << 15
    counts = np.full(frames, 20000, np.int32)  # mean gap ~1.7 µs
    t = np.full((frames, cap), np.iinfo(np.int32).max, np.int32)
    x = np.zeros((frames, cap), np.int16)
    y = np.zeros((frames, cap), np.int16)
    p = np.zeros((frames, cap), np.int8)
    for f in range(frames):
        n = counts[f]
        t[f, :n] = np.sort(rng.randint(0, 33334, n)).astype(np.int32)
        x[f, :n] = rng.randint(0, 346, n)
        y[f, :n] = rng.randint(0, 260, n)
        p[f, :n] = rng.randint(0, 2, n)
    s = EventStream(jnp.asarray(t), jnp.asarray(x), jnp.asarray(y),
                    jnp.asarray(p), jnp.asarray(counts),
                    jnp.zeros_like(jnp.asarray(counts)))
    offsets = jnp.asarray((np.arange(frames) / 30 * 1e6).astype(np.int32))

    _, kept3, _, n_side3, _ = _flatten_chunk_stream(s, offsets, frames)
    assert int(n_side3) <= int(kept3) * _SPARSE_SWITCH   # dense precondition

    out = _fetch_chunk_events(s, offsets, frames, fps=30)
    ref_t = np.concatenate(
        [t[f, :counts[f]].astype(np.int64) + int(offsets[f])
         for f in range(frames)])
    np.testing.assert_array_equal(out["timestamp"], ref_t)
    np.testing.assert_array_equal(
        out["polarity"],
        np.concatenate([p[f, :counts[f]] for f in range(frames)]))


def test_wire_format_rebased_past_int32_limit():
    """Per-chunk rebasing (int64 chunk base + int32 in-chunk offsets)
    reconstructs exact absolute timestamps past the int32 µs horizon
    (~35 min), so arbitrarily long videos stream without the former
    hard assert (reference keeps int64 offsets host-side the same way,
    v2ce.py:363-367). Mocked timestamps — no real 40-min decode."""
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.events import EventStream
    from v2ce_toolbox_tpu.pipeline.driver import _fetch_chunk_events

    rng = np.random.RandomState(9)
    frames, cap = 3, 2048
    counts = np.array([1500, 0, 900], np.int32)
    t = np.full((frames, cap), np.iinfo(np.int32).max, np.int32)
    x = np.zeros((frames, cap), np.int16)
    y = np.zeros((frames, cap), np.int16)
    p = np.zeros((frames, cap), np.int8)
    for f in range(frames):
        n = counts[f]
        if n:
            t[f, :n] = np.sort(rng.randint(0, 33334, n)).astype(np.int32)
            x[f, :n] = rng.randint(0, 346, n)
            y[f, :n] = rng.randint(0, 260, n)
            p[f, :n] = rng.randint(0, 2, n)
    s = EventStream(jnp.asarray(t), jnp.asarray(x), jnp.asarray(y),
                    jnp.asarray(p), jnp.asarray(counts),
                    jnp.zeros_like(jnp.asarray(counts)))

    start_frame = 72_000                       # 40 min into a 30 fps video
    offsets64 = ((np.arange(frames) + start_frame) / 30 * 1e6
                 ).astype(np.int64)
    base_us = int(offsets64[0])
    assert base_us > 2 ** 31                   # past the old limit
    rel = (offsets64 - base_us).astype(np.int32)

    out = _fetch_chunk_events(s, jnp.asarray(rel), frames, fps=30,
                              base_us=base_us)
    ref_t = np.concatenate(
        [t[f, :counts[f]].astype(np.int64) + offsets64[f]
         for f in range(frames)])
    assert len(out) == counts.sum()
    np.testing.assert_array_equal(out["timestamp"], ref_t)
    assert (out["timestamp"] > 2 ** 31).all()
    np.testing.assert_array_equal(
        out["x"], np.concatenate([x[f, :counts[f]] for f in range(frames)]))


def test_streaming_multichip_byte_identical(tmp_path):
    """Streaming mode over the 8-device CPU mesh: each forward dispatch
    carries n_dp DISTINCT windows round-robined onto the batch axis (the
    round-3 path replicated one window and discarded n_dp-1 results —
    VERDICT.md weak #3), and the emitted npz event stream is
    byte-identical to the single-chip run (per-window sampler keys fold
    in the global window index)."""
    import cv2

    from tools.make_test_video import make_frames
    from v2ce_toolbox_tpu.config import PipelineConfig, SamplerConfig
    from v2ce_toolbox_tpu.parallel.mesh import make_mesh
    from v2ce_toolbox_tpu.pipeline.driver import V2cePipeline

    h, w = 32, 44
    frames = make_frames(num_frames=21, height=h, width=w)
    video_path = str(tmp_path / "clip.mp4")
    vw = cv2.VideoWriter(video_path, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                         (w, h))
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_GRAY2BGR))
    vw.release()

    cfg = PipelineConfig(
        infer_type="center", height=h, width=w, seq_len=2,
        max_frame_num=21, write_event_frame_video=False,
        sampler=SamplerConfig(event_capacity=1 << 12),
    )

    pipe1 = V2cePipeline(cfg, model_path=None)
    r1 = pipe1.run_streaming(input_video_path=video_path,
                             out_folder=str(tmp_path / "one"))

    pipe8 = V2cePipeline(cfg, model_path=None, mesh=make_mesh(8))
    dispatches = []
    orig_forward_fn = pipe8._forward_fn

    def spy_forward_fn(width):
        fwd = orig_forward_fn(width)

        def wrapped(x):
            dispatches.append(np.asarray(x))
            return fwd(x)

        return wrapped

    pipe8._forward_fn = spy_forward_fn
    r8 = pipe8.run_streaming(input_video_path=video_path,
                             out_folder=str(tmp_path / "eight"))

    # 21 frames, seq_len=2 -> 10 windows -> dispatches of 8 + 2(+6 pad)
    assert [d.shape[0] for d in dispatches] == [8, 8]
    first = dispatches[0]
    for a in range(8):
        for b in range(a + 1, 8):
            assert not np.array_equal(first[a], first[b]), (a, b)

    ev1 = np.load(r1["event_stream_path"])["event_stream"]
    ev8 = np.load(r8["event_stream_path"])["event_stream"]
    assert ev1.tobytes() == ev8.tobytes()


def test_wire_roundtrip_wide_x():
    """Merged-pano streams can carry x >= 512 (W up to 1023): the wide
    wire format (x_bits=10) must round-trip them exactly. The 9-bit
    format silently wrapped x into the delta field (round-5 fix;
    reference pano emits full-width coordinates, v2ce.py:91-129)."""
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.events import EventStream
    from v2ce_toolbox_tpu.pipeline.driver import (
        _fetch_chunk_events,
        _x_bits_for_width,
    )

    assert _x_bits_for_width(346) == 9
    assert _x_bits_for_width(520) == 10

    rng = np.random.RandomState(5)
    frames, cap, w = 2, 2048, 692          # two full 346 strips
    counts = np.array([900, 700], np.int32)
    t = np.full((frames, cap), np.iinfo(np.int32).max, np.int32)
    x = np.zeros((frames, cap), np.int16)
    y = np.zeros((frames, cap), np.int16)
    p = np.zeros((frames, cap), np.int8)
    for f in range(frames):
        n = counts[f]
        t[f, :n] = np.sort(rng.randint(0, 33334, n)).astype(np.int32)
        x[f, :n] = rng.randint(0, w, n)
        y[f, :n] = rng.randint(0, 260, n)
        p[f, :n] = rng.randint(0, 2, n)
    assert (x >= 512).any()
    s = EventStream(jnp.asarray(t), jnp.asarray(x), jnp.asarray(y),
                    jnp.asarray(p), jnp.asarray(counts),
                    jnp.zeros_like(jnp.asarray(counts)))
    offsets = (np.arange(frames) / 30 * 1e6).astype(np.int32)

    out = _fetch_chunk_events(s, jnp.asarray(offsets), frames, 30.0,
                              width=w)
    ref_t = np.concatenate([t[f, :counts[f]].astype(np.int64) + offsets[f]
                            for f in range(frames)])
    np.testing.assert_array_equal(out["timestamp"], ref_t)
    np.testing.assert_array_equal(
        out["x"], np.concatenate([x[f, :counts[f]] for f in range(frames)]))
    np.testing.assert_array_equal(
        out["y"], np.concatenate([y[f, :counts[f]] for f in range(frames)]))
    np.testing.assert_array_equal(
        out["polarity"],
        np.concatenate([p[f, :counts[f]] for f in range(frames)]))


@pytest.mark.parametrize("strategy", ["slope", "none", "random"])
def test_fused_flatten_matches_unfused(strategy):
    """The fused sampler+flatten (_sample_flatten_window: wire format
    assembled on the post-sort rows, ONE merge pass) must emit exactly
    the stream of the round-4 chain sample_events -> per-frame buffers ->
    _flatten_chunk_stream, including skip_lead, per-frame capacity
    clipping, and the side-list/marker semantics."""
    import jax
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.config import SamplerConfig
    from v2ce_toolbox_tpu.ops.ldati import sample_events
    from v2ce_toolbox_tpu.pipeline.driver import (
        _fetch_chunk_events,
        _fetch_chunk_events_fused,
        _fused_flatten_ok,
    )

    rng = np.random.RandomState(11)
    f, p, c, h, w = 4, 2, 10, 24, 36
    v = jnp.asarray((rng.rand(f, p, c, h, w) < 0.2).astype(np.float32)
                    * rng.rand(f, p, c, h, w).astype(np.float32) * 3)
    scfg = SamplerConfig(additional_events_strategy=strategy,
                         event_capacity=1 << 12,
                         cap_bin=1 << 9, multi_cap=512, sort_cap=1 << 9)
    assert _fused_flatten_ok(scfg, p, h, w, 30)
    offsets = jnp.asarray((np.arange(f) / 30 * 1e6).astype(np.int32))
    key = jax.random.key(3)

    for skip in (0, 2):
        s = sample_events(v, key, **scfg.sample_kwargs(fps=30))
        ref = _fetch_chunk_events(s, offsets, f, 30.0, skip_lead=skip,
                                  width=w, monotone=strategy != "random")
        got = _fetch_chunk_events_fused(v, key, offsets, f, scfg, 30,
                                        skip_lead=skip, width=w)
        assert ref.tobytes() == got.tobytes(), (
            skip, len(ref), len(got))
        assert len(ref) > 0


def test_fused_flatten_capacity_clip_matches():
    """With event_capacity below a frame's emission, the fused path must
    drop exactly the same tail events the per-frame merge cap drops."""
    import jax
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.config import SamplerConfig
    from v2ce_toolbox_tpu.ops.ldati import sample_events
    from v2ce_toolbox_tpu.pipeline.driver import (
        _fetch_chunk_events,
        _fetch_chunk_events_fused,
    )

    rng = np.random.RandomState(2)
    f, p, c, h, w = 2, 2, 10, 16, 24
    v = jnp.asarray(rng.rand(f, p, c, h, w).astype(np.float32) * 2)
    # tiny capacity: well below the per-frame emission of this dense grid
    scfg = SamplerConfig(event_capacity=256, cap_bin=1 << 9,
                         multi_cap=512, sort_cap=1 << 9)
    offsets = jnp.asarray((np.arange(f) / 30 * 1e6).astype(np.int32))
    key = jax.random.key(5)

    s = sample_events(v, key, **scfg.sample_kwargs(fps=30))
    assert int(np.asarray(s.dropped).sum()) > 0     # the clip binds
    ref = _fetch_chunk_events(s, offsets, f, 30.0, width=w)
    got = _fetch_chunk_events_fused(v, key, offsets, f, scfg, 30, width=w)
    assert ref.tobytes() == got.tobytes(), (len(ref), len(got))
