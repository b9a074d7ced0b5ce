"""Data pipeline tests: voxelization parity/invariants, dataset schema,
dummy fixtures, and loader batching."""

import numpy as np
import pytest

from tests import conftest as _cf  # noqa: F401  (sets cpu mesh)


def _rand_events(n=500, h=32, w=40, seed=0):
    from v2ce_toolbox_tpu.events import EVENT_DTYPE

    rng = np.random.RandomState(seed)
    ev = np.zeros((n,), dtype=EVENT_DTYPE)
    ev["timestamp"] = np.sort(rng.randint(0, 100000, (n,)))
    ev["x"] = rng.randint(0, w, (n,))
    ev["y"] = rng.randint(0, h, (n,))
    ev["polarity"] = rng.randint(0, 2, (n,))
    return ev


def test_voxelize_np_matches_torch_reference():
    """Transcribed reference gen_discretized_event_volume
    (events_utils.py:118-175; the module itself imports numba/plotly,
    unavailable here)."""
    torch = pytest.importorskip("torch")

    from v2ce_toolbox_tpu.data.voxelize import gen_discretized_event_volume_np

    ev = _rand_events()
    h, w, nb2 = 32, 40, 20
    vol = torch.zeros((nb2, h, w), dtype=torch.float)
    x = torch.tensor(ev["x"].copy(), dtype=torch.long)
    y = torch.tensor(ev["y"].copy(), dtype=torch.long)
    t = torch.tensor(ev["timestamp"].copy())
    p = torch.tensor(ev["polarity"].copy())
    p[p == 0] = -1
    t_min, t_max = t.min(), t.max()
    t_scaled = (t - t_min) * ((nb2 // 2 - 1) / (t_max - t_min))
    t_scaled = torch.clamp(t_scaled, 0, nb2 // 2 - 1)
    x_fl = torch.floor(t_scaled + 1e-8)
    x_ce = torch.ceil(t_scaled - 1e-8)
    x_ce_fake = torch.floor(t_scaled) + 1
    dx_ce = t_scaled - x_fl
    dx_fl = x_ce_fake - t_scaled
    vol_mul = torch.where(p < 0, torch.full_like(p, nb2 // 2),
                          torch.zeros_like(p))
    for tt, dt in ((x_fl.long(), dx_fl), (x_ce.long(), dx_ce)):
        inds = (h * w) * (tt + vol_mul) + w * y + x
        vol.view(-1).put_(inds, dt.float(), accumulate=True)

    ours = gen_discretized_event_volume_np(ev, (nb2, h, w))
    np.testing.assert_allclose(ours, vol.numpy(), rtol=1e-5, atol=1e-5)


def test_voxelize_event_count_conservation():
    """Bilinear splat weights sum to 1 per event -> volume sums to N."""
    from v2ce_toolbox_tpu.data.voxelize import gen_discretized_event_volume_np

    ev = _rand_events(n=777, seed=3)
    vol = gen_discretized_event_volume_np(ev, (20, 32, 40))
    np.testing.assert_allclose(vol.sum(), len(ev), rtol=1e-5)
    # polarity halves
    pos = vol[:10].sum()
    np.testing.assert_allclose(pos, (ev["polarity"] == 1).sum(), rtol=1e-5)


def test_voxelize_jnp_matches_np():
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.data.voxelize import (
        gen_discretized_event_volume,
        gen_discretized_event_volume_np,
    )

    ev = _rand_events(n=400, seed=5)
    ref = gen_discretized_event_volume_np(ev, (20, 32, 40))
    # pad into a fixed-capacity masked buffer
    cap = 512
    valid = np.zeros(cap, bool)
    valid[:len(ev)] = True
    pad = lambda a: np.concatenate([a, np.zeros(cap - len(ev), a.dtype)])
    out = gen_discretized_event_volume(
        jnp.asarray(pad(ev["timestamp"].astype(np.int32))),
        jnp.asarray(pad(ev["x"].astype(np.int32))),
        jnp.asarray(pad(ev["y"].astype(np.int32))),
        jnp.asarray(pad(ev["polarity"].astype(np.int32))),
        jnp.asarray(valid),
        (20, 32, 40),
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_dummy_dataset_schema(tmp_path):
    from v2ce_toolbox_tpu.data.dummy_data_gen import generate
    from v2ce_toolbox_tpu.data.event_pack_dataset import EventPackDataset
    from v2ce_toolbox_tpu.data.loader import iterate_batches

    generate(str(tmp_path), num_packets=6, height=32, width=40,
             events_per_frame=100)
    ds = EventPackDataset("train", str(tmp_path))
    assert len(ds) == 4  # 0.8 * 6
    item = ds[0]
    assert item["image_units"].shape == (16, 32, 40, 2)
    assert item["voxels"].shape == (16, 32, 40, 20)
    assert item["imu"].shape == (16, 6)
    assert item["flows"].shape == (16, 32, 40, 4)
    assert item["lfr"].shape == (16, 32, 40, 1)
    # event count conservation into the GT voxel
    np.testing.assert_allclose(item["voxels"].sum(), 16 * 100, rtol=1e-4)

    batches = list(iterate_batches(ds, 2, num_workers=2))
    assert len(batches) == 2
    assert batches[0]["image_units"].shape == (2, 16, 32, 40, 2)


def test_lin_log_parity():
    torch = pytest.importorskip("torch")
    ref_mod = _cf.load_reference_module("train/scripts/utils/v2e_utils.py",
                                        "ref_v2e_utils")

    from v2ce_toolbox_tpu.utils.v2e import lin_log

    rng = np.random.RandomState(0)
    x = rng.rand(4, 8, 9).astype(np.float32) * 255
    ref = ref_mod.lin_log(x.copy())
    ours = lin_log(x)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)
    del torch


def test_illum_augmentation_parity_and_wiring(tmp_path):
    """apply_illum_augmentation matches a torch transcription of the
    reference recipe (train/scripts/utils/data_utils.py:41-45) for the same
    gain/gamma draws, and the dataset flag changes train-mode images only
    before normalization."""
    torch = pytest.importorskip("torch")
    from v2ce_toolbox_tpu.data.event_pack_dataset import (
        EventPackDataset,
        FRAME_MEAN,
        FRAME_STD,
        apply_illum_augmentation,
    )

    rng = np.random.RandomState(7)
    img = rng.rand(3, 8, 9, 2).astype(np.float32)

    class _FixedRng:
        def __init__(self, vals):
            self.vals = list(vals)

        def rand(self):
            return self.vals.pop(0)

    # reference: gamma drawn first, then gain
    u_gamma, u_gain = 0.3, 0.9
    ours = apply_illum_augmentation(img, _FixedRng([u_gamma, u_gain]))
    gamma = 0.8 + u_gamma * 0.4
    gain = 0.8 + u_gain * 0.4
    ref = torch.clamp(
        gain * torch.pow(torch.from_numpy(img), gamma), 0, 1.0).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)

    from v2ce_toolbox_tpu.data.dummy_data_gen import generate

    generate(str(tmp_path), num_packets=12, height=16, width=20,
             events_per_frame=10)
    kw = dict(include_flows=False, include_lfr=False)
    base = EventPackDataset("train", str(tmp_path), **kw)[0]
    aug_ds = EventPackDataset("train", str(tmp_path), illum_aug=True, **kw)
    aug = aug_ds[0]
    assert not np.allclose(aug["image_units"], base["image_units"])
    # augmented images stay in the normalized [0,1] range's image
    un = aug["image_units"] * FRAME_STD + FRAME_MEAN
    assert un.min() >= -1e-5 and un.max() <= 1.0 + 1e-5
    # voxels untouched by the illumination change
    np.testing.assert_array_equal(aug["voxels"], base["voxels"])
    # eval mode ignores the flag
    ev = EventPackDataset("val", str(tmp_path), illum_aug=True, **kw)
    ev_base = EventPackDataset("val", str(tmp_path), **kw)
    np.testing.assert_array_equal(ev[0]["image_units"],
                                  ev_base[0]["image_units"])
    del torch
