"""Golden tests: jnp losses/metrics vs the torch reference implementations.

Reference tensors are (B, L, 20, H, W); ours are channels-last
(B, L, H, W, 20). Each test feeds both with equivalent random data.
"""

import sys

import numpy as np
import pytest

from tests import conftest as _cf

torch = pytest.importorskip("torch")

_cf.add_reference_to_path()


def _ref(modname):
    """Load a reference train/scripts/model/<modname>.py file directly
    (its package __init__ needs pytorch_lightning, unavailable here)."""
    return _cf.load_reference_module(
        f"train/scripts/model/{modname}.py", f"ref_model_{modname}")


def _pair(shape=(2, 4, 20, 6, 7), seed=0, sparsity=0.5):
    rng = np.random.RandomState(seed)
    pred = (rng.rand(*shape) * 2 * (rng.rand(*shape) < sparsity)).astype(np.float32)
    gt = (rng.rand(*shape) * 2 * (rng.rand(*shape) < sparsity)).astype(np.float32)
    return pred, gt


def _to_cl(v):
    """(B, L, C, H, W) -> (B, L, H, W, C)"""
    return np.moveaxis(v, 2, -1)


@pytest.mark.parametrize("add_base", [False, True])
def test_pyramid3d_loss_parity(add_base):
    Pyramid3dLoss = _ref('losses').Pyramid3dLoss
    from einops import rearrange

    from v2ce_toolbox_tpu.train.losses import pyramid3d_loss

    pred, gt = _pair(shape=(2, 4, 20, 16, 18), seed=1)
    ref_fn = Pyramid3dLoss(add_base_loss=add_base)
    tp = rearrange(torch.from_numpy(pred), 'b l (p c) h w -> (b p) (l c) h w', p=2)
    tg = rearrange(torch.from_numpy(gt), 'b l (p c) h w -> (b p) (l c) h w', p=2)
    ref = ref_fn(tp, tg).item()
    ours = float(pyramid3d_loss(_to_cl(pred), _to_cl(gt), add_base_loss=add_base))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_pyramid_temporal_loss_parity():
    PyramidTemporalLoss = _ref('losses').PyramidTemporalLoss
    from einops import rearrange

    from v2ce_toolbox_tpu.train.losses import pyramid_temporal_loss

    pred, gt = _pair(shape=(2, 4, 20, 6, 7), seed=2)
    tp = rearrange(torch.from_numpy(pred), 'b l (p c) h w -> (b p) (l c) h w', p=2)
    tg = rearrange(torch.from_numpy(gt), 'b l (p c) h w -> (b p) (l c) h w', p=2)
    ref = PyramidTemporalLoss()(tp, tg).item()
    ours = float(pyramid_temporal_loss(_to_cl(pred), _to_cl(gt)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("ef_type", ["cl", "only_c", "c+cl"])
@pytest.mark.parametrize("splitp", [False, True])
def test_event_frame_loss_parity(ef_type, splitp):
    """Transcription of the ef loss arms (model_interface.py:193-229)."""
    from einops import rearrange

    from v2ce_toolbox_tpu.train.losses import event_frame_loss

    pred, gt = _pair(seed=3)
    tp, tg = torch.from_numpy(pred), torch.from_numpy(gt)
    if splitp:
        tp = rearrange(tp, 'b l (p c) h w -> b l c p h w', p=2)
        tg = rearrange(tg, 'b l (p c) h w -> b l c p h w', p=2)
    mse = torch.nn.MSELoss()
    if ef_type == "cl":
        ref = mse(tp.abs().sum(dim=(1, 2)), tg.abs().sum(dim=(1, 2)))
    elif ef_type == "only_c":
        ref = mse(tp.abs().sum(dim=2), tg.abs().sum(dim=2))
    else:
        ref = 5.0 * mse(tp.abs().sum(dim=2), tg.abs().sum(dim=2)) + \
            mse(tp.abs().sum(dim=(1, 2)), tg.abs().sum(dim=(1, 2)))
    ours = float(event_frame_loss(_to_cl(pred), _to_cl(gt),
                                  split_polarity=splitp, ef_type=ef_type))
    np.testing.assert_allclose(ours, ref.item(), rtol=1e-4, atol=1e-5)


def test_match_loss_parity():
    MatchLoss = _ref('losses').MatchLoss

    from v2ce_toolbox_tpu.train.losses import match_loss

    pred, gt = _pair(seed=4)
    ref = MatchLoss()(torch.from_numpy(pred), torch.from_numpy(gt)).item()
    ours = float(match_loss(_to_cl(pred), _to_cl(gt)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_compensation_loss_parity():
    CompensationLoss = _ref('losses').CompensationLoss

    from v2ce_toolbox_tpu.train.losses import compensation_loss

    pred, gt = _pair(seed=5)
    ref = CompensationLoss()(torch.from_numpy(pred), torch.from_numpy(gt)).item()
    ours = float(compensation_loss(_to_cl(pred), _to_cl(gt)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("op_type", ["raw", "sum_c", "sum_cp"])
def test_binary_match_parity(op_type):
    _m = _ref('metrics'); BinaryMatch, BinaryMatchF1 = _m.BinaryMatch, _m.BinaryMatchF1

    from v2ce_toolbox_tpu.train.metrics import binary_match, binary_match_f1

    pred, gt = _pair(seed=6, sparsity=0.3)
    tp, tg = torch.from_numpy(pred), torch.from_numpy(gt)
    ref_bm = BinaryMatch(op_type=op_type)(tp, tg).item()
    ref_f1 = BinaryMatchF1(op_type=op_type)(tp, tg).item()
    ours_bm = float(binary_match(_to_cl(pred), _to_cl(gt), op_type=op_type))
    ours_f1 = float(binary_match_f1(_to_cl(pred), _to_cl(gt), op_type=op_type))
    np.testing.assert_allclose(ours_bm, ref_bm, rtol=1e-5)
    np.testing.assert_allclose(ours_f1, ref_f1, rtol=1e-4)


@pytest.mark.parametrize("k", [2, 4])
def test_pool_mse_parity(k):
    PoolMSE = _ref('metrics').PoolMSE

    from v2ce_toolbox_tpu.train.metrics import pool_mse

    pred, gt = _pair(shape=(2, 4, 20, 16, 18), seed=7)
    ref = PoolMSE(kernel_size=k)(torch.from_numpy(pred),
                                 torch.from_numpy(gt)).item()
    ours = float(pool_mse(_to_cl(pred), _to_cl(gt), kernel_size=k))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-8)


def test_mean_ratio_parity():
    MeanRatio = _ref('metrics').MeanRatio

    from v2ce_toolbox_tpu.train.metrics import mean_ratio

    pred, gt = _pair(seed=8)
    ref = MeanRatio()(torch.from_numpy(pred), torch.from_numpy(gt)).item()
    ours = float(mean_ratio(_to_cl(pred), _to_cl(gt)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_discriminator_shapes_match_reference():
    """Our PatchGAN layer stack produces the reference's patch-logit map
    shape (gan.py:153-203, norm-free variant)."""
    Patch_Discriminator = _ref('gan').Patch_Discriminator

    import jax
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.train.gan import PatchDiscriminator2D

    x = torch.zeros(2, 20, 64, 86)
    ref_shape = Patch_Discriminator(in_channels=20)(x).shape  # (2,1,h',w')

    disc = PatchDiscriminator2D()
    xs = jnp.zeros((2, 64, 86, 20))
    variables = disc.init(jax.random.key(0), xs)
    out = disc.apply(variables, xs)
    assert out.shape == (2, ref_shape[2], ref_shape[3], 1)


def test_gan_training_reduces_disc_loss():
    """The in-step discriminator optimizer must actually learn: d_loss
    decreases over repeated updates on a fixed fake/real pair."""
    import jax
    import jax.numpy as jnp
    import optax

    from v2ce_toolbox_tpu.train.gan import (
        discriminator_update,
        make_discriminator,
    )

    disc = make_discriminator()
    rng = np.random.RandomState(0)
    # PatchGAN needs >= ~24x24 inputs: k4 convs shrink 16x18 to zero size.
    fake = jnp.asarray(rng.rand(1, 2, 48, 56, 20).astype(np.float32) * 2)
    real = jnp.asarray((rng.rand(1, 2, 48, 56, 20) < 0.2).astype(np.float32))
    params = disc.init(jax.random.key(0), jnp.zeros((2, 48, 56, 20)))["params"]
    # A faster optimizer than the production one (Adam 1e-5, gan.py:252-258)
    # keeps the mechanics test short.
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    losses = []
    for _ in range(3):
        params, opt_state, d_loss = discriminator_update(
            disc, params, opt_state, fake, real, gan_k=10, optimizer=tx)
        losses.append(float(d_loss))
    assert losses[-1] < losses[0]


def test_voxel_encoder_loss():
    """VoxelEncoder shapes match the reference architecture contract
    (losses.py:51-96: (B, L, C, H, W) -> (B, L, 512)); identical inputs
    give zero loss, different inputs positive."""
    import jax
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.train.voxel_encoder import EncoderLoss, VoxelEncoder

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 3, 32, 40, 20).astype(np.float32))
    enc = VoxelEncoder()
    variables = enc.init(jax.random.key(0), x)
    emb = enc.apply(variables, x)
    assert emb.shape == (2, 3, 512)

    loss = EncoderLoss(rng=jax.random.key(1),
                       input_shape=(1, 1, 32, 40, 20))
    assert float(loss(x, x)) == 0.0
    y = jnp.asarray(rng.rand(2, 3, 32, 40, 20).astype(np.float32))
    assert float(loss(x, y)) > 0.0


def test_compose_losses_rejects_unknown_names():
    """A typo'd --loss term must raise, not silently train without it
    (reference raises 'Invalid loss type': model_interface.py:367-368)."""
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.train.losses import compose_losses

    pred = jnp.zeros((1, 2, 8, 8, 20))
    with pytest.raises(ValueError, match="Invalid loss"):
        compose_losses(pred, pred, ("pyramid", "pyramd"))


def test_compose_losses_encoder_branch():
    """--loss encoder contributes a positive term through the frozen
    VoxelEncoder (reference: model_interface.py:238-247)."""
    import jax
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.train.losses import compose_losses
    from v2ce_toolbox_tpu.train.voxel_encoder import EncoderLoss

    rng = np.random.RandomState(3)
    pred = jnp.asarray(rng.rand(1, 2, 32, 40, 20).astype(np.float32))
    gt = jnp.asarray(rng.rand(1, 2, 32, 40, 20).astype(np.float32))
    enc = EncoderLoss(rng=jax.random.key(0), input_shape=(1, 1, 32, 40, 20))

    base, _ = compose_losses(pred, gt, ("l2",))
    with_enc, logs = compose_losses(pred, gt, ("l2", "encoder"),
                                    encoder_loss_fn=enc)
    assert float(logs["encoder_loss"]) > 0.0
    assert float(with_enc) > float(base)
    # requesting encoder without the frozen network is an error, not a no-op
    with pytest.raises(ValueError, match="encoder"):
        compose_losses(pred, gt, ("encoder",))


def test_compose_losses_imu_and_physical_branches():
    """imu MSE (model_interface.py:162-168) and physical-att MSE
    (model_interface.py:171-184) with multi-output pred extras."""
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.train.losses import DEFAULT_ALPHAS, compose_losses

    rng = np.random.RandomState(4)
    pred = jnp.asarray(rng.rand(1, 2, 16, 16, 20).astype(np.float32))
    gt = jnp.asarray(rng.rand(1, 2, 16, 16, 20).astype(np.float32))
    pred_imu = jnp.asarray(rng.rand(1, 2, 6).astype(np.float32))
    gt_imu = jnp.asarray(rng.rand(1, 2, 6).astype(np.float32))
    att0 = jnp.asarray(rng.rand(1, 2, 4, 4, 1).astype(np.float32))
    att1 = jnp.asarray(rng.rand(1, 2, 4, 4, 1).astype(np.float32))
    gt_att = jnp.asarray(rng.rand(1, 2, 4, 4, 1).astype(np.float32))

    total, logs = compose_losses(
        pred, gt, ("imu", "physical"),
        pred_extras={"imu": pred_imu, "physical_atts": [att0, att1]},
        batch={"imu": gt_imu, "physical_att": gt_att},
    )
    exp_imu = float(np.mean((np.asarray(pred_imu) - np.asarray(gt_imu)) ** 2))
    exp_att = float(np.mean((np.asarray(att0) - np.asarray(gt_att)) ** 2)
                    + np.mean((np.asarray(att1) - np.asarray(gt_att)) ** 2)) / 2
    assert np.isclose(float(logs["imu_loss"]), exp_imu, rtol=1e-5)
    assert np.isclose(float(logs["att_loss"]), exp_att, rtol=1e-5)
    assert np.isclose(
        float(total),
        DEFAULT_ALPHAS["alpha_imu"] * exp_imu
        + DEFAULT_ALPHAS["alpha_att"] * exp_att, rtol=1e-5)

    # physical with no model attention output is silently skipped
    # (reference gate: `'physical_atts' in pred.keys()`)
    total2, logs2 = compose_losses(pred, gt, ("physical", "l2"),
                                   batch={"physical_att": gt_att})
    assert "att_loss" not in logs2
    # imu without the plumbing is an error
    with pytest.raises(ValueError, match="imu"):
        compose_losses(pred, gt, ("imu",))
