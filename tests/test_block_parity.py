"""Block-level golden tests with healthy-magnitude weights.

The full-model parity test runs at the reference's kaiming(a=10) init, whose
tiny activations can mask path-level differences (e.g. the always-on
projection shortcut). Here we re-randomize torch block weights at O(1) scale
before converting, so every path contributes at full magnitude.
"""

import numpy as np
import pytest

from tests import conftest as _cf

torch = pytest.importorskip("torch")


def _healthy_rescale(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    for p in module.parameters():
        if p.ndim >= 2:
            fan_in = int(np.prod(p.shape[1:]))
            p.data = torch.randn(p.shape, generator=g) * (2.0 / fan_in) ** 0.5
        elif p.ndim == 1 and p.requires_grad:
            p.data = torch.randn(p.shape, generator=g) * 0.05
    for m in module.modules():
        if hasattr(m, "running_mean") and m.running_mean is not None:
            m.running_mean.data = torch.randn(m.running_mean.shape, generator=g) * 0.1
            m.running_var.data = torch.rand(m.running_var.shape, generator=g) + 0.5


@pytest.mark.parametrize("sn", [False, True])
@pytest.mark.parametrize("stride", [(1, 1, 1), (1, 2, 2)])
def test_residual_block3d_parity(sn, stride):
    _cf.add_reference_to_path()
    import jax.numpy as jnp
    from scripts.submodules import ResidualBlock3D as TorchRB

    from v2ce_toolbox_tpu.models.layers import ResidualBlock3D
    from v2ce_toolbox_tpu.utils.torch_compat import _TreeBuilder, state_dict_to_numpy

    torch.manual_seed(3)
    t_stride = 1 if stride == (1, 1, 1) else stride
    trb = TorchRB(8, 16, stride=t_stride, norm="BN", sn=sn).eval()
    _healthy_rescale(trb, seed=11)
    # SpectralNorm wraps parameters; refresh u/v scale too
    sd = {f"blk.{k}": v for k, v in state_dict_to_numpy(trb.state_dict()).items()}

    tb = _TreeBuilder()
    tb.residual_block(sd, "blk", ("blk",), sn=sn, norm=True)
    variables = {
        "params": tb.params["blk"],
        "batch_stats": tb.batch_stats["blk"],
    }
    if sn:
        variables["sn"] = tb.sn["blk"]

    rng = np.random.RandomState(5)
    x = rng.randn(2, 8, 4, 12, 14).astype(np.float32)  # (B, C, L, H, W)

    with torch.no_grad():
        ref = trb(torch.from_numpy(x)).numpy()

    blk = ResidualBlock3D(features=16, stride=stride, norm="BN", sn=sn)
    y = blk.apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))), train=False
    )
    y = np.transpose(np.asarray(y), (0, 4, 1, 2, 3))
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


def test_residual_block_uses_projection_shortcut():
    """Identity-shaped blocks must still apply the projection (the reference
    constructs downsample unconditionally: submodules.py:244-247)."""
    import jax
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.models.layers import ResidualBlock3D

    blk = ResidualBlock3D(features=8, stride=(1, 1, 1), norm="BN", sn=False)
    variables = blk.init(jax.random.key(0), jnp.zeros((1, 2, 4, 4, 8)))
    assert "downsample_conv" in variables["params"]
