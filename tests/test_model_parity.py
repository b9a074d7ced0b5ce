"""Golden tests: our flax V2ce3d vs the torch reference model.

Builds the reference model (imported read-only from /root/reference) with a
fixed seed, converts its state_dict through utils.torch_compat, and compares
eval-mode forward activations on random input. This validates conv padding,
BN running-stat semantics, spectral-norm power-iteration placement, and the
decoder's size-targeted nearest upsampling in one shot.
"""

import numpy as np
import pytest

from tests import conftest as _cf

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def torch_model():
    _cf.add_reference_to_path()
    from scripts.v2ce_3d import V2ce3d as TorchV2ce3d

    torch.manual_seed(0)
    model = TorchV2ce3d()
    model = model.eval()
    return model


def _convert(model):
    from v2ce_toolbox_tpu.utils.torch_compat import (
        convert_v2ce3d_state_dict,
        state_dict_to_numpy,
    )

    return convert_v2ce3d_state_dict(state_dict_to_numpy(model.state_dict()))


def test_forward_parity_small(torch_model):
    """Full-model parity on a small odd-sized input (stride/upsample paths)."""
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.models import V2ce3d

    rng = np.random.RandomState(42)
    B, L, H, W = 1, 4, 65, 87  # odd sizes exercise torch rounding behavior
    x = rng.randn(B, L, 2, H, W).astype(np.float32)

    # Convert BEFORE the torch forward: SpectralNorm.forward mutates (u, v)
    # in place (reference: scripts/spectral_norm.py:62-64), so our converted
    # state must match the pre-forward checkpoint to reproduce forward #1.
    variables = _convert(torch_model)

    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x)).numpy()  # (B, L, 20, H, W)
    model = V2ce3d()
    y = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"],
         "sn": variables["sn"]},
        jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))),  # -> (B, L, H, W, 2)
        train=False,
    )
    y = np.transpose(np.asarray(y), (0, 1, 4, 2, 3))  # -> (B, L, 20, H, W)

    assert y.shape == ref.shape
    # float32 conv stacks accumulate small differences; relative tolerance.
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)


def test_forward_parity_sensor_size(torch_model):
    """Parity at the real DAVIS346 geometry 260x346 with 2 frames."""
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.models import V2ce3d

    rng = np.random.RandomState(7)
    x = rng.randn(1, 2, 2, 260, 346).astype(np.float32) * 0.5

    variables = _convert(torch_model)  # before forward: see parity_small
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x)).numpy()
    y = V2ce3d().apply(
        variables, jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))), train=False
    )
    y = np.transpose(np.asarray(y), (0, 1, 4, 2, 3))
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)


def test_param_count_matches(torch_model):
    import jax

    variables = _convert(torch_model)
    n_torch = sum(p.numel() for p in torch_model.parameters())
    # flax 'params' includes kernel_bar (=weight_bar). torch parameters()
    # additionally include the non-trainable u/v vectors.
    n_sn = sum(x.size for x in jax.tree.leaves(variables["sn"]))
    n_flax = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert n_flax + n_sn == n_torch
