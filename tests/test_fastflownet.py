"""FastFlowNet architecture tests (weights not shipped; structure only)."""

import numpy as np

from tests import conftest as _cf  # noqa: F401


def test_bilinear_warp_identity_and_shift():
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.models.fastflownet import bilinear_warp

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 10, 3).astype(np.float32))
    # zero flow = identity
    out = bilinear_warp(x, jnp.zeros((2, 8, 10, 2)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
    # integer shift by +1 in x: out[y, x] = img[y, x+1]
    flow = jnp.zeros((2, 8, 10, 2)).at[..., 0].set(1.0)
    out = np.asarray(bilinear_warp(x, flow))
    np.testing.assert_allclose(out[:, :, :-1], np.asarray(x)[:, :, 1:],
                               atol=1e-6)
    np.testing.assert_allclose(out[:, :, -1], 0, atol=1e-6)  # OOB zeros


def test_fastflownet_shapes():
    import jax
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.models.fastflownet import FastFlowNet

    net = FastFlowNet()
    x = jnp.zeros((1, 64, 128, 6))
    variables = net.init(jax.random.key(0), x)
    flow = net.apply(variables, x)
    assert flow.shape == (1, 16, 32, 2)     # 1/4 resolution
    levels = net.apply(variables, x, train=True)
    assert len(levels) == 5
    assert levels[0].shape == (1, 16, 32, 2)
    assert levels[-1].shape == (1, 1, 2, 2)  # 1/64


def test_optical_flow_calculator_pads_and_restores():
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.models.fastflownet import OpticalFlowCalculator

    ofc = OpticalFlowCalculator()
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.rand(1, 50, 70, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 50, 70, 3).astype(np.float32))
    flow = ofc(a, b)
    assert flow.shape == (1, 50, 70, 2)
    assert np.isfinite(np.asarray(flow)).all()
