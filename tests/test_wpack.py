"""conv3d_wpack == XLA conv3d for every model layer shape class."""

import numpy as np
import pytest

from tests import conftest as _cf  # noqa: F401  (forces cpu)

import jax.numpy as jnp
from jax import lax

from v2ce_toolbox_tpu.ops.wpack import conv3d_wpack


def _ref_conv(x, k, strides):
    return lax.conv_general_dilated(
        x, k, window_strides=strides, padding=((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)


CASES = [
    # (h, w, cin, cout, strides, ws)  — shrunken model layer classes
    (13, 23, 2, 8, (1, 1, 1), None),        # head-like, ws=16
    (13, 23, 6, 8, (1, 2, 2), None),        # strided encoder, small c
    (14, 22, 8, 16, (1, 2, 2), None),       # strided, even w
    (13, 21, 16, 4, (1, 1, 1), 4),          # decoder small-cout, odd w
    (12, 24, 16, 4, (1, 1, 1), 2),          # explicit ws=2
    (9, 17, 32, 32, (1, 1, 1), 1),          # ws=1 (dw K-stacking only)
    (10, 20, 12, 128, (1, 1, 1), None),     # co >= 128 -> ws=1
    (11, 19, 8, 8, (1, 2, 2), 4),           # strided + packing
]


@pytest.mark.parametrize("h,w,cin,cout,strides,ws", CASES)
def test_wpack_matches_xla_conv(h, w, cin, cout, strides, ws):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, h, w, cin).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, cin, cout).astype(np.float32) * 0.1)
    ref = _ref_conv(x, k, strides)
    out = conv3d_wpack(x, k, strides, ws=ws)
    assert out.shape == ref.shape, (out.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_wpack_grad_flows():
    """The rewrite is differentiable (train-compatible, unlike the
    forward-only Pallas kernel)."""
    import jax

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 2, 8, 12, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 4, 4).astype(np.float32) * 0.1)

    g = jax.grad(lambda kk: conv3d_wpack(x, kk, (1, 1, 1)).sum())(k)
    g_ref = jax.grad(lambda kk: _ref_conv(x, kk, (1, 1, 1)).sum())(k)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-5, atol=2e-4)
