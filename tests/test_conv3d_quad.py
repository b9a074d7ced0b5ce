"""conv3d_quad (quad-packed Pallas GEMM) == XLA conv3d, interpret mode."""

import numpy as np
import pytest

from tests import conftest as _cf  # noqa: F401  (forces cpu)

import jax.numpy as jnp
from jax import lax

from v2ce_toolbox_tpu.ops.conv3d_quad import conv3d_quad


def _ref(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1, 1), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)


CASES = [
    # (l, h, w, cin, cout, ws) — shrunken model layer classes
    (5, 10, 22, 128, 64, None),     # auto ws=2
    (5, 8, 13, 64, 64, 2),          # odd w, ws=2
    (4, 12, 20, 64, 128, 2),        # co >= 128 (N tiled)
    (5, 9, 23, 32, 32, 4),          # decoder small-cout quad=4
    (3, 9, 17, 96, 32, 4),          # dec3_c1 class (c=96)
    (2, 7, 11, 64, 16, 8),          # ws=8
]


@pytest.mark.parametrize("l,h,w,cin,cout,ws", CASES)
def test_quad_matches_xla_conv(l, h, w, cin, cout, ws):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, l, h, w, cin).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, cin, cout).astype(np.float32) * 0.05)
    out = conv3d_quad(x, k, ws=ws)
    ref = _ref(x, k)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_quad_bf16_close():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 3, 8, 14, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 64, 32).astype(np.float32) * 0.05)
    out = conv3d_quad(x.astype(jnp.bfloat16), k.astype(jnp.bfloat16))
    ref = _ref(x, k)
    # bf16 inputs, f32 accumulation: ~1e-2 relative
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.1, atol=0.35)
