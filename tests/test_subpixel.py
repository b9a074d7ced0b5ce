"""Sub-pixel decoder folds are exact rewrites of conv-over-upsample.

All three formulations in ops/subpixel.py (split / wfold / pfold) must
match `conv3d(upsample_nearest_to(coarse, target))` to float-reassociation
tolerance for every odd/even target parity — the model hits (even, even)
at decoder_3 (260, 346) and (even, odd) at decoder_2 (130, 173).
Reference semantics: scripts/unet_2layer.py:355-371 (upsample + concat +
conv decoders).
"""

import numpy as np
import pytest

from tests import conftest as _cf  # noqa: F401  (forces cpu)

import jax.numpy as jnp
from jax import lax

from v2ce_toolbox_tpu.models.layers import upsample_nearest_to
from v2ce_toolbox_tpu.ops.subpixel import (
    conv1x1_on_nearest_up2,
    conv3d_on_nearest_up2,
    conv3d_on_nearest_up2_pfold,
    conv3d_on_nearest_up2_wfold,
)

_IMPLS = {
    "split": conv3d_on_nearest_up2,
    "wfold": conv3d_on_nearest_up2_wfold,
    "pfold": conv3d_on_nearest_up2_pfold,
}


def _oracle(coarse, kernel, target_hw):
    up = upsample_nearest_to(coarse, target_hw)
    return lax.conv_general_dilated(
        up, kernel, (1, 1, 1), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)


@pytest.mark.parametrize("impl", sorted(_IMPLS))
@pytest.mark.parametrize("odd_h,odd_w", [(0, 0), (0, 1), (1, 0), (1, 1)],
                         ids=["ee", "eo", "oe", "oo"])
def test_fold_matches_upsample_conv(impl, odd_h, odd_w):
    rng = np.random.RandomState(7 + odd_h * 2 + odd_w)
    hc, wc, c, co = 6, 5, 8, 4
    target = (2 * hc - odd_h, 2 * wc - odd_w)
    coarse = jnp.asarray(rng.randn(2, 3, hc, wc, c).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, 3, c, co).astype(np.float32))
    want = np.asarray(_oracle(coarse, kernel, target))
    got = np.asarray(_IMPLS[impl](coarse, kernel, target))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_conv1x1_matches_upsample_conv():
    rng = np.random.RandomState(3)
    coarse = jnp.asarray(rng.randn(1, 2, 4, 5, 6).astype(np.float32))
    kernel = jnp.asarray(rng.randn(1, 1, 1, 6, 3).astype(np.float32))
    target = (7, 10)
    up = upsample_nearest_to(coarse, target)
    want = np.asarray(lax.conv_general_dilated(
        up, kernel, (1, 1, 1), ((0, 0),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32))
    got = np.asarray(conv1x1_on_nearest_up2(coarse, kernel, target))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("impl", sorted(_IMPLS))
def test_model_shapes(impl):
    """The exact coarse/target pairs the 260x346 model produces."""
    rng = np.random.RandomState(11)
    for hc, wc, target in [(9, 11, (18, 22)), (9, 11, (17, 21))]:
        coarse = jnp.asarray(rng.randn(1, 2, hc, wc, 4).astype(np.float32))
        kernel = jnp.asarray(rng.randn(3, 3, 3, 4, 2).astype(np.float32))
        want = np.asarray(_oracle(coarse, kernel, target))
        got = np.asarray(_IMPLS[impl](coarse, kernel, target))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
