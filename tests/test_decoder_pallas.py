"""Fused Pallas decoder conv (ops/decoder_pallas.py) is exact.

Pins fused_up_concat_conv against the unfused composition
upsample_nearest_to + concat + conv3d('same') — the decoder block's
conv1 (reference: scripts/unet_2layer.py:355-371) — for every odd/even
fine-size parity and the model's real channel ratios. Runs the Pallas
kernel in interpreter mode on the CPU mesh (same code path as TPU)."""

import numpy as np
import pytest

from tests import conftest as _cf  # noqa: F401  (forces cpu)

import jax
import jax.numpy as jnp
from jax import lax

from v2ce_toolbox_tpu.models.layers import upsample_nearest_to
from v2ce_toolbox_tpu.ops.decoder_pallas import fused_up_concat_conv


def _ref(coarse, skip, kernel):
    up = upsample_nearest_to(coarse, (skip.shape[2], skip.shape[3]))
    x = jnp.concatenate([up, skip], axis=-1)
    return lax.conv_general_dilated(
        x, kernel, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)


def _mk(hc, wc, hf, wf, cu, cs, co, seed=0, l=4):
    rng = np.random.RandomState(seed)
    coarse = jnp.asarray(rng.randn(1, l, hc, wc, cu).astype(np.float32))
    skip = jnp.asarray(rng.randn(1, l, hf, wf, cs).astype(np.float32))
    kernel = jnp.asarray(
        (rng.randn(3, 3, 3, cu + cs, co) * 0.1).astype(np.float32))
    return coarse, skip, kernel


@pytest.mark.parametrize("hf_odd", [False, True], ids=["He", "Ho"])
@pytest.mark.parametrize("wf_odd", [False, True], ids=["We", "Wo"])
def test_parity_grid(hf_odd, wf_odd):
    hc, wc = 5, 7
    hf, wf = 2 * hc - hf_odd, 2 * wc - wf_odd
    coarse, skip, kernel = _mk(hc, wc, hf, wf, cu=8, cs=4, co=4,
                               seed=hf_odd * 2 + wf_odd)
    got = fused_up_concat_conv(coarse, skip, kernel, out_dtype=jnp.float32)
    want = _ref(coarse, skip, kernel)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("cu,cs,co", [(64, 32, 32), (128, 64, 64)],
                         ids=["dec3-ratio", "dec2-ratio"])
def test_model_channel_ratios(cu, cs, co):
    # dec3: even/even fine (260x346 analog); dec2: odd W (130x173 analog)
    hc, wc = 4, 5
    wf = 2 * wc - (cu == 128)
    coarse, skip, kernel = _mk(hc, wc, 2 * hc, wf, cu, cs, co, seed=7, l=2)
    got = fused_up_concat_conv(coarse, skip, kernel, out_dtype=jnp.float32)
    want = _ref(coarse, skip, kernel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_bf16_close_to_f32_ref():
    hc, wc = 5, 6
    coarse, skip, kernel = _mk(hc, wc, 2 * hc - 1, 2 * wc, 16, 8, 8, seed=3)
    got = fused_up_concat_conv(coarse.astype(jnp.bfloat16),
                               skip.astype(jnp.bfloat16),
                               kernel.astype(jnp.bfloat16),
                               out_dtype=jnp.float32)
    want = _ref(coarse, skip, kernel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.05)


def test_rejects_wide_co():
    coarse, skip, kernel = _mk(4, 4, 8, 8, 8, 8, 128)
    with pytest.raises(AssertionError, match="Co <= 64"):
        fused_up_concat_conv(coarse, skip, kernel)


@pytest.mark.parametrize("hf_odd,wf_odd", [(False, False), (True, True)],
                         ids=["even", "odd"])
def test_fused_projection(hf_odd, wf_odd):
    # the residual 1x1x1 projection rides the same dots as extra N lanes
    hc, wc = 5, 6
    hf, wf = 2 * hc - hf_odd, 2 * wc - wf_odd
    coarse, skip, kernel = _mk(hc, wc, hf, wf, cu=16, cs=8, co=8, seed=11)
    rng = np.random.RandomState(12)
    proj_k = jnp.asarray(
        (rng.randn(1, 1, 1, 24, 8) * 0.1).astype(np.float32))
    got, got_proj = fused_up_concat_conv(coarse, skip, kernel, proj_k,
                                         out_dtype=jnp.float32)
    want = _ref(coarse, skip, kernel)
    up = upsample_nearest_to(coarse, (hf, wf))
    x = jnp.concatenate([up, skip], axis=-1)
    want_proj = lax.conv_general_dilated(
        x, proj_k, (1, 1, 1), [(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_proj), np.asarray(want_proj),
                               rtol=1e-4, atol=1e-4)
