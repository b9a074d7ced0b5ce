"""Sobel image gradients and the double-blurred pair gradient channel.

jnp re-implementation of the reference's gradient utilities
(reference: train/scripts/utils/image_derivative.py:10-126), channels-last
(B, H, W, C). The blurred merge (used as an optional extra input channel
to the model, event_pack_dataset.py:69-73) uses a truncated gaussian kernel
matching torchvision's gaussian_blur(kernel_size=11, sigma=3).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)


def batch_img_gradient(img: jax.Array) -> jax.Array:
    """Sobel magnitude per channel; (B, H, W, C) -> (B, H, W, C)
    (reference: image_derivative.py:59-77)."""
    c = img.shape[-1]
    kx = jnp.asarray(_SOBEL_X)[:, :, None, None] * jnp.eye(c)[None, None]
    ky = jnp.asarray(_SOBEL_X.T)[:, :, None, None] * jnp.eye(c)[None, None]
    dn = ("NHWC", "HWIO", "NHWC")
    gx = lax.conv_general_dilated(img, kx, (1, 1), ((1, 1), (1, 1)),
                                  dimension_numbers=dn)
    gy = lax.conv_general_dilated(img, ky, (1, 1), ((1, 1), (1, 1)),
                                  dimension_numbers=dn)
    return jnp.sqrt(gx * gx + gy * gy)


def _gaussian_kernel1d(kernel_size: int, sigma: float) -> np.ndarray:
    x = np.arange(kernel_size, dtype=np.float64) - (kernel_size - 1) / 2
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jax.Array, kernel_size: int = 11,
                  sigma: float = 3.0) -> jax.Array:
    """Separable gaussian blur, (B, H, W, C); matches torchvision's
    reflect-padded gaussian_blur."""
    c = img.shape[-1]
    k1 = _gaussian_kernel1d(kernel_size, sigma)
    pad = kernel_size // 2
    kh = jnp.asarray(k1)[:, None, None, None] * jnp.eye(c)[None, None]
    kw = jnp.asarray(k1)[None, :, None, None] * jnp.eye(c)[None, None]
    dn = ("NHWC", "HWIO", "NHWC")
    x = jnp.pad(img, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode="reflect")
    x = lax.conv_general_dilated(x, kh, (1, 1), ((0, 0), (0, 0)),
                                 dimension_numbers=dn)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    return lax.conv_general_dilated(x, kw, (1, 1), ((0, 0), (0, 0)),
                                    dimension_numbers=dn)


def get_batch_double_blurred_image_gradient(
    image1: jax.Array, image2: jax.Array,
    sigma: float = 3.0, kernel_size: int = 11,
) -> jax.Array:
    """max(|∇img1|, |∇img2|) blurred — the optional model input channel
    (reference: image_derivative.py:38-57)."""
    g = jnp.maximum(batch_img_gradient(image1), batch_img_gradient(image2))
    return gaussian_blur(g, kernel_size, sigma)


def batch_img_residual(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """(reference: image_derivative.py:79-89)."""
    return img2 - img1
