"""Tests for the correlation (cost volume) op: numpy-loop golden for the
jnp path, and Pallas-kernel (interpret mode) parity with the jnp path."""

import numpy as np

from tests import conftest as _cf  # noqa: F401


def _np_correlation(f1, f2, md):
    b, h, w, c = f1.shape
    d = 2 * md + 1
    f2p = np.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))
    out = np.zeros((b, h, w, d * d), np.float32)
    for dy in range(d):
        for dx in range(d):
            win = f2p[:, dy:dy + h, dx:dx + w, :]
            out[..., dy * d + dx] = (f1 * win).mean(axis=-1)
    return out


def test_correlation_jnp_matches_numpy():
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.correlation import correlation_jnp

    rng = np.random.RandomState(0)
    f1 = rng.randn(2, 12, 14, 8).astype(np.float32)
    f2 = rng.randn(2, 12, 14, 8).astype(np.float32)
    ref = _np_correlation(f1, f2, md=2)
    out = np.asarray(correlation_jnp(jnp.asarray(f1), jnp.asarray(f2),
                                     max_displacement=2))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_correlation_pallas_matches_jnp():
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.correlation import correlation, correlation_jnp

    rng = np.random.RandomState(1)
    f1 = rng.randn(2, 16, 24, 16).astype(np.float32)
    f2 = rng.randn(2, 16, 24, 16).astype(np.float32)
    ref = np.asarray(correlation_jnp(jnp.asarray(f1), jnp.asarray(f2),
                                     max_displacement=3))
    out = np.asarray(correlation(jnp.asarray(f1), jnp.asarray(f2),
                                 max_displacement=3, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
