"""Plain-conv UNet variant tests (reference train/scripts/model/unet.py)."""

import numpy as np

from tests import conftest as _cf  # noqa: F401


def test_unet_plain3d_shapes_and_multi():
    import jax
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.models.unet_plain import UNetPlain3D

    # NOTE: the reference's skip_type='sum' default is latently broken for
    # its own channel progression (x+skip with 512 vs 256 channels would
    # fail in torch identically); 'concat' is the working configuration.
    x = jnp.zeros((1, 2, 32, 44, 8))
    net = UNetPlain3D(num_input_channels=8, num_output_channels=16,
                      skip_type="concat", activation="sigmoid", norm="BN")
    variables = net.init(jax.random.key(0), x)
    out = net.apply(variables, x, train=False)
    assert out.shape == (1, 2, 32, 44, 16)
    assert 0 <= float(out.min()) and float(out.max()) <= 1  # sigmoid

    multi = UNetPlain3D(num_input_channels=8, num_output_channels=16,
                        skip_type="concat", activation="sigmoid",
                        norm="BN", multi=True)
    mv = multi.init(jax.random.key(1), x)
    preds = multi.apply(mv, x, train=False)
    assert len(preds) == 4                      # one per decoder level
    assert preds[-1].shape == (1, 2, 32, 44, 16)
