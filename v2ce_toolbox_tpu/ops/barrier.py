"""Layout firewall: identity through a Pallas custom call.

The fused forward+sampler jit costs 136 ms vs the 82 ms sum of separate
dispatches because XLA's layout assignment propagates the sampler's
channel-major preference BACKWARD through the model: the top-resolution
convs get channels-minor T(1,128) layouts and a catastrophic emitter
(decoder_3/conv1 ~5 ms -> 40.9 ms; see PERF.md round-3 fused-HLO
analysis). `lax.optimization_barrier` does not help (180 ms) because it
is layout-transparent.

A Pallas call IS a layout boundary: XLA custom calls require
major-to-minor default layouts on operands and results, so placing an
identity kernel between the stages stops the propagation chain at the
cost of one HBM round-trip of the voxel tensor (~115 MB at 16x260x346
f32 ~= 0.3 ms at HBM bandwidth).

Usage: voxels = layout_barrier(voxels) between model.apply and the
sampler inside one jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _identity_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def layout_barrier(x: jax.Array) -> jax.Array:
    """Identity; compiles to a Pallas custom call that pins default
    layouts on both sides, firewalling XLA layout propagation."""
    if x.ndim < 2:
        x2 = x.reshape(1, -1)
        return layout_barrier(x2).reshape(x.shape)
    lead = 1
    for d in x.shape[:-2]:
        lead *= d
    h, w = x.shape[-2], x.shape[-1]
    x3 = x.reshape(lead, h, w)
    out = pl.pallas_call(
        _identity_kernel,
        grid=(lead,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((lead, h, w), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x3)
    return out.reshape(x.shape)
