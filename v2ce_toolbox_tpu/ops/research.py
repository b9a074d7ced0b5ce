"""Probe-only conv backends — measured dead ends kept as evidence.

Every backend here was A/B'd in-model on TPU v5e and LOST to XLA's direct
conv schedule (PERF.md rounds 2-4); they are retained for the perf-probe
harness (tools/perf_probe.py) and the parity tests
(tests/test_model_rewrites.py), NOT for the product path. The product
dispatch (models/layers._apply_conv) handles only conv_impl='xla' inline
and routes anything else through `dispatch_conv` below, so the product
path never carries this complexity.

Backends (see each op module for the full measurement story):
  'ko:<pred>'  knockout profiling: replace selected 3x3x3 convs with
               their center tap so a group's true in-model cost reads off
               the model-time delta (tools/perf_probe.py model_knockout).
  'fold'       phase-folded (1,2,2)-strided conv via space-to-depth
               (ops/conv3d_quad.fold_s122). In-model: 54.0 vs 49.65 ms.
  'd2'/'d2s'   depth-tap N-fold: 3x3x3 conv as one 2D conv with 3*cout
               output lanes + L shift-add. In-model: 101.6 / 51.3 ms.
  'wpack'      width-packed (3,3,1) rewrite (ops/wpack.py).
  'pallas'     implicit-GEMM Mosaic conv (ops/conv3d_pallas.py):
               per-layer parity with XLA (22-43 TF/s), forward-only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dispatch_conv(x: jax.Array, kernel: jax.Array, strides, padding,
                  compute_dtype, conv_impl: str) -> jax.Array:
    """Research-backend twin of models.layers._apply_conv; output f32."""
    ndim_sp = kernel.ndim - 2
    if conv_impl.startswith("ko:") and ndim_sp == 3 \
            and kernel.shape[:3] == (3, 3, 3):
        pred = conv_impl[3:]
        cin, cout = kernel.shape[3], kernel.shape[4]
        strided = tuple(strides) != (1, 1, 1)
        preds = {
            "all": True,
            "head": cin == 2,
            "strided": strided,
            "small": (not strided) and cout < 128 and cin > 2,
            "big": (not strided) and cin >= 256,
        }
        if pred not in preds:
            raise ValueError(f"unknown knockout predicate {pred!r}; "
                             f"valid: {sorted(preds)}")
        if preds[pred]:
            return jax.lax.conv_general_dilated(
                x.astype(compute_dtype),
                kernel[1:2, 1:2, 1:2].astype(compute_dtype),
                window_strides=strides, padding=[(0, 0)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32)
        conv_impl = "xla"
    if (conv_impl == "fold" and ndim_sp == 3
            and kernel.shape[:3] == (3, 3, 3)
            and tuple(strides) == (1, 2, 2)
            and tuple(padding) == ((1, 1), (1, 1), (1, 1))):
        # phase-folded strided conv: space-to-depth folds the H/W phases
        # into 4C channels, turning the (1,2,2)-strided conv into a dense
        # stride-1 (3,2,2) conv (exact: folded taps outside the 3x3
        # footprint carry zero weights).
        from v2ce_toolbox_tpu.ops.conv3d_quad import fold_s122

        xf, k4 = fold_s122(x.astype(compute_dtype),
                           kernel.astype(compute_dtype))
        return jax.lax.conv_general_dilated(
            xf, k4, (1, 1, 1), [(0, 0), (0, 0), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
    if conv_impl == "fold":
        conv_impl = "xla"
    if conv_impl == "d2s":
        # selective depth-fold: only the decoder conv1 pattern
        # (cout < 128 lanes and cin > cout), where the isolated A/B wins
        cin_, cout_ = kernel.shape[-2], kernel.shape[-1]
        conv_impl = "d2" if (cout_ < 128 and cin_ > cout_) else "xla"
    if (conv_impl == "d2" and ndim_sp == 3
            and kernel.shape[:3] == (3, 3, 3)
            and strides[0] == 1
            and tuple(padding) == ((1, 1), (1, 1), (1, 1))):
        # depth-tap N-fold: the 3x3x3 conv becomes ONE 2D conv over the
        # (B*L) batch whose output channels are (kd, cout), followed by a
        # shift-add over L. Exact up to f32 accumulation order.
        x = x.astype(compute_dtype)
        b, l, h, w, c = x.shape
        co = kernel.shape[-1]
        # (kd, kh, kw, cin, co) -> (kh, kw, cin, kd*co)
        k2 = jnp.transpose(kernel.astype(compute_dtype),
                           (1, 2, 3, 0, 4)).reshape(3, 3, c, 3 * co)
        z = jax.lax.conv_general_dilated(
            x.reshape(b * l, h, w, c), k2,
            window_strides=strides[1:], padding=list(padding[1:]),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        ho, wo = z.shape[1], z.shape[2]
        z = z.reshape(b, l, ho, wo, 3, co)
        # y[l] = z[l-1, kd=0] + z[l, kd=1] + z[l+1, kd=2]  (zero outside)
        y = z[:, :, :, :, 1]
        y = y.at[:, 1:].add(z[:, :-1, :, :, 0])
        y = y.at[:, :-1].add(z[:, 1:, :, :, 2])
        return y
    if conv_impl == "d2":
        conv_impl = "xla"
    if (conv_impl == "wpack" and ndim_sp == 3
            and kernel.shape[:3] == (3, 3, 3)
            and strides[0] == 1
            and tuple(padding) == ((1, 1), (1, 1), (1, 1))):
        from v2ce_toolbox_tpu.ops.wpack import conv3d_wpack

        return conv3d_wpack(x, kernel, tuple(strides),
                            compute_dtype=compute_dtype)
    if (conv_impl == "pallas" and ndim_sp == 3
            and kernel.shape[:3] == (3, 3, 3)
            and tuple(strides) == (1, 1, 1)
            and tuple(padding) == ((1, 1), (1, 1), (1, 1))
            and x.shape[-1] >= 16):
        from v2ce_toolbox_tpu.ops.conv3d_pallas import conv3d_3x3x3

        return conv3d_3x3x3(x.astype(compute_dtype),
                            kernel.astype(compute_dtype),
                            out_dtype=jnp.float32)
    if conv_impl not in ("xla", "fold", "d2", "d2s", "wpack", "pallas"):
        raise ValueError(f"unknown conv_impl {conv_impl!r}")
    dn_in = "N" + "DHW"[3 - ndim_sp:] + "C"
    dn_k = "DHW"[3 - ndim_sp:] + "IO"
    return jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        kernel.astype(compute_dtype),
        window_strides=strides,
        padding=list(padding),
        dimension_numbers=(dn_in, dn_k, dn_in),
        preferred_element_type=jnp.float32,
    )
