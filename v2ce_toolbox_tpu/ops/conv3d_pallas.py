"""Pallas implicit-GEMM 3x3x3 conv for the stage-1 UNet's hot layers.

Why: XLA's conv3d lowering plateaus at 20-54 TF/s on v5e across every
layer shape of this model (measured, tools/perf_probe.py conv_iso /
pallas_conv), and an XLA shifted-matmul formulation is accumulator-/
slice-traffic bound. This kernel keeps the f32 accumulator in VMEM and
reads each input slab from HBM once per tile, turning the conv into 27
accumulated MXU matmuls:

    out[l, h, w, co] = sum_{dl,dh,dw} x[l+dl-1, h+dh-1, w+dw-1, :] @
                       k[dl, dh, dw, :, co]

The matmul M dimension is (l_tile * th * w): output frames share the
filter, so a whole block of frames rides one dot per tap — tap dl of an
L_t-frame block is the shifted frame slice [l0+dl, l0+L_t+dl) of the same
slab. This is what fills the MXUs: M in the thousands instead of hundreds
(a v1 without L-tiling measured only 22-43 TF/s — MXU-starved at
M = th*w with one 128-lane N tile).

Grid: (B, Cout tiles, L tiles, H tiles). The filter tile is a pipelined
BlockSpec operand (re-fetched only when the co tile changes); the halo'd
input slab ((l_t+2) frames x (th+2) rows x full width) is DMA'd manually
since overlapping windows are not expressible as BlockSpec partitions.

Alignment rules learned the hard way (Mosaic):
  - the kernel-visible width w_out must be a sublane-tile multiple (16)
    for the (l_t, th, w_out, C) -> (l_t*th*w_out, C) merge to be legal;
  - HBM DMA slice sizes on the second-minor dim must be 8-multiples, so
    the slab width is w_out + 8 (covers the w_out + 2 halo);
  - the filter BlockSpec's last dim must be a 128-multiple or the whole
    Cout, so co tiles are 128-aligned (Cout padded when smaller).

Scope: kernel 3x3x3, stride 1, padding 1 — the shape of every
ResidualBlock3D conv1/conv2 and decoder conv in the model (91% of forward
FLOPs; reference architecture scripts/unet_2layer.py:203-378). Strided
encoder convs, 1x1 projections and the 2-channel head stay on XLA.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 11 * 1024 * 1024


def _pick_tiles(l: int, h: int, w_out: int, c: int, co: int,
                in_itemsize: int, out_itemsize: int) -> Tuple[int, int, int]:
    """Pick (l_t, th, co_t) to fit the VMEM budget with the largest matmul
    M = l_t*th*w_out. co tiles must be 128-aligned (or whole)."""
    co_t = co if co <= 128 else 128
    best = None
    for l_t in (l, 16, 8, 4, 2, 1):
        if l_t > l or l % l_t:
            continue
        for th in (h, 128, 64, 32, 16, 8, 4, 2, 1):
            if th > h:
                continue
            slab = (l_t + 2) * (th + 2) * (w_out + 8) * c * in_itemsize
            filt = 27 * c * co_t * in_itemsize * 2        # double-buffered
            acc = l_t * th * w_out * co_t * 4
            outb = l_t * th * w_out * co_t * out_itemsize * 2
            if slab + filt + acc + outb <= _VMEM_BUDGET:
                m = l_t * th * w_out
                # prefer larger M; tie-break fewer grid steps (larger tiles)
                key = (min(m, 16384), l_t * th)
                if best is None or key > best[0]:
                    best = (key, (l_t, th, co_t))
                break                       # larger th won't fit either way
    if best is None:
        raise ValueError(
            f"no VMEM-feasible tiling for conv3d L{l} {h}x{w_out}x{c}->{co}")
    return best[1]


def _kernel(k_ref, xp_ref, out_ref, slab, sem, *, l_t, th, w_out, co_t):
    b = pl.program_id(0)
    lt = pl.program_id(2)
    ht = pl.program_id(3)

    copy = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(lt * l_t, l_t + 2), pl.ds(ht * th, th + 2)],
        slab, sem)
    copy.start()
    copy.wait()

    acc = jnp.zeros((l_t * th * w_out, co_t), jnp.float32)
    for dl in range(3):
        for dh in range(3):
            for dw in range(3):
                a = slab[dl:dl + l_t, dh:dh + th, dw:dw + w_out, :]
                a = a.reshape(l_t * th * w_out, a.shape[-1])
                acc = acc + jax.lax.dot_general(
                    a, k_ref[dl, dh, dw],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    out_ref[0] = acc.reshape(l_t, th, w_out, co_t).astype(out_ref.dtype)


def conv3d_3x3x3(x: jax.Array, k: jax.Array,
                 out_dtype=jnp.float32) -> jax.Array:
    """3x3x3 stride-1 'same' conv, channels-last.

    Args:
      x: (B, L, H, W, C) activations (bf16 or f32).
      k: (3, 3, 3, C, Co) filter (same dtype as x).
    Returns:
      (B, L, H, W, Co) in out_dtype (f32 accumulation either way).

    Runs in interpreter mode off-TPU so the CPU-mesh tests exercise the
    same code path.
    """
    interpret = jax.default_backend() != "tpu"
    b, l, h, w, c = x.shape
    co = k.shape[-1]
    out_itemsize = jnp.dtype(out_dtype).itemsize
    # input channels padded to a lane-tile multiple: the manual slab DMA
    # slices the lane dim in full, and Mosaic requires 128-aligned slices
    cp = -(-c // 128) * 128
    wp_out = -(-w // 16) * 16          # sublane-tile aligned kernel width
    l_t, th, co_t = _pick_tiles(l, h, wp_out, cp, co,
                                x.dtype.itemsize, out_itemsize)
    hp = -h % th
    n_ht = (h + hp) // th
    n_co = -(-co // co_t)
    cop = n_co * co_t - co

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + hp), (1, 7 + wp_out - w),
                     (0, cp - c)))
    kp = jnp.pad(k, ((0, 0),) * 3 + ((0, cp - c), (0, cop)))

    out = pl.pallas_call(
        functools.partial(_kernel, l_t=l_t, th=th, w_out=wp_out, co_t=co_t),
        grid=(b, n_co, l // l_t, n_ht),
        in_specs=[
            pl.BlockSpec((3, 3, 3, cp, co_t),
                         lambda bi, ci, li, hi: (0, 0, 0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, l_t, th, wp_out, co_t),
            lambda bi, ci, li, hi: (bi, li, hi, 0, ci),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, h + hp, wp_out, n_co * co_t),
                                       out_dtype),
        scratch_shapes=[
            pltpu.VMEM((l_t + 2, th + 2, wp_out + 8, cp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * l * h * w * c * co * 27,
            bytes_accessed=(xp.size * x.dtype.itemsize
                            + b * l * h * w * co * out_itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(kp, xp)
    return out[:, :, :h, :w, :co]
