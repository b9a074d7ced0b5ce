"""Fused generation kernel (ops/gen_pallas.py) — bit-exactness vs the
unfused XLA path.

The kernel replaces relocate_counts + slope_params + candidate packing
inside `sample_events`; the contract is BIT-IDENTICAL EventStreams for
every covered configuration (same f32 op sequence, same truncating
converts, order-independent integer reductions), so these tests compare
full streams field-for-field between `use_gen_kernel=True/False` with a
shared PRNG key (identical packed inputs => identical downstream draws).
"""

import numpy as np
import pytest


def _streams_equal(a, b, msg=""):
    for name in a._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=f"{msg}: field {name}")


def _grid(seed, f=3, p=2, c=10, h=16, w=24, density=0.3, scale=5.0):
    rng = np.random.RandomState(seed)
    v = ((rng.rand(f, p, c, h, w) < density)
         * rng.rand(f, p, c, h, w) * scale)
    return v.astype(np.float32)


@pytest.mark.parametrize("strategy", ["none", "slope"])
@pytest.mark.parametrize("seed,density,scale", [(0, 0.3, 5.0),
                                                (1, 0.05, 1.5),
                                                (2, 0.9, 40.0)])
def test_stream_equality(strategy, seed, density, scale):
    import jax
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.ldati import sample_events

    v = _grid(seed, density=density, scale=scale)
    key = jax.random.key(seed + 11)
    kw = dict(additional_events_strategy=strategy, capacity=1 << 12,
              cap_bin=1 << 10, multi_cap=512, sort_cap=1 << 10)
    a = sample_events(jnp.asarray(v), key, use_gen_kernel=True, **kw)
    b = sample_events(jnp.asarray(v), key, use_gen_kernel=False, **kw)
    _streams_equal(a, b, f"{strategy}/{seed}")
    assert int(np.asarray(a.count).sum()) > 0


def test_stream_equality_t0_fps():
    """Non-zero t0 and non-default fps exercise the per-bin constant
    tables (numpy-f32 vs XLA constant folding)."""
    import jax
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.ldati import sample_events

    v = _grid(4)
    key = jax.random.key(3)
    kw = dict(additional_events_strategy="slope", capacity=1 << 12,
              cap_bin=1 << 10, multi_cap=512, sort_cap=1 << 10,
              t0=0.7312, fps=53)
    a = sample_events(jnp.asarray(v), key, use_gen_kernel=True, **kw)
    b = sample_events(jnp.asarray(v), key, use_gen_kernel=False, **kw)
    _streams_equal(a, b, "t0/fps")


def test_negative_and_zero_voxels():
    """Negative voxel values drive counts negative (emit clamps to 0) —
    the kernel must reproduce the clamp and the debt chain exactly."""
    import jax
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.ldati import sample_events

    rng = np.random.RandomState(9)
    v = rng.randn(2, 2, 10, 16, 24).astype(np.float32) * 2.0
    key = jax.random.key(1)
    kw = dict(additional_events_strategy="slope", capacity=1 << 12,
              cap_bin=1 << 10, multi_cap=512, sort_cap=1 << 10)
    a = sample_events(jnp.asarray(v), key, use_gen_kernel=True, **kw)
    b = sample_events(jnp.asarray(v), key, use_gen_kernel=False, **kw)
    _streams_equal(a, b, "negatives")


def test_odd_height_and_mepv1_fallback():
    """Odd spatial extents still run through the kernel (any H has a
    dividing row block); mepv=1 with 'slope' draws slot-0 on the grid,
    which the kernel does not cover — supported() gates it out and the
    XLA path produces the stream."""
    import jax
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.gen_pallas import supported
    from v2ce_toolbox_tpu.ops.ldati import sample_events

    assert supported(6, 17, "slope", 16)
    assert not supported(6, 17, "slope", 1)
    assert not supported(6, 17, "random", 16)
    assert not supported(260, 1 << 16, "slope", 16)  # VMEM guard
    v = _grid(5, h=6, w=17)
    key = jax.random.key(2)
    for mepv in (16, 1):
        kw = dict(additional_events_strategy="slope", capacity=1 << 12,
                  cap_bin=1 << 10, multi_cap=512, sort_cap=1 << 10,
                  max_events_per_voxel=mepv)
        a = sample_events(jnp.asarray(v), key, use_gen_kernel=True, **kw)
        b = sample_events(jnp.asarray(v), key, use_gen_kernel=False, **kw)
        _streams_equal(a, b, f"odd-shape mepv={mepv}")


def test_gen_pack_sums_match_grid():
    """gen_pack's per-frame emit/over-cap totals equal direct grid sums."""
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.gen_pallas import gen_pack
    from v2ce_toolbox_tpu.ops.ldati import relocate_counts

    v = _grid(6, f=2, density=0.5, scale=30.0)
    f, p, c, h, w = v.shape
    mepv = 4
    seg_bits = int(np.ceil(np.log2(p * h * w)))
    keys, kx, emit, drop = gen_pack(
        jnp.asarray(v), fps=30, t0=0.0, strategy="slope", mepv=mepv,
        vox_bits=seg_bits)
    y = np.swapaxes(np.flip(v, 1), 1, 2).reshape(f, c, p * h, w)
    counts, _ = relocate_counts(jnp.asarray(y))
    counts = np.asarray(counts)
    is_chain = counts == 1
    emit_ref = np.where(is_chain, 1, np.minimum(counts, mepv))
    emit_ref = np.maximum(emit_ref, 0).sum(axis=(1, 2, 3))
    drop_ref = np.where(counts > mepv, counts - mepv, 0).sum(axis=(1, 2, 3))
    np.testing.assert_array_equal(np.asarray(emit), emit_ref)
    np.testing.assert_array_equal(np.asarray(drop), drop_ref)
    assert kx is not None and keys.shape == (f, c - 1, p, h, w)


def test_wide_pano_grid_supported_and_equal():
    """Merged-pano grids (W > 346) must stay on the fused kernel: round 4
    found v2ce.py -t pano at W=520 failed TPU compile with a scoped-vmem
    OOM because the per-step block set (full P in one block) exceeded the
    100 MB limit. Polarity now rides the grid; supported() models the
    double-buffered block set. Exercised here at a reduced H with the
    real pano width."""
    import jax
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.gen_pallas import supported
    from v2ce_toolbox_tpu.ops.ldati import sample_events

    assert supported(260, 520, "slope", 16)      # the failing pano config
    assert supported(260, 692, "slope", 16)      # 2-strip merge
    assert not supported(260, 1038, "slope", 16)  # 3-strip: XLA fallback
    v = _grid(7, f=2, h=8, w=520, density=0.15)
    key = jax.random.key(4)
    kw = dict(additional_events_strategy="slope", capacity=1 << 13,
              cap_bin=1 << 11, multi_cap=512, sort_cap=1 << 11)
    a = sample_events(jnp.asarray(v), key, use_gen_kernel=True, **kw)
    b = sample_events(jnp.asarray(v), key, use_gen_kernel=False, **kw)
    _streams_equal(a, b, "wide-pano")
    assert int(np.asarray(a.count).sum()) > 0
