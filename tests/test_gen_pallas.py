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
    real pano width. use_gen_compact=False pins the comparison to
    gen_pack vs XLA (gen_compact's W > 128 order difference is covered
    by the test_gen_compact_* cases below)."""
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
              cap_bin=1 << 11, multi_cap=512, sort_cap=1 << 11,
              use_gen_compact=False)
    a = sample_events(jnp.asarray(v), key, use_gen_kernel=True, **kw)
    b = sample_events(jnp.asarray(v), key, use_gen_kernel=False, **kw)
    _streams_equal(a, b, "wide-pano")
    assert int(np.asarray(a.count).sum()) > 0


@pytest.mark.parametrize("strategy", ["none", "slope"])
@pytest.mark.parametrize("seed,density,scale", [(0, 0.3, 5.0),
                                                (2, 0.9, 40.0)])
def test_gen_compact_stream_equality_narrow(strategy, seed, density, scale):
    """W <= 128: the fused gen+compaction (ops/gen_pallas.gen_compact)
    processes candidates in exactly the unfused row order, so streams
    must be BIT-IDENTICAL even when capacity knobs bind (the 0.9/40.0
    case overflows multi_cap)."""
    import jax
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.ldati import sample_events

    v = _grid(seed, density=density, scale=scale)
    key = jax.random.key(seed + 21)
    kw = dict(additional_events_strategy=strategy, capacity=1 << 12,
              cap_bin=1 << 10, multi_cap=512, sort_cap=1 << 10)
    a = sample_events(jnp.asarray(v), key, use_gen_compact=True, **kw)
    b = sample_events(jnp.asarray(v), key, use_gen_compact=False, **kw)
    _streams_equal(a, b, f"gen_compact {strategy}/{seed}")
    assert int(np.asarray(a.count).sum()) > 0


def test_gen_compact_wide_none_exact():
    """W > 128 changes the fused processing order to (polarity, w-block,
    h, w%128), but for strategy='none' the stream is chain events only
    and the final per-bin sort canonicalizes order — bit-identical at
    any width (caps binding or not: drops are whole chunks of the SAME
    sorted content)."""
    import jax
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.ldati import sample_events

    v = _grid(7, f=2, h=8, w=300, density=0.05, scale=2.0)
    key = jax.random.key(4)
    kw = dict(additional_events_strategy="none", capacity=1 << 15,
              cap_bin=1 << 11, multi_cap=2048, sort_cap=1 << 15)
    a = sample_events(jnp.asarray(v), key, use_gen_compact=True, **kw)
    b = sample_events(jnp.asarray(v), key, use_gen_compact=False, **kw)
    _streams_equal(a, b, "gen_compact wide none")
    assert int(np.asarray(a.count).sum()) > 0


def test_gen_compact_wide_slope_counts_exact():
    """W > 128 with 'slope': the multi-pool slot order permutes, so the
    RNG assigns different u draws to the same voxels — distributionally
    identical, bitwise different. The exact invariants: identical
    per-frame totals and drops, and identical per-voxel event COUNTS
    (which voxel emits how many events is order-independent when no
    capacity knob binds)."""
    import jax
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.ldati import sample_events

    v = _grid(7, f=2, h=8, w=300, density=0.05, scale=2.0)
    key = jax.random.key(4)
    kw = dict(additional_events_strategy="slope", capacity=1 << 15,
              cap_bin=1 << 11, multi_cap=2048, sort_cap=1 << 15)
    a = sample_events(jnp.asarray(v), key, use_gen_compact=True, **kw)
    b = sample_events(jnp.asarray(v), key, use_gen_compact=False, **kw)
    np.testing.assert_array_equal(np.asarray(a.count), np.asarray(b.count))
    np.testing.assert_array_equal(np.asarray(a.dropped),
                                  np.asarray(b.dropped))
    for fi in range(v.shape[0]):
        n = int(np.asarray(a.count)[fi])
        va = np.stack([np.asarray(a.x)[fi, :n], np.asarray(a.y)[fi, :n],
                       np.asarray(a.p)[fi, :n]], 1)
        vb = np.stack([np.asarray(b.x)[fi, :n], np.asarray(b.y)[fi, :n],
                       np.asarray(b.p)[fi, :n]], 1)
        ua, ca = np.unique(va, axis=0, return_counts=True)
        ub, cb_ = np.unique(vb, axis=0, return_counts=True)
        np.testing.assert_array_equal(ua, ub, err_msg=f"frame {fi} voxels")
        np.testing.assert_array_equal(ca, cb_,
                                      err_msg=f"frame {fi} per-voxel counts")
        # timestamps stay inside the frame window either way (their
        # VALUES permute with the pool-slot u assignment by design;
        # distributional agreement is covered by the KS tests in
        # tests/test_ldati.py)
        ta = np.asarray(a.t_us)[fi, :n]
        assert ta.min() >= 0 and len(ta) == n


def test_gen_compact_kept_totals_match_unfused():
    """gen_compact's per-row kept/total equal compact_rows' at W <= 128
    (identical order => identical chunk drops), and its emit/drop frame
    sums equal gen_pack's at any width."""
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.compact_pallas import compact_rows
    from v2ce_toolbox_tpu.ops.gen_pallas import gen_compact, gen_pack

    for w in (24, 300):
        v = _grid(8, f=2, h=8, w=w, density=0.4, scale=8.0)
        f, p, c, h, _ = v.shape
        seg = p * h * w
        seg_bits = int(np.ceil(np.log2(seg)))
        keys, kx, emit_ref, drop_ref = gen_pack(
            jnp.asarray(v), fps=30, t0=0.0, strategy="slope", mepv=8,
            vox_bits=seg_bits)
        ck, (ckx,), kept_ref, tot_ref = compact_rows(
            keys.reshape(f * (c - 1), seg),
            [kx.reshape(f * (c - 1), seg)],
            cap=1 << 10, chunk=16384, algo="place")
        rk, rkx, kept, tot, emit, drop = gen_compact(
            jnp.asarray(v), fps=30, t0=0.0, strategy="slope", mepv=8,
            vox_bits=seg_bits, cap_bin=1 << 10)
        np.testing.assert_array_equal(np.asarray(emit), np.asarray(emit_ref))
        np.testing.assert_array_equal(np.asarray(drop), np.asarray(drop_ref))
        np.testing.assert_array_equal(np.asarray(tot), np.asarray(tot_ref))
        if w <= 128:
            np.testing.assert_array_equal(np.asarray(kept),
                                          np.asarray(kept_ref))
            np.testing.assert_array_equal(np.asarray(rk), np.asarray(ck))
            np.testing.assert_array_equal(np.asarray(rkx), np.asarray(ckx))
