#!/usr/bin/env python
"""Round-2 perf probes on the real TPU chip: isolate stage-1 conv layout
options and stage-2 sampler primitive costs so optimization decisions are
measured, not guessed (PERF.md records the conclusions).

Each probe is one jit with an internal data-dependent `lax.fori_loop` chain
(the only reliable timing through the axon tunnel, see bench.py).

Usage: python tools/perf_probe.py [probe ...]
Probes: model, model_pad, model_bf16, conv_iso, sampler, sort, gather
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def timed_loop(fn, args, n_iters=20, perturb=None):
    """Run fn(args) n_iters times chained inside one jit; return seconds per
    iteration. fn must return a scalar-reducible pytree."""
    if perturb is None:
        def perturb(args, acc):
            return jax.tree.map(
                lambda a: (a + acc * 1e-12).astype(a.dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, args)

    @jax.jit
    def loop(args):
        def body(i, acc):
            out = fn(perturb(args, acc))
            leaves = [jnp.sum(x).astype(jnp.float32)
                      for x in jax.tree.leaves(out)]
            return acc + sum(leaves) * 1e-20
        return lax.fori_loop(0, n_iters, body, jnp.zeros((), jnp.float32))

    _ = float(np.asarray(loop(args)))          # compile + warm
    t0 = time.time()
    r = float(np.asarray(loop(args)))
    dt = (time.time() - t0) / n_iters
    assert np.isfinite(r)
    return dt


def probe_model(compute_dtype=jnp.float32, pad_to=None, label="model",
                **cfg_kw):
    from v2ce_toolbox_tpu.config import ModelConfig
    from v2ce_toolbox_tpu.models import V2ce3d

    h, w = 260, 346
    model = V2ce3d(config=ModelConfig(compute_dtype=compute_dtype,
                                      **cfg_kw))
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(1, 16, h, w, 2).astype(np.float32))
    variables = model.init(jax.random.key(0), x[:, :3], train=False)

    if pad_to is not None:
        ph, pw = pad_to

        def fn(x):
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, ph - h), (0, pw - w), (0, 0)))
            y = model.apply(variables, xp, train=False)
            return y[:, :, :h, :w]
    else:
        def fn(x):
            return model.apply(variables, x, train=False)

    dt = timed_loop(fn, x, n_iters=10)
    print(f"{label}: {dt*1e3:.2f} ms/window ({16/dt:.1f} fps)")


def probe_conv_iso():
    """Isolated decoder-shaped conv3d: XLA conv vs 27-term shifted-matmul
    (einsum) formulation, f32 and bf16."""
    shapes = [
        ("dec0_conv1", (1, 16, 33, 44, 768), 256),
        ("dec2_conv1", (1, 16, 130, 173, 192), 64),
        ("enc1_conv2", (1, 16, 65, 87, 128), 128),
    ]
    for name, xshape, cout in shapes:
        cin = xshape[-1]
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(*xshape).astype(np.float32))
        k = jnp.asarray(rng.rand(3, 3, 3, cin, cout).astype(np.float32) * 0.01)

        def conv_fn(dtype):
            def fn(args):
                xx, kk = args
                return lax.conv_general_dilated(
                    xx.astype(dtype), kk.astype(dtype),
                    window_strides=(1, 1, 1),
                    padding=((1, 1),) * 3,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    preferred_element_type=jnp.float32)
            return fn

        def shifted_matmul(dtype):
            def fn(args):
                xx, kk = args
                xx = xx.astype(dtype)
                kk = kk.astype(dtype)
                n, l, hh, ww, _ = xx.shape
                xp = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
                out = jnp.zeros((n, l, hh, ww, cout), jnp.float32)
                for dl in range(3):
                    for dh in range(3):
                        for dw in range(3):
                            sl = xp[:, dl:dl + l, dh:dh + hh, dw:dw + ww]
                            out = out + jnp.einsum(
                                "nlhwc,co->nlhwo", sl, kk[dl, dh, dw],
                                preferred_element_type=jnp.float32)
                return out
            return fn

        flops = 2 * np.prod(xshape[:4]) * cin * cout * 27
        for label, fn in [("conv_f32", conv_fn(jnp.float32)),
                          ("conv_bf16", conv_fn(jnp.bfloat16)),
                          ("mm_f32", shifted_matmul(jnp.float32)),
                          ("mm_bf16", shifted_matmul(jnp.bfloat16))]:
            try:
                dt = timed_loop(fn, (x, k), n_iters=10)
                print(f"{name} {label}: {dt*1e3:.2f} ms  "
                      f"{flops/dt/1e12:.1f} TF/s")
            except Exception as e:  # noqa: BLE001
                print(f"{name} {label}: FAILED {type(e).__name__}: {e}")


def probe_sampler():
    from v2ce_toolbox_tpu.config import SamplerConfig
    from v2ce_toolbox_tpu.ops.ldati import sample_events

    scfg = SamplerConfig()
    rng = np.random.RandomState(0)
    v = jnp.asarray((rng.rand(16, 2, 10, 260, 346) < 0.1).astype(np.float32)
                    * rng.rand(16, 2, 10, 260, 346).astype(np.float32) * 4)

    def fn_full(args):
        vv, = args
        s = sample_events(
            vv, jax.random.key(0), fps=30,
            additional_events_strategy=scfg.additional_events_strategy,
            max_events_per_voxel=scfg.max_events_per_voxel,
            capacity=scfg.event_capacity)
        # consume EVERY output so XLA cannot dead-code-eliminate the sort
        return (s.count, jnp.sum(s.t_us % 97), jnp.sum(s.x.astype(jnp.int32)),
                jnp.sum(s.y.astype(jnp.int32)))

    def fn_count(args):
        vv, = args
        s = sample_events(
            vv, jax.random.key(0), fps=30,
            additional_events_strategy=scfg.additional_events_strategy,
            max_events_per_voxel=scfg.max_events_per_voxel,
            capacity=scfg.event_capacity)
        return s.count

    dt = timed_loop(fn_full, (v,), n_iters=10)
    print(f"sampler 16 frames (full stream): {dt*1e3:.2f} ms ({16/dt:.1f} fps)",
          flush=True)
    dt = timed_loop(fn_count, (v,), n_iters=10)
    print(f"sampler 16 frames (count only - sort DCE'd): {dt*1e3:.2f} ms",
          flush=True)


def probe_sort():
    """Primitive costs at sampler scale: kv sort, per-bin batched row sort,
    top_k, gathers — (16, n) shapes like the per-frame vmapped sampler."""
    rng = np.random.RandomState(0)
    for n in (9 * (1 << 14), 9 * (1 << 15), 9 * (1 << 17), 9 * 229376):
        keys = jnp.asarray(rng.randint(0, 1 << 30, (16, n), np.int32))
        vals = jnp.asarray(rng.randint(0, 1 << 20, (16, n), np.int32))

        def kv_sort(args):
            kk, vv = args
            return lax.sort((kk, vv), dimension=1, num_keys=1)[0]

        def rows9(args):
            kk, _ = args
            return lax.sort(kk.reshape(16 * 9, n // 9), dimension=1)

        def rows9_kv(args):
            kk, vv = args
            return lax.sort((kk.reshape(16 * 9, n // 9),
                             vv.reshape(16 * 9, n // 9)),
                            dimension=1, num_keys=1)[0]

        def topk_blocks(args):
            kk, _ = args
            return lax.top_k(kk.reshape(16, n // 16, 16).max(axis=2),
                             1 << 12)[0]

        def gather64(args):
            kk, vv = args
            idx = jnp.abs(vv[:, :1 << 16]) % n
            return jnp.take_along_axis(kk, idx, axis=1)

        def gather512(args):
            kk, vv = args
            idx = jnp.abs(vv[:, :1 << 19]) % n
            return jnp.take_along_axis(kk, idx, axis=1)

        for label, fn in [("kv_sort", kv_sort), ("rows9_sort", rows9),
                          ("rows9_kv", rows9_kv),
                          ("topk4k_of_blockmax", topk_blocks),
                          ("gather_64k", gather64),
                          ("gather_512k", gather512)]:
            def perturb(args, acc):
                kk, vv = args
                return (kk + (acc * 1e-12).astype(jnp.int32), vv)
            try:
                dt = timed_loop(fn, (keys, vals), n_iters=10, perturb=perturb)
                print(f"n={n/1e6:.2f}M x16 {label}: {dt*1e3:.2f} ms  "
                      f"({n*16/dt/1e9:.2f} Gelem/s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"n={n/1e6:.2f}M x16 {label}: FAILED "
                      f"{type(e).__name__}", flush=True)


PROBES = {
    "model": lambda: probe_model(),
    "model_pad": lambda: probe_model(pad_to=(264, 384), label="model_pad384"),
    "model_bf16": lambda: probe_model(jnp.bfloat16, label="model_bf16"),
    "model_bf16_pad": lambda: probe_model(jnp.bfloat16, pad_to=(264, 384),
                                          label="model_bf16_pad384"),
    "conv_iso": probe_conv_iso,
    "sampler": probe_sampler,
    "sort": probe_sort,
}




def probe_pallas_conv():
    """conv3d_3x3x3 (Pallas implicit GEMM) vs XLA conv on the model's
    layer shapes."""
    from v2ce_toolbox_tpu.ops.conv3d_pallas import conv3d_3x3x3

    shapes = [
        ("res_512", (1, 16, 17, 22, 512), 512),
        ("dec0_conv1", (1, 16, 33, 44, 768), 256),
        ("dec1_conv1", (1, 16, 65, 87, 384), 128),
        ("dec2_conv1", (1, 16, 130, 173, 192), 64),
        ("dec3_conv1", (1, 16, 260, 346, 96), 32),
        ("enc1_conv2", (1, 16, 65, 87, 128), 128),
        ("dec3_conv2", (1, 16, 260, 346, 32), 32),
    ]
    for name, xshape, cout in shapes:
        cin = xshape[-1]
        rng = np.random.RandomState(0)
        xf = rng.rand(*xshape).astype(np.float32)
        kf = rng.rand(3, 3, 3, cin, cout).astype(np.float32) * 0.01
        flops = 2 * np.prod(xshape[:4]) * cin * cout * 27

        for dt, label in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            x = jnp.asarray(xf).astype(dt)
            k = jnp.asarray(kf).astype(dt)

            def pallas_fn(args):
                return conv3d_3x3x3(*args)

            def xla_fn(args):
                xx, kk = args
                return lax.conv_general_dilated(
                    xx, kk, (1, 1, 1), ((1, 1),) * 3,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    preferred_element_type=jnp.float32)

            try:
                # correctness spot check on device
                diff = float(jnp.max(jnp.abs(
                    pallas_fn((x, k)) - xla_fn((x, k)))))
                scale = float(jnp.max(jnp.abs(xla_fn((x, k))))) + 1e-9
                dt_p = timed_loop(pallas_fn, (x, k), n_iters=10)
                dt_x = timed_loop(xla_fn, (x, k), n_iters=10)
                print(f"{name} {label}: pallas {dt_p*1e3:.2f} ms "
                      f"({flops/dt_p/1e12:.1f} TF/s) vs xla {dt_x*1e3:.2f} ms"
                      f" ({flops/dt_x/1e12:.1f} TF/s); rel_err "
                      f"{diff/scale:.2e}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name} {label}: FAILED {type(e).__name__}: {e}",
                      flush=True)


PROBES["pallas_conv"] = probe_pallas_conv
PROBES["model_pallas_bf16"] = lambda: probe_model(
    jnp.bfloat16, label="model_pallas_bf16", conv_impl="pallas")
PROBES["model_pallas"] = lambda: probe_model(
    label="model_pallas_f32", conv_impl="pallas")
PROBES["model_subpixel"] = lambda: probe_model(
    label="model_subpixel", subpixel_decoder=True)




def probe_compact():
    """Roll-based Pallas compactor at sampler scale vs the sort it
    replaces: 144 rows (16 frames x 9 bins) x 180k candidate slots."""
    from v2ce_toolbox_tpu.ops.compact_pallas import INVALID, compact_rows

    rng = np.random.RandomState(0)
    r, n = 144, 2048 * 89       # ~180k slots per bin-row
    for density in (0.1, 0.3):
        keys = np.where(rng.rand(r, n) < density,
                        rng.randint(0, 1 << 30, (r, n)),
                        INVALID).astype(np.int32)
        keys_j = jnp.asarray(keys)

        # on-device correctness spot check (2 rows)
        out, _, kept, total = compact_rows(keys_j, cap=1 << 16, chunk=2048)
        out_h, kept_h = np.asarray(out[:2]), np.asarray(kept[:2])
        for i in range(2):
            valid = keys[i][keys[i] != INVALID][:int(kept_h[i])]
            assert (out_h[i][:len(valid)] == valid).all(), f"row {i} mismatch"

        def perturb(args, acc):
            kk, = args
            return (kk + (acc * 1e-12).astype(jnp.int32),)

        for ch in (8192, 16384):
            def fn(args, ch=ch):
                kk, = args
                o, _, k, t = compact_rows(kk, cap=1 << 16, chunk=ch)
                return (o[:, ::127].astype(jnp.int64).sum(), k.sum(),
                        t.sum())

            try:
                dt = timed_loop(fn, (keys_j,), n_iters=10, perturb=perturb)
                print(f"compact d={density} chunk={ch}: {dt*1e3:.2f} ms "
                      f"({r*n/dt/1e9:.2f} Gelem/s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"compact d={density} chunk={ch}: FAILED "
                      f"{type(e).__name__}", flush=True)


PROBES["compact"] = probe_compact


def probe_compact_algo():
    """window (2-chunk butterfly) vs place (chunk butterfly + rotate into
    accumulator) compactor at the sampler's chain-compaction shape, with
    the slope payload riding along."""
    from v2ce_toolbox_tpu.ops.compact_pallas import INVALID, compact_rows

    rng = np.random.RandomState(0)
    r, n = 144, 2048 * 89
    keys = np.where(rng.rand(r, n) < 0.1,
                    rng.randint(0, 1 << 30, (r, n)), INVALID).astype(np.int32)
    pays = np.where(keys != INVALID,
                    rng.randint(1, 1 << 20, (r, n)), 0).astype(np.int32)
    keys_j, pays_j = jnp.asarray(keys), jnp.asarray(pays)

    def perturb(args, acc):
        kk, pp = args
        return (kk + (acc * 1e-12).astype(jnp.int32), pp)

    for algo in ("window", "place"):
        for ch in (8192, 16384):
            def fn(args, ch=ch, algo=algo):
                kk, pp = args
                o, (op,), k, t = compact_rows(kk, [pp], cap=1 << 14,
                                              chunk=ch, algo=algo)
                return (o[:, ::127].astype(jnp.int32).sum()
                        + (op[:, ::127] % 31).sum(), k.sum(), t.sum())

            try:
                dt = timed_loop(fn, (keys_j, pays_j), n_iters=10,
                                perturb=perturb)
                print(f"compact[{algo}] chunk={ch} +payload: {dt*1e3:.2f} ms "
                      f"({r*n/dt/1e9:.2f} Gelem/s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"compact[{algo}] chunk={ch}: FAILED "
                      f"{type(e).__name__}: {str(e)[:150]}", flush=True)


PROBES["compact_algo"] = probe_compact_algo


def probe_compact_chunk_sweep():
    """Chunk sweep for the place compactor at the sampler's chain shape
    (144 x 179,920, 1 payload). Measured round 3 at 15% density: 16384 is
    the knee (9.19 / 9.44 / 9.34 ms at 16k/32k/64k) — the kernel is
    butterfly-compute-bound, so larger chunks only add stages.

    Density is 8% (~14.4k valid/row) so every config keeps ALL valid
    elements: compact_rows rounds cap up to a chunk multiple, so at 15%
    density the chunk=32768/65536 runs got 32k/64k effective caps and
    kept ~27k valid while chunk=16384 truncated at 16384 — the runs did
    different amounts of work (round-3 advisor finding). The effective
    cap is printed per config so any future sweep stays auditable."""
    from v2ce_toolbox_tpu.ops.compact_pallas import INVALID, compact_rows

    rng = np.random.RandomState(0)
    f, cb, seg = 16, 9, 2 * 260 * 346
    keys0 = np.where(rng.rand(f * cb, seg) < 0.08,
                     rng.randint(0, 1 << 30, (f * cb, seg)),
                     INVALID).astype(np.int32)
    kx = rng.randint(0, 1 << 30, (f * cb, seg)).astype(np.int32)
    n_valid = int((keys0 != INVALID).sum(axis=1).max())
    cap = 1 << 14
    assert n_valid <= cap, (n_valid, cap)

    def perturb(args, acc):
        return tuple(a + (acc * 1e-12).astype(jnp.int32) for a in args)

    for chunk in (16384, 32768, 65536):
        def chain(args, ch=chunk):
            kk, px = args
            o, (op,), kc, t = compact_rows(kk, [px], cap=cap, chunk=ch,
                                           algo="place")
            return o[:, ::255].astype(jnp.int32).sum(), kc.sum()

        cap_eff = -(-cap // chunk) * chunk
        dt = timed_loop(chain, (jnp.asarray(keys0), jnp.asarray(kx)),
                        n_iters=10, perturb=perturb)
        print(f"place chunk={chunk} (cap_eff={cap_eff}, max "
              f"valid/row={n_valid}): {dt*1e3:.2f} ms "
              f"({f*cb*seg/dt/1e9:.2f} Gelem/s)", flush=True)


PROBES["compact_chunk_sweep"] = probe_compact_chunk_sweep




def probe_sampler_phases():
    """Decompose the v3 sampler's remaining cost: generation (relocate +
    slope + packing), chain compaction, the per-bin sort, and the frame
    merge, each timed as an isolated jit."""
    from v2ce_toolbox_tpu.ops.compact_pallas import INVALID, compact_rows
    from v2ce_toolbox_tpu.ops.ldati import (
        frame_order_voxels, relocate_counts, slope_params)

    rng = np.random.RandomState(0)
    f, p, c, h, w = 16, 2, 10, 260, 346
    cb, seg = c - 1, p * h * w
    v = jnp.asarray((rng.rand(f, p, c, h, w) < 0.1).astype(np.float32)
                    * rng.rand(f, p, c, h, w).astype(np.float32) * 4)

    def gen(args):
        # pre_ordered entry layout (ldati.sample_events): ONE transpose of
        # the input grid, downstream frame_order is a reshape
        vv, = args
        y = jnp.swapaxes(jnp.flip(vv, 1), 1, 2).reshape(f, c, p * h, w)
        counts, tendency = relocate_counts(y)
        k, b = slope_params(counts.astype(jnp.float32), 30)
        rel = (tendency * 3703).astype(jnp.int32)
        emit = jnp.minimum(counts, 32)
        rel_f = rel.reshape(f, cb, seg)
        emit_f = emit.reshape(f, cb, seg)
        vox = lax.broadcasted_iota(jnp.int32, (f, cb, seg), 2)
        keys = jnp.where(emit_f > 0, (rel_f << 18) | vox, INVALID)
        return keys.sum(), k.sum()

    dt = timed_loop(gen, (v,), n_iters=10)
    print(f"phase gen(pre-ordered relocate+slope+pack): {dt*1e3:.2f} ms",
          flush=True)

    keys0 = np.where(rng.rand(f * cb, seg) < 0.15,
                     rng.randint(0, 1 << 30, (f * cb, seg)),
                     INVALID).astype(np.int32)
    kx = rng.randint(0, 1 << 30, (f * cb, seg)).astype(np.int32)

    def perturb(args, acc):
        return tuple(a + (acc * 1e-12).astype(jnp.int32) if a.dtype == jnp.int32
                     else a for a in args)

    def chain(args):
        kk, px = args
        o, (op,), kc, t = compact_rows(kk, [px], cap=1 << 14, chunk=16384,
                                       algo="place")
        return o[:, ::255].astype(jnp.int64).sum(), kc.sum()

    dt = timed_loop(chain, (jnp.asarray(keys0), jnp.asarray(kx)),
                    n_iters=10, perturb=perturb)
    print(f"phase chain compaction (place, 1 payload): {dt*1e3:.2f} ms",
          flush=True)

    # post-sort_cap width: cap_bin(16k) + tiers pre-compacted to 16k
    sort_in = jnp.asarray(rng.randint(0, 1 << 30, (f * cb, 16384), np.int32))

    def srt(args):
        kk, = args
        return lax.sort(kk, dimension=1)

    dt = timed_loop(srt, (sort_in,), n_iters=10, perturb=perturb)
    print(f"phase per-bin sort (144x16k post-sort_cap): {dt*1e3:.2f} ms",
          flush=True)

    from v2ce_toolbox_tpu.ops.compact_pallas import merge_sorted_rows
    mrow = np.sort(np.where(rng.rand(f * cb, 16384) < 0.3,
                            rng.randint(0, 1 << 30, (f * cb, 16384)),
                            INVALID).astype(np.int32), axis=1)
    merge_px = rng.randint(0, 1 << 20, (f * cb, 16384)).astype(np.int32)

    def merge(args):
        kk, px = args
        o, (op,), kc, t = merge_sorted_rows(kk, [px], nb=cb, cap=1 << 19)
        return o[:, ::255].astype(jnp.int64).sum(), kc.sum()

    dt = timed_loop(merge, (jnp.asarray(mrow), jnp.asarray(merge_px)),
                    n_iters=10, perturb=perturb)
    print(f"phase frame merge (append, 144x16k -> 16 frames): "
          f"{dt*1e3:.2f} ms", flush=True)


PROBES["sampler_phases"] = probe_sampler_phases


def probe_gen():
    """A/B the sampler generation phase: the unfused XLA chain
    (relocate + slope + pack, materializing counts/tendency/k grids)
    vs the fused Pallas kernel (ops/gen_pallas.gen_pack)."""
    from v2ce_toolbox_tpu.ops.compact_pallas import INVALID
    from v2ce_toolbox_tpu.ops.gen_pallas import gen_pack
    from v2ce_toolbox_tpu.ops.ldati import relocate_counts, slope_params

    rng = np.random.RandomState(0)
    f, p, c, h, w = 16, 2, 10, 260, 346
    cb, seg = c - 1, p * h * w
    vox_bits = int(np.ceil(np.log2(seg)))
    mepv = 16
    v = jnp.asarray((rng.rand(f, p, c, h, w) < 0.1).astype(np.float32)
                    * rng.rand(f, p, c, h, w).astype(np.float32) * 4)

    def xla_gen(args):
        vv, = args
        y = jnp.swapaxes(jnp.flip(vv, 1), 1, 2).reshape(f, c, p * h, w)
        counts, tendency = relocate_counts(y)
        k, b = slope_params(counts.astype(jnp.float32), 30)
        is_chain = counts == 1
        emit = jnp.maximum(
            jnp.where(is_chain, 1, jnp.minimum(counts, mepv)), 0)
        ts_us = ((tendency / 30.0 / float(cb)) * 1e6).astype(jnp.int32)
        rel = jnp.where(is_chain, jnp.clip(ts_us, 0, 1 << 12), 0)
        vox = lax.broadcasted_iota(jnp.int32, counts.shape, 0) * 0 + 1
        keys = jnp.where(emit > 0, (rel << vox_bits) | vox, INVALID)
        extra = jnp.minimum(jnp.minimum(
            jnp.maximum(counts - 1, 0), mepv - 1), 255)
        kx = (lax.bitcast_convert_type(k, jnp.int32) & ~jnp.int32(0xFF)
              ) | extra
        return (keys[:, ::7].astype(jnp.int64).sum()
                + kx[:, ::7].astype(jnp.int64).sum(),
                emit.sum(dtype=jnp.int32))

    def fused(args):
        vv, = args
        keys, kx, emit, drop = gen_pack(
            vv, fps=30, t0=0.0, strategy="slope", mepv=mepv,
            vox_bits=vox_bits)
        return (keys[:, ::7].astype(jnp.int64).sum()
                + kx[:, ::7].astype(jnp.int64).sum(),
                emit.sum() + drop.sum())

    for name, fn in [("xla relocate+slope+pack", xla_gen),
                     ("fused gen_pack kernel", fused)]:
        dt = timed_loop(fn, (v,), n_iters=10)
        print(f"gen [{name}]: {dt*1e3:.2f} ms", flush=True)


PROBES["gen"] = probe_gen


def probe_flatten():
    """Decompose the driver's device stream-flatten (the ~10 ms gap
    between the two-jit window probe and bench.py's e2e number): the
    main frames x capacity pass (place compaction vs the butterfly-free
    append kernel), the side-list compaction (window-2048 vs place-8192),
    and the full _flatten_chunk_stream."""
    from v2ce_toolbox_tpu.events import EventStream
    from v2ce_toolbox_tpu.ops.compact_pallas import (
        INVALID, append_rows, compact_rows)
    from v2ce_toolbox_tpu.pipeline.driver import _flatten_chunk_stream

    rng = np.random.RandomState(0)
    frames, cap = 16, 1 << 19
    per_frame = 74_000                      # synthetic-dense README load
    counts = np.full(frames, per_frame, np.int32)
    t = np.sort(rng.randint(0, 33_333, (frames, cap)).astype(np.int32), 1)
    slot = np.arange(cap)[None]
    keys_np = np.where(slot < counts[:, None], t, INVALID).astype(np.int32)
    pay_np = np.where(slot < counts[:, None],
                      rng.randint(0, 346, (frames, cap)), 0
                      ).astype(np.int32)
    keys, pay = jnp.asarray(keys_np), jnp.asarray(pay_np)

    def perturb(args, acc):
        return tuple(a + (acc * 1e-12).astype(jnp.int32)
                     if a.dtype == jnp.int32 else a for a in args)

    def main_place(args):
        kk, px = args
        o, (op,), kc, _ = compact_rows(
            kk.reshape(1, frames * cap), [px.reshape(1, frames * cap)],
            cap=frames * cap, chunk=8192, algo="place")
        return o[:, ::255].astype(jnp.int64).sum(), kc.sum()

    def main_append(args):
        kk, px = args
        o, (op,), kc, _ = append_rows(kk, [px], cap=frames * cap,
                                      chunk=8192)
        return o[:, ::255].astype(jnp.int64).sum(), kc.sum()

    for name, fn in [("place 1x8.4M", main_place),
                     ("append 16x512k", main_append)]:
        dt = timed_loop(fn, (keys, pay), n_iters=10, perturb=perturb)
        print(f"flatten main pass [{name}]: {dt*1e3:.2f} ms", flush=True)

    # side pass at out width: ~1% markers (dense stream, 7 µs gaps rare)
    width = frames * cap
    out_k = jnp.asarray(np.sort(rng.randint(0, 1 << 29, width)
                                ).astype(np.int32))
    is_exc = jnp.asarray(rng.rand(width) < 0.01)
    idx = jnp.arange(width, dtype=jnp.int32)
    side_in = jnp.where(is_exc, idx, INVALID)

    for name, kw in [("window-2048", dict(chunk=2048)),
                     ("place-8192", dict(chunk=8192, algo="place"))]:
        def side(args, kw=kw):
            si, ok = args
            _, (sk,), ns, st = compact_rows(si[None], [ok[None]],
                                            cap=1 << 17, **kw)
            return sk[:, ::255].astype(jnp.int64).sum(), ns.sum()

        dt = timed_loop(side, (side_in, out_k), n_iters=10, perturb=perturb)
        print(f"flatten side pass [{name}]: {dt*1e3:.2f} ms", flush=True)

    # full flatten (current code path)
    zeros8 = jnp.zeros((frames, cap), jnp.int8)
    stream = EventStream(
        t_us=keys, x=pay.astype(jnp.int16), y=zeros8.astype(jnp.int16),
        p=zeros8, count=jnp.asarray(counts),
        dropped=jnp.zeros(frames, jnp.int32))
    offs = jnp.asarray((np.arange(frames) / 30 * 1e6).astype(np.int32))

    def full(args):
        kk, = args
        s = stream._replace(t_us=kk)
        words, kept, side_key, n_side, side_total = _flatten_chunk_stream(
            s, offs, frames)
        return ((words % 97).sum().astype(jnp.int32) + kept
                + (side_key % 83).sum() + n_side + side_total)

    dt = timed_loop(full, (keys,), n_iters=10, perturb=perturb)
    print(f"flatten full (_flatten_chunk_stream): {dt*1e3:.2f} ms",
          flush=True)


PROBES["flatten"] = probe_flatten




def probe_window(barrier=False):
    """bench.py's full window step (model -> sampler) in ONE jit, with and
    without an optimization barrier between the stages."""
    from v2ce_toolbox_tpu.config import ModelConfig, SamplerConfig
    from v2ce_toolbox_tpu.models import V2ce3d
    from v2ce_toolbox_tpu.ops.ldati import sample_events
    from v2ce_toolbox_tpu.pipeline.preprocess import normalize_pairs

    seq_len, h, w = 16, 260, 346
    scfg = SamplerConfig()
    model = V2ce3d(config=ModelConfig())
    rng = np.random.RandomState(0)
    frames0 = jnp.asarray(rng.rand(1, seq_len + 1, h, w).astype(np.float32))
    variables = model.init(jax.random.key(0),
                           frames0[:, :3, :, :, None].repeat(2, -1),
                           train=False)

    def fn(args):
        frames, = args
        units = normalize_pairs(frames)
        voxels = model.apply(variables, units, train=False)
        if barrier:
            voxels = lax.optimization_barrier(voxels)
        v = jnp.transpose(voxels[0], (0, 3, 1, 2)).reshape(
            seq_len, 2, 10, h, w)
        s = sample_events(
            v, jax.random.key(0), fps=30,
            additional_events_strategy=scfg.additional_events_strategy,
            max_events_per_voxel=scfg.max_events_per_voxel,
            capacity=scfg.event_capacity)
        return (s.count.sum() + (s.t_us % 97).sum()
                + s.x.astype(jnp.int32).sum())

    dt = timed_loop(fn, (frames0,), n_iters=10)
    label = "barrier" if barrier else "fused"
    print(f"window step ({label}): {dt*1e3:.2f} ms ({16/dt:.1f} fps)",
          flush=True)


PROBES["window"] = lambda: probe_window(False)
PROBES["window_barrier"] = lambda: probe_window(True)


def probe_window_lb():
    """Fused window jit with a Pallas identity custom call between model
    and sampler (ops/barrier.layout_barrier): custom calls force default
    layouts, firewalling the sampler's channel-major preference from
    propagating back into the model's conv layouts (the fused-jit
    pathology, /tmp/fused_hlo.txt fusion.142)."""
    from v2ce_toolbox_tpu.config import ModelConfig, SamplerConfig
    from v2ce_toolbox_tpu.models import V2ce3d
    from v2ce_toolbox_tpu.ops.barrier import layout_barrier
    from v2ce_toolbox_tpu.ops.ldati import sample_events
    from v2ce_toolbox_tpu.pipeline.preprocess import normalize_pairs

    seq_len, h, w = 16, 260, 346
    scfg = SamplerConfig()
    model = V2ce3d(config=ModelConfig())
    rng = np.random.RandomState(0)
    frames0 = jnp.asarray(rng.rand(1, seq_len + 1, h, w).astype(np.float32))
    variables = model.init(jax.random.key(0),
                           frames0[:, :3, :, :, None].repeat(2, -1),
                           train=False)

    def fn(args):
        frames, = args
        units = normalize_pairs(frames)
        voxels = model.apply(variables, units, train=False)
        voxels = layout_barrier(voxels)
        v = jnp.transpose(voxels[0], (0, 3, 1, 2)).reshape(
            seq_len, 2, 10, h, w)
        s = sample_events(
            v, jax.random.key(0), fps=30,
            additional_events_strategy=scfg.additional_events_strategy,
            max_events_per_voxel=scfg.max_events_per_voxel,
            capacity=scfg.event_capacity)
        return (s.count.sum() + (s.t_us % 97).sum()
                + s.x.astype(jnp.int32).sum())

    dt = timed_loop(fn, (frames0,), n_iters=10)
    print(f"window step (fused, layout barrier): {dt*1e3:.2f} ms "
          f"({16/dt:.1f} fps)", flush=True)


PROBES["window_lb"] = probe_window_lb


def probe_window_cm():
    """Fused window jit with out_layout='cm': the model emits
    channel-major (L,20,H,W) natively (NDCHW pred conv), so the sampler's
    consumption no longer pulls channels-minor T(1,128) layouts back into
    the top-resolution convs (the fused-jit pathology: decoder_3/conv1
    40.9 ms vs ~5 ms, /tmp/fused_hlo.txt fusion.142)."""
    from v2ce_toolbox_tpu.config import ModelConfig, SamplerConfig
    from v2ce_toolbox_tpu.models import V2ce3d
    from v2ce_toolbox_tpu.ops.ldati import sample_events
    from v2ce_toolbox_tpu.pipeline.preprocess import normalize_pairs

    seq_len, h, w = 16, 260, 346
    scfg = SamplerConfig()
    model = V2ce3d(config=ModelConfig(out_layout="cm"))
    rng = np.random.RandomState(0)
    frames0 = jnp.asarray(rng.rand(1, seq_len + 1, h, w).astype(np.float32))
    variables = model.init(jax.random.key(0),
                           frames0[:, :3, :, :, None].repeat(2, -1),
                           train=False)

    def fn(args):
        frames, = args
        units = normalize_pairs(frames)
        voxels = model.apply(variables, units, train=False)  # (1,16,20,H,W)
        v = voxels[0].reshape(seq_len, 2, 10, h, w)
        s = sample_events(
            v, jax.random.key(0), fps=30,
            additional_events_strategy=scfg.additional_events_strategy,
            max_events_per_voxel=scfg.max_events_per_voxel,
            capacity=scfg.event_capacity)
        return (s.count.sum() + (s.t_us % 97).sum()
                + s.x.astype(jnp.int32).sum())

    dt = timed_loop(fn, (frames0,), n_iters=10)
    print(f"window step (fused, cm): {dt*1e3:.2f} ms ({16/dt:.1f} fps)",
          flush=True)


PROBES["window_fused_cm"] = probe_window_cm




def probe_sampler_t(barrier=False):
    """Sampler fed through an in-jit transpose from (16,H,W,20) — the
    layout the model produces — vs the isolated probe's direct input."""
    from v2ce_toolbox_tpu.config import SamplerConfig
    from v2ce_toolbox_tpu.ops.ldati import sample_events

    scfg = SamplerConfig()
    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.rand(16, 260, 346, 20) < 0.1).astype(np.float32)
                    * rng.rand(16, 260, 346, 20).astype(np.float32) * 4)

    def fn(args):
        xx, = args
        v = jnp.transpose(xx, (0, 3, 1, 2)).reshape(16, 2, 10, 260, 346)
        if barrier:
            v = lax.optimization_barrier(v)
        s = sample_events(
            v, jax.random.key(0), fps=30,
            additional_events_strategy=scfg.additional_events_strategy,
            max_events_per_voxel=scfg.max_events_per_voxel,
            capacity=scfg.event_capacity)
        return (s.count.sum() + (s.t_us % 97).sum()
                + s.x.astype(jnp.int32).sum())

    label = "barrier" if barrier else "fused"
    dt = timed_loop(fn, (x,), n_iters=10)
    print(f"sampler via transpose ({label}): {dt*1e3:.2f} ms", flush=True)


PROBES["sampler_t"] = lambda: probe_sampler_t(False)
PROBES["sampler_t_barrier"] = lambda: probe_sampler_t(True)




def probe_window_model_only():
    """bench's window step with the sampler removed — isolates whether the
    model slows down inside the composite graph."""
    from v2ce_toolbox_tpu.config import ModelConfig
    from v2ce_toolbox_tpu.models import V2ce3d
    from v2ce_toolbox_tpu.pipeline.preprocess import normalize_pairs

    seq_len, h, w = 16, 260, 346
    model = V2ce3d(config=ModelConfig())
    rng = np.random.RandomState(0)
    frames0 = jnp.asarray(rng.rand(1, seq_len + 1, h, w).astype(np.float32))
    variables = model.init(jax.random.key(0),
                           frames0[:, :3, :, :, None].repeat(2, -1),
                           train=False)

    def fn(args):
        frames, = args
        units = normalize_pairs(frames)
        voxels = model.apply(variables, units, train=False)
        v = jnp.transpose(voxels[0], (0, 3, 1, 2)).reshape(
            seq_len, 2, 10, h, w)
        return (v.sum(), (v * v).sum())

    dt = timed_loop(fn, (frames0,), n_iters=10)
    print(f"window model-only: {dt*1e3:.2f} ms", flush=True)


PROBES["window_model_only"] = probe_window_model_only




def probe_window_two_jits():
    """Driver-style execution: forward and sampler as separate async
    dispatches chained across 20 windows, one final fetch — the way the
    real pipeline runs (and a valid timing through the tunnel since all
    dispatches queue server-side)."""
    import time as _time

    from v2ce_toolbox_tpu.config import ModelConfig, SamplerConfig
    from v2ce_toolbox_tpu.models import V2ce3d
    from v2ce_toolbox_tpu.ops.ldati import sample_events
    from v2ce_toolbox_tpu.pipeline.preprocess import normalize_pairs

    seq_len, h, w = 16, 260, 346
    scfg = SamplerConfig()
    model = V2ce3d(config=ModelConfig())
    rng = np.random.RandomState(0)
    frames0 = jnp.asarray(rng.rand(1, seq_len + 1, h, w).astype(np.float32))
    variables = model.init(jax.random.key(0),
                           frames0[:, :3, :, :, None].repeat(2, -1),
                           train=False)

    @jax.jit
    def fwd(frames):
        return model.apply(variables, normalize_pairs(frames), train=False)

    @jax.jit
    def sample(voxels, key):
        v = jnp.transpose(voxels[0], (0, 3, 1, 2)).reshape(
            seq_len, 2, 10, h, w)
        s = sample_events(
            v, key, fps=30,
            additional_events_strategy=scfg.additional_events_strategy,
            max_events_per_voxel=scfg.max_events_per_voxel,
            capacity=scfg.event_capacity)
        return (s.count.sum() + (s.t_us % 97).sum()
                + s.x.astype(jnp.int32).sum()).astype(jnp.float32)

    def run(n):
        acc = jnp.zeros((), jnp.float32)
        for i in range(n):
            vox = fwd(frames0 + acc * 1e-12)
            acc = acc + sample(vox, jax.random.key(i)) * 1e-20
        return float(np.asarray(acc))

    _ = run(2)                         # compile + warm both jits
    t0 = _time.time()
    r = run(20)
    dt = (_time.time() - t0) / 20
    assert np.isfinite(r)
    print(f"window two-jits (driver style): {dt*1e3:.2f} ms "
          f"({16/dt:.1f} fps)", flush=True)


PROBES["window_two_jits"] = probe_window_two_jits




def probe_roofline():
    """Device speed-of-light references + every model conv layer in f32 and
    bf16 XLA, to locate the conv3d plateau relative to the hardware peaks
    rather than to other conv formulations."""
    # 1. pure matmul peaks
    for dt_name, dt in [("bf16", jnp.bfloat16), ("f32", jnp.float32)]:
        m = k = n = 4096
        rng = np.random.RandomState(0)
        a = jnp.asarray(rng.rand(m, k).astype(np.float32)).astype(dt)
        b = jnp.asarray(rng.rand(k, n).astype(np.float32)).astype(dt)

        def mm(args):
            aa, bb = args
            return jnp.dot(aa, bb, preferred_element_type=jnp.float32)

        t = timed_loop(mm, (a, b), n_iters=50)
        print(f"matmul_{dt_name} 4096^3: {t*1e3:.3f} ms  "
              f"{2*m*k*n/t/1e12:.1f} TF/s", flush=True)

    # 2. HBM copy bandwidth
    x = jnp.asarray(np.random.RandomState(0).rand(256, 1024, 1024)
                    .astype(np.float32))          # 1 GiB

    def cp(args):
        return args[0] * 1.0000001

    t = timed_loop(cp, (x,), n_iters=20)
    print(f"hbm_rw 1GiB: {t*1e3:.2f} ms  {2*x.size*4/t/1e9:.0f} GB/s",
          flush=True)

    # 3. every 3x3x3 layer of the model (B=1, L=16)
    layers = [
        ("head", 260, 346, 2, 32, 1),
        ("enc1_c1s2", 260, 346, 32, 64, 2),
        ("enc1_c2", 130, 173, 64, 64, 1),
        ("enc2_c1s2", 130, 173, 64, 128, 2),
        ("enc2_c2", 65, 87, 128, 128, 1),
        ("enc3_c1s2", 65, 87, 128, 256, 2),
        ("enc3_c2", 33, 44, 256, 256, 1),
        ("enc4_c1s2", 33, 44, 256, 512, 2),
        ("enc4_c2", 17, 22, 512, 512, 1),
        ("botl_c", 17, 22, 512, 512, 1),
        ("dec0_c1", 33, 44, 768, 256, 1),
        ("dec0_c2", 33, 44, 256, 256, 1),
        ("dec1_c1", 65, 87, 384, 128, 1),
        ("dec1_c2", 65, 87, 128, 128, 1),
        ("dec2_c1", 130, 173, 192, 64, 1),
        ("dec2_c2", 130, 173, 64, 64, 1),
        ("dec3_c1", 260, 346, 96, 32, 1),
        ("dec3_c2", 260, 346, 32, 32, 1),
    ]
    total = {"f32": 0.0, "bf16": 0.0}
    for name, h, w, cin, cout, s in layers:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 16, h, w, cin).astype(np.float32))
        k = jnp.asarray(
            rng.rand(3, 3, 3, cin, cout).astype(np.float32) * 0.01)
        ho, wo = -(-h // s), -(-w // s)
        flops = 2 * 16 * ho * wo * cin * cout * 27

        for dt_name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
            def fn(args):
                xx, kk = args
                return lax.conv_general_dilated(
                    xx.astype(dt), kk.astype(dt),
                    window_strides=(1, s, s),
                    padding=((1, 1),) * 3,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    preferred_element_type=jnp.float32)
            try:
                t = timed_loop(fn, (x, k), n_iters=10)
                total[dt_name] += t
                print(f"{name} {h}x{w} {cin}->{cout}s{s} {dt_name}: "
                      f"{t*1e3:.2f} ms  {flops/t/1e12:.1f} TF/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name} {dt_name}: FAILED {type(e).__name__}")
    print(f"sum of layers: f32 {total['f32']*1e3:.1f} ms, "
          f"bf16 {total['bf16']*1e3:.1f} ms", flush=True)


PROBES["roofline"] = probe_roofline


def probe_batch_scaling():
    """Model forward at window batch B=1/2/4 (the reference README workload
    runs -b 4): per-window amortization of the small-spatial layers."""
    from v2ce_toolbox_tpu.config import ModelConfig
    from v2ce_toolbox_tpu.models import V2ce3d

    h, w = 260, 346
    for dt_name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        model = V2ce3d(config=ModelConfig(compute_dtype=dt))
        x1 = jnp.asarray(np.random.RandomState(0)
                         .rand(1, 16, h, w, 2).astype(np.float32))
        variables = model.init(jax.random.key(0), x1[:, :3], train=False)
        for b in (1, 2, 4):
            x = jnp.broadcast_to(x1, (b, *x1.shape[1:])) + jnp.arange(
                b, dtype=jnp.float32)[:, None, None, None, None] * 1e-6

            def fn(xx):
                return model.apply(variables, xx, train=False)

            try:
                t = timed_loop(fn, x, n_iters=10)
                print(f"model B={b} {dt_name}: {t*1e3:.1f} ms "
                      f"({b*16/t:.1f} fps, {t/b*1e3:.1f} ms/window)",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"model B={b} {dt_name}: FAILED {type(e).__name__}: {e}",
                      flush=True)


PROBES["batch_scaling"] = probe_batch_scaling


def probe_wpack():
    """conv3d_wpack (width-packed (3,3,1) conv) vs native XLA conv3d on
    the model's problem layers, f32 and bf16."""
    from v2ce_toolbox_tpu.ops.wpack import conv3d_wpack

    layers = [
        ("head", 260, 346, 2, 32, (1, 1, 1)),
        ("enc1_c1s2", 260, 346, 32, 64, (1, 2, 2)),
        ("enc1_c2", 130, 173, 64, 64, (1, 1, 1)),
        ("enc2_c1s2", 130, 173, 64, 128, (1, 2, 2)),
        ("enc4_c1s2", 33, 44, 256, 512, (1, 2, 2)),
        ("botl_c", 17, 22, 512, 512, (1, 1, 1)),
        ("dec0_c1", 33, 44, 768, 256, (1, 1, 1)),
        ("dec1_c1", 65, 87, 384, 128, (1, 1, 1)),
        ("dec1_c2", 65, 87, 128, 128, (1, 1, 1)),
        ("dec2_c1", 130, 173, 192, 64, (1, 1, 1)),
        ("dec2_c2", 130, 173, 64, 64, (1, 1, 1)),
        ("dec3_c1", 260, 346, 96, 32, (1, 1, 1)),
        ("dec3_c2", 260, 346, 32, 32, (1, 1, 1)),
    ]
    for name, h, w, cin, cout, strides in layers:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 16, h, w, cin).astype(np.float32))
        k = jnp.asarray(
            rng.rand(3, 3, 3, cin, cout).astype(np.float32) * 0.01)
        ho, wo = -(-h // strides[1]), -(-w // strides[2])
        flops = 2 * 16 * ho * wo * cin * cout * 27
        for dt_name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
            def fn(args):
                xx, kk = args
                return conv3d_wpack(xx, kk, strides, compute_dtype=dt)
            try:
                t = timed_loop(fn, (x, k), n_iters=10)
                print(f"wpack {name} {dt_name}: {t*1e3:.2f} ms  "
                      f"{flops/t/1e12:.1f} TF/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"wpack {name} {dt_name}: FAILED "
                      f"{type(e).__name__}: {e}", flush=True)


PROBES["wpack"] = probe_wpack


def probe_compact_chunk():
    """Roll-compactor rate vs chunk size at sampler grid scale (144 rows x
    180k slots, 1 payload, 15% density): the 8192-chunk rate is grid-step
    bound (PERF.md), so larger chunks should scale until VMEM binds."""
    from v2ce_toolbox_tpu.ops.compact_pallas import INVALID, compact_rows

    rng = np.random.RandomState(0)
    r, n = 144, 180224               # 22 chunks of 8192
    keys0 = np.where(rng.rand(r, n) < 0.15,
                     rng.randint(0, 1 << 30, (r, n)),
                     INVALID).astype(np.int32)
    kx = rng.randint(0, 1 << 30, (r, n)).astype(np.int32)
    kj, xj = jnp.asarray(keys0), jnp.asarray(kx)

    def perturb(args, acc):
        return tuple(a + (acc * 1e-12).astype(jnp.int32) for a in args)

    for chunk in (8192, 16384, 32768, 65536):
        def fn(args):
            kk, px = args
            o, (op,), kc, t = compact_rows(kk, [px], cap=1 << 15,
                                           chunk=chunk)
            return o[:, ::255].astype(jnp.int64).sum(), kc.sum()
        try:
            dt = timed_loop(fn, (kj, xj), n_iters=10, perturb=perturb)
            print(f"compact chunk={chunk}: {dt*1e3:.2f} ms  "
                  f"{r*n/dt/1e9:.2f} Gelem/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"compact chunk={chunk}: FAILED {type(e).__name__}: {e}",
                  flush=True)

    # keys-only (no payload) reference
    for chunk in (8192, 32768):
        def fn2(args):
            kk, _ = args
            o, _, kc, t = compact_rows(kk, cap=1 << 15, chunk=chunk)
            return o[:, ::255].astype(jnp.int64).sum(), kc.sum()
        try:
            dt = timed_loop(fn2, (kj, xj), n_iters=10, perturb=perturb)
            print(f"compact nopay chunk={chunk}: {dt*1e3:.2f} ms  "
                  f"{r*n/dt/1e9:.2f} Gelem/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"compact nopay chunk={chunk}: FAILED "
                  f"{type(e).__name__}: {e}", flush=True)


PROBES["compact_chunk"] = probe_compact_chunk


def probe_conv2d_decomp():
    """conv3d = sum of 3 L-shifted conv2d over (B*L, H, W, C): XLA's 2D
    conv path vs its 3D lowering on the problem layers."""
    layers = [
        ("head", 260, 346, 2, 32, 1),
        ("enc1_c1s2", 260, 346, 32, 64, 2),
        ("enc1_c2", 130, 173, 64, 64, 1),
        ("dec2_c1", 130, 173, 192, 64, 1),
        ("dec2_c2", 130, 173, 64, 64, 1),
        ("dec3_c1", 260, 346, 96, 32, 1),
        ("dec3_c2", 260, 346, 32, 32, 1),
        ("botl_c", 17, 22, 512, 512, 1),
        ("dec0_c1", 33, 44, 768, 256, 1),
    ]
    l = 16
    for name, h, w, cin, cout, s in layers:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, l, h, w, cin).astype(np.float32))
        k = jnp.asarray(
            rng.rand(3, 3, 3, cin, cout).astype(np.float32) * 0.01)
        ho, wo = -(-h // s), -(-w // s)
        flops = 2 * l * ho * wo * cin * cout * 27

        for dt_name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
            def fn(args):
                xx, kk = args
                xx = xx.astype(dt)
                kk = kk.astype(dt)
                b = xx.shape[0]
                x2 = xx.reshape(b * l, h, w, cin)
                outs = []
                for dl in range(3):
                    o = lax.conv_general_dilated(
                        x2, kk[dl], window_strides=(s, s),
                        padding=((1, 1), (1, 1)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.float32)
                    outs.append(o.reshape(b, l, ho, wo, cout))
                # shift along L: out[l] += conv_dl(x[l + dl - 1])
                out = outs[1]
                out = out.at[:, 1:].add(outs[0][:, :-1])
                out = out.at[:, :-1].add(outs[2][:, 1:])
                return out
            try:
                t = timed_loop(fn, (x, k), n_iters=10)
                print(f"c2d {name} {dt_name}: {t*1e3:.2f} ms  "
                      f"{flops/t/1e12:.1f} TF/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"c2d {name} {dt_name}: FAILED "
                      f"{type(e).__name__}: {e}", flush=True)


PROBES["conv2d_decomp"] = probe_conv2d_decomp


def probe_d2():
    """Depth-tap N-fold (_apply_conv 'd2'): ONE 2D conv with kd folded
    into the output channels (N = 3*cout MXU lanes) + an L shift-add —
    vs the native conv3d, on the small-cout layers the knockout probe
    blamed (lane-fill-bound at cout=32/64)."""
    from v2ce_toolbox_tpu.models.layers import _apply_conv

    layers = [
        ("dec3_c2", 260, 346, 32, 32),
        ("dec3_c1", 260, 346, 96, 32),
        ("enc1_c2", 130, 173, 64, 64),
        ("dec2_c1", 130, 173, 192, 64),
        ("dec2_c2", 130, 173, 64, 64),
        ("enc2_c2", 65, 87, 128, 128),
        ("dec1_c1", 65, 87, 384, 128),
        ("botl_c", 17, 22, 512, 512),
    ]
    same3 = ((1, 1), (1, 1), (1, 1))
    for name, h, w, cin, cout in layers:
        rng = np.random.RandomState(0)
        flops = 2 * 16 * h * w * cin * cout * 27
        x = jnp.asarray(rng.rand(1, 16, h, w, cin).astype(np.float32))
        k = jnp.asarray(rng.rand(3, 3, 3, cin, cout)
                        .astype(np.float32) * 0.01)
        for impl in ("xla", "d2"):
            def fn(args, _impl=impl):
                xx, kk = args
                return _apply_conv(xx, kk, (1, 1, 1), same3,
                                   jnp.bfloat16, _impl)
            t = timed_loop(fn, (x, k), n_iters=10)
            print(f"d2 {name} {impl} bf16: {t*1e3:.2f} ms  "
                  f"{flops/t/1e12:.1f} TF/s", flush=True)


PROBES["d2"] = probe_d2


def probe_model_d2():
    """Full model with conv_impl='d2' (driver-style channel-major
    output), vs base."""
    from v2ce_toolbox_tpu.config import ModelConfig
    from v2ce_toolbox_tpu.models import V2ce3d

    h, w = 260, 346
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(1, 16, h, w, 2).astype(np.float32))
    for name, kw in [("base", {}), ("d2", {"conv_impl": "d2"}),
                     ("d2s", {"conv_impl": "d2s"})]:
        model = V2ce3d(config=ModelConfig(compute_dtype=jnp.bfloat16, **kw))
        variables = model.init(jax.random.key(0), x[:, :3], train=False)

        def fn(xx, _model=model, _v=variables):
            y = _model.apply(_v, xx, train=False)
            return jnp.transpose(y, (0, 1, 4, 2, 3))

        dt = timed_loop(fn, x, n_iters=10)
        print(f"model_d2[{name}]: {dt*1e3:.2f} ms/window "
              f"({16/dt:.1f} fps)", flush=True)


PROBES["model_d2"] = probe_model_d2


def probe_quad():
    """conv3d_quad (quad-packed Pallas implicit GEMM) on the model's
    stride-1 3x3x3 layers, vs the XLA native numbers in the roofline
    probe."""
    from v2ce_toolbox_tpu.ops.conv3d_quad import conv3d_quad

    layers = [
        ("enc1_c2", 130, 173, 64, 64),
        ("enc2_c2", 65, 87, 128, 128),
        ("enc3_c2", 33, 44, 256, 256),
        ("enc4_c2", 17, 22, 512, 512),
        ("botl_c", 17, 22, 512, 512),
        ("dec0_c1", 33, 44, 768, 256),
        ("dec0_c2", 33, 44, 256, 256),
        ("dec1_c1", 65, 87, 384, 128),
        ("dec1_c2", 65, 87, 128, 128),
        ("dec2_c1", 130, 173, 192, 64),
        ("dec2_c2", 130, 173, 64, 64),
        ("dec3_c1", 260, 346, 96, 32),
        ("dec3_c2", 260, 346, 32, 32),
    ]
    for name, h, w, cin, cout in layers:
        rng = np.random.RandomState(0)
        flops = 2 * 16 * h * w * cin * cout * 27
        for dt_name, dt in [("bf16", jnp.bfloat16), ("f32", jnp.float32)]:
            x = jnp.asarray(rng.rand(1, 16, h, w, cin)
                            .astype(np.float32)).astype(dt)
            k = jnp.asarray(rng.rand(3, 3, 3, cin, cout)
                            .astype(np.float32) * 0.01).astype(dt)

            def fn(args):
                xx, kk = args
                return conv3d_quad(xx, kk)
            try:
                t = timed_loop(fn, (x, k), n_iters=10)
                print(f"quad {name} {dt_name}: {t*1e3:.2f} ms  "
                      f"{flops/t/1e12:.1f} TF/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"quad {name} {dt_name}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


PROBES["quad"] = probe_quad


def probe_quad_s2():
    """conv3d_quad_s122 (phase-folded strided quad conv) on the encoder
    downsampling layers."""
    from v2ce_toolbox_tpu.ops.conv3d_quad import conv3d_quad_s122

    layers = [
        ("enc1_c1s2", 260, 346, 32, 64),
        ("enc2_c1s2", 130, 173, 64, 128),
        ("enc3_c1s2", 65, 87, 128, 256),
        ("enc4_c1s2", 33, 44, 256, 512),
    ]
    for name, h, w, cin, cout in layers:
        rng = np.random.RandomState(0)
        ho, wo = -(-h // 2), -(-w // 2)
        flops = 2 * 16 * ho * wo * cin * cout * 27
        for dt_name, dt in [("bf16", jnp.bfloat16)]:
            x = jnp.asarray(rng.rand(1, 16, h, w, cin)
                            .astype(np.float32)).astype(dt)
            k = jnp.asarray(rng.rand(3, 3, 3, cin, cout)
                            .astype(np.float32) * 0.01).astype(dt)

            def fn(args):
                xx, kk = args
                return conv3d_quad_s122(xx, kk)
            try:
                t = timed_loop(fn, (x, k), n_iters=10)
                print(f"quad_s2 {name} {dt_name}: {t*1e3:.2f} ms  "
                      f"{flops/t/1e12:.1f} TF/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"quad_s2 {name} {dt_name}: FAILED "
                      f"{type(e).__name__}: {str(e)[:150]}", flush=True)


PROBES["quad_s2"] = probe_quad_s2


def probe_model_knockout():
    """True in-model cost of each conv group: run the real model with a
    group's 3x3x3 convs replaced by their center tap (shape-preserving)
    and read the group cost off the delta vs the full model."""
    for label in ("xla", "ko:all", "ko:head", "ko:strided", "ko:small",
                  "ko:big"):
        probe_model(jnp.bfloat16, label=f"model[{label}]", conv_impl=label)


PROBES["model_knockout"] = probe_model_knockout


def probe_model_overhead():
    """Decompose the non-conv3d half of the model time: SN recompute,
    BN, and their combination, on the bf16 model."""
    probe_model(jnp.bfloat16, label="model[bf16]")
    probe_model(jnp.bfloat16, label="model[no_sn]", spectral_norm=False)
    probe_model(jnp.bfloat16, label="model[no_bn]", norm=None)
    probe_model(jnp.bfloat16, label="model[no_sn_no_bn]",
                spectral_norm=False, norm=None)
    probe_model(jnp.bfloat16, label="model[ko:all,no_sn,no_bn]",
                conv_impl="ko:all", spectral_norm=False, norm=None)


PROBES["model_overhead"] = probe_model_overhead


def probe_quad_sweep():
    """Tile sweep of conv3d_quad on the two hottest small-Cout layers."""
    from v2ce_toolbox_tpu.ops.conv3d_quad import conv3d_quad

    cases = [
        ("dec3_c1", 260, 346, 96, 32, [
            (16, 4, 32), (16, 2, 48), (8, 8, 32), (8, 4, 48),
            (4, 16, 32), (4, 8, 48), (2, 8, 96), None]),
        ("dec2_c1", 130, 173, 192, 64, [
            (16, 4, 32), (8, 8, 32), (8, 4, 48), (4, 16, 32),
            (2, 16, 48), None]),
    ]
    for name, h, w, cin, cout, tiless in cases:
        rng = np.random.RandomState(0)
        flops = 2 * 16 * h * w * cin * cout * 27
        x = jnp.asarray(rng.rand(1, 16, h, w, cin)
                        .astype(np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray(rng.rand(3, 3, 3, cin, cout)
                        .astype(np.float32) * 0.01).astype(jnp.bfloat16)
        for tiles in tiless:
            def fn(args):
                xx, kk = args
                return conv3d_quad(xx, kk, tiles=tiles)
            try:
                t = timed_loop(fn, (x, k), n_iters=10)
                print(f"qsweep {name} tiles={tiles}: {t*1e3:.2f} ms  "
                      f"{flops/t/1e12:.1f} TF/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"qsweep {name} tiles={tiles}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


PROBES["quad_sweep"] = probe_quad_sweep




def probe_boundary():
    """Round-3 boundary formulations: the trace_attrib profile shows the
    model's time concentrated at the C<128 network edges (head, pred,
    concat, strided enc0), where channels-minor tensors waste lanes
    (minor dim pads to 128). Each probe measures the current formulation
    vs a lane-dense rewrite; exactness is asserted in-probe."""
    rng = np.random.RandomState(0)

    # --- pred: (1,16,260,346,32) bf16 -> channel-major (16,2,10,260,346) f32
    x32 = jnp.asarray(rng.rand(1, 16, 260, 346, 32).astype(np.float32))
    kp = jnp.asarray(rng.rand(1, 1, 1, 32, 20).astype(np.float32) * 0.1)

    def pred_cur(args):
        x, k = args
        y = lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1, 1),
            [(0, 0)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
        y = jax.nn.relu(y)
        v = jnp.transpose(y[0], (0, 3, 1, 2)).reshape(16, 2, 10, 260, 346)
        return v

    def pred_cm(args):
        x, k = args
        # transpose the 32-ch input first (dense relayout), 1x1 conv as
        # NCHW GEMM with W-minor output
        xt = jnp.transpose(x[0], (0, 3, 1, 2)).astype(jnp.bfloat16)
        y = lax.conv_general_dilated(
            xt, k[0, 0, 0].astype(jnp.bfloat16)[:, :, None, None], (1, 1),
            [(0, 0)] * 2, dimension_numbers=("NCHW", "IOHW", "NCHW"),
            preferred_element_type=jnp.float32)
        y = jax.nn.relu(y)
        return y.reshape(16, 2, 10, 260, 346)

    for name, fn in [("pred_cur", pred_cur), ("pred_cm", pred_cm)]:
        t = timed_loop(fn, (x32, kp), n_iters=10)
        print(f"boundary {name}: {t*1e3:.2f} ms", flush=True)
    a = np.asarray(pred_cur((x32, kp)))
    b = np.asarray(pred_cm((x32, kp)))
    print("  pred parity:", np.abs(a - b).max(), flush=True)

    # --- head: (1,16,260,346,2) -> (1,16,260,346,32), 3x3x3
    xin = jnp.asarray(rng.rand(1, 16, 260, 346, 2).astype(np.float32))
    kh = jnp.asarray(rng.rand(3, 3, 3, 2, 32).astype(np.float32) * 0.1)

    def head_cur(args):
        x, k = args
        return lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1, 1),
            [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)

    def head_cm(args):
        x, k = args
        xt = jnp.transpose(x, (0, 1, 4, 2, 3)).astype(jnp.bfloat16)
        y = lax.conv_general_dilated(
            xt, k.astype(jnp.bfloat16), (1, 1, 1),
            [(1, 1)] * 3, dimension_numbers=("NDCHW", "DHWIO", "NDCHW"),
            preferred_element_type=jnp.float32)
        return jnp.transpose(y, (0, 1, 3, 4, 2))

    def head_cm_stay(args):
        # channel-major output handed on (no transpose back)
        x, k = args
        xt = jnp.transpose(x, (0, 1, 4, 2, 3)).astype(jnp.bfloat16)
        return lax.conv_general_dilated(
            xt, k.astype(jnp.bfloat16), (1, 1, 1),
            [(1, 1)] * 3, dimension_numbers=("NDCHW", "DHWIO", "NDCHW"),
            preferred_element_type=jnp.float32)

    for name, fn in [("head_cur", head_cur), ("head_cm", head_cm),
                     ("head_cm_stay", head_cm_stay)]:
        t = timed_loop(fn, (xin, kh), n_iters=10)
        print(f"boundary {name}: {t*1e3:.2f} ms", flush=True)
    a = np.asarray(head_cur((xin, kh)))
    b = np.asarray(head_cm((xin, kh)))
    print("  head parity:", np.abs(a - b).max(), flush=True)

    # --- enc0 strided: (1,16,260,346,32) -> (1,16,130,173,64), s(1,2,2)
    ke = jnp.asarray(rng.rand(3, 3, 3, 32, 64).astype(np.float32) * 0.1)

    def enc0_cur(args):
        x, k = args
        return lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 2, 2),
            [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)

    def enc0_fold(args):
        x, k = args
        x = x.astype(jnp.bfloat16)
        k = k.astype(jnp.bfloat16)
        b_, l, h, w, c = x.shape
        co = k.shape[-1]
        ho, wo = -(-h // 2), -(-w // 2)
        xp = jnp.pad(x, ((0, 0), (0, 0), (1, 2 * (ho + 1) - h - 1),
                         (1, 2 * (wo + 1) - w - 1), (0, 0)))
        xh = jnp.concatenate([xp[:, :, 0::2], xp[:, :, 1::2]], axis=-1)
        xf = jnp.concatenate([xh[:, :, :, 0::2], xh[:, :, :, 1::2]],
                             axis=-1)
        kz = jnp.concatenate([k, jnp.zeros((3, 1, 3, c, co), k.dtype)],
                             axis=1)
        kz = jnp.concatenate([kz, jnp.zeros((3, 4, 1, c, co), kz.dtype)],
                             axis=2)
        parts = []
        for ph_w in (0, 1):
            for ph_h in (0, 1):
                parts.append(kz[:, [0 + ph_h, 2 + ph_h]][:, :, [0 + ph_w,
                                                                2 + ph_w]])
        k4 = jnp.concatenate(parts, axis=3)
        return lax.conv_general_dilated(
            xf, k4, (1, 1, 1), [(1, 1), (0, 0), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)

    for name, fn in [("enc0_cur", enc0_cur), ("enc0_fold", enc0_fold)]:
        t = timed_loop(fn, (x32, ke), n_iters=10)
        print(f"boundary {name}: {t*1e3:.2f} ms", flush=True)
    a = np.asarray(enc0_cur((x32, ke)))
    b = np.asarray(enc0_fold((x32, ke)))
    print("  enc0 parity:", np.abs(a - b).max(), flush=True)

    # --- dec3 conv1: concat(up64, skip32) -> 32 vs split convs
    up = jnp.asarray(rng.rand(1, 16, 130, 173, 64).astype(np.float32))
    skip = jnp.asarray(rng.rand(1, 16, 260, 346, 32).astype(np.float32))
    kc = jnp.asarray(rng.rand(3, 3, 3, 96, 32).astype(np.float32) * 0.1)

    def upsample(u):
        b_, l, h, w, c = u.shape
        y = jnp.broadcast_to(u[:, :, :, None, :, None, :],
                             (b_, l, h, 2, w, 2, c))
        return y.reshape(b_, l, 2 * h, 2 * w, c)[:, :, :260, :346]

    def dec3_cur(args):
        u, s, k = args
        x = jnp.concatenate([upsample(u).astype(jnp.bfloat16),
                             s.astype(jnp.bfloat16)], axis=-1)
        return lax.conv_general_dilated(
            x, k.astype(jnp.bfloat16), (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)

    def dec3_split(args):
        u, s, k = args
        k = k.astype(jnp.bfloat16)
        y = lax.conv_general_dilated(
            upsample(u).astype(jnp.bfloat16), k[..., :64, :], (1, 1, 1),
            [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
        return y + lax.conv_general_dilated(
            s.astype(jnp.bfloat16), k[..., 64:, :], (1, 1, 1),
            [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)

    for name, fn in [("dec3_cur", dec3_cur), ("dec3_split", dec3_split)]:
        t = timed_loop(fn, (up, skip, kc), n_iters=10)
        print(f"boundary {name}: {t*1e3:.2f} ms", flush=True)
    a = np.asarray(dec3_cur((up, skip, kc)))
    b = np.asarray(dec3_split((up, skip, kc)))
    print("  dec3 parity:", np.abs(a - b).max(), flush=True)


PROBES["boundary"] = probe_boundary




def probe_model_variants():
    """In-model A/B of the round-3 boundary rewrites (isolated micro-
    probes proved unreliable: jit-boundary layouts dominate them). Each
    variant runs the full driver-style output (channel-major (L,20,H,W)
    voxels), so 'cl' variants pay the external transpose the driver
    would."""
    from v2ce_toolbox_tpu.config import ModelConfig
    from v2ce_toolbox_tpu.models import V2ce3d

    h, w = 260, 346
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(1, 16, h, w, 2).astype(np.float32))

    variants = [
        ("base", {}),
        ("split", {"decoder_split": True}),
        ("cm", {"out_layout": "cm"}),
        ("fold", {"conv_impl": "fold"}),
        ("split+cm", {"decoder_split": True, "out_layout": "cm"}),
        ("split+cm+fold", {"decoder_split": True, "out_layout": "cm",
                           "conv_impl": "fold"}),
    ]
    for name, kw in variants:
        model = V2ce3d(config=ModelConfig(compute_dtype=jnp.bfloat16, **kw))
        variables = model.init(jax.random.key(0), x[:, :3], train=False)
        cm = kw.get("out_layout") == "cm"

        def fn(xx, _model=model, _v=variables, _cm=cm):
            y = _model.apply(_v, xx, train=False)
            if not _cm:
                y = jnp.transpose(y, (0, 1, 4, 2, 3))
            return y

        dt = timed_loop(fn, x, n_iters=10)
        print(f"model_variant[{name}]: {dt*1e3:.2f} ms/window "
              f"({16/dt:.1f} fps)", flush=True)


PROBES["model_variants"] = probe_model_variants


def probe_subpixel_variants():
    """In-model A/B of the round-4 sub-pixel decoder reformulations
    (ops/subpixel.py): split (round-2 loser), wfold (W parity in cout),
    pfold (both parities in cout, one full-fill conv on the coarse
    grid). Driver-style channel-major output like model_variants."""
    from v2ce_toolbox_tpu.config import ModelConfig
    from v2ce_toolbox_tpu.models import V2ce3d

    h, w = 260, 346
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(1, 16, h, w, 2).astype(np.float32))

    variants = [
        ("base", {}),
        ("sp-pfold", {"subpixel_decoder": True, "subpixel_impl": "pfold"}),
        ("sp-wfold", {"subpixel_decoder": True, "subpixel_impl": "wfold"}),
        ("sp-split", {"subpixel_decoder": True, "subpixel_impl": "split"}),
        # pfold ONLY on the fill-bound top-resolution blocks — the deep
        # blocks run the direct conv at 160-177 TF/s already, so
        # all-blocks measurements conflate a dec3/dec2 win with a
        # dec0/dec1 regression (fused_geometry probe: the coarse-grid
        # conv geometry itself runs at 57-78 TF/s)
        ("sp-pfold-last1", {"subpixel_decoder": True,
                            "subpixel_impl": "pfold",
                            "subpixel_blocks": 1}),
        ("sp-pfold-last2", {"subpixel_decoder": True,
                            "subpixel_impl": "pfold",
                            "subpixel_blocks": 2}),
        ("sp-wfold-last2", {"subpixel_decoder": True,
                            "subpixel_impl": "wfold",
                            "subpixel_blocks": 2}),
        # the fused Pallas decoder kernel (ops/decoder_pallas.py) on the
        # two top-resolution blocks only
        ("sp-pallas-last2", {"subpixel_decoder": True,
                             "subpixel_impl": "pallas",
                             "subpixel_blocks": 2}),
        ("sp-pallas-last1", {"subpixel_decoder": True,
                             "subpixel_impl": "pallas",
                             "subpixel_blocks": 1}),
    ]
    for name, kw in variants:
        model = V2ce3d(config=ModelConfig(compute_dtype=jnp.bfloat16, **kw))
        variables = model.init(jax.random.key(0), x[:, :3], train=False)

        def fn(xx, _model=model, _v=variables):
            y = _model.apply(_v, xx, train=False)
            return jnp.transpose(y, (0, 1, 4, 2, 3))

        dt = timed_loop(fn, x, n_iters=10)
        print(f"subpixel_variant[{name}]: {dt*1e3:.2f} ms/window "
              f"({16/dt:.1f} fps)", flush=True)


PROBES["subpixel_variants"] = probe_subpixel_variants


def probe_pallas_model():
    """In-model A/B of the fused Pallas decoder block (subpixel_impl=
    'pallas'): base direct schedule vs fusing the last 1 / last 2 decoder
    blocks. Full V2ce3d forward, bf16, driver-style output."""
    from v2ce_toolbox_tpu.config import ModelConfig
    from v2ce_toolbox_tpu.models import V2ce3d

    h, w = 260, 346
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(1, 16, h, w, 2).astype(np.float32))
    variants = [
        ("base", {}),
        ("pallas-last1", {"subpixel_decoder": True,
                          "subpixel_impl": "pallas",
                          "subpixel_blocks": 1}),
        ("pallas-last2", {"subpixel_decoder": True,
                          "subpixel_impl": "pallas",
                          "subpixel_blocks": 2}),
    ]
    variables = None
    for name, kw in variants:
        model = V2ce3d(config=ModelConfig(compute_dtype=jnp.bfloat16, **kw))
        if variables is None:
            variables = model.init(jax.random.key(0), x[:, :3], train=False)

        def fn(xx, model=model):
            y = model.apply(variables, xx, train=False)
            return jnp.transpose(y, (0, 1, 4, 2, 3))

        dt = timed_loop(fn, x, n_iters=10)
        print(f"pallas_model {name}: {dt*1e3:.2f} ms/window "
              f"({16/dt:.1f} fps)", flush=True)


PROBES["pallas_model"] = probe_pallas_model


def probe_fused_geometry():
    """Decide the fused Pallas decoder block (VERDICT item 2b) with the
    cheapest possible measurement: the fused kernel's inner loop IS a
    3x3x3 conv at COARSE-grid spatial size with full-lane channel counts
    (coarse + parity-blocked skip in K, 4*Co parity blocks in N). Time
    the existing Pallas implicit-GEMM kernel (ops/conv3d_pallas.py) and
    XLA's conv at exactly those geometries; the achieved TF/s sets the
    fused kernel's ceiling before any fusion work is done.

    To beat: the XLA direct path = dec3/conv1 7.81 ms + dec2/conv1
    3.97 ms + their upsample/concat copy share (~3-5 ms) — PERF.md
    round-3 roofline rows."""
    from v2ce_toolbox_tpu.ops.conv3d_pallas import conv3d_3x3x3

    # (name, hc, wc, K_slab, N_out): dec3 fused = coarse 130x173,
    # slab-A form K=128 (Cu 64 + skip a=1 blocks) and dense one-slab
    # K=256 (Cu pad + 4*Cs); dec2 fused = coarse 65x87, K=384
    # (Cu 128 + 4*Cs 256), N=4*Co=256.
    geoms = [
        ("dec3_fused_slabA", 130, 173, 128, 128),
        ("dec3_fused_dense", 130, 173, 256, 128),
        ("dec2_fused_dense", 65, 87, 384, 256),
    ]
    rng = np.random.RandomState(0)
    for name, h, w, cin, cout in geoms:
        flops = 2 * 16 * h * w * cin * cout * 27
        x = jnp.asarray(rng.rand(1, 16, h, w, cin)
                        .astype(np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray((rng.rand(3, 3, 3, cin, cout) * 0.01)
                        .astype(np.float32)).astype(jnp.bfloat16)

        def fn_pallas(args):
            xx, kk = args
            return conv3d_3x3x3(xx, kk, out_dtype=jnp.bfloat16)

        def fn_xla(args):
            xx, kk = args
            return lax.conv_general_dilated(
                xx, kk, (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        for impl, fn in [("pallas", fn_pallas), ("xla", fn_xla)]:
            try:
                t = timed_loop(fn, (x, k), n_iters=10)
                print(f"fused_geom {name} {impl}: {t*1e3:.2f} ms  "
                      f"{flops/t/1e12:.1f} TF/s", flush=True)
            except Exception as e:
                print(f"fused_geom {name} {impl}: FAILED "
                      f"{type(e).__name__}: {e}", flush=True)


PROBES["fused_geometry"] = probe_fused_geometry


def probe_fused_dec():
    """The REAL fused Pallas decoder conv (ops/decoder_pallas.py) vs the
    direct XLA path (upsample + concat + conv3d) at the model's dec3/dec2
    conv1 shapes, bf16. Also times the pieces the fused kernel absorbs
    (upsample+concat alone) so the net win decomposes."""
    from v2ce_toolbox_tpu.models.layers import upsample_nearest_to
    from v2ce_toolbox_tpu.ops.decoder_pallas import fused_up_concat_conv

    geoms = [
        # with_proj: dec3 (Co=32) folds the residual 1x1 projection into
        # the same dots (fills N to 128); dec2 (Co=64) is full-N already
        ("dec3", 130, 173, 260, 346, 64, 32, 32, True),
        ("dec2", 65, 87, 130, 173, 128, 64, 64, False),
    ]
    rng = np.random.RandomState(0)
    for name, hc, wc, hf, wf, cu, cs, co, with_proj in geoms:
        coarse = jnp.asarray(rng.rand(1, 16, hc, wc, cu)
                             .astype(np.float32)).astype(jnp.bfloat16)
        skip = jnp.asarray(rng.rand(1, 16, hf, wf, cs)
                           .astype(np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray((rng.rand(3, 3, 3, cu + cs, co) * 0.02)
                        .astype(np.float32)).astype(jnp.bfloat16)
        kd = (jnp.asarray((rng.rand(1, 1, 1, cu + cs, co) * 0.02)
                          .astype(np.float32)).astype(jnp.bfloat16)
              if with_proj else None)
        # useful-work FLOPs (fine grid, 27 taps) for both variants
        flops = 2 * 16 * hf * wf * (cu + cs) * co * (27 + with_proj)

        def fn_direct(args):
            c, s, kk, kkd = args
            up = upsample_nearest_to(c, (s.shape[2], s.shape[3]))
            x = jnp.concatenate([up, s], axis=-1)
            y = lax.conv_general_dilated(
                x, kk, (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            if kkd is None:
                return y
            r = lax.conv_general_dilated(
                x, kkd, (1, 1, 1), [(0, 0)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return y, r

        def fn_upconcat(args):
            c, s, _, _ = args
            up = upsample_nearest_to(c, (s.shape[2], s.shape[3]))
            return jnp.concatenate([up, s], axis=-1)

        def fn_fused(args):
            c, s, kk, kkd = args
            return fused_up_concat_conv(c, s, kk, kkd,
                                        out_dtype=jnp.bfloat16)

        def fn_fused_k64(args):
            # K padded to 192 instead of 256 (dec3): 25% fewer executed
            # MACs if Mosaic runs 1.5-lane-tile slabs at full rate
            c, s, kk, kkd = args
            return fused_up_concat_conv(c, s, kk, kkd,
                                        out_dtype=jnp.bfloat16,
                                        k_align=64)

        args = (coarse, skip, k, kd)
        variants = [("direct", fn_direct), ("up+concat", fn_upconcat),
                    ("fused", fn_fused)]
        if (cu + 4 * cs) % 128:
            variants.append(("fused-k64", fn_fused_k64))
        for impl, fn in variants:
            try:
                t = timed_loop(fn, args, n_iters=10)
                print(f"fused_dec {name} {impl}: {t*1e3:.2f} ms  "
                      f"{flops/t/1e12:.1f} TF/s-useful", flush=True)
            except Exception as e:
                print(f"fused_dec {name} {impl}: FAILED "
                      f"{type(e).__name__}: {e}", flush=True)


PROBES["fused_dec"] = probe_fused_dec


def probe_int8():
    """Does the v5e MXU's 2x int8 path show up through XLA at this
    model's conv/dot geometries? Times int8 (preferred int32) vs bf16
    (preferred f32) for (a) a big square matmul, (b) the model's
    fill-bound decoder conv shapes, (c) the bottleneck 512-ch conv. If
    int8 is ~2x on (b)/(c), a post-training-quantized stage-1 is the
    remaining big single-chip lever; if only (a) speeds up, the
    fill-bound layers gain nothing and the idea is dead."""
    rng = np.random.RandomState(0)

    def mk_i8(*shape):
        return jnp.asarray(rng.randint(-127, 127, shape, dtype=np.int32)
                           .astype(np.int8))

    def mk_bf(*shape):
        return jnp.asarray(rng.rand(*shape).astype(np.float32)
                           ).astype(jnp.bfloat16)

    def perturb(args, acc):
        # data-dependent no-op for ints too (prevents loop hoisting)
        z = (acc * 1e-12).astype(jnp.int32)
        return tuple(a + z.astype(a.dtype) for a in args)

    # (a) square matmul 4096^3
    for name, mk, pt in [("i8", mk_i8, jnp.int32), ("bf16", mk_bf,
                                                    jnp.float32)]:
        a, bm = mk(4096, 4096), mk(4096, 4096)
        flops = 2 * 4096 ** 3

        def fn(args, pt=pt):
            x, y = args
            return jax.lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                       preferred_element_type=pt)

        t = timed_loop(fn, (a, bm), n_iters=10, perturb=perturb)
        print(f"int8_probe matmul4096 {name}: {t*1e3:.2f} ms "
              f"{flops/t/1e12:.1f} T/s", flush=True)

    # (b)/(c) conv shapes: (name, h, w, cin, cout)
    geoms = [("dec3_conv1", 260, 346, 96, 32),
             ("dec3_conv2", 260, 346, 32, 32),
             ("enc_mid", 65, 87, 128, 256),
             ("bottleneck", 17, 22, 512, 512)]
    for gname, h, w, cin, cout in geoms:
        flops = 2 * 16 * h * w * cin * cout * 27
        for name, mk, pt in [("i8", mk_i8, jnp.int32),
                             ("bf16", mk_bf, jnp.float32)]:
            x = mk(1, 16, h, w, cin)
            k = mk(3, 3, 3, cin, cout)

            def fn(args, pt=pt):
                xx, kk = args
                return lax.conv_general_dilated(
                    xx, kk, (1, 1, 1), [(1, 1)] * 3,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    preferred_element_type=pt)

            try:
                t = timed_loop(fn, (x, k), n_iters=10, perturb=perturb)
                print(f"int8_probe {gname} {name}: {t*1e3:.2f} ms "
                      f"{flops/t/1e12:.1f} T/s", flush=True)
            except Exception as e:
                print(f"int8_probe {gname} {name}: FAILED "
                      f"{type(e).__name__}: {e}", flush=True)


PROBES["int8"] = probe_int8


def probe_winograd():
    """Winograd F(2x2,3x3) (XLA formulation, ops/winograd.py) vs direct
    XLA conv on the fill-bound stride-1 model layers — measures whether
    the 2.25x dot-volume cut survives the transform data movement when
    XLA schedules it (the Pallas kernel is the VMEM-resident variant)."""
    from jax import lax

    from v2ce_toolbox_tpu.ops.winograd import conv3d_winograd

    shapes = [
        ("dec3_conv1", (1, 16, 260, 346, 96), 32),
        ("dec2_conv1", (1, 16, 130, 173, 192), 64),
        ("dec3_conv2", (1, 16, 260, 346, 32), 32),
    ]
    for name, xshape, cout in shapes:
        cin = xshape[-1]
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(*xshape).astype(np.float32))
        k = jnp.asarray(rng.rand(3, 3, 3, cin, cout).astype(np.float32)
                        * 0.01)
        flops_direct = 2 * np.prod(xshape[:4]) * cin * cout * 27

        def direct(dtype):
            def fn(args):
                xx, kk = args
                return lax.conv_general_dilated(
                    xx.astype(dtype), kk.astype(dtype),
                    window_strides=(1, 1, 1), padding=((1, 1),) * 3,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    preferred_element_type=jnp.float32)
            return fn

        def wino(dtype):
            def fn(args):
                xx, kk = args
                return conv3d_winograd(xx, kk, compute_dtype=dtype)
            return fn

        for label, fn in [("direct_bf16", direct(jnp.bfloat16)),
                          ("wino_bf16", wino(jnp.bfloat16)),
                          ("wino_f32", wino(jnp.float32))]:
            try:
                dt = timed_loop(fn, (x, k), n_iters=10)
                print(f"{name} {label}: {dt*1e3:.2f} ms  "
                      f"{flops_direct/dt/1e12:.1f} TF/s-equiv", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name} {label}: FAILED {type(e).__name__}: {e}",
                      flush=True)


PROBES["winograd"] = probe_winograd


def probe_wino_pallas():
    """Mosaic Winograd F(4,3)_LxH kernel (ops/winograd_pallas.py) vs
    direct XLA conv on the fill-bound model layers, sweeping block
    configs."""
    from jax import lax

    from v2ce_toolbox_tpu.ops.winograd_pallas import conv3d_wino4

    shapes = [
        ("dec3_conv1", (1, 16, 260, 346, 96), 32),
        ("dec2_conv1", (1, 16, 130, 173, 192), 64),
        ("dec3_conv2", (1, 16, 260, 346, 32), 32),
    ]
    for name, xshape, cout in shapes:
        cin = xshape[-1]
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(*xshape).astype(np.float32) - 0.5)
        xb = x.astype(jnp.bfloat16)
        k = jnp.asarray(rng.rand(3, 3, 3, cin, cout).astype(np.float32)
                        * 0.05)
        kb = k.astype(jnp.bfloat16)
        flops_direct = 2 * np.prod(xshape[:4]) * cin * cout * 27

        def direct(args):
            xx, kk = args
            return lax.conv_general_dilated(
                xx, kk, window_strides=(1, 1, 1), padding=((1, 1),) * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32)

        # correctness spot-check on chip before timing
        ref = np.asarray(direct((xb, kb)))
        got = np.asarray(conv3d_wino4(xb, kb))
        rel = (np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9))
        print(f"{name} wino-vs-direct bf16 rel err: {rel:.2e}", flush=True)

        for dlabel, xx, kk in [("bf16", xb, kb), ("f32", x, k)]:
            dt = timed_loop(direct, (xx, kk), n_iters=10)
            print(f"{name} direct_{dlabel}: {dt*1e3:.2f} ms  "
                  f"{flops_direct/dt/1e12:.1f} TF/s", flush=True)
            for lt, th in [(8, 8), (4, 8), (8, 4), (4, 4)]:
                if xshape[1] % lt or lt < 4 or th < 4:
                    continue

                def wfn(args, lt=lt, th=th):
                    ax, ak = args
                    return conv3d_wino4(ax, ak, lt=lt, th=th)

                try:
                    dt = timed_loop(wfn, (xx, kk), n_iters=10)
                    print(f"{name} wino4_{dlabel}[lt={lt},th={th}]: "
                          f"{dt*1e3:.2f} ms  "
                          f"{flops_direct/dt/1e12:.1f} TF/s-equiv",
                          flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"{name} wino4_{dlabel}[lt={lt},th={th}]: FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)


PROBES["wino_pallas"] = probe_wino_pallas


def probe_wino_ablate():
    """Stage-cost attribution for the Winograd kernel: full vs noinv
    (no AT collapses) vs nodot (fake z) on the dec3_conv1 shape."""
    from v2ce_toolbox_tpu.ops.winograd_pallas import conv3d_wino4

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 16, 260, 346, 96).astype(np.float32) - 0.5)
    k = jnp.asarray(rng.rand(3, 3, 3, 96, 32).astype(np.float32) * 0.05)
    for dlabel, xx, kk in [("bf16", x.astype(jnp.bfloat16),
                            k.astype(jnp.bfloat16)), ("f32", x, k)]:
        for mode in ("full", "noinv", "nodot"):
            def fn(args, mode=mode):
                ax, ak = args
                return conv3d_wino4(ax, ak, lt=8, th=8, ablate=mode)
            try:
                dt = timed_loop(fn, (xx, kk), n_iters=10)
                print(f"wino4 dec3_conv1 {dlabel} [{mode}]: "
                      f"{dt*1e3:.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"wino4 {dlabel} [{mode}]: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)


PROBES["wino_ablate"] = probe_wino_ablate


def probe_sampler_strategies():
    """On-chip sampler time per 16-frame window for each additional-event
    strategy. 'random' (reference LDATI.py:173-174) historically ran the
    v2 sort/gather path (~10-60x the v3 primitives); round 4 put it on
    the v3 compactor in two-word form — this probe records the gap that
    remains vs 'slope' (the product default)."""
    from v2ce_toolbox_tpu.config import SamplerConfig
    from v2ce_toolbox_tpu.ops.ldati import sample_events

    scfg = SamplerConfig()
    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.rand(16, 260, 346, 20) < 0.1).astype(np.float32)
                    * rng.rand(16, 260, 346, 20).astype(np.float32) * 4)

    for strategy in ("none", "slope", "random"):
        def fn(args, strategy=strategy):
            xx, = args
            v = jnp.transpose(xx, (0, 3, 1, 2)).reshape(16, 2, 10, 260, 346)
            s = sample_events(
                v, jax.random.key(0), fps=30,
                additional_events_strategy=strategy,
                max_events_per_voxel=scfg.max_events_per_voxel,
                capacity=scfg.event_capacity)
            return (s.count.sum() + (s.t_us % 97).sum()
                    + s.x.astype(jnp.int32).sum())

        dt = timed_loop(fn, (x,), n_iters=10)
        print(f"sampler strategy={strategy}: {dt*1e3:.2f} ms / 16 frames",
              flush=True)


PROBES["sampler_strategies"] = probe_sampler_strategies


def probe_bf16_fidelity():
    """Fidelity of the bf16 production inference config vs the f32
    contract config: same params, same frames, same sampler key. Reports
    the repo's own stage-1 quality metrics (BASELINE.md rows — treating
    the f32 forward as GT) plus downstream event-count ratio and
    timestamp KS between the two sampled streams."""
    from v2ce_toolbox_tpu.config import ModelConfig, SamplerConfig
    from v2ce_toolbox_tpu.models import V2ce3d
    from v2ce_toolbox_tpu.ops.ldati import sample_events
    from v2ce_toolbox_tpu.pipeline.preprocess import normalize_pairs
    from v2ce_toolbox_tpu.train import metrics as tm

    seq_len, h, w = 16, 260, 346
    scfg = SamplerConfig()
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(1, seq_len + 1, h, w).astype(np.float32))
    units = normalize_pairs(frames)

    preds = {}
    variables = None
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = V2ce3d(config=ModelConfig(compute_dtype=dt))
        if variables is None:
            variables = model.init(jax.random.key(0), units[:, :3],
                                   train=False)
        preds[name] = np.asarray(jax.jit(
            lambda u, m=model: m.apply(variables, u, train=False)
        )(units), dtype=np.float32)

    p, g = jnp.asarray(preds["bf16"]), jnp.asarray(preds["f32"])
    print(f"bf16_fidelity voxel MAE {float(jnp.abs(p - g).mean()):.3e} "
          f"(f32 mean {float(jnp.abs(g).mean()):.3e}); "
          f"BinaryMatch raw {float(tm.binary_match(p, g, 'raw')):.6f}  "
          f"F1 sum_c {float(tm.binary_match_f1(p, g, 'sum_c')):.6f}  "
          f"PoolMSE k2 {float(tm.pool_mse(p, g, 2)):.3e}", flush=True)

    streams = {}
    for name in ("f32", "bf16"):
        v = jnp.transpose(jnp.asarray(preds[name][0]), (0, 3, 1, 2)
                          ).reshape(seq_len, 2, 10, h, w)
        s = jax.jit(lambda vv: sample_events(
            vv, jax.random.key(7), fps=30,
            additional_events_strategy=scfg.additional_events_strategy,
            max_events_per_voxel=scfg.max_events_per_voxel,
            capacity=scfg.event_capacity))(v)
        cnt = np.asarray(s.count)
        t = np.concatenate([np.asarray(s.t_us[i])[:cnt[i]]
                            for i in range(seq_len)])
        streams[name] = t
    n_f, n_b = len(streams["f32"]), len(streams["bf16"])
    ks = float(np.abs(
        np.searchsorted(np.sort(streams["f32"]),
                        np.sort(np.concatenate(list(streams.values()))),
                        side="right") / max(n_f, 1)
        - np.searchsorted(np.sort(streams["bf16"]),
                          np.sort(np.concatenate(list(streams.values()))),
                          side="right") / max(n_b, 1)).max())
    print(f"bf16_fidelity events f32 {n_f}  bf16 {n_b}  "
          f"count ratio {n_b / max(n_f, 1):.5f}  timestamp KS {ks:.5f}",
          flush=True)


PROBES["bf16_fidelity"] = probe_bf16_fidelity


def probe_compact_block():
    """A/B the block_chunks lever: chunks per Mosaic grid step for the
    place compactor (chain-compaction shape) and the append kernel
    (flatten shape). bc > 1 amortizes per-grid-step sequencing overhead;
    the butterfly/roll work per element is unchanged, so any delta IS the
    grid overhead. Also sweeps chunk size at fixed whole-row blocks
    (smaller chunks = fewer butterfly stages per element once the
    per-chunk fixed cost is amortized)."""
    from v2ce_toolbox_tpu.ops.compact_pallas import (
        INVALID, append_rows, compact_rows)

    rng = np.random.RandomState(0)
    f, cb, seg = 16, 9, 2 * 260 * 346
    keys0 = np.where(rng.rand(f * cb, seg) < 0.15,
                     rng.randint(0, 1 << 30, (f * cb, seg)),
                     INVALID).astype(np.int32)
    kx = rng.randint(0, 1 << 30, (f * cb, seg)).astype(np.int32)
    k_j, x_j = jnp.asarray(keys0), jnp.asarray(kx)

    def perturb(args, acc):
        return tuple(a + (acc * 1e-12).astype(jnp.int32) for a in args)

    for chunk, bc in [(16384, 1), (16384, 3), (16384, 6), (16384, 12),
                      (8192, 24), (4096, 48), (2048, 96)]:
        def chain(args, chunk=chunk, bc=bc):
            kk, px = args
            o, (op,), kc, t = compact_rows(
                kk, [px], cap=1 << 14, chunk=chunk, algo="place",
                block_chunks=bc)
            return o[:, ::255].astype(jnp.int64).sum(), kc.sum()

        dt = timed_loop(chain, (k_j, x_j), n_iters=10, perturb=perturb)
        print(f"chain place chunk={chunk} bc={bc}: {dt*1e3:.2f} ms",
              flush=True)

    frames, cap = 16, 1 << 19
    per_frame = 74_000
    counts = np.full(frames, per_frame, np.int32)
    t = np.sort(rng.randint(0, 33_333, (frames, cap)).astype(np.int32), 1)
    slot = np.arange(cap)[None]
    akeys = jnp.asarray(np.where(slot < counts[:, None], t,
                                 INVALID).astype(np.int32))
    apay = jnp.asarray(np.where(slot < counts[:, None],
                                rng.randint(0, 346, (frames, cap)), 0
                                ).astype(np.int32))

    for chunk, bc in [(8192, 1), (8192, 8), (8192, 16), (8192, 64),
                      (4096, 128), (2048, 256)]:
        def app(args, chunk=chunk, bc=bc):
            kk, px = args
            o, (op,), kc, _ = append_rows(kk, [px], cap=frames * cap,
                                          chunk=chunk, block_chunks=bc)
            return o[:, ::255].astype(jnp.int64).sum(), kc.sum()

        dt = timed_loop(app, (akeys, apay), n_iters=10, perturb=perturb)
        print(f"append chunk={chunk} bc={bc}: {dt*1e3:.2f} ms", flush=True)


PROBES["compact_block"] = probe_compact_block


def probe_fused_pipeline():
    """A/B the round-5 fused sampler+flatten (_sample_flatten_window: wire
    format on the post-sort rows + ONE merge) against the round-4 chain
    (sample_events -> per-frame buffers -> _flatten_chunk_stream), full
    16-frame 260x346 window at synthetic-dense load."""
    import jax

    from v2ce_toolbox_tpu.config import SamplerConfig
    from v2ce_toolbox_tpu.ops.ldati import sample_events
    from v2ce_toolbox_tpu.pipeline.driver import (
        _flatten_chunk_stream, _sample_flatten_window)

    rng = np.random.RandomState(0)
    f, p, c, h, w = 16, 2, 10, 260, 346
    v = jnp.asarray((rng.rand(f, p, c, h, w) < 0.1).astype(np.float32)
                    * rng.rand(f, p, c, h, w).astype(np.float32) * 4)
    scfg = SamplerConfig()
    offs = jnp.asarray((np.arange(f) / 30 * 1e6).astype(np.int32))
    key = jax.random.key(0)

    @jax.jit
    def unfused(vv):
        s = sample_events(vv, key, **scfg.sample_kwargs(fps=30))
        words, kept, side_key, n_side, side_total = _flatten_chunk_stream(
            s, offs, f)
        return ((words % 97).sum().astype(jnp.int32)
                + (side_key % 83).sum() + n_side + side_total + kept
                + s.dropped.sum()).astype(jnp.float32)

    @jax.jit
    def fused(vv):
        words, kept, side_key, n_side, side_total, dropped = (
            _sample_flatten_window(vv, key, offs, scfg=scfg, frames=f,
                                   fps=30))
        return ((words % 97).sum().astype(jnp.int32)
                + (side_key % 83).sum() + n_side + side_total + kept
                + dropped.sum()).astype(jnp.float32)

    for name, fn in [("unfused (r4 chain)", unfused), ("fused", fused)]:
        def run(args, fn=fn):
            vv, = args
            return fn(vv)

        dt = timed_loop(run, (v,), n_iters=10,
                        perturb=lambda args, acc: (args[0] + acc * 1e-12,))
        print(f"sampler+flatten [{name}]: {dt*1e3:.2f} ms", flush=True)


PROBES["fused_pipeline"] = probe_fused_pipeline


def probe_stage1_flags():
    """VERDICT r4 item 2: A/B XLA:TPU compiler flags on the full stage-1
    forward (the one unmeasured lever class for the ~8 ms residual above
    the composite bound), plus a seq_len=32 window to amortize per-window
    non-FLOP copies. Unknown flags on this XLA version report as
    unavailable instead of failing the sweep."""
    import time as _t

    import jax
    from flax.core import freeze

    from v2ce_toolbox_tpu.config import ModelConfig
    from v2ce_toolbox_tpu.models import V2ce3d
    from v2ce_toolbox_tpu.pipeline.preprocess import normalize_pairs

    rng = np.random.RandomState(0)
    h, w = 260, 346
    model = V2ce3d(config=ModelConfig(compute_dtype=jnp.bfloat16))
    frames16 = jnp.asarray(rng.rand(1, 17, h, w).astype(np.float32))
    frames32 = jnp.asarray(rng.rand(1, 33, h, w).astype(np.float32))
    variables = model.init(jax.random.key(0),
                           frames16[:, :3, :, :, None].repeat(2, -1),
                           train=False)

    def fwd(frames):
        units = normalize_pairs(frames)
        return model.apply(variables, units, train=False)

    def timed_compiled(compiled, frames, n=10):
        def run(k):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(k):
                out = compiled(frames + acc * 1e-12)
                acc = acc + out.sum().astype(jnp.float32) * 1e-20
            return float(np.asarray(acc))

        _ = run(2)
        t0 = _t.time()
        r = run(n)
        assert np.isfinite(r)
        return (_t.time() - t0) / n

    flag_sets = [
        ("baseline", {}),
        ("vmem-128M", {"xla_tpu_scoped_vmem_limit_kib": "131072"}),
        ("no-latency-hiding",
         {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
        ("latency-hiding",
         {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
        ("licm-2x", {"xla_tpu_licm_size_inflation_ratio": "2.0"}),
        ("no-dot-sr", {"xla_tpu_enable_dot_strength_reduction": "false"}),
        ("no-multi-level-fusion",
         {"xla_tpu_enable_multi_level_nested_loop_fusion": "false"}),
        ("opt-level-3", {"xla_backend_optimization_level": "3"}),
        ("all-reduce-scatter", {}),
    ]
    lowered = jax.jit(fwd).lower(frames16)
    base_dt = None
    for name, opts in flag_sets:
        if name == "all-reduce-scatter":
            continue
        try:
            compiled = lowered.compile(compiler_options=opts or None)
        except Exception as e:  # noqa: BLE001
            print(f"stage1 flags [{name}]: unavailable "
                  f"({type(e).__name__}: {str(e)[:120]})", flush=True)
            continue
        dt = timed_compiled(compiled, frames16)
        if name == "baseline":
            base_dt = dt
        rel = f" ({dt / base_dt:.3f}x)" if base_dt else ""
        print(f"stage1 flags [{name}]: {dt*1e3:.2f} ms/window{rel}",
              flush=True)

    # seq_len scaling: 32-frame window, report per-16-frames for direct
    # comparison (reference --seq_len flag, v2ce.py:286)
    c32 = jax.jit(fwd).lower(frames32).compile()
    dt32 = timed_compiled(c32, frames32, n=6)
    print(f"stage1 seq_len=32: {dt32*1e3:.2f} ms/window "
          f"= {dt32*1e3/2:.2f} ms per 16 frames", flush=True)


PROBES["stage1_flags"] = probe_stage1_flags


def probe_fused_phases():
    """Decompose _sample_flatten_window: rows-only (sampler core), + wire
    prep (payload/delta/recs elementwise), + merge, + side pass — each a
    separate jit consuming its outputs, so the regression vs the unfused
    chain localizes."""
    import jax

    from v2ce_toolbox_tpu.config import SamplerConfig
    from v2ce_toolbox_tpu.ops.compact_pallas import (
        INVALID, compact_rows, merge_sorted_rows)
    from v2ce_toolbox_tpu.ops.ldati import sample_events

    rng = np.random.RandomState(0)
    f, p, c, h, w = 16, 2, 10, 260, 346
    cb = c - 1
    v = jnp.asarray((rng.rand(f, p, c, h, w) < 0.1).astype(np.float32)
                    * rng.rand(f, p, c, h, w).astype(np.float32) * 4)
    scfg = SamplerConfig()
    offs = jnp.asarray((np.arange(f) / 30 * 1e6).astype(np.int32))
    key = jax.random.key(0)
    kw = scfg.sample_kwargs(fps=30)
    kw.pop("capacity")

    def rows(vv):
        rel, gvox, te, cd = sample_events(
            vv, key, capacity=1 << 19, return_rows=True, **kw)
        return ((rel[:, ::255] % 97).sum() + (gvox[:, ::255] % 83).sum()
                + te.sum() + cd.sum()).astype(jnp.float32)

    def wire(vv):
        rel, gvox, te, cd = sample_events(
            vv, key, capacity=1 << 19, return_rows=True, **kw)
        rr, wd = rel.shape
        valid = rel != INVALID
        row_id = jnp.arange(rr, dtype=jnp.int32)
        bin_row = row_id % cb
        voxel_step = 1.0 / 30 / cb
        bin_start_us = ((bin_row.astype(jnp.float32) * voxel_step)
                        * 1e6).astype(jnp.int32)
        off_row = offs[jnp.minimum(row_id // cb, f - 1)]
        t_abs = rel + (bin_start_us + off_row)[:, None]
        hw = h * w
        rem = gvox % (p * hw)
        payload = (((rem % hw) % w) << 10) | (((rem % hw) // w) << 1) \
            | (rem // hw)
        t_val = jnp.where(valid, t_abs, jnp.int32(-2147483647))
        last = jnp.max(t_val, axis=1)
        has = jnp.any(valid, axis=1)

        def ff2(a, b):
            av, ah = a
            bv, bh = b
            return jnp.where(bh, bv, av), ah | bh

        inc_val, _ = jax.lax.associative_scan(
            ff2, (jnp.where(has, last, 0), has))
        prev_last = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), inc_val[:-1]])
        prev = jnp.concatenate([prev_last[:, None], t_abs[:, :-1]], axis=1)
        delta = t_abs - prev
        is_exc = valid & ((delta < 0) | (delta >= 7))
        recs = jnp.where(valid,
                         (jnp.where(is_exc, 7, jnp.maximum(delta, 0))
                          << 19) | payload, INVALID)
        side_cand = jnp.where(is_exc, t_abs, INVALID)
        return ((recs[:, ::255] % 97).sum()
                + (side_cand[:, ::255] % 83).sum()).astype(jnp.float32)

    def wire_and_merge(vv, with_side):
        rel, gvox, te, cd = sample_events(
            vv, key, capacity=1 << 19, return_rows=True, **kw)
        rr, wd = rel.shape
        valid = rel != INVALID
        row_id = jnp.arange(rr, dtype=jnp.int32)
        bin_row = row_id % cb
        voxel_step = 1.0 / 30 / cb
        bin_start_us = ((bin_row.astype(jnp.float32) * voxel_step)
                        * 1e6).astype(jnp.int32)
        off_row = offs[jnp.minimum(row_id // cb, f - 1)]
        t_abs = rel + (bin_start_us + off_row)[:, None]
        hw = h * w
        rem = gvox % (p * hw)
        payload = (((rem % hw) % w) << 10) | (((rem % hw) // w) << 1) \
            | (rem // hw)
        prev = jnp.concatenate(
            [jnp.zeros((rr, 1), jnp.int32), t_abs[:, :-1]], axis=1)
        delta = t_abs - prev
        is_exc = valid & ((delta < 0) | (delta >= 7))
        recs = jnp.where(valid,
                         (jnp.where(is_exc, 7, jnp.maximum(delta, 0))
                          << 19) | payload, INVALID)
        out_recs, _, kept, _ = merge_sorted_rows(recs, (), nb=rr,
                                                 cap=rr * wd)
        acc = (out_recs[0][::255] % 97).sum() + kept.sum()
        if with_side:
            side_cand = jnp.where(is_exc, t_abs, INVALID)
            side_rows, _, _, ns_tot = compact_rows(
                side_cand, (), cap=2048, chunk=2048, algo="place")
            side_flat, _, n_side, _ = merge_sorted_rows(
                side_rows, (), nb=rr, cap=2048)
            acc = acc + (side_flat[0][::31] % 83).sum() + n_side.sum() \
                + ns_tot.sum()
        return acc.astype(jnp.float32)

    cases = [
        ("rows only (sampler core)", jax.jit(rows)),
        ("+ wire prep", jax.jit(wire)),
        ("+ merge (no side)",
         jax.jit(functools.partial(wire_and_merge, with_side=False))),
        ("+ merge + side",
         jax.jit(functools.partial(wire_and_merge, with_side=True))),
    ]
    for name, fn in cases:
        def run(args, fn=fn):
            return fn(args[0])

        dt = timed_loop(run, (v,), n_iters=10,
                        perturb=lambda args, acc: (args[0] + acc * 1e-12,))
        print(f"fused phase [{name}]: {dt*1e3:.2f} ms", flush=True)


PROBES["fused_phases"] = probe_fused_phases


def _frontpack_op_count(window, n_pay, lanes=128):
    """Static vector-op count of compact_pallas._front_pack per chunk.

    Counts each Mosaic vector instruction (roll / xor / compare / select /
    add) applied to the full (S, 128) tile, mirroring the kernel source
    line for line: _flat_push is 5 tile-ops for d < lanes (2 rolls of the
    shifted copy, 1 lane roll, 2 selects) and 2 for d >= lanes (1 sublane
    roll + 1 bounds select); _flat_pull is 5 / 2 likewise. The route
    phase pulls key + delta + each payload and applies the pull/keep
    masks (3 + 3 compares) and 2 selects per routed array."""
    ops = 2                       # delta init: compare + select
    d = 1
    while d < window:             # exclusive prefix scan of invalids
        ops += (5 if d < lanes else 2) + 1           # push + add
        d <<= 1
    d = 1
    while d < window:             # LSB-first pull routing
        pull = 5 if d < lanes else 2
        ops += pull * (2 + n_pay)                    # key, delta, payloads
        ops += 3 + 3                                 # pull / keep masks
        ops += 2 * (1 + n_pay) + 2                   # selects + delta upd
        d <<= 1
    return ops


def probe_stage2_roofline():
    """Stage-2 roofline (VERDICT r4 missing #4): measure a synthetic
    Mosaic vector-op ceiling and a Mosaic HBM-stream ceiling at the chain
    compaction's exact grid shape, count the compactor's per-chunk vector
    ops from the kernel source, and compare every sampler phase against
    its bound. Also prices the radix-on-compactor sort alternative
    (VERDICT r4 next-round item 1a) with measured rates."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from v2ce_toolbox_tpu.ops.compact_pallas import INVALID, compact_rows
    from v2ce_toolbox_tpu.ops.gen_pallas import gen_pack

    LANES = 128
    r, chunk = 144, 16384         # 16 frames x 9 bins; the measured knee
    sc = chunk // LANES
    n_chunks = -(-(2 * 260 * 346) // chunk)          # 11: padded seg width
    n = n_chunks * chunk
    total_el = r * n

    rng = np.random.RandomState(0)
    x_j = jnp.asarray(
        rng.randint(0, 1 << 30, (r, n_chunks, sc, LANES)).astype(np.int32))

    def perturb_int(args, acc):
        return tuple((a + (acc * 1e-12).astype(jnp.int32)
                      if a.dtype == jnp.int32 else a) for a in args)

    # --- 1. synthetic vector-op ceiling: k alternating roll/xor/
    # sublane-roll/select ops per element, same grid + block shape as the
    # compactor (the op mix mirrors _front_pack: rolls on both axes,
    # compares, selects). Two k points; the slope isolates the per-op
    # cost from grid/DMA overheads shared with the real kernel.
    def make_op_kernel(k):
        def kern(x_ref, o_ref):
            ci = pl.program_id(1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (sc, LANES), 1)
            x = x_ref[0, 0]
            for _ in range(k // 4):
                x = pltpu.roll(x, 1, axis=1)
                x = x ^ lane
                x = pltpu.roll(x, 1, axis=0)
                x = jnp.where(lane < 64, x, x + 1)

            @pl.when(ci == n_chunks - 1)
            def _():
                o_ref[0] = x
        return kern

    def time_ops(k):
        def fn(args):
            xx, = args
            out = pl.pallas_call(
                make_op_kernel(k),
                grid=(r, n_chunks),
                in_specs=[pl.BlockSpec((1, 1, sc, LANES),
                                       lambda ri, ci: (ri, ci, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, sc, LANES),
                                       lambda ri, ci: (ri, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((r, sc, LANES), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary")),
            )(xx)
            return ((out[:, ::17] % 97).sum(),)
        return timed_loop(fn, (x_j,), n_iters=10, perturb=perturb_int)

    t64, t256 = time_ops(64), time_ops(256)
    op_rate = (256 - 64) * total_el / (t256 - t64)   # el-ops / s
    print(f"synthetic vector-op kernel (serial chain): k=64 {t64*1e3:.2f} "
          f"ms, k=256 {t256*1e3:.2f} ms -> sustained "
          f"{op_rate/1e12:.2f} T el-ops/s", flush=True)

    # --- 1b. ILP ceiling: 4 independent op chains interleaved — the real
    # kernel's pulls of key/delta/payload are independent, so its issue
    # rate can exceed the serial-chain rate; this measures how far.
    def make_ilp_kernel(k):
        def kern(x_ref, o_ref):
            ci = pl.program_id(1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (sc, LANES), 1)
            xs = [x_ref[0, 0] + i for i in range(4)]
            for _ in range(k // 16):
                xs = [pltpu.roll(x, 1, axis=1) for x in xs]
                xs = [x ^ lane for x in xs]
                xs = [pltpu.roll(x, 1, axis=0) for x in xs]
                xs = [jnp.where(lane < 64, x, x + 1) for x in xs]

            @pl.when(ci == n_chunks - 1)
            def _():
                o_ref[0] = xs[0] ^ xs[1] ^ xs[2] ^ xs[3]
        return kern

    def time_ilp(k):
        def fn(args):
            xx, = args
            out = pl.pallas_call(
                make_ilp_kernel(k),
                grid=(r, n_chunks),
                in_specs=[pl.BlockSpec((1, 1, sc, LANES),
                                       lambda ri, ci: (ri, ci, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, sc, LANES),
                                       lambda ri, ci: (ri, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((r, sc, LANES), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary")),
            )(xx)
            return ((out[:, ::17] % 97).sum(),)
        return timed_loop(fn, (x_j,), n_iters=10, perturb=perturb_int)

    ti64, ti256 = time_ilp(64), time_ilp(256)
    ilp_rate = (256 - 64) * total_el / (ti256 - ti64)
    print(f"synthetic vector-op kernel (4 indep chains): k=64 "
          f"{ti64*1e3:.2f} ms, k=256 {ti256*1e3:.2f} ms -> sustained "
          f"{ilp_rate/1e12:.2f} T el-ops/s "
          f"({ilp_rate/op_rate:.2f}x serial)", flush=True)

    # --- 2. Mosaic HBM stream ceiling at the same grid (read + write)
    def copy_kern(x_ref, o_ref):
        o_ref[0, 0] = x_ref[0, 0]

    def fn_copy(args):
        xx, = args
        out = pl.pallas_call(
            copy_kern,
            grid=(r, n_chunks),
            in_specs=[pl.BlockSpec((1, 1, sc, LANES),
                                   lambda ri, ci: (ri, ci, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, sc, LANES),
                                   lambda ri, ci: (ri, ci, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((r, n_chunks, sc, LANES),
                                           jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(xx)
        return ((out[:, :, ::17, 0] % 97).sum(),)

    t_copy = timed_loop(fn_copy, (x_j,), n_iters=10, perturb=perturb_int)
    stream_rate = 2 * total_el * 4 / t_copy          # bytes/s, in + out
    print(f"mosaic stream copy (64 KB blocks, {r * n_chunks} steps): "
          f"{t_copy*1e3:.2f} ms -> {stream_rate/1e9:.0f} GB/s (read+write)",
          flush=True)

    # --- 2b. same copy with full-row blocks (704 KB, 144 steps): the
    # delta vs 2a isolates the fixed per-grid-step cost from bandwidth
    def copy_row_kern(x_ref, o_ref):
        o_ref[0] = x_ref[0]

    def fn_copy_row(args):
        xx, = args
        out = pl.pallas_call(
            copy_row_kern,
            grid=(r,),
            in_specs=[pl.BlockSpec((1, n_chunks, sc, LANES),
                                   lambda ri: (ri, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, n_chunks, sc, LANES),
                                   lambda ri: (ri, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((r, n_chunks, sc, LANES),
                                           jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(xx)
        return ((out[:, :, ::17, 0] % 97).sum(),)

    t_copy_row = timed_loop(fn_copy_row, (x_j,), n_iters=10,
                            perturb=perturb_int)
    row_rate = 2 * total_el * 4 / t_copy_row
    step_fixed_us = max(t_copy - t_copy_row, 0.0) / (r * n_chunks - r) * 1e6
    print(f"mosaic stream copy (704 KB blocks, {r} steps): "
          f"{t_copy_row*1e3:.2f} ms -> {row_rate/1e9:.0f} GB/s; implied "
          f"fixed cost ~{step_fixed_us:.2f} us per grid step", flush=True)

    # --- 3. chain compaction at the exact sampler shape + payload
    keys_np = np.where(rng.rand(r, n) < 0.1,
                       rng.randint(0, 1 << 30, (r, n)),
                       INVALID).astype(np.int32)
    pays_np = np.where(keys_np != INVALID,
                       rng.randint(1, 1 << 20, (r, n)), 0).astype(np.int32)
    keys_j, pays_j = jnp.asarray(keys_np), jnp.asarray(pays_np)

    def fn_compact(args):
        kk, pp = args
        o, (op,), k, t = compact_rows(kk, [pp], cap=1 << 14, chunk=chunk,
                                      algo="place")
        return (o[:, ::127].astype(jnp.int32).sum() + (op[:, ::127] % 31
                                                       ).sum(),
                k.sum(), t.sum())

    t_comp = timed_loop(fn_compact, (keys_j, pays_j), n_iters=10,
                        perturb=perturb_int)
    comp_rate = total_el / t_comp
    ops_per_chunk = _frontpack_op_count(chunk, n_pay=1)
    place_ops = 2 * 8 + 6                            # 2 places + pop amort
    bound_s = (ops_per_chunk + place_ops) * (total_el // chunk) * chunk \
        / op_rate
    print(f"chain compaction (place, +payload): {t_comp*1e3:.2f} ms "
          f"({comp_rate/1e9:.2f} Gelem/s); counted "
          f"{ops_per_chunk + place_ops} vector ops/chunk -> op-bound "
          f"{bound_s*1e3:.2f} ms -> {bound_s/t_comp*100:.0f}% of bound",
          flush=True)

    # --- 4. the final per-bin sort at its exact shape, vs the radix
    # alternative priced with the measured compactor rate
    sort_in = jnp.asarray(np.where(
        rng.rand(r, 1 << 14) < 0.6,
        rng.randint(0, 1 << 30, (r, 1 << 14)), INVALID).astype(np.int32))

    def fn_sort(args):
        ss, = args
        out = lax.sort(ss, dimension=1)
        return ((out[:, ::127] % 97).sum(),)

    t_sort = timed_loop(fn_sort, (sort_in,), n_iters=10,
                        perturb=perturb_int)
    sort_el = r * (1 << 14)
    bits = 13                     # sub-bin rel-us at fps=30, cb=9: <= 3704
    radix_s = 2 * bits * sort_el / comp_rate
    print(f"final sort (144, 16384): {t_sort*1e3:.2f} ms "
          f"({sort_el/t_sort/1e9:.2f} Gelem/s); radix-on-compactor "
          f"alternative = 2x{bits} stable partition passes = "
          f"{radix_s*1e3:.1f} ms ({radix_s/t_sort:.1f}x SLOWER)",
          flush=True)

    # --- 5. fused generation kernel vs its stream + op bounds
    v = jnp.asarray((rng.rand(16, 2, 10, 260, 346) < 0.1).astype(np.float32)
                    * rng.rand(16, 2, 10, 260, 346).astype(np.float32) * 4)

    def fn_gen(args):
        vv, = args
        kg, kxg, emit, drop = gen_pack(vv, fps=30, t0=0.0, strategy="slope",
                                       mepv=32, vox_bits=18)
        return ((kg[:, :, :, ::37, 0] % 97).sum(),
                (kxg[:, :, :, ::37, 0] % 31).sum(), emit.sum(), drop.sum())

    t_gen = timed_loop(fn_gen, (v,), n_iters=10)
    gen_el = 16 * 9 * 2 * 260 * 346
    gen_bytes = (16 * 2 * 10 * 260 * 346 + 2 * gen_el) * 4
    gen_stream_s = gen_bytes / stream_rate
    gen_ops = 25                  # relocate ~6 + ts/key pack ~8 + kx ~7 +
    gen_op_s = gen_ops * gen_el / op_rate            # emit/drop sums ~4
    print(f"gen kernel: {t_gen*1e3:.2f} ms; stream bound "
          f"{gen_stream_s*1e3:.2f} ms, ~{gen_ops} op bound "
          f"{gen_op_s*1e3:.2f} ms -> "
          f"{max(gen_stream_s, gen_op_s)/t_gen*100:.0f}% of bound",
          flush=True)


PROBES["stage2_roofline"] = probe_stage2_roofline


def probe_gen_compact():
    """Fused gen+chain-compaction (ops/gen_pallas.gen_compact) vs the
    gen_pack -> compact_rows chain, isolated and inside the full rows
    path, at the bench shape."""
    import jax

    from v2ce_toolbox_tpu.ops.compact_pallas import compact_rows
    from v2ce_toolbox_tpu.ops.gen_pallas import gen_compact, gen_pack
    from v2ce_toolbox_tpu.ops.ldati import sample_events

    rng = np.random.RandomState(0)
    f, p, c, h, w = 16, 2, 10, 260, 346
    v = jnp.asarray((rng.rand(f, p, c, h, w) < 0.1).astype(np.float32)
                    * rng.rand(f, p, c, h, w).astype(np.float32) * 4)
    key = jax.random.key(0)
    seg = p * h * w
    seg_bits = int(np.ceil(np.log2(seg)))

    def fn_unfused(args):
        vv, = args
        keys, kx, emit, drop = gen_pack(vv, fps=30, t0=0.0,
                                        strategy="slope", mepv=32,
                                        vox_bits=seg_bits)
        ck, (ckx,), kept, tot = compact_rows(
            keys.reshape(f * (c - 1), seg), [kx.reshape(f * (c - 1), seg)],
            cap=1 << 14, chunk=16384, algo="place")
        return ((ck[:, ::127] % 97).sum() + (ckx[:, ::127] % 31).sum(),
                kept.sum(), tot.sum(), emit.sum(), drop.sum())

    def fn_fused(args):
        vv, = args
        ck, ckx, kept, tot, emit, drop = gen_compact(
            vv, fps=30, t0=0.0, strategy="slope", mepv=32,
            vox_bits=seg_bits, cap_bin=1 << 14)
        return ((ck[:, ::127] % 97).sum() + (ckx[:, ::127] % 31).sum(),
                kept.sum(), tot.sum(), emit.sum(), drop.sum())

    for name, fn in (("gen_pack + compact_rows", fn_unfused),
                     ("gen_compact (fused)", fn_fused)):
        dt = timed_loop(fn, (v,), n_iters=10)
        print(f"{name}: {dt*1e3:.2f} ms", flush=True)

    for flag in (False, True):
        def fn_rows(args, flag=flag):
            vv, = args
            rel, gvox, te, cd = sample_events(
                vv, key, capacity=1 << 19, return_rows=True,
                use_gen_compact=flag)
            return ((rel[:, ::255] % 97).sum() + (gvox[:, ::255] % 83
                                                 ).sum(),
                    te.sum(), cd.sum())

        dt = timed_loop(fn_rows, (v,), n_iters=10)
        print(f"sampler rows path (use_gen_compact={flag}): "
              f"{dt*1e3:.2f} ms", flush=True)


PROBES["gen_compact"] = probe_gen_compact


if __name__ == "__main__":
    from v2ce_toolbox_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    names = sys.argv[1:] or list(PROBES)
    print(f"devices: {jax.devices()}")
    for name in names:
        PROBES[name]()
