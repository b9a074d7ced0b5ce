"""Root-cause probe for the fused-jit pathology (PERF.md): per-fusion
device-time diff between the window step run as ONE jit (model + transpose
+ sampler + flatten) and as the two separate dispatches bench.py uses.

The round-2 measurement: fused = 136 ms vs 82 ms sum-of-parts, and an
optimization_barrier between the stages makes it WORSE (180 ms) — so the
regression is not cross-stage fusion but something XLA decides differently
when both stages live in one module (layout assignment / scheduling /
rematerialization). This tool localizes it to named HLO ops.

Usage:
  python tools/trace_window.py --mode fused   [--top 30]
  python tools/trace_window.py --mode split   [--top 30]
  python tools/trace_window.py --mode fused --dump-hlo /tmp/fused_hlo.txt
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from v2ce_toolbox_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

SEQ, H, W = 16, 260, 346


def build(compute_dtype=jnp.float32):
    from v2ce_toolbox_tpu.config import ModelConfig, SamplerConfig
    from v2ce_toolbox_tpu.models import V2ce3d
    from v2ce_toolbox_tpu.ops.ldati import sample_events
    from v2ce_toolbox_tpu.pipeline.driver import _flatten_chunk_stream
    from v2ce_toolbox_tpu.pipeline.preprocess import normalize_pairs

    scfg = SamplerConfig()
    model = V2ce3d(config=ModelConfig(compute_dtype=compute_dtype))
    rng = np.random.RandomState(0)
    frames0 = jnp.asarray(rng.rand(1, SEQ + 1, H, W).astype(np.float32))
    variables = model.init(jax.random.key(0),
                           frames0[:, :3, :, :, None].repeat(2, -1),
                           train=False)
    offsets_us = jnp.asarray((np.arange(SEQ) / 30 * 1e6).astype(np.int32))

    def fwd(frames):
        units = normalize_pairs(frames)
        return model.apply(variables, units, train=False)

    def sample(voxels, key):
        v = jnp.transpose(voxels[0], (0, 3, 1, 2)).reshape(SEQ, 2, 10, H, W)
        stream = sample_events(
            v, key, fps=30,
            additional_events_strategy=scfg.additional_events_strategy,
            max_events_per_voxel=scfg.max_events_per_voxel,
            capacity=scfg.event_capacity)
        words, kept, side_key, n_side, side_total = _flatten_chunk_stream(
            stream, offsets_us, SEQ)
        return ((words % 97).sum().astype(jnp.int32)
                + (side_key % 83).sum() + n_side + side_total
                + kept + stream.dropped.sum()).astype(jnp.float32)

    return frames0, fwd, sample


def trace(mode: str, log_dir: str, iters: int, dump_hlo: str | None):
    frames0, fwd, sample = build()
    key = jax.random.key(0)

    if mode == "fused":
        @jax.jit
        def step(frames, k):
            return sample(fwd(frames), k)

        if dump_hlo:
            txt = step.lower(frames0, key).compile().as_text()
            with open(dump_hlo, "w") as f:
                f.write(txt)
            print(f"wrote {dump_hlo} ({len(txt)} bytes)", flush=True)

        def run_iter(acc, i):
            return acc + step(frames0 + acc * 1e-12,
                              jax.random.fold_in(key, i)) * 1e-20
    else:
        jfwd = jax.jit(fwd)
        jsample = jax.jit(sample)

        def run_iter(acc, i):
            voxels = jfwd(frames0 + acc * 1e-12)
            return acc + jsample(voxels, jax.random.fold_in(key, i)) * 1e-20

    acc = jnp.zeros((), jnp.float32)
    for i in range(2):                      # compile + warm
        acc = run_iter(acc, i)
    float(np.asarray(acc))

    jax.profiler.start_trace(log_dir, create_perfetto_trace=True)
    acc = jnp.zeros((), jnp.float32)
    for i in range(iters):
        acc = run_iter(acc, i)
    float(np.asarray(acc))
    jax.profiler.stop_trace()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["fused", "split"], default="fused")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dir", default=None)
    ap.add_argument("--dump-hlo", default=None)
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    log_dir = args.dir or f"/tmp/v2ce_window_trace_{args.mode}"
    if not args.parse_only:
        trace(args.mode, log_dir, args.iters, args.dump_hlo)
    from tools.trace_model import parse_perfetto
    parse_perfetto(log_dir, args.top, args.iters)


if __name__ == "__main__":
    main()
