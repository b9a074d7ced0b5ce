#!/usr/bin/env python
"""LDATI stage-2 wall-clock benchmark.

Equivalent of the reference's sampler perf harnesses (reference:
train/scripts/stage2/performance_test.py:18-49 and the __main__ benchmark
of scripts/LDATI.py:325-351): average ms per 346x260 frame and events/sec
on random voxels (or packet-derived voxels with --data_dir)."""

import argparse
import os.path as op
import sys
import time

sys.path.insert(0, op.dirname(op.dirname(op.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=10,
                    help="frames per call (reference uses B=10)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--height", type=int, default=260)
    ap.add_argument("--width", type=int, default=346)
    ap.add_argument("--sparsity", type=float, default=0.1)
    ap.add_argument("--strategy", default="slope",
                    choices=["slope", "random", "none"])
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax import lax

    from v2ce_toolbox_tpu.ops.ldati import sample_events
    from v2ce_toolbox_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.RandomState(42)
    shape = (args.batch, 2, 10, args.height, args.width)
    y = jnp.asarray((rng.rand(*shape) * 2 *
                     (rng.rand(*shape) < args.sparsity)).astype(np.float32))

    N = args.iters

    @jax.jit
    def loop(y):
        def body(i, acc):
            s = sample_events(y + acc * 1e-9,
                              jax.random.fold_in(jax.random.key(0), i),
                              additional_events_strategy=args.strategy)
            return acc + s.count.sum().astype(jnp.float32)
        return lax.fori_loop(0, N, body, 0.0)

    total = float(np.asarray(loop(y)))     # compile + warm
    t0 = time.time()
    total = float(np.asarray(loop(y)))
    dt = (time.time() - t0) / N
    events = total / N
    print(f"{dt*1000/args.batch:.3f} ms/frame  "
          f"({args.batch/dt:.1f} frames/s, "
          f"{events/dt/1e6:.2f} M events/s, "
          f"{events/args.batch:.0f} events/frame)")


if __name__ == "__main__":
    main()
