#!/usr/bin/env python
"""Stage-1 model speed/size report.

Equivalent of the reference speed test (reference:
train/scripts/tools/speed_test.py:22-44): parameter count, analytical
FLOPs (XLA cost analysis instead of thop), and steady-state forward
latency on the default 1x16x2x512x512 workload.

Usage: python tools/speed_test.py [--height 512 --width 512 --iters 20]
"""

import argparse
import os.path as op
import sys
import time

sys.path.insert(0, op.dirname(op.dirname(op.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--seq_len", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax import lax

    from v2ce_toolbox_tpu.config import ModelConfig
    from v2ce_toolbox_tpu.models import V2ce3d
    from v2ce_toolbox_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    cfg = ModelConfig(
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    model = V2ce3d(config=cfg)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, args.seq_len, args.height, args.width, 2)
                    .astype(np.float32))
    variables = model.init(jax.random.key(0), x[:, :3], train=False)
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    print(f"params: {n_params/1e6:.2f} M")

    fwd = jax.jit(lambda v, a: model.apply(v, a, train=False))
    lowered = fwd.lower(variables, x)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    flops = cost.get("flops", float("nan")) if cost else float("nan")
    print(f"analytical flops/forward: {flops/1e9:.1f} G")

    N = args.iters

    @jax.jit
    def loop(v, a):
        def body(i, acc):
            return acc + model.apply(v, a + acc * 1e-9, train=False).mean()
        return lax.fori_loop(0, N, body, 0.0)

    np.asarray(loop(variables, x))          # compile + warm
    t0 = time.time()
    np.asarray(loop(variables, x))
    dt = (time.time() - t0) / N
    print(f"avg forward latency: {dt*1000:.2f} ms "
          f"({args.seq_len/dt:.1f} frames/s, "
          f"{flops/dt/1e12:.2f} TFLOP/s effective)")


if __name__ == "__main__":
    main()
