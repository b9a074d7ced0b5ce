"""Dump the optimized HLO of the stage-1 forward and summarize the big ops.

Pairs with tools/trace_model.py: the trace gives per-fusion device times,
this maps fusion/copy names to their root expressions, shapes, and JAX
source metadata.

Usage: python tools/dump_hlo.py [--impl xla] [--out /tmp/v2ce_hlo.txt]
       python tools/dump_hlo.py --grep fusion.40 copy.112
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from v2ce_toolbox_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()


def dump(conv_impl: str, out_path: str) -> str:
    from v2ce_toolbox_tpu.config import ModelConfig
    from v2ce_toolbox_tpu.models import V2ce3d

    h, w = 260, 346
    model = V2ce3d(config=ModelConfig(compute_dtype=jnp.bfloat16,
                                      conv_impl=conv_impl))
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(1, 16, h, w, 2).astype(np.float32))
    variables = model.init(jax.random.key(0), x[:, :3], train=False)
    fn = jax.jit(lambda xx: model.apply(variables, xx, train=False))
    txt = fn.lower(x).compile().as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {out_path} ({len(txt)} bytes)", flush=True)
    return txt


def show(txt: str, names: list[str], context: int):
    lines = txt.splitlines()
    for name in names:
        # the fusion's computation body is named %fused_computation.* ;
        # find the instruction line first
        pat = re.compile(rf"%?{re.escape(name)} = ")
        for i, ln in enumerate(lines):
            if pat.search(ln):
                print("=" * 100, flush=True)
                for j in range(max(0, i - 1), min(len(lines), i + context)):
                    print(lines[j][:400], flush=True)
                break
        else:
            print(f"-- {name}: not found", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="xla")
    ap.add_argument("--out", default="/tmp/v2ce_hlo.txt")
    ap.add_argument("--grep", nargs="*", default=[])
    ap.add_argument("--context", type=int, default=3)
    args = ap.parse_args()
    if os.path.exists(args.out) and args.grep:
        txt = open(args.out).read()
    else:
        txt = dump(args.impl, args.out)
    if args.grep:
        show(txt, args.grep, args.context)


if __name__ == "__main__":
    main()
