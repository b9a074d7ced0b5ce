"""Per-fusion device trace of the stage-1 forward on the real TPU.

Writes a perfetto trace of N warm model forwards, then parses the JSON
to aggregate device time per HLO fusion name — the data that localizes
the ~24 ms non-conv skeleton (PERF.md round-3 knockout table).

Usage: python tools/trace_model.py [--impl xla|ko:all] [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from v2ce_toolbox_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()


def run_trace(conv_impl: str, log_dir: str, iters: int = 5,
              full: bool = False):
    from v2ce_toolbox_tpu.config import ModelConfig
    from v2ce_toolbox_tpu.models import V2ce3d

    h, w = 260, 346
    cfg_kw = {}
    if conv_impl:
        cfg_kw["conv_impl"] = conv_impl
    model = V2ce3d(config=ModelConfig(compute_dtype=jnp.bfloat16, **cfg_kw))
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(1, 16, h, w, 2).astype(np.float32))
    variables = model.init(jax.random.key(0), x[:, :3], train=False)

    fn = jax.jit(lambda xx: model.apply(variables, xx, train=False))
    y = fn(x)
    float(jnp.sum(y))  # warm + sync

    jax.profiler.start_trace(log_dir, create_perfetto_trace=True)
    for _ in range(iters):
        y = fn(x)
    float(jnp.sum(y))
    jax.profiler.stop_trace()


def parse_perfetto(log_dir: str, top: int, iters: int):
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("NO perfetto trace written", flush=True)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace

    # device-track complete events: pid/tid whose track name mentions TPU/XLA
    track = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            track[e["pid"]] = e["args"].get("name", "")
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = track.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        by_name[e["name"]] += dur
        total += dur
    print(f"trace {path}: {total:.2f} ms device total over {iters} iters "
          f"({total/iters:.2f} ms/iter)", flush=True)
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ms/iters:8.3f} ms/iter  {name[:110]}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="xla")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dir", default="/tmp/v2ce_trace")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        run_trace(args.impl, args.dir, iters=args.iters)
    parse_perfetto(args.dir, args.top, args.iters)


if __name__ == "__main__":
    main()
