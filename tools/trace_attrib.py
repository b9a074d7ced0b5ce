"""Attribute traced device time to JAX module paths.

Joins tools/trace_model.py's perfetto trace (per-HLO-instruction device
times) with tools/dump_hlo.py's optimized HLO (instruction -> metadata
op_name), then aggregates time by model component (e.g.
'unet/decoder_3/conv1'). This is the per-layer profile XLA's opaque
fusion names hide.

Usage:
  python tools/trace_attrib.py --hlo /tmp/v2ce_hlo.txt --trace /tmp/v2ce_trace
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
from collections import defaultdict


def load_meta(hlo_path: str) -> dict:
    """instruction name -> (op_name, shape-ish string)."""
    meta = {}
    pat = re.compile(r"%([\w.\-]+) = (\S+)")
    op_pat = re.compile(r'op_name="([^"]*)"')
    for ln in open(hlo_path):
        m = pat.search(ln)
        if not m:
            continue
        name, shape = m.group(1), m.group(2)
        om = op_pat.search(ln)
        meta[name] = (om.group(1) if om else "", shape)
    return meta


def component(op_name: str, depth: int) -> str:
    """'jit(<lambda>)/V2ce3d/unet/decoder_3/conv1/...' -> 'decoder_3/conv1'"""
    parts = [p for p in op_name.split("/")
             if p and not p.startswith("jit(")][:]
    while parts and parts[0] in ("V2ce3d", "unet"):
        parts.pop(0)
    return "/".join(parts[:depth]) if parts else "(none)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hlo", default="/tmp/v2ce_hlo.txt")
    ap.add_argument("--trace", default="/tmp/v2ce_trace")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--detail", default=None,
                    help="print per-instruction rows for components "
                         "matching this substring")
    args = ap.parse_args()

    meta = load_meta(args.hlo)
    paths = glob.glob(os.path.join(args.trace, "**", "*.trace.json.gz"),
                      recursive=True)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace
    track = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            track[e["pid"]] = e["args"].get("name", "")

    by_comp = defaultdict(float)
    by_inst = defaultdict(float)
    unattr = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if "TPU" not in track.get(e.get("pid"), ""):
            continue
        name = e["name"]
        if name.startswith("jit_"):       # whole-module parent span
            continue
        dur = e.get("dur", 0) / 1e3 / args.iters
        total += dur
        om = meta.get(name)
        if om is None or not om[0]:
            unattr[name] += dur
            continue
        by_comp[component(om[0], args.depth)] += dur
        by_inst[name] += dur

    print(f"total device: {total:.2f} ms/iter "
          f"(attributed {sum(by_comp.values()):.2f}, "
          f"unattributed {sum(unattr.values()):.2f})", flush=True)
    for comp, ms in sorted(by_comp.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {ms:8.3f} ms  {comp}", flush=True)
    if unattr:
        print("unattributed:", flush=True)
        for n, ms in sorted(unattr.items(), key=lambda kv: -kv[1])[:10]:
            print(f"  {ms:8.3f} ms  {n}", flush=True)
    if args.detail:
        print(f"-- detail: {args.detail}", flush=True)
        for n, ms in sorted(by_inst.items(), key=lambda kv: -kv[1]):
            om = meta[n]
            if args.detail in om[0]:
                print(f"  {ms:8.3f} ms  {n:40s} {om[1][:60]} "
                      f"{component(om[0], 4)}", flush=True)


if __name__ == "__main__":
    main()
