#!/usr/bin/env python
"""Dataset voxel-value statistics report
(reference: train/scripts/tools/time_voxel_stat_calc.py:14-62): mean, std,
and percentiles of the GT voxel values over a packet directory."""

import argparse
import os
import os.path as op
import pickle
import sys

import numpy as np

sys.path.insert(0, op.dirname(op.dirname(op.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--max_files", type=int, default=32)
    ap.add_argument("--num_bins", type=int, default=10)
    args = ap.parse_args()

    from v2ce_toolbox_tpu.data.voxelize import gen_discretized_event_volume_np

    files = sorted(f for f in os.listdir(args.data_dir)
                   if f.endswith(".pkl"))[: args.max_files]
    vals = []
    for fname in files:
        with open(op.join(args.data_dir, fname), "rb") as f:
            packet = pickle.load(f)
        h, w = packet["images"].shape[1:]
        for ev in packet["events"]:
            vol = gen_discretized_event_volume_np(
                ev, (2 * args.num_bins, h, w))
            vals.append(vol[vol > 0])
    v = np.concatenate(vals) if vals else np.zeros(1)
    qs = [50, 90, 95, 98, 99, 99.9, 100]
    print(f"files: {len(files)}  nonzero voxels: {v.size}")
    print(f"mean {v.mean():.4f}  std {v.std():.4f}")
    for q in qs:
        print(f"p{q}: {np.percentile(v, q):.4f}")


if __name__ == "__main__":
    main()
