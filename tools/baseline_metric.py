#!/usr/bin/env python
"""Score an external simulator's event stream (ESIM, v2e, ...) against GT
packets with the stage-1 voxel metrics.

CLI twin of the reference's esim_metric.py / v2e_metric.py
(reference: train/scripts/tools/esim_metric.py:16-122): the simulator
stream is cut into the packet's frame intervals (16 even time splits when
frame timestamps are absent), voxelized like the GT, and scored with
BinaryMatch / BinaryMatchF1 / PoolMSE.

Usage:
  python tools/baseline_metric.py --pred events.npz --data_dir packets/
"""

import argparse
import os
import os.path as op
import pickle
import sys

import numpy as np

sys.path.insert(0, op.dirname(op.dirname(op.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred", required=True,
                    help=".npz with an 'event_stream' structured array")
    ap.add_argument("--data_dir", required=True,
                    help="GT packet dir (16-frame pkl packets)")
    ap.add_argument("--max_files", type=int, default=8)
    ap.add_argument("--num_bins", type=int, default=10)
    args = ap.parse_args()

    from v2ce_toolbox_tpu.data.voxelize import gen_discretized_event_volume_np
    from v2ce_toolbox_tpu.eval.baseline_metrics import score_stream_against_gt

    pred = np.load(args.pred)["event_stream"]
    files = sorted(f for f in os.listdir(args.data_dir)
                   if f.endswith(".pkl"))[: args.max_files]
    agg = {}
    n = 0
    for fname in files:
        with open(op.join(args.data_dir, fname), "rb") as f:
            packet = pickle.load(f)
        h, w = packet["images"].shape[1:]
        gt = np.stack([
            gen_discretized_event_volume_np(ev, (2 * args.num_bins, h, w))
            for ev in packet["events"]
        ])
        ts = packet["timestamps"].astype(np.int64)
        sel = (pred["timestamp"] >= ts[0]) & (pred["timestamp"] < ts[-1])
        scores = score_stream_against_gt(pred[sel], gt, timestamps=ts)
        for k, v in scores.items():
            agg[k] = agg.get(k, 0.0) + v
        n += 1
    for k in sorted(agg):
        print(f"{k}: {agg[k] / max(n, 1):.4f}")


if __name__ == "__main__":
    main()
