#!/usr/bin/env python
"""Stage-2 sampler evaluation harness.

Equivalent of the reference's stage2_metrics CLI
(reference: train/scripts/stage2/stage2_metrics.py:204-266): for every
packet in a data dir, build the GT voxel per frame, run each sampler on it,
and score the sampled stream against the GT events with the timestamp-error
metric. Emits a CSV table [Avg Error (µs), #Overflow, Pred/GT ratio].

The reference fans out over 8 CPU processes because its metric is a pure
python loop; the vectorized metric here makes that unnecessary.

Usage:  python tools/stage2_eval.py --data_dir dummy_data --max_files 4
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
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--max_files", type=int, default=8)
    ap.add_argument("--max_frames_per_file", type=int, default=4)
    ap.add_argument("--search_range", type=int, default=0)
    ap.add_argument("--fps", type=int, default=30)
    ap.add_argument("--fix_10x_timestamps", action="store_true",
                    help="apply the reference's 10x timestamp data-bug "
                         "correction (stage2_metrics.py:112-116)")
    ap.add_argument("--samplers", nargs="*",
                    default=["ldati", "random", "even", "slope"])
    ap.add_argument("--recorder_dir", default=None,
                    help="evaluate on MODEL-predicted voxels dumped by "
                         "train_main --record_predictions (matched to the "
                         "val split of --data_dir by deterministic order), "
                         "like the reference's recorder-pkl flow "
                         "(stage2_metrics.py:91-201)")
    ap.add_argument("-o", "--out_csv", default=None)
    args = ap.parse_args()

    import jax

    from v2ce_toolbox_tpu.data.voxelize import gen_discretized_event_volume_np
    from v2ce_toolbox_tpu.eval.stage2_metrics import evaluate_samplers_on_frame
    from v2ce_toolbox_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    agg = {name: np.zeros(3) for name in args.samplers}
    n = 0

    def score_frame(ev, voxel):
        nonlocal n
        ev = ev.copy()
        # metric works in frame-local time
        ev["timestamp"] -= ev["timestamp"].min() if len(ev) else 0
        scores = evaluate_samplers_on_frame(
            ev, voxel, samplers=args.samplers, fps=args.fps,
            search_range=args.search_range, key=jax.random.key(n))
        for name, (d, o, r) in scores.items():
            agg[name] += np.array([d, o, r])
        n += 1

    if args.recorder_dir:
        # Pair recorder dumps with val packets by deterministic split order.
        from v2ce_toolbox_tpu.data.event_pack_dataset import split_paths

        val_paths = split_paths(args.data_dir)["val"]
        recs = sorted(f for f in os.listdir(args.recorder_dir)
                      if f.endswith(".pkl"))[: args.max_files]
        path_idx = 0
        for rname in recs:
            with open(op.join(args.recorder_dir, rname), "rb") as f:
                rec = pickle.load(f)
            pred = rec["pred_voxels"]              # (B, L, H, W, 20)
            for b in range(pred.shape[0]):
                if path_idx >= len(val_paths):
                    break
                with open(val_paths[path_idx], "rb") as f:
                    packet = pickle.load(f)
                path_idx += 1
                if args.fix_10x_timestamps:
                    for ev in packet["events"]:
                        ev["timestamp"] = ev["timestamp"] // 10
                for i in range(min(pred.shape[1], len(packet["events"]),
                                   args.max_frames_per_file)):
                    v = np.moveaxis(pred[b, i], -1, 0).reshape(
                        2, 10, *pred.shape[2:4])
                    score_frame(packet["events"][i], v)
            print(f"{rname}: {n} frames scored", flush=True)
    else:
        files = sorted(f for f in os.listdir(args.data_dir)
                       if f.endswith(".pkl"))[: args.max_files]
        for fname in files:
            with open(op.join(args.data_dir, fname), "rb") as f:
                packet = pickle.load(f)
            if args.fix_10x_timestamps:
                for ev in packet["events"]:
                    ev["timestamp"] = ev["timestamp"] // 10
            h, w = packet["images"].shape[1:]
            for ev in packet["events"][: args.max_frames_per_file]:
                vol = gen_discretized_event_volume_np(ev, (20, h, w))
                score_frame(ev, vol.reshape(2, 10, h, w))
            print(f"{fname}: {n} frames scored", flush=True)

    rows = ["sampler,avg_error_us,overflow,pred_gt_ratio"]
    for name in args.samplers:
        d, o, r = agg[name] / max(n, 1)
        rows.append(f"{name},{d:.2f},{o:.2f},{r:.4f}")
    table = "\n".join(rows)
    print(table)
    if args.out_csv:
        with open(args.out_csv, "w") as f:
            f.write(table + "\n")


if __name__ == "__main__":
    main()
