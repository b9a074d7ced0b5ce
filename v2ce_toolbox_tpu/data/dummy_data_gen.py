"""Synthetic packet fixture generator (reference:
train/scripts/tools/dummy_data_gen.py:10-39): random packets with the exact
production schema, so the training loop is smoke-testable without MVSEC."""

from __future__ import annotations

import os
import os.path as op
import pickle

import numpy as np

from v2ce_toolbox_tpu.events import EVENT_DTYPE


def make_packet(rng: np.random.RandomState, height=260, width=346,
                num_frames=17, events_per_frame=1000) -> dict:
    packet = {
        "images": rng.randint(0, 255, (num_frames, height, width),
                              dtype=np.uint8),
        "gyroscopes": rng.rand(num_frames, 3),
        "accelerometers": rng.rand(num_frames, 3),
        "physical_att": rng.rand(num_frames - 1, height, width),
        "optical_flow": rng.rand(num_frames - 1, 2, height, width),
        "acc_flow": rng.rand(num_frames - 1, 2, height, width),
        "timestamps": np.sort(rng.randint(0, 1000000, (num_frames,))),
    }
    event_packets = []
    for _ in range(num_frames - 1):
        ev = np.zeros((events_per_frame,), dtype=EVENT_DTYPE)
        ev["timestamp"] = np.sort(rng.randint(0, 1000000, (events_per_frame,)))
        ev["x"] = rng.randint(0, width, (events_per_frame,))
        ev["y"] = rng.randint(0, height, (events_per_frame,))
        ev["polarity"] = rng.randint(0, 2, (events_per_frame,))
        event_packets.append(ev)
    packet["events"] = event_packets
    return packet


def generate(data_dir: str, num_packets: int = 256, seed: int = 0,
             height=260, width=346, events_per_frame=1000):
    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(num_packets):
        with open(op.join(data_dir, f"{i:05d}.pkl"), "wb") as f:
            pickle.dump(make_packet(rng, height, width,
                                    events_per_frame=events_per_frame), f)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="dummy_data")
    ap.add_argument("-n", "--num_packets", type=int, default=256)
    ap.add_argument("--height", type=int, default=260)
    ap.add_argument("--width", type=int, default=346)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    generate(args.data_dir, args.num_packets, args.seed, args.height,
             args.width)
    print(f"wrote {args.num_packets} packets to {args.data_dir}")
