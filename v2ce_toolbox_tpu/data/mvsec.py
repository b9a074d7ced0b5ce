"""MVSEC HDF5 -> 16-frame training packets.

Re-design of the reference's MVSEC converter
(reference: train/scripts/tools/MVSEC_data_utils.py:70-247): reads the
`davis/<left|right>/` groups (image_raw, image_raw_ts, image_raw_event_inds,
events, imu), pairs events to [frame_t, frame_{t+1}) intervals using the
per-frame event indices, and dumps pkl packets with the schema consumed by
EventPackDataset.

The reference additionally attaches FastFlowNet optical flow per packet
(its CUDA correlation op is the repo's only native dependency,
train/scripts/utils/fastflownet.py:5); the checkpoint for it is not shipped
in the mirror, so flow fields are optional here: pass `flow_fn` to attach
one (e.g. a Farneback cv2 flow), otherwise packets carry zeros and the
dataset's flow channels are disabled.
"""

from __future__ import annotations

import os
import os.path as op
import pickle
from typing import Callable, Optional

import numpy as np

from v2ce_toolbox_tpu.events import EVENT_DTYPE


def _to_structured(ev_slice: np.ndarray, t_scale: float = 1e6) -> np.ndarray:
    """MVSEC raw events rows are [x, y, t(s), p(+1/-1)]
    (reference: MVSEC_data_utils.py:143-146)."""
    out = np.zeros(len(ev_slice), dtype=EVENT_DTYPE)
    out["x"] = ev_slice[:, 0].astype(np.int16)
    out["y"] = ev_slice[:, 1].astype(np.int16)
    out["timestamp"] = (ev_slice[:, 2] * t_scale).astype(np.int64)
    out["polarity"] = (ev_slice[:, 3] > 0).astype(np.int8)
    return out


def convert_mvsec_h5(
    path: str,
    out_dir: str,
    which: str = "left",
    frames_per_sequence: int = 16,
    max_sequences: Optional[int] = None,
    flow_fn: Optional[Callable] = None,
) -> int:
    """Convert one MVSEC *_data.hdf5 file into packets; returns the number
    of packets written."""
    import h5py

    assert which in ("left", "right")
    prefix = op.basename(path).split(".")[0] + "_" + which
    os.makedirs(out_dir, exist_ok=True)

    with h5py.File(path, "r") as f:
        g = f["davis"][which]
        images = np.array(g["image_raw"])              # (N, H, W) uint8
        image_ts = np.array(g["image_raw_ts"])         # (N,) seconds
        event_inds = np.array(g["image_raw_event_inds"]).astype(np.int64)
        events = np.array(g["events"])                 # (M, 4)
        imu = np.array(g["imu"]) if "imu" in g else np.zeros((0, 6))
        imu_ts = (np.array(g["imu_ts"]) if "imu_ts" in g
                  else np.zeros((0,)))

    n_frames = len(images)
    h, w = images.shape[1:]
    fpp = frames_per_sequence + 1                      # 17 images per packet
    n_packets = (n_frames - 1) // frames_per_sequence
    if max_sequences:
        n_packets = min(n_packets, max_sequences)

    written = 0
    for s in range(n_packets):
        lo = s * frames_per_sequence
        hi = lo + fpp
        if hi > n_frames:
            break
        pkt_images = images[lo:hi]
        pkt_ts = (image_ts[lo:hi] * 1e6).astype(np.int64)

        # per-interval events via the frame->event index map
        # (reference pairs events to frame intervals with leftover carry,
        # MVSEC_data_utils.py:160-210; the index map gives the same cut)
        pkt_events = []
        for i in range(lo, lo + frames_per_sequence):
            a = event_inds[i]
            b = event_inds[i + 1]
            pkt_events.append(_to_structured(events[max(a, 0):max(b, 0)]))

        # nearest-IMU alignment per frame timestamp
        if len(imu_ts):
            idx = np.searchsorted(imu_ts, image_ts[lo:hi])
            idx = np.clip(idx, 0, len(imu) - 1)
            acc = imu[idx][:, 0:3]
            gyro = imu[idx][:, 3:6]
        else:
            acc = np.zeros((fpp, 3))
            gyro = np.zeros((fpp, 3))

        packet = {
            "images": pkt_images,
            "events": pkt_events,
            "accelerometers": acc,
            "gyroscopes": gyro,
            "timestamps": pkt_ts,
        }
        if flow_fn is not None:
            packet["optical_flow"] = flow_fn(pkt_images)
            packet["acc_flow"] = np.cumsum(packet["optical_flow"], axis=0)
        out_path = op.join(out_dir, f"{prefix}_{s:05d}.pkl")
        with open(out_path, "wb") as fo:
            pickle.dump(packet, fo)
        written += 1
    return written


def farneback_flow(images: np.ndarray) -> np.ndarray:
    """cv2 Farneback optical flow between consecutive frames: a host-side
    stand-in for the reference's FastFlowNet (whose weights are not shipped
    in the mirror). (N, H, W) uint8 -> (N-1, 2, H, W) float32."""
    import cv2

    flows = []
    for i in range(len(images) - 1):
        flow = cv2.calcOpticalFlowFarneback(
            images[i], images[i + 1], None,
            pyr_scale=0.5, levels=3, winsize=15, iterations=3,
            poly_n=5, poly_sigma=1.2, flags=0)
        flows.append(np.moveaxis(flow, -1, 0))
    return np.stack(flows).astype(np.float32)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-i", "--h5_path", required=True)
    ap.add_argument("-o", "--out_dir", required=True)
    ap.add_argument("--which", default="left", choices=["left", "right"])
    ap.add_argument("--frames_per_sequence", type=int, default=16)
    ap.add_argument("--max_sequences", type=int, default=None)
    ap.add_argument("--with_flow", action="store_true")
    args = ap.parse_args()
    n = convert_mvsec_h5(args.h5_path, args.out_dir, args.which,
                         args.frames_per_sequence, args.max_sequences,
                         farneback_flow if args.with_flow else None)
    print(f"wrote {n} packets to {args.out_dir}")
