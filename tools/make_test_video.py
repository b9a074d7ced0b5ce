#!/usr/bin/env python
"""Generate a small synthetic grayscale test clip (moving shapes) for
pipeline smoke tests. Writes /tmp/v2ce_test.mp4 by default."""

import argparse

import numpy as np


def make_frames(num_frames=33, height=260, width=346, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:height, 0:width]
    frames = []
    cx, cy = width * 0.3, height * 0.5
    vx, vy = 3.1, 1.3
    for t in range(num_frames):
        img = np.full((height, width), 40, np.float32)
        # moving bright disc
        r2 = (xx - (cx + vx * t)) ** 2 + (yy - (cy + vy * t)) ** 2
        img += 150.0 * (r2 < 30 ** 2)
        # drifting vertical edge
        edge = int(width * 0.7 - 2 * t) % width
        img[:, :edge] += 30
        # static texture + per-frame noise
        img += 10 * np.sin(xx / 7.0) * np.cos(yy / 9.0)
        img += rng.randn(height, width) * 2.0
        frames.append(np.clip(img, 0, 255).astype(np.uint8))
    return np.stack(frames)


def main():
    import cv2

    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out", default="/tmp/v2ce_test.mp4")
    ap.add_argument("-n", "--num_frames", type=int, default=33)
    ap.add_argument("--height", type=int, default=260)
    ap.add_argument("--width", type=int, default=346)
    ap.add_argument("--fps", type=int, default=30)
    args = ap.parse_args()

    frames = make_frames(args.num_frames, args.height, args.width)
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    video = cv2.VideoWriter(args.out, fourcc, args.fps,
                            (args.width, args.height))
    for f in frames:
        video.write(cv2.cvtColor(f, cv2.COLOR_GRAY2BGR))
    video.release()
    print(f"wrote {args.num_frames} frames to {args.out}")


if __name__ == "__main__":
    main()
