#!/usr/bin/env python
"""Split a video into numbered PNG frames
(reference: tools/video_to_image_sequence.py:10-39)."""

import argparse
import os
import os.path as op
import sys

sys.path.insert(0, op.dirname(op.dirname(op.abspath(__file__))))


def split_video(video_path: str, out_dir: str, max_frames: int = 0,
                gray: bool = False) -> int:
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok or (max_frames and i >= max_frames):
            break
        if gray:
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        cv2.imwrite(op.join(out_dir, f"{i:06d}.png"), frame)
        i += 1
    cap.release()
    return i


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--video", required=True)
    ap.add_argument("-o", "--out_dir", required=True)
    ap.add_argument("--max_frames", type=int, default=0)
    ap.add_argument("--gray", action="store_true")
    args = ap.parse_args()
    n = split_video(args.video, args.out_dir, args.max_frames, args.gray)
    print(f"wrote {n} frames to {args.out_dir}")
