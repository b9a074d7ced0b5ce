#!/usr/bin/env python
"""V2CE CLI — video to DVS event stream, TPU-native.

Flag-for-flag mirror of the reference CLI (reference: v2ce.py:282-372):

    python v2ce.py -i input.mp4 -t center -b 4
    python v2ce.py -f frames_dir -t pano --max_frame_num 321

Outputs an event-frame preview mp4 and a `<name>-events.npz` structured
event stream, with the reference's naming scheme.
"""

import argparse
import logging
import os
import os.path as op


def SBool(v):
    # reference: v2ce.py:19-27
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--fps", type=int, default=30, help="FPS of the output video")
    p.add_argument("--seq_len", type=int, default=16, help="Sequence length")
    p.add_argument("--ceil", type=int, default=10, help="The ceiling of the ef value")
    p.add_argument("-u", "--upper_bound_percentile", type=int, default=98,
                   help="Percentile of nonzero ef values bounding visualization")
    p.add_argument("-f", "--image_folder", type=str,
                   help="Folder containing .png frames to infer")
    p.add_argument("-i", "--input_video_path", type=str,
                   help="Path to the input video")
    p.add_argument("-o", "--out_folder", type=str, default="./output",
                   help="Folder for outputs")
    p.add_argument("-t", "--infer_type", type=str, default="center",
                   choices=["center", "pano"], help="Inference mode")
    p.add_argument("-m", "--model_path", type=str, default="./weights/v2ce_3d.pt",
                   help="Stage-1 checkpoint (torch .pt is auto-converted)")
    p.add_argument("--out_name_suffix", type=str, default="")
    p.add_argument("--max_frame_num", type=int, default=1800)
    p.add_argument("--width", type=int, default=346)
    p.add_argument("--height", type=int, default=260)
    p.add_argument("--write_event_frame_video", type=SBool, default=True,
                   nargs="?", const=True)
    p.add_argument("--vis_keep_polarity", type=SBool, default=True,
                   nargs="?", const=True)
    p.add_argument("-l", "--log_level", type=str, default="info")
    p.add_argument("-b", "--batch_size", type=int, default=1)
    p.add_argument("--stage2_batch_size", type=int, default=24)
    p.add_argument("--streaming", type=SBool, default=False, nargs="?",
                   const=True,
                   help="stream windows end-to-end (decode -> forward -> "
                        "sampler -> packed event fetch per window): O(window) "
                        "device memory and fetches overlapped with compute")
    p.add_argument("--bf16", type=SBool, default=False, nargs="?", const=True,
                   help="run the stage-1 model with bfloat16 compute + "
                        "activations (faster on TPU; voxel values differ "
                        "from float32 at the 3rd decimal)")
    p.add_argument("--stage2_strategy", type=str, default="slope",
                   choices=["slope", "random", "none"],
                   help="LDATI additional-events strategy (the reference "
                        "CLI hardcodes slope, v2ce.py:356)")
    p.add_argument("--stage2_pooling", type=str, default="none",
                   choices=["none", "avg", "weighted"],
                   help="spatial pooling before the slope fit")
    p.add_argument("--stage2_sort_cap", type=int, default=1 << 14,
                   help="pre-sort per-(frame,bin) row compaction width in "
                        "the v3 sampler core; 0 disables. Overflow beyond "
                        "any capacity knob is counted in `dropped` exactly")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=getattr(logging, args.log_level.upper()))

    assert args.image_folder is not None or args.input_video_path is not None, \
        "one of -f/--image_folder or -i/--input_video_path is required"
    assert not (args.image_folder and args.input_video_path), \
        "only one of -f and -i may be given"
    for path in (args.image_folder, args.input_video_path):
        if path is not None:
            assert os.path.exists(path), f"{path} does not exist"

    import jax.numpy as jnp

    from v2ce_toolbox_tpu.config import (
        ModelConfig,
        PipelineConfig,
        SamplerConfig,
    )
    from v2ce_toolbox_tpu.pipeline.driver import V2cePipeline
    from v2ce_toolbox_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    config = PipelineConfig(
        model=ModelConfig(
            compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32),
        infer_type=args.infer_type,
        seq_len=args.seq_len,
        height=args.height,
        width=args.width,
        batch_size=args.batch_size,
        fps=args.fps,
        max_frame_num=args.max_frame_num,
        ceil=args.ceil,
        upper_bound_percentile=args.upper_bound_percentile,
        vis_keep_polarity=args.vis_keep_polarity,
        stage2_batch_size=args.stage2_batch_size,
        write_event_frame_video=args.write_event_frame_video,
        sampler=SamplerConfig(
            fps=args.fps,
            additional_events_strategy=args.stage2_strategy,
            pooling_type=args.stage2_pooling,
            sort_cap=args.stage2_sort_cap or None,
        ),
    )
    pipeline = V2cePipeline(config, model_path=args.model_path)
    run = pipeline.run_streaming if args.streaming else pipeline.run
    result = run(
        input_video_path=args.input_video_path,
        image_folder=args.image_folder,
        out_folder=args.out_folder,
        out_name_suffix=args.out_name_suffix,
    )
    print(result)
    return result


if __name__ == "__main__":
    main()
