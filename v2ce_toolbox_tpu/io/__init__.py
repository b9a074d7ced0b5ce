from v2ce_toolbox_tpu.io.video import VideoReader, write_video  # noqa: F401
