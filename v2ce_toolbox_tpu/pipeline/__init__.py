from v2ce_toolbox_tpu.pipeline.windows import (  # noqa: F401
    plan_windows,
    merge_window_voxels,
)
from v2ce_toolbox_tpu.pipeline.preprocess import (  # noqa: F401
    resize_frames,
    normalize_pairs,
)
from v2ce_toolbox_tpu.pipeline.infer import make_forward_fn  # noqa: F401
from v2ce_toolbox_tpu.pipeline.render import render_event_frames  # noqa: F401
from v2ce_toolbox_tpu.pipeline.driver import V2cePipeline  # noqa: F401
