from v2ce_toolbox_tpu.ops.ldati import (  # noqa: F401
    compact_frame_events,
    relocate_counts,
    slope_params,
    sample_events,
    sample_voxel_statistical,
)
from v2ce_toolbox_tpu.ops.samplers import (  # noqa: F401
    sample_events_baseline,
    sample_events_pure_slope,
    sample_voxel_baseline,
    sample_voxel_pure_slope,
)
