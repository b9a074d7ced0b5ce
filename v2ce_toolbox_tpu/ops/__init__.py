from v2ce_toolbox_tpu.ops.ldati import (  # noqa: F401
    relocate_counts,
    slope_params,
    sample_events,
    sample_voxel_statistical,
)
