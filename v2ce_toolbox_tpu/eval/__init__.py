from v2ce_toolbox_tpu.eval.stage2_metrics import (  # noqa: F401
    ts_diff_metric,
    event_count_ratio,
    roundtrip_voxel_consistency,
)
