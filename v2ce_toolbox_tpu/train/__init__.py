from v2ce_toolbox_tpu.train import losses, metrics  # noqa: F401
