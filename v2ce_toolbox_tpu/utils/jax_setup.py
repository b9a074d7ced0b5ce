"""Process-level JAX configuration helpers.

The 3D-UNet and the sampler compile in O(minutes) on a cold process; the
persistent compilation cache makes every subsequent process start hit the
disk cache instead (critical for CLI/bench workflows that launch fresh
interpreters).
"""

from __future__ import annotations

import os

_DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/v2ce_jax_cache")


def raise_cpu_collective_timeouts():
    """Raise XLA:CPU's collective rendezvous kill-switch (default 40 s).

    On a virtual N-device CPU mesh the devices timeshare the host cores, so
    slower devices legitimately take minutes to reach an all-reduce. Must
    run before the first XLA compilation in the process.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "collective_call_terminate" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags
            + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
            + " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
        ).strip()


def enable_compilation_cache(cache_dir: str = _DEFAULT_CACHE_DIR):
    """Enable JAX's persistent compilation cache (idempotent)."""
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without these flags — best effort
        pass
