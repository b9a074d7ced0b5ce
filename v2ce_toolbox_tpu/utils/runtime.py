"""Runtime utilities: logging, timers, experiment working tree, profiling.

Equivalents of the reference's utils (reference:
train/scripts/utils/utils.py:18-195): init_logging (stdout + file),
build_working_tree (timestamped experiment dirs), Timer / tic_toc, plus
TPU-native additions: a jax.profiler trace context and a debug-mode switch
that enables NaN checking (the reference's closest artifact is the NaN
tripwire in its GAN discriminator, train/scripts/model/gan.py:72-97).
"""

from __future__ import annotations

import contextlib
import functools
import logging
import os
import os.path as op
import time
from typing import Optional


def init_logging(log_dir: Optional[str] = None, level: str = "INFO",
                 filename: str = "log.txt"):
    """stdout + optional file logging (reference: utils.py:18-58)."""
    handlers = [logging.StreamHandler()]
    if log_dir is not None:
        os.makedirs(log_dir, exist_ok=True)
        handlers.append(logging.FileHandler(op.join(log_dir, filename)))
    logging.basicConfig(
        level=getattr(logging, level.upper()),
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
        handlers=handlers,
        force=True,
    )


def build_working_tree(root: str, exp_name: Optional[str] = None) -> dict:
    """Create the per-experiment directory tree
    (reference: utils.py:118-141: tb_logs/checkpoints/recorder/profile).
    Rank-aware: reuses RUN_TIMESTAMP so multi-process launches share a tree."""
    ts = os.environ.setdefault("RUN_TIMESTAMP",
                               time.strftime("%Y%m%d-%H%M%S"))
    name = exp_name or ts
    base = op.join(root, name)
    tree = {
        "base": base,
        "logs": op.join(base, "logs"),
        "checkpoints": op.join(base, "checkpoints"),
        "recorder": op.join(base, "recorder"),
        "profile": op.join(base, "profile"),
    }
    if int(os.environ.get("LOCAL_RANK", 0)) == 0:
        for p in tree.values():
            os.makedirs(p, exist_ok=True)
    return tree


class Timer:
    """Context-manager wall-clock timer (reference: utils.py:163-178)."""

    def __init__(self, name: str = "timer", logger=None):
        self.name = name
        self.logger = logger or logging.getLogger(__name__)

    def __enter__(self):
        self.start = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.time() - self.start
        self.logger.info("%s took %.4fs", self.name, self.elapsed)


def tic_toc(fn):
    """Decorator timing each call (reference: utils.py:181-195)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.time()
        out = fn(*args, **kwargs)
        logging.getLogger(fn.__module__).info(
            "%s took %.4fs", fn.__name__, time.time() - t0)
        return out

    return wrapper


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context: writes a TensorBoard-compatible xplane
    trace of TPU execution (TPU-native replacement for the reference's
    ad-hoc CUDA-event timing, scripts/LDATI.py:313-322)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_debug_checks(nans: bool = True):
    """Debug mode: trap NaNs/Infs inside jit (TPU equivalent of the
    reference's tensor-dumping NaN tripwires, gan.py:72-97)."""
    import jax

    if nans:
        jax.config.update("jax_debug_nans", True)
        jax.config.update("jax_debug_infs", True)
