"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # the session presets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate" not in flags:
    # virtual devices timeshare the host cores; the default 40 s collective
    # rendezvous kill-switch fires on slow single-core CI boxes
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
os.environ["XLA_FLAGS"] = flags

# sitecustomize may have imported jax already (axon PJRT registration), in
# which case the env var is too late — override through the config API.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_to_path():
    """Make the read-only torch reference importable for golden tests."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def load_reference_module(relpath: str, name: str):
    """Import a single reference file by path, bypassing package __init__
    chains that need unavailable deps (pytorch_lightning, torchvision)."""
    import importlib.util

    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REFERENCE_ROOT, relpath)
    )
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    return module


# ---------------------------------------------------------------------------
# JIT-executable hygiene: the full suite compiles thousands of XLA:CPU
# programs in one process; around ~160 tests in, the accumulated JIT code
# mappings crash the compiler itself (SIGSEGV inside
# backend_compile_and_load — reproduced twice at different tests, each
# passing in isolation; host RAM was 90% free, so it is mapping/code-space
# exhaustion, not OOM). Dropping compiled-executable references between
# test MODULES caps the growth; cross-module shared jits are rare, so the
# recompile cost is small.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()
