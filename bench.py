#!/usr/bin/env python
"""End-to-end throughput benchmark: video frames -> DVS events, per chip.

Measures the steady-state device pipeline (stage-1 3D-UNet forward on
16-frame windows + on-device LDATI event sampling + the driver's stream
flatten) on synthetic 260x346 input — the reference's README workload
geometry (reference: readme.md:23, scripts/LDATI.py:329). Host video
decode is excluded (it overlaps device compute in the real pipeline and
is not the TPU's bottleneck).

Prints the headline JSON line FIRST:
  {"metric": "e2e_frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / 300.0, "stage1_*": ...}
then (best-effort, within the time budget) a second line repeating the
headline fields plus "e2e_cli_frames_per_sec" from the full 321-frame CLI
workload. Round 3 lost its entire bench artifact because the CLI
measurement ran first and starved the headline of budget (VERDICT.md
weak #1) — the cheap, always-available number now prints before the
expensive one, and every subprocess is individually time-bounded.

vs_baseline is against the BASELINE.md north star of >= 10x realtime at
30 FPS (300 frames/s) per chip; the reference repo publishes no numbers
of its own (BASELINE.md).

Process structure: the axon TPU tunnel admits ONE process at a time, so
the orchestrating parent never opens a TPU client — the device bench runs
as `bench.py --device-only` in a subprocess (also usable standalone for
device-only A/Bs), and the CLI runs v2ce.py subprocesses afterwards.

Timing notes: through the axon tunnel `block_until_ready` does not
reliably block, so we queue N iterations that are data-dependent chained
and fetch one scalar at the end. The scalar CHECKSUMS EVERY OUTPUT FIELD
— fetching only a count let XLA dead-code-eliminate the sampler's sort in
round 1 (PERF.md).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Total wall-clock budget (s). The round-3 driver killed bench.py at
# ~600 s; leave headroom below that by default.
BUDGET_S = float(os.environ.get("V2CE_BENCH_BUDGET_S", "540"))


def main():
    t_start = time.time()

    def remaining():
        return BUDGET_S - (time.time() - t_start)

    # 1. Device records (ONE subprocess; parent stays off the TPU tunnel).
    # The child prints the guaranteed f32 contract headline first, then a
    # best-effort bf16 production-config record (tagged "dtype": "bf16";
    # fidelity record: PERF.md bf16_fidelity). Both dtypes share one
    # process because the per-process warm cost through the tunnel is
    # ~200 s EVEN ON COMPILE-CACHE HITS (measured round 4) — two separate
    # subprocesses cannot fit the 540 s budget, while the shared sampler
    # executable makes the bf16 add-on ~100 s. The parent STREAMS child
    # stdout so the f32 line survives even if the bf16 tail is killed.
    headline = None
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--device-only", "--with-bf16"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    deadline = t_start + min(BUDGET_S - 60.0, 480.0)
    import selectors
    sel = selectors.DefaultSelector()
    sel.register(child.stdout, selectors.EVENT_READ)
    n_records = 0
    while child.poll() is None and time.time() < deadline:
        if not sel.select(timeout=1.0):
            continue
        line = child.stdout.readline()
        if not line:
            break
        line = line.strip()
        if line.startswith("{"):
            print(line, flush=True)           # forward the instant it lands
            if headline is None:
                headline = json.loads(line)
            n_records += 1
            if n_records >= 2:
                break  # both records in; don't wait out client teardown
    if child.poll() is None:
        child.kill()
        if n_records < 2:
            print("# device bench killed at deadline (records so far kept)",
                  file=sys.stderr)
    if headline is None:
        print(f"# device bench emitted no JSON (rc={child.returncode})",
              file=sys.stderr)
        # Emit a parseable failure record rather than nothing.
        print(json.dumps(
            {"metric": "e2e_frames_per_sec_per_chip", "value": None,
             "unit": "frames/s", "vs_baseline": None}), flush=True)

    # 2. CLI wall clock (best-effort; the headline is already out).
    cli_fps = None
    try:
        if remaining() > 120:
            cli_fps = round(cli_wall_clock(num_frames=321,
                                           budget_s=remaining() - 10), 2)
    except Exception as e:  # noqa: BLE001
        print(f"# e2e CLI measurement failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    if cli_fps is not None:
        # Repeat the headline fields so the record stays self-contained
        # whichever line a consumer parses.
        print(json.dumps({**headline, "e2e_cli_frames_per_sec": cli_fps}),
              flush=True)


def device_bench(bf16: bool = False, mfu: bool = True,
                 with_bf16: bool = False):
    """In-process device pipeline benchmark; prints the headline JSON.

    bf16=False is the contract headline (BASELINE.md fidelity gate binds
    per-voxel counts to the f32 torch reference); bf16=True measures the
    TPU production inference config (`v2ce.py --bf16`) and tags the JSON
    with "dtype" so the two records never get conflated. with_bf16=True
    (--with-bf16) prints the f32 record first, then the bf16 record from
    the SAME process — the sampler executable is dtype-independent and
    per-process warm costs ~200 s through the tunnel even on compile-cache
    hits, so sharing the process is what lets both records fit the driver
    budget (round-4 measurement)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.config import ModelConfig, SamplerConfig
    from v2ce_toolbox_tpu.models import V2ce3d
    from v2ce_toolbox_tpu.ops.ldati import sample_events
    from v2ce_toolbox_tpu.pipeline.preprocess import normalize_pairs
    from v2ce_toolbox_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    seq_len, h, w = 16, 260, 346
    scfg = SamplerConfig()
    rng = np.random.RandomState(0)
    frames0 = jnp.asarray(rng.rand(1, seq_len + 1, h, w).astype(np.float32))
    variables = None

    from v2ce_toolbox_tpu.pipeline.driver import _sample_flatten_window

    offsets_us = jnp.asarray(
        (np.arange(seq_len) / 30 * 1e6).astype(np.int32))

    @jax.jit
    def sample(voxels, key):
        v = jnp.transpose(voxels[0], (0, 3, 1, 2)).reshape(
            seq_len, 2, 10, h, w)
        # The round-5 driver path: sampler + wire-format flatten fused
        # into one dispatch (pipeline/driver._sample_flatten_window).
        # Consume EVERY output field: returning only the count lets XLA
        # dead-code-eliminate the timestamp sort entirely (discovered in
        # round 2 — the round-1 number was measured sort-free).
        words, kept, side_key, n_side, side_total, dropped = (
            _sample_flatten_window(v, key, offsets_us, scfg=scfg,
                                   frames=seq_len, fps=30))
        return ((words % 97).sum().astype(jnp.int32)
                + (side_key % 83).sum() + n_side + side_total
                + kept + dropped.sum()).astype(jnp.float32)

    n_iters = 20
    dtypes = [(jnp.bfloat16, True)] if bf16 else [(jnp.float32, mfu)]
    if with_bf16 and not bf16:
        # the f32 record keeps the MFU audit; the bf16 add-on skips it
        # (duplicate lower().compile() = a second executable load; its
        # FLOP count equals f32's — 2178 vs 2177 GF measured)
        dtypes = [(jnp.float32, mfu), (jnp.bfloat16, False)]

    for compute_dtype, with_mfu in dtypes:
        is_bf16 = compute_dtype == jnp.bfloat16

        model = V2ce3d(config=ModelConfig(compute_dtype=compute_dtype))
        if variables is None:
            variables = model.init(jax.random.key(0),
                                   frames0[:, :3, :, :, None].repeat(2, -1),
                                   train=False)

        # Driver-style execution: forward and sampler as SEPARATE jits
        # with async chained dispatches and one final fetch — how the
        # real pipeline runs. (Fusing both into one jit measured 136
        # ms/window vs the 82 ms sum of parts — an XLA layout-assignment
        # pathology, PERF.md round 3; separate dispatches queue
        # server-side so the timing stays valid through the axon tunnel.)
        @jax.jit
        def fwd(frames, model=model):
            units = normalize_pairs(frames)
            return model.apply(variables, units,
                               train=False)  # (1,16,H,W,20)

        def run(n, key):
            acc = jnp.zeros((), jnp.float32)
            for i in range(n):
                voxels = fwd(frames0 + acc * 1e-12)    # chained dependency
                acc = acc + sample(voxels,
                                   jax.random.fold_in(key, i)) * 1e-20
            return float(np.asarray(acc))

        key = jax.random.key(0)
        t_wall = time.time()
        _ = run(2, key)                                # compile + warm
        print(f"# warm({'bf16' if is_bf16 else 'f32'}) done at "
              f"+{time.time() - t_wall:.0f}s", file=sys.stderr)
        t0 = time.time()
        total = run(n_iters, key)
        elapsed = max(time.time() - t0, 1e-9)
        assert np.isfinite(total)

        frames_per_sec = n_iters * seq_len / elapsed

        # Self-auditing MFU: XLA cost-analysis FLOPs of the stage-1
        # forward (the FLOP-dominant stage; reference analog: thop
        # GFLOPs in train/scripts/tools/speed_test.py:28-44) over the
        # measured window time, against the v5e bf16 MXU peak.
        stage1 = {}
        try:
            if not with_mfu:
                raise StopIteration  # skip quietly
            cost = fwd.lower(frames0).compile().cost_analysis()
            model_flops = float(cost.get("flops", 0.0))
            stage1_s = timed_stage1_seconds(fwd, frames0, np, jnp, jax)
            v5e_peak = 197e12
            stage1 = {
                "stage1_ms_per_window": round(stage1_s * 1e3, 2),
                "stage1_gflops_per_window": round(model_flops / 1e9, 1),
                "stage1_tflops_per_sec": round(
                    model_flops / stage1_s / 1e12, 1),
                "stage1_mfu_vs_v5e_bf16_peak": round(
                    model_flops / stage1_s / v5e_peak, 4),
            }
        except StopIteration:
            pass
        except Exception as e:  # noqa: BLE001
            print(f"# MFU measurement failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

        print(json.dumps({
            "metric": "e2e_frames_per_sec_per_chip",
            "value": round(frames_per_sec, 2),
            "unit": "frames/s",
            "vs_baseline": round(frames_per_sec / 300.0, 4),
            **({"dtype": "bf16"} if is_bf16 else {}),
            **stage1,
        }), flush=True)


def timed_stage1_seconds(fwd, frames0, np, jnp, jax, n_iters=10):
    """Stage-1-only window time via the chained-dispatch recipe."""
    import time as _t

    def run(n):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(n):
            acc = acc + fwd(frames0 + acc * 1e-12).sum() * 1e-20
        return float(np.asarray(acc))

    _ = run(2)
    t0 = _t.time()
    r = run(n_iters)
    assert np.isfinite(r)
    return max(_t.time() - t0, 1e-9) / n_iters


def cli_wall_clock(num_frames: int = 321, budget_s: float = 1e9) -> float:
    """Run the full CLI (decode -> voxels -> events -> mp4 + npz) on a
    synthetic clip and return frames/sec of the timed warm run.

    e2e_cli_frames_per_sec: full CLI wall clock on the reference README
    workload (321 frames @ 30 fps, center; readme.md:23): decode ->
    model -> sampler -> event-frame mp4 + npz, host paths included."""
    import tempfile

    from tools.make_test_video import make_frames

    import cv2

    deadline = time.time() + budget_s
    with tempfile.TemporaryDirectory() as td:
        clip = os.path.join(td, "bench_clip.mp4")
        frames = make_frames(num_frames=num_frames)
        vw = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                             (346, 260))
        for fr in frames:
            vw.write(cv2.cvtColor(fr, cv2.COLOR_GRAY2BGR))
        vw.release()

        def run(max_frames):
            t0 = time.time()
            subprocess.run(
                [sys.executable, os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "v2ce.py"),
                 "-i", clip, "-t", "center", "--max_frame_num",
                 str(max_frames), "-o", td],
                check=True, capture_output=True,
                timeout=max(deadline - time.time(), 1.0))
            return time.time() - t0

        run(33)                         # compile warm-up (cached afterwards)
        dt = run(num_frames)
        return num_frames / dt


if __name__ == "__main__":
    if "--device-only" in sys.argv[1:]:
        device_bench(bf16="--bf16" in sys.argv[1:],
                     mfu="--no-mfu" not in sys.argv[1:],
                     with_bf16="--with-bf16" in sys.argv[1:])
    else:
        main()
