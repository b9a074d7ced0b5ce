"""End-to-end video -> voxels -> events pipeline driver.

Orchestrates the full inference flow of the reference CLI
(reference: v2ce.py:282-372) on TPU:

  host: streaming decode + resize (overlapped with device compute — jax
        dispatch is async, so the next window decodes while the current
        one runs)
  device (jit): pair-stack + normalize + 3D-UNet forward (windows batched,
        pano strips folded into the batch axis)
  device: overlap-correct window merge, event-frame rendering, LDATI
        event sampling in fixed-capacity buffers
  host: mp4 writing, npz event dump (int64 timestamps with per-frame
        offsets, v2ce.py:363-366)
"""

from __future__ import annotations

import logging
import os.path as op
import time
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from v2ce_toolbox_tpu.config import PipelineConfig
from v2ce_toolbox_tpu.events import EventStream, to_recarrays
from v2ce_toolbox_tpu.models import V2ce3d
from v2ce_toolbox_tpu.ops.ldati import sample_events
from v2ce_toolbox_tpu.pipeline.infer import make_forward_fn
from v2ce_toolbox_tpu.pipeline.preprocess import resize_frames
from v2ce_toolbox_tpu.pipeline.render import render_event_frames_cmajor
from v2ce_toolbox_tpu.pipeline.windows import plan_windows

import functools


# Bit-packed delta event wire format (device -> host). The event stream
# is nondecreasing in time, so the int32 absolute-µs key compresses to a
# delta_bits-wide delta in a (10 + x_bits + delta_bits)-bit record,
# bit-packed into a dense word stream (ops/bitpack.py):
#   top delta_bits:          delta µs vs previous event (all-ones =
#                marker: the absolute key rides the in-order side list)
#   bits 10..9+x_bits: x, bits 1..9: y, bit 0: polarity
# x_bits is 9 for streams up to 512 px wide and 10 for wider merged-pano
# streams (x >= 512 would otherwise overflow into the delta field and
# corrupt the record — round-5 fix, guarded by
# tests/test_pipeline.py::test_wire_roundtrip_wide_x).
# The side list needs no positions: markers are visible in the delta
# field, so the host pairs them up in order. Its capacity is physical,
# not statistical: every marker means a gap >= the marker value, so a
# chunk spanning span_us holds at most span_us/marker of them (+ first
# events per frame).
#
# delta_bits adapts to stream density (see _fetch_chunk_events): dense
# footage (sub-µs mean gap) ships 3-bit deltas at 2.75 B/event +
# 4 B/marker; sparse streams, where >= 7 µs gaps would make most events
# markers, ship 12-bit deltas at 3.875 B/event with markers only at
# >= 4095 µs gaps (11-bit when x_bits = 10 keeps the record inside one
# word). Both beat the 8 B/event (t, payload) words the round-1 driver
# fetched — the dominant device->host CLI term on tunneled infra
# (PERF.md).
DELTA_BITS = 3
# marker fraction above which the 3-bit format's side list outweighs the
# 12-bit format's wider records: 22n/8 + 4m > 31n/8  <=>  m > 9n/32
_SPARSE_SWITCH = 9 / 32


def _x_bits_for_width(width: int) -> int:
    """x field width: 9 bits covers every single-sensor stream (W <= 512);
    merged pano streams wider than 512 px need 10."""
    return 9 if width <= 512 else 10


def _sparse_delta_bits(x_bits: int) -> int:
    """Widest delta field keeping the record inside one 32-bit word."""
    return min(12, 32 - (10 + x_bits))


def _side_cap(frames: int, cap: int, span_us: int,
              delta_bits: int = DELTA_BITS, monotone: bool = True) -> int:
    """Static side-list capacity. For time-sorted streams the bound is
    physical: every marker means a gap >= the marker value, so a chunk
    spanning span_us holds at most span_us/marker of them. The 'random'
    strategy's streams are NOT time-sorted (reference keeps raw U[0,1)s
    offsets and concatenates per-channel sorts, LDATI.py:173-174,290-300),
    so negative deltas make every event a potential marker — the bound is
    the full event count."""
    marker = (1 << delta_bits) - 1
    bound = span_us // marker + frames + 64 if monotone else frames * cap
    n = min(frames * cap, bound)
    return -(-n // 2048) * 2048


@functools.partial(jax.jit,
                   static_argnames=("frames", "skip_lead", "side_cap",
                                    "delta_bits", "x_bits"))
def _flatten_chunk_stream(s: EventStream, offsets_us: jax.Array,
                          frames: int, skip_lead: int = 0,
                          side_cap: int = 1 << 17,
                          delta_bits: int = DELTA_BITS,
                          x_bits: int = 9):
    """Device-side flatten of a chunk's per-frame event buffers into one
    valid-prefix bit-packed stream (wire format above), roll-compacted so
    the host fetches only ceil(kept/32) word columns instead of frames x
    capacity buffer slots. `skip_lead` drops the first frames (the
    streaming path's last window re-emits only its non-overlapping tail,
    like merge_voxels).

    Returns (words (19 + delta_bits, N/32) uint32, kept, side_key,
    n_side, side_total); side_total > n_side means side overflow (callers
    assert equality; the physical _side_cap bound makes that
    unreachable)."""
    from v2ce_toolbox_tpu.ops.bitpack import pack_bits
    from v2ce_toolbox_tpu.ops.compact_pallas import (
        INVALID, append_rows, compact_rows)

    t_us = s.t_us[:frames]
    cap = t_us.shape[1]
    slot = jax.lax.broadcasted_iota(jnp.int32, t_us.shape, 1)
    valid = slot < s.count[:frames, None]
    if skip_lead:
        frame_row = jax.lax.broadcasted_iota(jnp.int32, t_us.shape, 0)
        valid = valid & (frame_row >= skip_lead)
    keys = jnp.where(valid, t_us + offsets_us[:frames, None], INVALID)
    pbits = 10 + x_bits
    payload = jnp.where(
        valid,
        (s.x[:frames].astype(jnp.int32) << 10)
        | (s.y[:frames].astype(jnp.int32) << 1)
        | s.p[:frames].astype(jnp.int32), 0)
    # Each frame row is a valid PREFIX (slot < count), so the flatten is
    # an append, not a compaction: the butterfly-free kernel runs at
    # roll-place + DMA cost over the frames x capacity buffer.
    out_k, (out_p,), kept, _ = append_rows(
        keys, [payload], cap=frames * cap,
        chunk=min(8192, -(-cap // 128) * 128))
    out_k, out_p, kept = out_k[0], out_p[0], kept[0]

    marker = (1 << delta_bits) - 1
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, out_k.shape[0]), 1)[0]
    in_prefix = idx < kept
    prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), out_k[:-1]])
    delta = out_k - prev                  # first event: its absolute key
    is_exc = in_prefix & ((delta < 0) | (delta >= marker))
    delta_enc = jnp.where(is_exc, marker, jnp.maximum(delta, 0))
    recs = jnp.where(in_prefix, (delta_enc << pbits) | out_p, 0)
    words = pack_bits(recs, pbits + delta_bits)

    side_in = jnp.where(is_exc, idx, INVALID)
    _, (side_key,), n_side, side_total = compact_rows(
        side_in[None], [out_k[None]], cap=side_cap, chunk=8192,
        algo="place")
    return words, kept, side_key[0], n_side[0], side_total[0]


@functools.partial(jax.jit,
                   static_argnames=("scfg", "frames", "fps", "skip_lead",
                                    "side_cap", "delta_bits", "x_bits"))
def _sample_flatten_window(voxels: jax.Array, key: jax.Array,
                           offsets_us: jax.Array, *, scfg, frames: int,
                           fps: int, skip_lead: int = 0,
                           side_cap: int = 1 << 17,
                           delta_bits: int = DELTA_BITS, x_bits: int = 9):
    """Fused sampler + stream flatten: LDATI up to its post-sort
    (frame*bin, W) rows (ops/ldati.sample_events(return_rows=True)), then
    the wire format assembled ON THE ROWS and ONE merge pass emits the
    flat bit-packed stream.

    This replaces the round-4 chain  merge(bins->frame buffers) ->
    append(frames->stream) -> delta/bitpack -> side compaction over the
    flat stream  with  per-row delta/bitpack -> merge(rows->stream) +
    per-row side compaction: the frames x capacity append pass disappears
    and the side pass carries one word instead of two (the deltas are
    computable per row because each sorted row's valids are a prefix and
    the cross-row boundary delta only needs the previous non-empty row's
    last key — a 144-step scan). Stream bytes are identical to the
    unfused path: same candidate rows, same merge order, same delta
    semantics (tests/test_pipeline.py::test_fused_flatten_matches_unfused).

    Returns (words, kept, side_key, n_side, side_total, dropped):
    dropped is the per-frame sampler drop accounting (capacity clipping
    included, exactly as EventStream.dropped reports it)."""
    from v2ce_toolbox_tpu.ops.bitpack import pack_bits
    from v2ce_toolbox_tpu.ops.compact_pallas import (
        INVALID, compact_rows, merge_sorted_rows)
    from v2ce_toolbox_tpu.ops.ldati import sample_events

    f, p, c, h, w = voxels.shape
    cb = c - 1
    kw = scfg.sample_kwargs(fps=fps)
    capacity = kw.pop("capacity")
    strategy = kw["additional_events_strategy"]
    # t0 = 0 is the driver contract (per-frame offsets ride offsets_us);
    # the bin-start decode below reproduces sample_events' t0=0 floats.
    rel, gvox, total_emit, cap_drop = sample_events(
        voxels, key, capacity=capacity, return_rows=True, **kw)
    rr, wd = rel.shape                      # rr = f * cb
    voxel_step = 1.0 / fps / cb

    valid = rel != INVALID
    # per-ROW frame/bin ids (length rr) — broadcast into the (rr, wd)
    # grid; indexing offsets_us at row granularity keeps the lookup a
    # 144-element gather instead of a 2.4M-element one
    row_id = jnp.arange(rr, dtype=jnp.int32)
    frame_row = row_id // cb
    bin_row = row_id % cb
    frame = frame_row[:, None]

    # per-frame capacity clipping, bit-equal to the EventStream path's
    # merge cap (the merge drops the tail of each frame's bin-concat
    # stream beyond cap_eff; rows concatenate in the same order here)
    cap_eff = min(capacity, -(-cb * wd // 128) * 128)
    if cb * wd > cap_eff:
        cnt_row = jnp.sum(valid, axis=1, dtype=jnp.int32)
        csum = jnp.cumsum(cnt_row.reshape(f, cb), axis=1)
        prefix = (csum - cnt_row.reshape(f, cb)).reshape(rr)
        pos = jax.lax.broadcasted_iota(jnp.int32, (rr, wd), 1)
        valid = valid & (prefix[:, None] + pos < cap_eff)

    # sampler drop accounting (before skip_lead, like EventStream.dropped)
    kept_frame = jnp.sum(valid, axis=1, dtype=jnp.int32
                         ).reshape(f, cb).sum(axis=1)
    dropped = total_emit - kept_frame + cap_drop

    # wire-visible events: real frames only, minus the skip_lead overlap
    valid = valid & (frame < frames)
    if skip_lead:
        valid = valid & (frame >= skip_lead)

    # absolute in-chunk µs (identical float exprs to decode_event_stream
    # at t0=0) and the packed (x, y, p) payload
    bin_start_us = ((bin_row.astype(jnp.float32) * voxel_step)
                    * 1e6).astype(jnp.int32)
    off_row = offsets_us[jnp.minimum(frame_row, f - 1)]
    t_abs = rel + (bin_start_us + off_row)[:, None]
    hw = h * w
    rem = gvox % (p * hw)
    p_idx = rem // hw                        # flipped P: 1 = ON
    yx = rem % hw
    payload = ((yx % w) << 10) | ((yx // w) << 1) | p_idx

    # deltas per row: within a row the valids are a sorted prefix, so
    # prev is a shift; the row's first event needs the previous
    # non-empty row's last key (exclusive forward-fill over rr rows)
    t_val = jnp.where(valid, t_abs, jnp.int32(-2147483647))
    last = jnp.max(t_val, axis=1)
    has = jnp.any(valid, axis=1)

    # exclusive forward-fill of the last non-empty row's key: an
    # associative combine (take the right side if it has events), so the
    # 144-row carry runs in log2 vectorized steps instead of a 144-step
    # sequential scan (while-loop iteration overhead measured ~ms-scale)
    def ff2(a, b):
        av, ah = a
        bv, bh = b
        return jnp.where(bh, bv, av), ah | bh

    inc_val, _ = jax.lax.associative_scan(
        ff2, (jnp.where(has, last, 0), has))
    prev_last = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), inc_val[:-1]])
    prev = jnp.concatenate([prev_last[:, None], t_abs[:, :-1]], axis=1)
    delta = t_abs - prev
    marker = (1 << delta_bits) - 1
    pbits = 10 + x_bits
    is_exc = valid & ((delta < 0) | (delta >= marker))
    delta_enc = jnp.where(is_exc, marker, jnp.maximum(delta, 0))
    recs_rows = (delta_enc << pbits) | payload

    flat_cap = rr * wd
    worst_rec = (marker << pbits) | ((w - 1) << 10) | ((h - 1) << 1) | 1
    if 0 <= worst_rec < np.iinfo(np.int32).max:
        # one-word merge: the record itself is the key (INVALID marks
        # empty slots — unreachable for real records by the bound above)
        out_recs, _, kept, _ = merge_sorted_rows(
            jnp.where(valid, recs_rows, INVALID), (), nb=rr, cap=flat_cap)
        # tail slots hold INVALID — deterministic, and the host decode
        # slices to ceil(kept/32) words, so no extra zeroing pass
        recs_flat = out_recs[0]
    else:
        out_t, (out_recs,), kept, _ = merge_sorted_rows(
            jnp.where(valid, t_abs, INVALID),
            [jnp.where(valid, recs_rows, 0)], nb=rr, cap=flat_cap)
        recs_flat = out_recs[0]
    kept = kept[0]
    words = pack_bits(recs_flat, pbits + delta_bits)

    # side list: markers in stream order. Per (frame, bin) row a
    # monotone strategy is bounded physically (row spans one bin:
    # <= span/marker + 1 markers); 'random' rows are non-monotone, so
    # every event can be a marker
    if strategy == "random":
        side_row_cap = wd
        side_chunk = min(4096, wd)
    else:
        # monotone rows span one bin: markers <= span/marker + 1 << 4096;
        # chunk 4096 balances butterfly stages against per-chunk cost
        # (tools/perf_probe.py compact_block sweep)
        side_chunk = 4096 if wd >= 4096 else wd
        side_row_cap = side_chunk
    side_cand = jnp.where(is_exc, t_abs, INVALID)
    side_rows, _, _, ns_tot = compact_rows(
        side_cand, (), cap=side_row_cap, chunk=side_chunk, algo="place")
    # clamp to the physical max (every slot a marker) so an over-generous
    # caller cap can't inflate the merge accumulator
    side_cap_eff = min(-(-side_cap // 128) * 128, rr * side_rows.shape[1])
    side_flat, _, n_side, _ = merge_sorted_rows(
        side_rows, (), nb=rr, cap=side_cap_eff)
    side_total = ns_tot.sum()
    return words, kept, side_flat[0], n_side[0], side_total, dropped


def _fetch_chunk_events_fused(voxels: jax.Array, key: jax.Array,
                              offsets_us: jax.Array, frames: int,
                              scfg, fps: int, skip_lead: int = 0,
                              base_us: int = 0,
                              width: int = 512) -> np.ndarray:
    """Fused-path twin of _fetch_chunk_events: sampler + flatten in one
    dispatch, with the same adaptive dense/sparse wire-format switch."""
    from v2ce_toolbox_tpu.events import EVENT_DTYPE

    f = voxels.shape[0]
    span = int((f + 1) * 1e6 / fps) + 2
    monotone = scfg.additional_events_strategy != "random"
    x_bits = _x_bits_for_width(width)
    bits = DELTA_BITS
    scap = _side_cap(f, scfg.event_capacity, span, bits, monotone)
    words, kept, side_key, n_side, side_total = _sample_flatten_window(
        voxels, key, offsets_us, scfg=scfg, frames=frames, fps=fps,
        skip_lead=skip_lead, side_cap=scap, delta_bits=bits,
        x_bits=x_bits)[:5]
    n, m = int(kept), int(n_side)
    assert int(side_total) == m <= scap, (int(side_total), m, scap)
    if m > n * _SPARSE_SWITCH:
        bits = _sparse_delta_bits(x_bits)
        scap = _side_cap(f, scfg.event_capacity, span, bits, monotone)
        words, kept, side_key, n_side, side_total = _sample_flatten_window(
            voxels, key, offsets_us, scfg=scfg, frames=frames, fps=fps,
            skip_lead=skip_lead, side_cap=scap, delta_bits=bits,
            x_bits=x_bits)[:5]
        n, m = int(kept), int(n_side)
        assert int(side_total) == m <= scap, (int(side_total), m, scap)
    ts, x_, y_, p_ = _decode_packed_events(
        np.asarray(words[:, :-(-n // 32)]), side_key[:m], n,
        delta_bits=bits, x_bits=x_bits)
    out = np.zeros(n, dtype=EVENT_DTYPE)
    out["timestamp"] = ts + np.int64(base_us)
    out["x"], out["y"], out["polarity"] = x_, y_, p_
    return out


def _fused_flatten_ok(scfg, p: int, h: int, w: int, fps: int) -> bool:
    """Gate for the fused sampler+flatten path (falls back to
    sample_events + _flatten_chunk_stream otherwise)."""
    from v2ce_toolbox_tpu.ops.ldati import supports_rows

    return (not scfg.bidirectional
            and scfg.pooling_type in ("none", "avg", "weighted")
            and supports_rows(
                p, h, w, fps=fps,
                additional_events_strategy=scfg.additional_events_strategy,
                pooling_type=scfg.pooling_type))


def _decode_packed_events(words: np.ndarray, side_key: np.ndarray, n: int,
                          delta_bits: int = DELTA_BITS, x_bits: int = 9):
    """Host-side decode of the bit-packed wire format: returns (t_us
    int64, x, y, p). `words` must already be sliced to ceil(n/32) word
    columns; side_key to n_side."""
    from v2ce_toolbox_tpu.ops.bitpack import unpack_bits

    marker = (1 << delta_bits) - 1
    pbits = 10 + x_bits
    recs = unpack_bits(words, pbits + delta_bits, n)
    delta = (recs >> pbits) & marker
    x = ((recs >> 10) & ((1 << x_bits) - 1)).astype(np.int16)
    y = ((recs >> 1) & 0x1FF).astype(np.int16)
    p = (recs & 1).astype(np.int8)
    is_marker = delta == marker
    raw = np.cumsum(np.where(is_marker, 0, delta).astype(np.int64))
    side = np.asarray(side_key).astype(np.int64)
    seg = np.cumsum(is_marker)            # 0 before the first marker
    n_marker = int(seg[-1]) if n else 0
    assert side.shape[0] == n_marker, (side.shape, n_marker)
    base = np.concatenate(
        [np.zeros(1, np.int64), side - raw[np.flatnonzero(is_marker)]])
    ts = raw + base[seg]
    return ts, x, y, p


def _fetch_chunk_events(s: EventStream, offsets_us: jax.Array, frames: int,
                        fps: float, skip_lead: int = 0,
                        base_us: int = 0, width: int = 512,
                        monotone: bool = True) -> np.ndarray:
    """Flatten + fetch + decode one chunk's events as a structured array,
    adapting the wire format to stream density: dispatch the 3-bit-delta
    flatten first (device cost ~1-2 ms), and if its side list says the
    stream is sparse (markers > 9/32 of events, where 2.75 B/event +
    4 B/marker exceeds the 12-bit format's 3.875 B/event), re-dispatch at
    delta_bits=12 and fetch that instead. The density check rides the
    `kept`/`n_side` scalars the exact-length fetch needs anyway, so the
    dense path pays no extra round trip.

    `offsets_us` are CHUNK-LOCAL int32 frame starts; `base_us` is the
    chunk's absolute int64 start, added host-side after decode. The wire
    format itself never sees absolute time, so stream length is unbounded
    (the reference keeps int64 offsets host-side the same way,
    /root/reference/v2ce.py:363-367)."""
    from v2ce_toolbox_tpu.events import EVENT_DTYPE

    span = int((frames + 1) * 1e6 / fps) + 2
    cap = int(s.t_us.shape[1])
    x_bits = _x_bits_for_width(width)
    bits = DELTA_BITS
    scap = _side_cap(frames, cap, span, bits, monotone)
    words, kept, side_key, n_side, side_total = _flatten_chunk_stream(
        s, offsets_us, frames, skip_lead=skip_lead, side_cap=scap,
        delta_bits=bits, x_bits=x_bits)
    n, m = int(kept), int(n_side)
    assert int(side_total) == m <= scap
    if m > n * _SPARSE_SWITCH:
        bits = _sparse_delta_bits(x_bits)
        scap = _side_cap(frames, cap, span, bits, monotone)
        words, kept, side_key, n_side, side_total = _flatten_chunk_stream(
            s, offsets_us, frames, skip_lead=skip_lead, side_cap=scap,
            delta_bits=bits, x_bits=x_bits)
        n, m = int(kept), int(n_side)
        assert int(side_total) == m <= scap
    # exact-length fetch: through the ~0.5 MB/s axon tunnel the transfer
    # volume dominates wall clock (quantizing the slice length to reuse
    # compiled shapes fetched 2.4x more bytes and measured slower e2e)
    ts, x_, y_, p_ = _decode_packed_events(
        np.asarray(words[:, :-(-n // 32)]), side_key[:m], n,
        delta_bits=bits, x_bits=x_bits)
    out = np.zeros(n, dtype=EVENT_DTYPE)
    out["timestamp"] = ts + np.int64(base_us)
    out["x"], out["y"], out["polarity"] = x_, y_, p_
    return out

logger = logging.getLogger(__name__)


def load_variables(model: V2ce3d, model_path: Optional[str], *,
                   height: int = 260, width: int = 346):
    """Load stage-1 weights: a torch checkpoint (converted) or random init.

    The reference loads `weights/v2ce_3d.pt` (v2ce.py:30-43); that blob is
    not shipped in the mirror, so a seeded random init is the fallback.
    """
    if model_path and op.exists(model_path):
        if model_path.endswith((".pt", ".pth")):
            from v2ce_toolbox_tpu.utils.torch_compat import load_torch_checkpoint

            logger.info("converting torch checkpoint %s", model_path)
            return load_torch_checkpoint(model_path)
        from v2ce_toolbox_tpu.utils.checkpoint import load_checkpoint

        return load_checkpoint(model_path)
    logger.warning(
        "model checkpoint %s not found — using seeded random init", model_path
    )
    dummy = jnp.zeros((1, 2, height, width, 2), jnp.float32)
    return model.init(jax.random.key(0), dummy, train=False)


class V2cePipeline:
    """Video/image-sequence -> event stream converter (stage 1 + stage 2)."""

    def __init__(self, config: PipelineConfig = PipelineConfig(),
                 model_path: Optional[str] = None, mesh=None):
        """mesh: optional jax.sharding.Mesh with a 'data' axis — window
        batches shard across its chips (embarrassingly parallel)."""
        self.config = config
        self.mesh = mesh
        if config.model.out_layout != "cl":
            # the driver's voxel handling (window merge, channel-major
            # reshape for the sampler, renders) assumes channels-last
            # model output; 'cm' is a measured probe option
            # (tools/perf_probe.py window_fused_cm, PERF.md round 3) that
            # would silently scramble stage 2 here
            raise ValueError(
                "V2cePipeline requires ModelConfig.out_layout='cl'; "
                f"got {config.model.out_layout!r} (probe-only option)")
        self.model = V2ce3d(config=config.model)
        self.variables = load_variables(
            self.model, model_path, height=config.height, width=config.width
        )
        self._fwd_cache = {}

    # -- stage 1 ----------------------------------------------------------

    def _forward_fn(self, resized_width: int):
        key = (self.config.infer_type, resized_width)
        if key not in self._fwd_cache:
            self._fwd_cache[key] = make_forward_fn(
                self.model,
                self.variables,
                infer_type=self.config.infer_type,
                width=self.config.width,
                resized_width=resized_width,
                mesh=self.mesh,
            )
        return self._fwd_cache[key]

    def video_to_voxels(self, *, vidcap=None, image_paths=None) -> jax.Array:
        """Run stage 1 over a whole video; returns merged device voxels
        in CHANNEL-MAJOR layout (T, 20, H, W_out), T = frame_count - 1
        (reference: v2ce.py:131-209 keeps (T, 2, 10, H, W)).

        Channel-major on device because TPU (8,128) tiling pads the minor
        dims: (T, H, W, 20) f32 expands 6.4x (14.7 GB at 320 frames —
        an HBM OOM waiting past ~350 frames) while (T, 20, H, W) pads
        only W 346->384 (1.11x)."""
        cfg = self.config
        assert vidcap is not None or image_paths is not None
        frame_count = (
            vidcap.frame_count if vidcap is not None else len(image_paths)
        )
        starts, mode = plan_windows(frame_count, cfg.seq_len)

        window_outputs: List[jax.Array] = []
        batch_frames: List[np.ndarray] = []

        def flush():
            if not batch_frames:
                return
            frames = np.stack(batch_frames, axis=0)  # (b, L+1, H, W')
            real = frames.shape[0]
            if self.mesh is not None:
                # pad to a multiple of the data axis (sharding needs even
                # division); padded windows are sliced off below
                n_dp = self.mesh.shape["data"]
                pad = -real % n_dp
                if pad:
                    frames = np.concatenate(
                        [frames, np.repeat(frames[-1:], pad, axis=0)], axis=0)
            fwd = self._forward_fn(frames.shape[-1])
            out = fwd(jnp.asarray(frames))
            window_outputs.append(
                jnp.transpose(out[:real], (0, 1, 4, 2, 3)))
            batch_frames.clear()

        for start in starts:
            idx = range(int(start), int(start) + cfg.seq_len + 1)
            if vidcap is not None:
                raw = vidcap.read_frames_at_indices(idx)
            else:
                from v2ce_toolbox_tpu.io.video import read_gray_images

                raw = read_gray_images([image_paths[i] for i in idx])
            batch_frames.append(resize_frames(raw, cfg.height))
            if len(batch_frames) == cfg.batch_size:
                flush()
        flush()

        windows = jnp.concatenate(window_outputs, axis=0)  # (S, L, 20, H, W)
        return self._merge(windows, mode)

    @staticmethod
    def _merge(windows: jax.Array, mode: int) -> jax.Array:
        s, seq_len = windows.shape[:2]
        parts = []
        if s > 1:
            parts.append(
                windows[:-1].reshape((s - 1) * seq_len, *windows.shape[2:])
            )
        last = windows[-1]
        parts.append(last[-mode:] if mode != 0 else last)
        return jnp.concatenate(parts, axis=0)

    # -- stage 2 ----------------------------------------------------------

    def voxels_to_events(self, voxels: jax.Array,
                         key: Optional[jax.Array] = None) -> List[np.ndarray]:
        """Merged voxels (T, 20, H, W) -> per-frame event recarrays with
        absolute int64 µs timestamps (reference: v2ce.py:351-367)."""
        cfg = self.config
        if key is None:
            key = jax.random.key(0)
        t, c, h, w = voxels.shape
        v = voxels.reshape(t, 2, c // 2, h, w)      # already channel-major

        chunk = cfg.stage2_batch_size
        n_chunks = -(-t // chunk)
        pad = n_chunks * chunk - t
        if pad:
            v = jnp.concatenate(
                [v, jnp.zeros((pad, *v.shape[1:]), v.dtype)], axis=0
            )
        streams = []
        for i in range(n_chunks):
            streams.append(
                sample_events(
                    v[i * chunk:(i + 1) * chunk],
                    jax.random.fold_in(key, i),
                    **cfg.sampler.sample_kwargs(fps=cfg.fps),
                )
            )
        recs: List[np.ndarray] = []
        for i, s in enumerate(streams):
            base = i * chunk
            offsets = (
                (np.arange(chunk) + base) / cfg.fps * 1e6
            ).astype(np.int64)
            recs.extend(to_recarrays(s, offsets))
        return recs[:t]

    def voxels_to_event_stream(self, voxels: jax.Array,
                               key: Optional[jax.Array] = None) -> np.ndarray:
        """Like voxels_to_events but emits ONE concatenated structured
        stream, applying the per-frame i/fps offsets of v2ce.py:363-367.

        The per-chunk streams are flattened ON DEVICE (roll-compaction of
        the fixed-capacity frame buffers into one valid-prefix array with
        (x, y, p) packed into an int32 payload), so only the actual events
        cross to the host — the fixed buffers are ~85-95% empty and
        fetching them measured ~1.6 GB per 321-frame video through the
        TPU tunnel. The wire format is chunk-rebased (int64 chunk base +
        int32 in-chunk offsets), so any video length works."""
        cfg = self.config
        if key is None:
            key = jax.random.key(0)
        t, c, h, w = voxels.shape
        v = voxels.reshape(t, 2, c // 2, h, w)      # already channel-major
        chunk = cfg.stage2_batch_size
        n_chunks = -(-t // chunk)
        pad = n_chunks * chunk - t
        if pad:
            v = jnp.concatenate(
                [v, jnp.zeros((pad, *v.shape[1:]), v.dtype)], axis=0)

        fused = _fused_flatten_ok(cfg.sampler, 2, h, w, cfg.fps)
        parts = []
        for i in range(n_chunks):
            base = i * chunk
            frames = min(chunk, t - base)
            offsets64 = ((np.arange(chunk) + base) / cfg.fps * 1e6
                         ).astype(np.int64)
            base_us = int(offsets64[0])
            rel = offsets64 - base_us           # in-chunk: spans chunk/fps s
            assert rel[-1] + 2e6 < 2 ** 31
            rel_j = jnp.asarray(rel.astype(np.int32))
            ckey = jax.random.fold_in(key, i)
            if fused:
                parts.append(_fetch_chunk_events_fused(
                    v[i * chunk:(i + 1) * chunk], ckey, rel_j, frames,
                    cfg.sampler, cfg.fps, base_us=base_us, width=w))
                continue
            s = sample_events(
                v[i * chunk:(i + 1) * chunk], ckey,
                **cfg.sampler.sample_kwargs(fps=cfg.fps),
            )
            parts.append(_fetch_chunk_events(
                s, rel_j, frames, cfg.fps, base_us=base_us, width=w,
                monotone=cfg.sampler.additional_events_strategy
                != "random"))
        return np.concatenate(parts) if parts else np.zeros(0)

    # -- full run ---------------------------------------------------------

    def run(self, *, input_video_path: Optional[str] = None,
            image_folder: Optional[str] = None,
            out_folder: str = "./output",
            out_name_suffix: str = "") -> dict:
        """Full CLI-equivalent run; returns paths + stats."""
        import os

        from v2ce_toolbox_tpu.io.video import (
            VideoReader,
            list_image_frames,
            write_video,
        )

        cfg = self.config
        assert (input_video_path is None) != (image_folder is None)
        os.makedirs(out_folder, exist_ok=True)

        if image_folder is not None:
            name = op.basename(op.normpath(image_folder))
        else:
            name = op.splitext(op.basename(input_video_path))[0]
        output_name = f"{name}-ceil_{cfg.ceil}-fps_{cfg.fps}"
        if out_name_suffix:
            output_name += f"-{out_name_suffix}"

        t_start = time.time()
        if image_folder is not None:
            paths = list_image_frames(image_folder, cfg.max_frame_num)
            voxels = self.video_to_voxels(image_paths=paths)
            n_frames = len(paths)
        else:
            vidcap = VideoReader(input_video_path, color_mode="GRAY")
            if cfg.max_frame_num and vidcap.frame_count > cfg.max_frame_num:
                vidcap.frame_count = cfg.max_frame_num
            voxels = self.video_to_voxels(vidcap=vidcap)
            n_frames = vidcap.frame_count
            vidcap.close()

        t_, c_, h_, w_ = voxels.shape
        result = {"voxels_shape": (t_, h_, w_, c_)}   # logical, channels-last

        if cfg.write_event_frame_video:
            frames = render_event_frames_cmajor(
                voxels,
                ceil=float(cfg.ceil),
                upper_bound_percentile=cfg.upper_bound_percentile,
                keep_polarity=cfg.vis_keep_polarity,
            )
            vis_color = "rgb" if cfg.vis_keep_polarity else "gray"
            ef_path = op.join(
                out_folder,
                f"{cfg.infer_type}-{output_name}-pred_ef_{vis_color}.mp4",
            )
            write_video(frames, ef_path, cfg.fps)
            result["event_frame_video"] = ef_path

        event_stream = self.voxels_to_event_stream(voxels)
        ev_path = op.join(out_folder, f"{output_name}-events.npz")
        np.savez(ev_path, event_stream=event_stream)
        result.update(
            event_stream_path=ev_path,
            num_events=int(event_stream.shape[0]),
            num_frames=n_frames,
            wall_time_s=time.time() - t_start,
        )
        logger.info(
            "%d frames -> %d events in %.2fs",
            n_frames, result["num_events"], result["wall_time_s"],
        )
        return result

    def run_streaming(self, *, input_video_path: Optional[str] = None,
                      image_folder: Optional[str] = None,
                      out_folder: str = "./output",
                      out_name_suffix: str = "") -> dict:
        """Streaming CLI run: each 16-frame window flows decode -> forward
        -> sampler -> device flatten -> host event fetch, with only the
        per-polarity event-frame sums (for the preview's global percentile
        bound) retained on device. Voxels never accumulate: memory is
        O(window) instead of O(video), and the per-window event fetches
        overlap the next window's device compute via async dispatch.

        Event totals are identical to run() (emission counts are a
        deterministic function of the voxels; the last window re-emits
        only its non-overlapping tail, matching merge_voxels). Timestamp
        draws differ in RNG chunking (16-frame windows vs
        stage2_batch_size chunks) — the same distributional contract as
        the reference.
        """
        import os

        from v2ce_toolbox_tpu.io.video import (
            VideoReader,
            list_image_frames,
            read_gray_images,
            write_video,
        )
        from v2ce_toolbox_tpu.pipeline.render import (
            render_event_frames_from_sums,
        )

        cfg = self.config
        assert (input_video_path is None) != (image_folder is None)
        os.makedirs(out_folder, exist_ok=True)
        if image_folder is not None:
            name = op.basename(op.normpath(image_folder))
            paths = list_image_frames(image_folder, cfg.max_frame_num)
            frame_count = len(paths)
            vidcap = None
        else:
            name = op.splitext(op.basename(input_video_path))[0]
            vidcap = VideoReader(input_video_path, color_mode="GRAY")
            if cfg.max_frame_num and vidcap.frame_count > cfg.max_frame_num:
                vidcap.frame_count = cfg.max_frame_num
            frame_count = vidcap.frame_count
        output_name = f"{name}-ceil_{cfg.ceil}-fps_{cfg.fps}"
        if out_name_suffix:
            output_name += f"-{out_name_suffix}"

        t_start = time.time()
        starts, mode = plan_windows(frame_count, cfg.seq_len)
        key = jax.random.key(0)

        parts: List[np.ndarray] = []
        ef_sums: List[jax.Array] = []
        h_out = w_out = None
        # With a mesh, each forward dispatch carries n_dp DISTINCT windows
        # round-robined onto the batch axis (sharded chip-local by
        # make_forward_fn) — every chip computes a different window. The
        # per-window sampler keys fold_in the GLOBAL window index, so the
        # emitted stream is identical to the single-chip run.
        n_dp = self.mesh.shape["data"] if self.mesh is not None else 1
        for g in range(0, len(starts), n_dp):
            group = starts[g:g + n_dp]
            frame_stack = []
            for start in group:
                idx = range(int(start), int(start) + cfg.seq_len + 1)
                if vidcap is not None:
                    raw = vidcap.read_frames_at_indices(idx)
                else:
                    raw = read_gray_images([paths[j] for j in idx])
                frame_stack.append(resize_frames(raw, cfg.height))
            frames_in = np.stack(frame_stack, axis=0)   # (k, L+1, H, W')
            if len(group) < n_dp:
                # pad the final group (sharding needs even division);
                # padded windows are never sampled
                frames_in = np.concatenate(
                    [frames_in,
                     np.repeat(frames_in[-1:], n_dp - len(group), axis=0)],
                    axis=0)
            fwd = self._forward_fn(frames_in.shape[-1])
            vox_all = fwd(jnp.asarray(frames_in))   # (n_dp, 16, H, W, 20)
            for j, start in enumerate(group):
                i = g + j
                vox = vox_all[j]
                h_out, w_out = vox.shape[1], vox.shape[2]
                v = jnp.transpose(vox, (0, 3, 1, 2)).reshape(
                    cfg.seq_len, 2, vox.shape[-1] // 2, *vox.shape[1:3])

                is_last = i == len(starts) - 1
                skip = (cfg.seq_len - mode) if (is_last and mode) else 0
                offsets64 = ((np.arange(cfg.seq_len) + int(start)) / cfg.fps
                             * 1e6).astype(np.int64)
                base_us = int(offsets64[0])     # window-rebased: any length
                if cfg.write_event_frame_video:
                    ef_sums.append(v.sum(axis=2)[skip:])  # (16-skip,2,H,W)
                rel_j = jnp.asarray((offsets64 - base_us).astype(np.int32))
                wkey = jax.random.fold_in(key, i)
                if _fused_flatten_ok(cfg.sampler, 2, h_out, w_out, cfg.fps):
                    parts.append(_fetch_chunk_events_fused(
                        v, wkey, rel_j, cfg.seq_len, cfg.sampler, cfg.fps,
                        skip_lead=skip, base_us=base_us, width=w_out))
                else:
                    s = sample_events(
                        v, wkey, **cfg.sampler.sample_kwargs(fps=cfg.fps))
                    parts.append(_fetch_chunk_events(
                        s, rel_j, cfg.seq_len, cfg.fps, skip_lead=skip,
                        base_us=base_us, width=w_out,
                        monotone=cfg.sampler.additional_events_strategy
                        != "random"))
        if vidcap is not None:
            vidcap.close()

        result = {"voxels_shape": (frame_count - 1, h_out, w_out,
                                   cfg.model.out_channels)}
        if cfg.write_event_frame_video:
            frames8 = render_event_frames_from_sums(
                jnp.concatenate(ef_sums, axis=0),
                ceil=float(cfg.ceil),
                upper_bound_percentile=cfg.upper_bound_percentile,
                keep_polarity=cfg.vis_keep_polarity,
            )
            vis_color = "rgb" if cfg.vis_keep_polarity else "gray"
            ef_path = op.join(
                out_folder,
                f"{cfg.infer_type}-{output_name}-pred_ef_{vis_color}.mp4",
            )
            write_video(frames8, ef_path, cfg.fps)
            result["event_frame_video"] = ef_path

        event_stream = (np.concatenate(parts) if parts else np.zeros(0))
        ev_path = op.join(out_folder, f"{output_name}-events.npz")
        np.savez(ev_path, event_stream=event_stream)
        result.update(
            event_stream_path=ev_path,
            num_events=int(event_stream.shape[0]),
            num_frames=frame_count,
            wall_time_s=time.time() - t_start,
        )
        logger.info(
            "[streaming] %d frames -> %d events in %.2fs",
            frame_count, result["num_events"], result["wall_time_s"],
        )
        return result
