"""Roll-based stream compaction — the TPU-native replacement for
sort/gather compaction in the LDATI sampler.

Problem: emitting a compacted event stream from a mostly-empty candidate
grid needs a stable compaction, and every XLA primitive for it is slow on
TPU at sampler scale (measured, tools/perf_probe.py: sort 0.4-0.8 Gelem/s,
gathers 0.2-1.9 Gelem/s, scatter serializes). This kernel compacts with
VECTOR ROLLS instead:

  1. each kernel step concatenates the carried partial chunk with the next
     input chunk into a 2-chunk window [pending valids | gap | incoming];
  2. the window is front-packed by pull-based butterfly routing: each
     valid element's displacement is the number of invalid slots before it
     (an exclusive prefix sum — log2(W) rolled adds), and stage k moves an
     element down by 2^k iff bit k of its remaining displacement is set.
     LSB-first pull routing is collision-free for compaction
     displacements: adjacent valid elements have equal deltas unless an
     invalid separates them, and delta_i <= i keeps every move in-bounds
     (validated exhaustively in tests/test_compact.py);
  3. when the window holds >= chunk valids, its first chunk is DMA'd to
     the next chunk-aligned output slot (so every DMA is a whole
     (S, 128) tile — aligned and non-overlapping) and the second half
     becomes the new carry; the last step flushes the remainder.

Cost: ~45 vector ops per 2048-element chunk ~= 25x less VPU work than a
bitonic sort of the same volume, no gathers, no scatters.

Rows are compacted independently (grid dim 0) with chunks sequential
(carry + offsets in scratch). Payload arrays route along with the keys.
Chunks that would overflow the output capacity are dropped whole
(counted, never silent).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INVALID = jnp.iinfo(jnp.int32).max
_LANES = 128


def _roll(x, shift, axis):
    """pltpu.roll with any-sign static shift (pltpu requires >= 0)."""
    size = x.shape[axis]
    shift %= size
    if shift == 0:
        return x
    return pltpu.roll(x, shift, axis=axis)


def _flat_pull(x, d, fill, lane_idx, flat_idx, c):
    """y[f] = x[f + d] for f + d < c else fill (flat row-major order over
    the (S, 128) tile); d > 0 static."""
    r, l = divmod(d, _LANES)
    a = _roll(x, -r, axis=0)
    if l == 0:
        y = a
    else:
        b = _roll(x, -(r + 1), axis=0)
        al = _roll(a, -l, axis=1)
        bl = _roll(b, _LANES - l, axis=1)
        y = jnp.where(lane_idx < _LANES - l, al, bl)
    return jnp.where(flat_idx + d < c, y, fill)


def _flat_push(x, d, fill, lane_idx, flat_idx):
    """y[f] = x[f - d] for f >= d else fill; d > 0 static."""
    r, l = divmod(d, _LANES)
    a = _roll(x, r, axis=0)
    if l == 0:
        y = a
    else:
        b = _roll(x, r + 1, axis=0)
        al = _roll(a, l, axis=1)
        bl = _roll(b, l - _LANES, axis=1)
        y = jnp.where(lane_idx >= l, al, bl)
    return jnp.where(flat_idx >= d, y, fill)


def _front_pack(key, pays, lane, flat, window):
    """Stable-compact the (S, 128) window: valids to the front in order.
    Returns (key, pays, valid_count)."""
    s = window // _LANES
    inv = (key == INVALID).astype(jnp.int32)
    scan = inv
    d = 1
    while d < window:
        scan = scan + _flat_push(scan, d, 0, lane, flat)
        d <<= 1
    delta = jnp.where(key != INVALID, scan - inv, 0)
    cnt = window - scan[s - 1, _LANES - 1]

    # Invariant: INVALID slots always carry delta == 0 — established by
    # the init above and maintained by the delta-zeroing update below
    # (a slot that goes INVALID gets delta 0; a pulled slot inherits a
    # valid source's delta). So the routing masks need only the delta
    # bit: `pull` can skip the src_key validity test (invalid sources
    # have no delta bits set) and `keep` can skip the key test (an
    # INVALID slot with keep=True keeps key=INVALID and payload garbage
    # that is never observable — outputs are masked to the kept prefix).
    # Saves 4 of ~28 vector ops per routing stage (measured A/B:
    # PERF.md round 5).
    d = 1
    while d < window:
        src_key = _flat_pull(key, d, INVALID, lane, flat, window)
        src_delta = _flat_pull(delta, d, 0, lane, flat, window)
        pull = (src_delta & d) != 0
        keep = (delta & d) == 0
        new_key = jnp.where(pull, src_key, jnp.where(keep, key, INVALID))
        new_pays = []
        for p in pays:
            src_p = _flat_pull(p, d, 0, lane, flat, window)
            new_pays.append(jnp.where(pull, src_p,
                                      jnp.where(keep, p, 0)))
        delta = jnp.where(pull, src_delta - d, jnp.where(keep, delta, 0))
        key, pays = new_key, new_pays
        d <<= 1
    return key, pays, cnt


def _compact_kernel(keys_ref, *rest, chunk, n_chunks, cap_chunks,
                    n_payloads):
    payload_refs = rest[:n_payloads]
    out_keys = rest[n_payloads]
    out_payloads = rest[n_payloads + 1:n_payloads + 1 + n_payloads]
    carry = rest[n_payloads + 1 + n_payloads]    # VMEM (1+P, S, 128)
    send = rest[n_payloads + 2 + n_payloads]     # VMEM (1+P, S, 128)
    state = rest[-2]            # SMEM: [pend, cidx, total, kept]
    sem = rest[-1]

    r = pl.program_id(0)
    ci = pl.program_id(1)
    window = 2 * chunk
    sw = window // _LANES
    sc = chunk // _LANES

    @pl.when(ci == 0)
    def _():
        state[0] = 0
        state[1] = 0
        state[2] = 0
        state[3] = 0
        carry[...] = jnp.full_like(carry, INVALID)

    lane = jax.lax.broadcasted_iota(jnp.int32, (sw, _LANES), 1)
    flat = (jax.lax.broadcasted_iota(jnp.int32, (sw, _LANES), 0) * _LANES
            + lane)

    key = jnp.concatenate([carry[0], keys_ref[0, 0]], axis=0)
    pays = [jnp.concatenate([carry[1 + i], payload_refs[i][0, 0]], axis=0)
            for i in range(n_payloads)]

    key, pays, cnt = _front_pack(key, pays, lane, flat, window)
    # cnt counts ALL window valids, i.e. carried pend + new arrivals
    pend = state[0]
    total = cnt
    state[2] = state[2] + (cnt - pend)

    cidx = state[1]
    emit_full = (total >= chunk) & (cidx < cap_chunks)

    @pl.when(emit_full)
    def _():
        # window holds >= chunk valids, so its first chunk is all-valid
        send[0] = key[:sc]
        for i in range(n_payloads):
            send[1 + i] = pays[i][:sc]
        copy = pltpu.make_async_copy(send.at[0], out_keys.at[r, cidx], sem)
        copy.start()
        copy.wait()
        for i in range(n_payloads):
            copy = pltpu.make_async_copy(
                send.at[1 + i], out_payloads[i].at[r, cidx], sem)
            copy.start()
            copy.wait()
        state[1] = cidx + 1
        state[3] = state[3] + chunk

    # new carry: second half when a chunk left the window (emitted OR
    # dropped at capacity — the drop is exact via total - kept), else the
    # front-packed first half (total < chunk fits entirely there)
    popped = total >= chunk
    carry[0] = jnp.where(popped, key[sc:], key[:sc])
    for i in range(n_payloads):
        carry[1 + i] = jnp.where(popped, pays[i][sc:], pays[i][:sc])
    state[0] = jnp.where(popped, total - chunk, total)

    @pl.when(ci == n_chunks - 1)
    def _():
        # flush the carried partial chunk to the next aligned slot
        cidx2 = state[1]

        @pl.when((state[0] > 0) & (cidx2 < cap_chunks))
        def _():
            copy = pltpu.make_async_copy(carry.at[0],
                                         out_keys.at[r, cidx2], sem)
            copy.start()
            copy.wait()
            for i in range(n_payloads):
                copy = pltpu.make_async_copy(
                    carry.at[1 + i], out_payloads[i].at[r, cidx2], sem)
                copy.start()
                copy.wait()
            state[3] = state[3] + state[0]

        # counts ride in a dedicated trailing chunk slot of the keys
        # output (TPU-aligned SMEM/VMEM per-row blocks are not
        # expressible): lane 0 = kept, lane 1 = total
        lane0 = jax.lax.broadcasted_iota(
            jnp.int32, (chunk // _LANES, _LANES), 1)
        counts_tile = jnp.where(
            lane0 == 0, state[3], jnp.where(lane0 == 1, state[2], 0))
        send[0] = counts_tile
        copy = pltpu.make_async_copy(send.at[0],
                                     out_keys.at[r, cap_chunks], sem)
        copy.start()
        copy.wait()


def _compact_kernel2(keys_ref, *rest, chunk, n_steps, bc, cap_chunks,
                     n_payloads):
    """Place-based variant of _compact_kernel: front-pack ONLY the
    incoming chunk (half the butterfly volume of the 2-chunk window),
    then rotate it to the pending offset of a 2-chunk VMEM accumulator
    (one dynamic lane roll + a masked window write, as in _merge_kernel).
    Same contract and drop semantics as _compact_kernel.

    Each grid step carries `bc` chunks (block_chunks): the per-step body
    loops over the block's chunks, so Mosaic's grid sequencing / revolving
    buffer overhead amortizes over bc chunks instead of paying per chunk
    (measured: the per-grid-step overhead was a third of the chain
    compaction's cost at bc=1, tools/perf_probe.py compact_block)."""
    payload_refs = rest[:n_payloads]
    out_keys = rest[n_payloads]
    out_payloads = rest[n_payloads + 1:n_payloads + 1 + n_payloads]
    acc = rest[n_payloads + 1 + n_payloads]      # VMEM (1+P, 2*sc+1, 128)
    send = rest[n_payloads + 2 + n_payloads]     # VMEM (1+P, sc, 128)
    state = rest[-2]            # SMEM: [pend, cidx, total, kept]
    sem = rest[-1]

    r = pl.program_id(0)
    bi = pl.program_id(1)
    sc = chunk // _LANES

    lane = jax.lax.broadcasted_iota(jnp.int32, (sc, _LANES), 1)
    flat = (jax.lax.broadcasted_iota(jnp.int32, (sc, _LANES), 0) * _LANES
            + lane)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (sc + 1, _LANES), 1)

    for sub in range(bc):
        if sub == 0:
            @pl.when(bi == 0)
            def _():
                state[0] = 0
                state[1] = 0
                state[2] = 0
                state[3] = 0
                acc[0] = jnp.full_like(acc[0], INVALID)
                for i in range(n_payloads):
                    acc[1 + i] = jnp.zeros_like(acc[1 + i])

        key = keys_ref[0, sub]
        pays = [payload_refs[i][0, sub] for i in range(n_payloads)]
        key, pays, cnt = _front_pack(key, pays, lane, flat, chunk)

        pend = state[0]
        state[2] = state[2] + cnt

        # place the packed chunk into acc at flat offset pend
        rr = pend // _LANES
        ll = pend % _LANES
        gflat = (rr + jax.lax.broadcasted_iota(
            jnp.int32, (sc + 1, _LANES), 0)) * _LANES + lane2
        window = (gflat >= pend) & (gflat < pend + cnt)

        def place(tile, fill, slot, ll=ll, window=window, rr=rr):
            padded = jnp.concatenate(
                [tile, jnp.full((1, _LANES), fill, tile.dtype)], axis=0)
            al = pltpu.roll(padded, ll, axis=1)
            bl = pltpu.roll(_roll(padded, 1, axis=0), ll, axis=1)
            shifted = jnp.where(lane2 >= ll, al, bl)
            region = acc[slot, pl.ds(rr, sc + 1)]
            acc[slot, pl.ds(rr, sc + 1)] = jnp.where(window, shifted,
                                                     region)

        place(key, INVALID, 0)
        for i in range(n_payloads):
            place(pays[i], 0, 1 + i)

        new_pend = pend + cnt
        cidx = state[1]

        @pl.when((new_pend >= chunk) & (cidx < cap_chunks))
        def _(cidx=cidx):
            send[0] = acc[0, :sc]
            for i in range(n_payloads):
                send[1 + i] = acc[1 + i, :sc]
            copy = pltpu.make_async_copy(send.at[0], out_keys.at[r, cidx],
                                         sem)
            copy.start()
            copy.wait()
            for i in range(n_payloads):
                copy = pltpu.make_async_copy(
                    send.at[1 + i], out_payloads[i].at[r, cidx], sem)
                copy.start()
                copy.wait()
            state[1] = cidx + 1
            state[3] = state[3] + chunk

        # pop the first chunk when full (emitted, or dropped whole at
        # capacity — exact via total - kept): shift acc down by sc rows
        @pl.when(new_pend >= chunk)
        def _():
            fills = [jnp.full((sc, _LANES), INVALID, jnp.int32)] + [
                jnp.zeros((sc, _LANES), jnp.int32)] * n_payloads
            for slot in range(1 + n_payloads):
                acc[slot] = jnp.concatenate(
                    [acc[slot, sc:], fills[slot]], axis=0)

        state[0] = jnp.where(new_pend >= chunk, new_pend - chunk, new_pend)

        if sub == bc - 1:
            @pl.when(bi == n_steps - 1)
            def _():
                cidx2 = state[1]

                @pl.when((state[0] > 0) & (cidx2 < cap_chunks))
                def _():
                    send[0] = acc[0, :sc]
                    copy = pltpu.make_async_copy(send.at[0],
                                                 out_keys.at[r, cidx2], sem)
                    copy.start()
                    copy.wait()
                    for i in range(n_payloads):
                        send[1 + i] = acc[1 + i, :sc]
                        copy = pltpu.make_async_copy(
                            send.at[1 + i], out_payloads[i].at[r, cidx2],
                            sem)
                        copy.start()
                        copy.wait()
                    state[3] = state[3] + state[0]

                lane0 = jax.lax.broadcasted_iota(jnp.int32, (sc, _LANES), 1)
                counts_tile = jnp.where(
                    lane0 == 0, state[3],
                    jnp.where(lane0 == 1, state[2], 0))
                send[0] = counts_tile
                copy = pltpu.make_async_copy(send.at[0],
                                             out_keys.at[r, cap_chunks],
                                             sem)
                copy.start()
                copy.wait()


def _append_kernel(keys_ref, *rest, chunk, n_rows, n_steps, bc, cap_chunks,
                   n_payloads):
    """Append-based collapse of R prefix-packed rows into ONE stream:
    `_compact_kernel2` with the per-chunk butterfly front-pack removed
    (each incoming chunk's valids are REQUIRED to already sit at the
    chunk front — true for any row whose valids form a prefix, e.g. the
    sampler's per-frame event buffers) and with the carry state living
    across row boundaries, so the grid walks (row, chunk) blocks and the
    output is a single row. This keeps the hot path at pure
    roll-place + DMA cost, ~log2(chunk) butterfly stages cheaper per
    chunk than 'place', and never reshapes rows together (a chunk never
    straddles two rows, so the prefix precondition survives any row
    width)."""
    payload_refs = rest[:n_payloads]
    out_keys = rest[n_payloads]
    out_payloads = rest[n_payloads + 1:n_payloads + 1 + n_payloads]
    acc = rest[n_payloads + 1 + n_payloads]      # VMEM (1+P, 2*sc+1, 128)
    send = rest[n_payloads + 2 + n_payloads]     # VMEM (1+P, sc, 128)
    state = rest[-2]            # SMEM: [pend, cidx, total, kept]
    sem = rest[-1]

    r = pl.program_id(0)
    bi = pl.program_id(1)
    sc = chunk // _LANES
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (sc + 1, _LANES), 1)

    for sub in range(bc):
        if sub == 0:
            @pl.when((r == 0) & (bi == 0))
            def _():
                state[0] = 0
                state[1] = 0
                state[2] = 0
                state[3] = 0
                acc[0] = jnp.full_like(acc[0], INVALID)
                for i in range(n_payloads):
                    acc[1 + i] = jnp.zeros_like(acc[1 + i])

        key = keys_ref[0, sub]
        pays = [payload_refs[i][0, sub] for i in range(n_payloads)]
        cnt = jnp.sum((key != INVALID).astype(jnp.int32))

        pend = state[0]
        state[2] = state[2] + cnt

        # place the (already packed) chunk into acc at flat offset pend
        rr = pend // _LANES
        ll = pend % _LANES
        gflat = (rr + jax.lax.broadcasted_iota(
            jnp.int32, (sc + 1, _LANES), 0)) * _LANES + lane2
        window = (gflat >= pend) & (gflat < pend + cnt)

        def place(tile, fill, slot, ll=ll, window=window, rr=rr):
            padded = jnp.concatenate(
                [tile, jnp.full((1, _LANES), fill, tile.dtype)], axis=0)
            al = pltpu.roll(padded, ll, axis=1)
            bl = pltpu.roll(_roll(padded, 1, axis=0), ll, axis=1)
            shifted = jnp.where(lane2 >= ll, al, bl)
            region = acc[slot, pl.ds(rr, sc + 1)]
            acc[slot, pl.ds(rr, sc + 1)] = jnp.where(window, shifted,
                                                     region)

        @pl.when(cnt > 0)
        def _(key=key, pays=pays, place=place):
            place(key, INVALID, 0)
            for i in range(n_payloads):
                place(pays[i], 0, 1 + i)

        new_pend = pend + cnt
        cidx = state[1]

        @pl.when((new_pend >= chunk) & (cidx < cap_chunks))
        def _(cidx=cidx):
            send[0] = acc[0, :sc]
            for i in range(n_payloads):
                send[1 + i] = acc[1 + i, :sc]
            copy = pltpu.make_async_copy(send.at[0], out_keys.at[0, cidx],
                                         sem)
            copy.start()
            copy.wait()
            for i in range(n_payloads):
                copy = pltpu.make_async_copy(
                    send.at[1 + i], out_payloads[i].at[0, cidx], sem)
                copy.start()
                copy.wait()
            state[1] = cidx + 1
            state[3] = state[3] + chunk

        @pl.when(new_pend >= chunk)
        def _():
            fills = [jnp.full((sc, _LANES), INVALID, jnp.int32)] + [
                jnp.zeros((sc, _LANES), jnp.int32)] * n_payloads
            for slot in range(1 + n_payloads):
                acc[slot] = jnp.concatenate(
                    [acc[slot, sc:], fills[slot]], axis=0)

        state[0] = jnp.where(new_pend >= chunk, new_pend - chunk, new_pend)

        if sub == bc - 1:
            @pl.when((r == n_rows - 1) & (bi == n_steps - 1))
            def _():
                cidx2 = state[1]

                @pl.when((state[0] > 0) & (cidx2 < cap_chunks))
                def _():
                    send[0] = acc[0, :sc]
                    copy = pltpu.make_async_copy(send.at[0],
                                                 out_keys.at[0, cidx2], sem)
                    copy.start()
                    copy.wait()
                    for i in range(n_payloads):
                        send[1 + i] = acc[1 + i, :sc]
                        copy = pltpu.make_async_copy(
                            send.at[1 + i], out_payloads[i].at[0, cidx2],
                            sem)
                        copy.start()
                        copy.wait()
                    state[3] = state[3] + state[0]

                lane0 = jax.lax.broadcasted_iota(jnp.int32, (sc, _LANES), 1)
                counts_tile = jnp.where(
                    lane0 == 0, state[3],
                    jnp.where(lane0 == 1, state[2], 0))
                send[0] = counts_tile
                copy = pltpu.make_async_copy(send.at[0],
                                             out_keys.at[0, cap_chunks],
                                             sem)
                copy.start()
                copy.wait()


def _merge_kernel(keys_ref, *rest, nb, sr, s_out, cap, n_payloads):
    """Append each of the nb sorted rows' valid prefixes into one
    (cap,)-stream per output row, entirely in VMEM."""
    payload_refs = rest[:n_payloads]
    out_keys = rest[n_payloads]
    out_payloads = rest[n_payloads + 1:2 * n_payloads + 1]
    acc = rest[2 * n_payloads + 1]         # VMEM (1+P, s_out + sr + 1, 128)
    state = rest[-2]                       # SMEM [pos]
    sem = rest[-1]

    fi = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _():
        state[0] = 0
        acc[0] = jnp.full_like(acc[0], INVALID)
        for i in range(n_payloads):
            acc[1 + i] = jnp.zeros_like(acc[1 + i])

    lane = jax.lax.broadcasted_iota(jnp.int32, (sr + 1, _LANES), 1)
    pos = state[0]
    row_key = keys_ref[0, 0]
    length = jnp.sum((row_key != INVALID).astype(jnp.int32))

    r = pos // _LANES
    l = pos % _LANES

    def place(tile, fill, slot):
        padded = jnp.concatenate(
            [tile, jnp.full((1, _LANES), fill, tile.dtype)], axis=0)
        al = pltpu.roll(padded, l, axis=1)
        bl = pltpu.roll(_roll(padded, 1, axis=0), l, axis=1)
        shifted = jnp.where(lane >= l, al, bl)
        # global flat index of each target slot in the acc buffer
        gflat = (r + jax.lax.broadcasted_iota(
            jnp.int32, (sr + 1, _LANES), 0)) * _LANES + lane
        window = (gflat >= pos) & (gflat < pos + length)
        region = acc[slot, pl.ds(r, sr + 1)]
        acc[slot, pl.ds(r, sr + 1)] = jnp.where(window, shifted, region)

    @pl.when(pos < cap)
    def _():
        place(row_key, INVALID, 0)
        for i in range(n_payloads):
            place(payload_refs[i][0, 0], 0, 1 + i)

    state[0] = pos + length

    @pl.when(b == nb - 1)
    def _():
        copy = pltpu.make_async_copy(acc.at[0, pl.ds(0, s_out)],
                                     out_keys.at[fi], sem)
        copy.start()
        copy.wait()
        for i in range(n_payloads):
            copy = pltpu.make_async_copy(
                acc.at[1 + i, pl.ds(0, s_out)],
                out_payloads[i].at[fi], sem)
            copy.start()
            copy.wait()


@functools.partial(jax.jit, static_argnames=("nb", "cap"))
def merge_sorted_rows(keys: jax.Array, payloads: Sequence[jax.Array] = (),
                      *, nb: int, cap: int
                      ) -> Tuple[jax.Array, Tuple[jax.Array, ...],
                                 jax.Array, jax.Array]:
    """Concatenate the valid prefixes of nb consecutive rows into one
    row — the frame-merge step of the v3 sampler, replacing a full
    roll-compaction of the (f, nb*W) grid (the bins are time-disjoint and
    individually sorted, so appending their prefixes preserves global
    order).

    Each output row is assembled in VMEM: the incoming row is
    lane/sublane-rotated to the current write position (dynamic
    pltpu.roll) and masked into the accumulator — O(nb * W) vector ops
    per frame versus the compactor's O(nb * W * log) butterfly stages.

    Args:
      keys: (R, W) int32, R % nb == 0; each row sorted with INVALID
        tail. W % 128 == 0.
      payloads: same-shape int32 arrays routed with the keys.
      cap: output capacity per merged row (128-multiple).
    Returns:
      (out_keys (R//nb, cap), out_payloads, kept (R//nb,), total):
      kept == min(total, cap); events beyond cap are dropped exactly.
    """
    r, wdt = keys.shape
    payloads = tuple(payloads)
    assert r % nb == 0 and wdt % _LANES == 0 and cap % _LANES == 0
    f = r // nb
    sr = wdt // _LANES
    s_out = cap // _LANES
    n_pay = len(payloads)

    def shape4(a):
        return a.reshape(f, nb, sr, _LANES)

    interpret = jax.default_backend() != "tpu"
    in_specs = [pl.BlockSpec((1, 1, sr, _LANES),
                             lambda fi, bi: (fi, bi, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(1 + n_pay)]
    out_shapes = [jax.ShapeDtypeStruct((f, s_out, _LANES), jnp.int32)
                  for _ in range(1 + n_pay)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.ANY)
                 for _ in range(1 + n_pay)]

    outs = pl.pallas_call(
        functools.partial(_merge_kernel, nb=nb, sr=sr, s_out=s_out,
                          cap=cap, n_payloads=n_pay),
        grid=(f, nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((1 + n_pay, s_out + sr + 1, _LANES), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(shape4(keys), *[shape4(p) for p in payloads])

    total = jnp.sum((keys != INVALID).astype(jnp.int32)
                    .reshape(f, nb * wdt), axis=1)
    kept = jnp.minimum(total, cap)
    idx = jax.lax.broadcasted_iota(jnp.int32, (f, cap), 1)
    mask = idx < kept[:, None]
    out_keys = jnp.where(mask, outs[0].reshape(f, cap), INVALID)
    out_pays = tuple(jnp.where(mask, o.reshape(f, cap), 0)
                     for o in outs[1:])
    return out_keys, out_pays, kept, total


@functools.partial(jax.jit, static_argnames=("cap", "chunk",
                                             "block_chunks"))
def append_rows(keys: jax.Array, payloads: Sequence[jax.Array] = (),
                *, cap: int, chunk: int = 8192, block_chunks: int = 1
                ) -> Tuple[jax.Array, Tuple[jax.Array, ...],
                           jax.Array, jax.Array]:
    """Collapse R prefix-packed rows into ONE front-packed stream.

    PRECONDITION: within every row, valid (key != INT32_MAX) elements
    form a prefix — e.g. fixed-capacity per-frame event buffers. Rows
    whose valids are scattered need `compact_rows` (full front-pack);
    this kernel skips the per-chunk butterfly entirely and runs at
    roll-place + DMA cost (the driver's stream-flatten hot path).

    Args:
      keys: (R, W) int32, INT32_MAX marks empty; each row prefix-packed.
      payloads: same-shape int32 arrays routed with the keys.
      cap: output capacity (rounded up to a chunk multiple).
      block_chunks: chunks carried per grid step (amortizes Mosaic's
        per-step sequencing overhead; the carry state spans blocks).
    Returns:
      (out_keys (1, cap'), out_payloads, kept (1,), total (1,)):
      kept == min(total, cap'); overflow beyond cap is dropped in whole
      chunks, counted exactly via total - kept.
    """
    r, n = keys.shape
    payloads = tuple(payloads)
    assert chunk % _LANES == 0, chunk
    bc = max(1, min(block_chunks, -(-n // chunk)))
    if n % (chunk * bc):
        pad = chunk * bc - n % (chunk * bc)
        # per-row tail padding preserves each row's prefix structure
        keys = jnp.pad(keys, ((0, 0), (0, pad)), constant_values=INVALID)
        payloads = tuple(jnp.pad(p, ((0, 0), (0, pad))) for p in payloads)
        n += pad
    n_chunks = n // chunk
    n_steps = n_chunks // bc
    n_pay = len(payloads)
    cap_chunks = -(-cap // chunk)
    cap_pad = cap_chunks * chunk
    sc = chunk // _LANES

    def shape4(a):
        return a.reshape(r, n_chunks, sc, _LANES)

    interpret = jax.default_backend() != "tpu"
    in_specs = [pl.BlockSpec((1, bc, sc, _LANES),
                             lambda ri, bi: (ri, bi, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(1 + n_pay)]
    out_shapes = (
        [jax.ShapeDtypeStruct((1, cap_chunks + 1, sc, _LANES), jnp.int32)]
        + [jax.ShapeDtypeStruct((1, cap_chunks, sc, _LANES), jnp.int32)
           for _ in range(n_pay)])
    out_specs = [pl.BlockSpec(memory_space=pltpu.ANY)
                 for _ in range(1 + n_pay)]

    outs = pl.pallas_call(
        functools.partial(_append_kernel, chunk=chunk, n_rows=r,
                          n_steps=n_steps, bc=bc, cap_chunks=cap_chunks,
                          n_payloads=n_pay),
        grid=(r, n_steps),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((1 + n_pay, 2 * sc + 1, _LANES), jnp.int32),  # acc
            pltpu.VMEM((1 + n_pay, sc, _LANES), jnp.int32),          # send
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(shape4(keys), *[shape4(p) for p in payloads])

    keys_and_counts = outs[0]
    kept = keys_and_counts[:1, cap_chunks, 0, 0]
    total = keys_and_counts[:1, cap_chunks, 0, 1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, cap_pad), 1)
    mask = idx < kept[:, None]
    out_keys = jnp.where(
        mask, keys_and_counts[:1, :cap_chunks].reshape(1, cap_pad), INVALID)
    out_pays = tuple(jnp.where(mask, o.reshape(1, cap_pad), 0)
                     for o in outs[1:1 + n_pay])
    return out_keys, out_pays, kept, total


@functools.partial(jax.jit, static_argnames=("cap", "chunk", "algo",
                                             "block_chunks"))
def compact_rows(keys: jax.Array, payloads: Sequence[jax.Array] = (),
                 *, cap: int, chunk: int = 2048, algo: str = "window",
                 block_chunks: int = 1
                 ) -> Tuple[jax.Array, Tuple[jax.Array, ...],
                            jax.Array, jax.Array]:
    """Stable per-row compaction: elements with key != INT32_MAX move to
    the row front (order preserved).

    Args:
      keys: (R, N) int32; INT32_MAX marks empty slots. N % chunk == 0.
      payloads: int32 arrays of the same shape, routed with the keys.
      cap: output row capacity, rounded up to a chunk multiple.
      block_chunks: chunks per grid step ('place' algo only) — amortizes
        Mosaic's per-step sequencing overhead over bc chunks.
    Returns:
      (out_keys (R, cap'), out_payloads, kept (R,), total (R,)):
      rows front-packed with INT32_MAX beyond `kept`; `total` counts all
      valid inputs, so total - kept is the (exact) drop.
    """
    r, n = keys.shape
    payloads = tuple(payloads)
    assert chunk % _LANES == 0, chunk
    bc = max(1, min(block_chunks, -(-n // chunk)))
    if algo == "window":
        assert bc == 1, "block_chunks > 1 requires algo='place'"
    if n % (chunk * bc):
        pad = chunk * bc - n % (chunk * bc)
        keys = jnp.pad(keys, ((0, 0), (0, pad)), constant_values=INVALID)
        payloads = tuple(jnp.pad(p, ((0, 0), (0, pad))) for p in payloads)
        n += pad
    n_chunks = n // chunk
    n_steps = n_chunks // bc
    n_pay = len(payloads)
    cap_chunks = -(-cap // chunk)
    cap_pad = cap_chunks * chunk
    sc = chunk // _LANES

    def shape4(a):
        return a.reshape(r, n_chunks, sc, _LANES)

    interpret = jax.default_backend() != "tpu"
    in_specs = [pl.BlockSpec((1, bc, sc, _LANES),
                             lambda ri, bi: (ri, bi, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(1 + n_pay)]
    out_shapes = (
        [jax.ShapeDtypeStruct((r, cap_chunks + 1, sc, _LANES), jnp.int32)]
        + [jax.ShapeDtypeStruct((r, cap_chunks, sc, _LANES), jnp.int32)
           for _ in range(n_pay)])
    out_specs = ([pl.BlockSpec(memory_space=pltpu.ANY)]
                 + [pl.BlockSpec(memory_space=pltpu.ANY)
                    for _ in range(n_pay)])

    if algo == "window":
        kernel = functools.partial(
            _compact_kernel, chunk=chunk, n_chunks=n_chunks,
            cap_chunks=cap_chunks, n_payloads=n_pay)
    else:
        kernel = functools.partial(
            _compact_kernel2, chunk=chunk, n_steps=n_steps, bc=bc,
            cap_chunks=cap_chunks, n_payloads=n_pay)
    acc_rows = sc if algo == "window" else 2 * sc + 1
    outs = pl.pallas_call(
        kernel,
        grid=(r, n_steps),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((1 + n_pay, acc_rows, _LANES), jnp.int32),  # carry
            pltpu.VMEM((1 + n_pay, sc, _LANES), jnp.int32),        # send
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(shape4(keys), *[shape4(p) for p in payloads])

    keys_and_counts = outs[0]
    kept = keys_and_counts[:, cap_chunks, 0, 0]
    total = keys_and_counts[:, cap_chunks, 0, 1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (r, cap_pad), 1)
    mask = idx < kept[:, None]
    out_keys = jnp.where(
        mask, keys_and_counts[:, :cap_chunks].reshape(r, cap_pad), INVALID)
    out_pays = tuple(jnp.where(mask, o.reshape(r, cap_pad), 0)
                     for o in outs[1:1 + n_pay])
    return out_keys, out_pays, kept, total
