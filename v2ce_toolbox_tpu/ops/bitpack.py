"""Dense bit-packing of fixed-width records for device->host transfers.

The CLI's dominant cost on tunneled infra is the device->host event fetch
(PERF.md: ~0.5 MB/s; transfer volume IS the wall clock). The event wire
format's records are narrower than a word (22 bits: 3-bit timestamp delta
+ 19-bit x/y/polarity payload), so shipping one int32 per record wastes
10/32 of the volume. This module packs b-bit records into a dense word
stream ON DEVICE with pure static-indexed vector ops — no gathers (TPU
gathers run 0.06-1.9 Gelem/s; this is a handful of shifted ORs at
elementwise-copy speed) — and unpacks on the host with vectorized numpy.

Layout: records are grouped 32 at a time; group g's records occupy the
32*b-bit little-endian bitstream word[k][g], k = 0..b-1, record i at bit
offset b*i. 32 records -> exactly b words for ANY b <= 32, so the word
count for n records is ceil(n/32)*b and a kept-prefix fetch is the
2-D slice words[:, :ceil(kept/32)].
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def pack_bits(recs: jnp.ndarray, b: int) -> jnp.ndarray:
    """Pack (n,) b-bit records (int32/uint32, high bits ignored) into a
    (b, n//32) uint32 word grid. n must be a multiple of 32.

    Word k of group g covers bits [32k, 32k+32) of the group's bitstream;
    record i contributes at offset b*i - 32k — a static shift, so each of
    the b output rows is an OR of <= 3 statically-indexed shifted record
    rows (a 32-bit window intersects at most 3 b-bit records for b >= 16).
    """
    assert 1 <= b <= 32
    n = recs.shape[0]
    assert n % 32 == 0, n
    g = n // 32
    mask = jnp.uint32((1 << b) - 1) if b < 32 else jnp.uint32(0xFFFFFFFF)
    r = (recs.astype(jnp.uint32) & mask).reshape(g, 32).T  # (32, G)
    rows = []
    for k in range(b):
        lo = 32 * k
        w = jnp.zeros((g,), jnp.uint32)
        i0 = lo // b
        i1 = min((lo + 31) // b, 31)
        for i in range(i0, i1 + 1):
            off = b * i - lo
            w = w | (r[i] << off if off >= 0 else r[i] >> (-off))
        rows.append(w)
    return jnp.stack(rows)


def unpack_bits(words: np.ndarray, b: int, n: int) -> np.ndarray:
    """Host-side inverse of pack_bits: (b, G) words -> (n,) uint32 records
    (n <= 32*G; trailing pad records are garbage the caller sliced away).
    Vectorized numpy; the fancy-indexed word reads are host-cheap."""
    assert 1 <= b <= 32
    w = np.ascontiguousarray(np.asarray(words)).view(np.uint32) \
        if np.asarray(words).dtype != np.uint32 else np.asarray(words)
    if n == 0:
        return np.zeros(0, np.uint32)
    r = np.arange(n, dtype=np.int64)
    g = r >> 5
    lob = b * (r & 31)
    k0 = lob >> 5
    sh = (lob & 31).astype(np.uint32)
    lo = w[k0, g] >> sh
    spans = (sh + b) > 32
    hi_shift = np.where(spans, 32 - sh, 0).astype(np.uint32)
    hi = np.where(spans, w[np.minimum(k0 + 1, b - 1), g] << hi_shift, 0)
    mask = np.uint32((1 << b) - 1) if b < 32 else np.uint32(0xFFFFFFFF)
    return ((lo | hi) & mask).astype(np.uint32)
