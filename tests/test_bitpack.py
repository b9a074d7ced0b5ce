"""Unit tests for ops/bitpack — the dense record packer behind the
device->host event wire format (pipeline/driver wire format; the CLI's
dominant transfer term, see PERF.md tunnel analysis)."""

import numpy as np
import pytest

import jax.numpy as jnp

from v2ce_toolbox_tpu.ops.bitpack import pack_bits, unpack_bits


@pytest.mark.parametrize("b", [1, 3, 7, 16, 19, 22, 24, 31, 32])
def test_roundtrip_random(b):
    rng = np.random.default_rng(b)
    n = 32 * 17
    recs = rng.integers(0, 1 << min(b, 63), size=n, dtype=np.uint64)
    recs = recs.astype(np.uint32)
    words = np.asarray(pack_bits(jnp.asarray(recs.astype(np.int32)), b))
    assert words.shape == (b, n // 32)
    out = unpack_bits(words, b, n)
    mask = np.uint32((1 << b) - 1) if b < 32 else np.uint32(0xFFFFFFFF)
    np.testing.assert_array_equal(out, recs & mask)


def test_high_bits_ignored():
    """Bits above b in the input records must not leak into neighbors."""
    b = 22
    n = 64
    recs = np.full(n, 0xFFFFFFFF, np.uint32).astype(np.int32)
    words = np.asarray(pack_bits(jnp.asarray(recs), b))
    out = unpack_bits(words, b, n)
    np.testing.assert_array_equal(out, np.full(n, (1 << b) - 1, np.uint32))


def test_partial_prefix_unpack():
    """Unpacking n < 32*G records reads only valid words (kept-prefix
    fetch: the driver slices words[:, :ceil(kept/32)])."""
    b = 22
    rng = np.random.default_rng(0)
    recs = rng.integers(0, 1 << b, size=32 * 8, dtype=np.int64)
    words = np.asarray(pack_bits(jnp.asarray(recs.astype(np.int32)), b))
    for n in (0, 1, 31, 32, 33, 100, 255):
        cols = -(-n // 32)
        out = unpack_bits(words[:, :cols], b, n)
        np.testing.assert_array_equal(
            out, recs[:n].astype(np.uint32), err_msg=f"n={n}")


def test_word_volume():
    """32 records pack into exactly b words for any b (the 2.75 B/event
    claim for b=22)."""
    for b in range(1, 33):
        n = 128
        words = pack_bits(jnp.zeros(n, jnp.int32), b)
        assert words.shape == (b, n // 32)
        assert words.size * 4 == n * b // 8     # b/8 bytes per record
