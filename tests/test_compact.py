"""Tests for the roll-based Pallas stream compactor (ops/compact_pallas.py)
— the sort/gather-free compaction primitive under the LDATI sampler."""

import numpy as np
import pytest

from tests import conftest as _cf  # noqa: F401  (forces the CPU platform)


def _ref_compact(row, cap, invalid):
    valid = row[row != invalid]
    return valid[:cap]


@pytest.mark.parametrize("algo,bc", [("window", 1), ("place", 1),
                                     ("place", 3), ("place", 8)])
@pytest.mark.parametrize("density", [0.0, 0.05, 0.5, 0.95, 1.0])
def test_compact_rows_matches_reference(density, algo, bc):
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.compact_pallas import INVALID, compact_rows

    rng = np.random.RandomState(int(density * 100))
    r, n, chunk, cap = 4, 8 * 256, 256, 1024
    keys = np.where(rng.rand(r, n) < density,
                    rng.randint(0, 1 << 20, (r, n)), INVALID).astype(np.int32)
    pay = rng.randint(0, 1 << 20, (r, n)).astype(np.int32)
    pay = np.where(keys != INVALID, pay, 0)

    out_keys, (out_pay,), kept, total = compact_rows(
        jnp.asarray(keys), [jnp.asarray(pay)], cap=cap, chunk=chunk,
        algo=algo, block_chunks=bc)
    out_keys, out_pay = np.asarray(out_keys), np.asarray(out_pay)
    kept, total = np.asarray(kept), np.asarray(total)

    for i in range(r):
        valid = keys[i][keys[i] != INVALID]
        pv = pay[i][keys[i] != INVALID]
        assert total[i] == len(valid)
        k = kept[i]
        assert k == min(len(valid), k)  # kept <= total
        # kept events are a prefix of the valid sequence, in order
        np.testing.assert_array_equal(out_keys[i][:k], valid[:k])
        np.testing.assert_array_equal(out_pay[i][:k], pv[:k])
        assert (out_keys[i][k:] == INVALID).all()
        if len(valid) <= cap:
            assert k == len(valid)     # nothing dropped below capacity


def test_compact_rows_capacity_drop_exact():
    """Over-capacity rows drop whole chunks, counted exactly."""
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.compact_pallas import INVALID, compact_rows

    rng = np.random.RandomState(7)
    r, n, chunk, cap = 2, 8 * 256, 256, 512       # cap = 2 chunks
    keys = rng.randint(0, 1 << 20, (r, n)).astype(np.int32)  # fully dense

    out_keys, _, kept, total = compact_rows(
        jnp.asarray(keys), cap=cap, chunk=chunk)
    assert (np.asarray(total) == n).all()
    assert (np.asarray(kept) == cap).all()
    np.testing.assert_array_equal(np.asarray(out_keys)[:, :cap],
                                  keys[:, :cap])


@pytest.mark.parametrize("f,nb,w,cap", [(3, 9, 256, 512), (2, 4, 128, 256),
                                        (1, 9, 384, 128)])
def test_merge_sorted_rows_matches_concat(f, nb, w, cap):
    """merge_sorted_rows == concatenation of the rows' valid prefixes,
    truncated at cap with exact kept/total accounting."""
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.compact_pallas import INVALID, merge_sorted_rows

    rng = np.random.RandomState(f * 1000 + nb)
    keys = np.full((f * nb, w), INVALID, np.int32)
    pays = np.zeros((f * nb, w), np.int32)
    for r in range(f * nb):
        n = rng.randint(0, w + 1)
        keys[r, :n] = np.sort(rng.randint(0, 1 << 20, n).astype(np.int32))
        pays[r, :n] = rng.randint(1, 100, n)

    ok, (op,), kept, total = merge_sorted_rows(
        jnp.asarray(keys), [jnp.asarray(pays)], nb=nb, cap=cap)
    ok, op = np.asarray(ok), np.asarray(op)
    kept, total = np.asarray(kept), np.asarray(total)

    for i in range(f):
        rows = keys[i * nb:(i + 1) * nb]
        ref_k = np.concatenate([r[r != INVALID] for r in rows])
        ref_p = np.concatenate(
            [pays[i * nb + b][rows[b] != INVALID] for b in range(nb)])
        assert total[i] == len(ref_k)
        k = kept[i]
        assert k == min(len(ref_k), cap)
        np.testing.assert_array_equal(ok[i, :k], ref_k[:k])
        np.testing.assert_array_equal(op[i, :k], ref_p[:k])
        assert (ok[i, k:] == INVALID).all()
        assert (op[i, k:] == 0).all()


def test_compact_rows_no_payload_many_shapes():
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.compact_pallas import INVALID, compact_rows

    rng = np.random.RandomState(3)
    for r, n_chunks, chunk in [(1, 1, 256), (3, 5, 256), (2, 3, 512)]:
        n = n_chunks * chunk
        keys = np.where(rng.rand(r, n) < 0.3,
                        rng.randint(0, 100, (r, n)), INVALID).astype(np.int32)
        out, _, kept, total = compact_rows(jnp.asarray(keys),
                                           cap=n, chunk=chunk)
        for i in range(r):
            valid = keys[i][keys[i] != INVALID]
            assert int(kept[i]) == int(total[i]) == len(valid)
            np.testing.assert_array_equal(np.asarray(out)[i][:len(valid)],
                                          valid)


@pytest.mark.parametrize("chunk", [256, 512])
@pytest.mark.parametrize("density", [0.0, 0.1, 0.6, 1.0])
@pytest.mark.parametrize("bc", [1, 2, 8])
def test_append_rows_matches_concat(density, chunk, bc):
    """append_rows == concatenation of the rows' valid prefixes (the
    driver's stream-flatten contract: per-frame buffers are prefixes)."""
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.compact_pallas import INVALID, append_rows

    rng = np.random.RandomState(int(density * 100) + chunk)
    r, w = 6, 1000                                # w % chunk != 0: pad path
    counts = (rng.rand(r) * density * w).astype(np.int64)
    keys = np.full((r, w), INVALID, np.int32)
    pay = np.zeros((r, w), np.int32)
    for i in range(r):
        keys[i, :counts[i]] = rng.randint(0, 1 << 20, counts[i])
        pay[i, :counts[i]] = rng.randint(0, 1 << 20, counts[i])

    out_k, (out_p,), kept, total = append_rows(
        jnp.asarray(keys), [jnp.asarray(pay)], cap=r * w, chunk=chunk,
        block_chunks=bc)
    out_k, out_p = np.asarray(out_k)[0], np.asarray(out_p)[0]
    kept, total = int(kept[0]), int(total[0])

    ref_k = np.concatenate([keys[i, :counts[i]] for i in range(r)])
    ref_p = np.concatenate([pay[i, :counts[i]] for i in range(r)])
    assert total == counts.sum() == kept
    np.testing.assert_array_equal(out_k[:kept], ref_k)
    np.testing.assert_array_equal(out_p[:kept], ref_p)
    assert (out_k[kept:] == INVALID).all()


def test_append_rows_capacity_drop_exact():
    """Overflow beyond cap drops whole chunks, counted via total - kept."""
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.compact_pallas import INVALID, append_rows

    rng = np.random.RandomState(3)
    r, w, chunk, cap = 4, 512, 256, 512           # cap = 2 chunks < 4*512
    keys = rng.randint(0, 1 << 20, (r, w)).astype(np.int32)  # full rows

    out_k, _, kept, total = append_rows(
        jnp.asarray(keys), cap=cap, chunk=chunk)
    assert int(total[0]) == r * w
    assert int(kept[0]) == cap
    np.testing.assert_array_equal(
        np.asarray(out_k)[0][:cap], keys.reshape(-1)[:cap])
