"""Fixed-capacity graph pooling vs. direct numpy transcriptions of the
torch-geometric semantics the reference wraps
(reference: train/scripts/model/layers.py:8-55; torch_geometric is not
installed here, so the oracle is a python set/dict transcription of
voxel_grid / max_pool_x / max_pool documented behavior)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from v2ce_toolbox_tpu.models.graph_pool import (
    INVALID,
    MaxPooling,
    MaxPoolingX,
    consecutive_cluster,
    max_pool,
    max_pool_x,
    max_pool_x_sized,
    pool_edge,
    voxel_grid,
)


def _np_voxel_grid(pos, size, batch=None, start=None, end=None):
    pos = np.asarray(pos, np.float32)
    d = pos.shape[1]
    size = np.broadcast_to(np.asarray(size, np.float32), (d,))
    start = pos.min(0) if start is None else np.asarray(start, np.float32)
    end = pos.max(0) if end is None else np.asarray(end, np.float32)
    coord = np.floor((pos - start) / size).astype(np.int64)
    dims = np.floor((end - start) / size).astype(np.int64) + 1
    stride = np.concatenate([[1], np.cumprod(dims[:-1])])
    ids = (coord * stride).sum(1)
    if batch is not None:
        ids = ids + np.asarray(batch) * dims.prod()
    return ids


def test_voxel_grid_matches_transcription():
    rng = np.random.default_rng(0)
    pos = rng.uniform(-3, 7, size=(200, 2)).astype(np.float32)
    batch = rng.integers(0, 3, size=200)
    got = np.asarray(voxel_grid(jnp.asarray(pos), 1.5,
                                batch=jnp.asarray(batch)))
    want = _np_voxel_grid(pos, 1.5, batch)
    np.testing.assert_array_equal(got, want)


def test_voxel_grid_masks_invalid():
    pos = jnp.asarray([[0.0, 0.0], [100.0, 100.0], [1.0, 1.0]])
    valid = jnp.asarray([True, False, True])
    ids = voxel_grid(pos, 2.0, valid=valid)
    assert int(ids[1]) == int(INVALID)
    # start/end ignore the invalid point: live ids dense near 0
    assert int(ids[0]) == 0 and int(ids[2]) == 0


def test_consecutive_cluster_relabels_in_id_order():
    ids = jnp.asarray([30, 10, 30, 20, 10, int(INVALID)], jnp.int32)
    out, k, perm = consecutive_cluster(ids)
    np.testing.assert_array_equal(np.asarray(out)[:5], [2, 0, 2, 1, 0])
    assert int(out[5]) == int(INVALID)
    assert int(k) == 3
    # perm[c] = first member index of cluster c
    np.testing.assert_array_equal(np.asarray(perm)[:3], [1, 3, 0])


def test_max_pool_x_matches_dict_oracle():
    rng = np.random.default_rng(1)
    n = 300
    ids = rng.integers(0, 40, size=n).astype(np.int32)
    x = rng.normal(size=(n, 5)).astype(np.float32)
    pooled, batch_out, k = max_pool_x(jnp.asarray(ids), jnp.asarray(x),
                                      jnp.zeros((n,), jnp.int32))
    uniq = np.unique(ids)
    assert int(k) == len(uniq)
    for slot, c in enumerate(uniq):
        np.testing.assert_allclose(np.asarray(pooled)[slot],
                                   x[ids == c].max(0), rtol=1e-6)
    assert not np.asarray(pooled)[int(k):].any()
    with pytest.raises(ValueError):
        max_pool_x(jnp.asarray(ids), jnp.asarray(x), None, size=16)


def test_max_pool_x_sized_layout_and_zero_fill():
    # 2 graphs, 4 voxel slots; graph 1 leaves slot 2 empty -> zero row
    ids = jnp.asarray([0, 0, 3, 1, 1, 3], jnp.int32)
    batch = jnp.asarray([0, 0, 0, 1, 1, 1], jnp.int32)
    x = jnp.asarray([[1.], [5.], [2.], [-7.], [-3.], [9.]])
    out = max_pool_x_sized(ids, x, batch, num_graphs=2, size=4)
    np.testing.assert_allclose(
        np.asarray(out).ravel(), [5, 0, 0, 2, 0, -3, 0, 9])


def test_pool_edge_exact():
    cl = jnp.asarray([0, 0, 1, 2], jnp.int32)
    ei = jnp.asarray([[0, 1, 0, 2, 3],
                      [2, 2, 1, 3, 2]], jnp.int32)
    attr = jnp.arange(5, dtype=jnp.float32)[:, None] + 1
    out_idx, out_attr, n_e = pool_edge(cl, ei, attr)
    # remapped: (0,1),(0,1),(0,0)self,(1,2),(2,1) -> unique live:
    # (0,1) sum 3, (1,2) sum 4, (2,1) sum 5
    assert int(n_e) == 3
    got = {(int(out_idx[0, i]), int(out_idx[1, i])): float(out_attr[i, 0])
           for i in range(3)}
    assert got == {(0, 1): 3.0, (1, 2): 4.0, (2, 1): 5.0}
    assert int(out_idx[0, 3]) == int(INVALID)
    assert not np.asarray(out_attr)[3:].any()


def test_max_pool_full_coarsening():
    rng = np.random.default_rng(2)
    n, e = 120, 400
    pos = rng.uniform(0, 10, size=(n, 2)).astype(np.float32)
    x = rng.normal(size=(n, 4)).astype(np.float32)
    batch = np.zeros(n, np.int32)
    ei = rng.integers(0, n, size=(2, e)).astype(np.int32)
    cl = _np_voxel_grid(pos, 2.5)
    x_o, pos_o, b_o, ei_o, _, k, n_e = max_pool(
        jnp.asarray(cl.astype(np.int32)), jnp.asarray(x), jnp.asarray(pos),
        jnp.asarray(ei), batch=jnp.asarray(batch))
    uniq = np.unique(cl)
    assert int(k) == len(uniq)
    relabel = {c: i for i, c in enumerate(uniq)}
    for c, slot in relabel.items():
        np.testing.assert_allclose(np.asarray(x_o)[slot],
                                   x[cl == c].max(0), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(pos_o)[slot],
                                   pos[cl == c].mean(0), rtol=1e-5)
    want_edges = {(relabel[cl[a]], relabel[cl[b]])
                  for a, b in ei.T if relabel[cl[a]] != relabel[cl[b]]}
    got_edges = {(int(ei_o[0, i]), int(ei_o[1, i]))
                 for i in range(int(n_e))}
    assert got_edges == want_edges
    assert not np.asarray(x_o)[int(k):].any()


def test_max_pool_jit_static_shapes():
    n, e = 64, 100
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.uniform(0, 4, (n, 2)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    ei = jnp.asarray(rng.integers(0, n, (2, e)).astype(np.int32))

    @jax.jit
    def run(pos, x, ei):
        cl = voxel_grid(pos, 1.0)
        return max_pool(cl, x, pos, ei)

    x_o, pos_o, b_o, ei_o, a_o, k, n_e = run(pos, x, ei)
    assert x_o.shape == (n, 3) and ei_o.shape == (2, e)
    assert int(k) > 0


def test_module_wrappers():
    rng = np.random.default_rng(4)
    n = 80
    pos = jnp.asarray(rng.uniform(0, 8, (n, 3)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    batch = jnp.asarray((np.arange(n) % 2).astype(np.int32))
    mx = MaxPoolingX(voxel_size=[4.0, 4.0, 8.0], size=4)
    out = mx(x, pos, batch=batch, num_graphs=2)
    assert out.shape == (8, 6)
    assert "MaxPoolingX" in repr(mx)

    ei = jnp.asarray(rng.integers(0, n, (2, 60)).astype(np.int32))
    mp = MaxPooling(size=[2.0, 2.0])
    x_o, pos_o, b_o, ei_o, a_o, k, n_e = mp(x, pos, batch=batch,
                                            edge_index=ei)
    assert x_o.shape == (n, 6) and int(k) > 0
    assert "MaxPooling" in repr(mp)
