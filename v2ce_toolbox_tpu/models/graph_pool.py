"""Fixed-capacity event-graph pooling — the TPU-native equivalent of the
reference's torch-geometric layers (reference:
train/scripts/model/layers.py:8-55: MaxPoolingX wraps voxel_grid +
max_pool_x, MaxPooling wraps voxel_grid + max_pool, View wraps reshape).

No main model of the reference instantiates these (SURVEY §2.2), but they
ship as part of its training toolbox, so the rebuild provides the same
surface. torch-geometric operates on ragged per-graph tensors with
data-dependent sizes; XLA needs static shapes, so every op here is
fixed-capacity: inputs carry an optional validity mask, outputs keep the
input capacity with a returned live count, and padding rows are inert
(zero features, INVALID edge endpoints). All ops are jit-compatible and
differentiable w.r.t. `x`.

The ops are utility-path, not hot-path: the consecutive relabel uses one
sort + one scatter, which is fine at event-graph scale (<= a few 100k
nodes) but deliberately NOT the roll-compaction machinery of the sampler.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

INVALID = jnp.int32(2**31 - 1)


def _as_size(size: Union[float, Sequence[float]], d: int) -> jnp.ndarray:
    s = jnp.asarray(size, jnp.float32).reshape(-1)
    return jnp.broadcast_to(s, (d,))


def voxel_grid(pos: jax.Array, size, batch: Optional[jax.Array] = None,
               start=None, end=None,
               valid: Optional[jax.Array] = None) -> jax.Array:
    """Cluster ids from quantizing positions onto a regular grid.

    Follows torch_cluster.grid_cluster's convention (the backend of
    torch_geometric.nn.pool.voxel_grid, reference layers.py:17,38):
    coordinate d of point i is floor((pos[i, d] - start[d]) / size[d]),
    ids ravel with dim 0 fastest, and the batch index rides as the
    slowest coordinate — so id = batch * n_voxels + raveled_coord.
    start/end default to the per-dim min/max over valid points (computed
    on device; values are data-dependent, shapes are static).

    Invalid points get id INVALID (sorts after every live cluster).
    """
    n, d = pos.shape
    size = _as_size(size, d)
    if valid is None:
        valid = jnp.ones((n,), bool)
    big = jnp.float32(3.4e38)
    pv = jnp.where(valid[:, None], pos.astype(jnp.float32), big)
    nv = jnp.where(valid[:, None], pos.astype(jnp.float32), -big)
    start = pv.min(axis=0) if start is None else _as_size(start, d)
    end = nv.max(axis=0) if end is None else _as_size(end, d)

    coord = jnp.floor((pos.astype(jnp.float32) - start) / size).astype(
        jnp.int32)
    dims = (jnp.floor((end - start) / size).astype(jnp.int32) + 1)
    stride = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), jnp.cumprod(dims[:-1])])
    ids = (coord * stride).sum(axis=1)
    if batch is not None:
        ids = ids + batch.astype(jnp.int32) * jnp.prod(dims)
    return jnp.where(valid, ids, INVALID)


def consecutive_cluster(ids: jax.Array) -> Tuple[jax.Array, jax.Array,
                                                 jax.Array]:
    """Relabel cluster ids to 0..K-1 in ascending-id order (the semantics
    of torch_geometric.nn.pool.consecutive.consecutive_cluster, which
    max_pool/max_pool_x apply before pooling). INVALID ids keep INVALID.

    Returns (relabeled ids, K, perm) where perm[k] is the index of one
    member (the first in sorted order) of cluster k — the analog of
    torch's `perm` used to pool the batch vector.
    """
    n = ids.shape[0]
    order = jnp.argsort(ids)
    s = ids[order]
    live = s != INVALID
    first = live & jnp.concatenate(
        [jnp.ones((1,), bool), s[1:] != s[:-1]])
    rank = jnp.cumsum(first) - 1
    out = jnp.zeros((n,), jnp.int32).at[order].set(rank.astype(jnp.int32))
    out = jnp.where(ids == INVALID, INVALID, out)
    k = first.sum().astype(jnp.int32)
    # first member (smallest position index among the sorted ties is not
    # guaranteed by an unstable sort; use segment_min over positions)
    seg = jnp.where(ids == INVALID, n, out)
    perm = -jax.ops.segment_max(-jnp.arange(n, dtype=jnp.int32) - 1, seg,
                                num_segments=n + 1)[:n] - 1
    return out, k, perm


def _seg(ids: jax.Array, n_seg: int) -> jax.Array:
    return jnp.where(ids == INVALID, n_seg, ids)


def max_pool_x(cluster: jax.Array, x: jax.Array,
               batch: Optional[jax.Array] = None,
               size: Optional[int] = None):
    """Max-pool node features by cluster
    (torch_geometric.nn.pool.max_pool_x; reference layers.py:18).

    Consecutive relabel, then feature-wise max per cluster; the output
    keeps the node capacity with rows K.. zeroed. Returns
    (x_out, batch_out, K). For the reference's fixed-`size` variant
    (static output rows under jit) use max_pool_x_sized — XLA cannot
    size an output from the data-dependent batch count.
    """
    n = x.shape[0]
    if size is not None:
        raise ValueError(
            "max_pool_x(size=...) needs a static batch count; call "
            "max_pool_x_sized(cluster, x, batch, num_graphs, size)")
    ids, k, perm = consecutive_cluster(cluster)
    seg = _seg(ids, n)
    pooled = jax.ops.segment_max(x, seg, num_segments=n + 1)[:n]
    live = (jnp.arange(n) < k)[:, None]
    pooled = jnp.where(live, pooled, 0)
    batch_out = (None if batch is None else
                 jnp.where(jnp.arange(n) < k,
                           batch[jnp.clip(perm, 0, n - 1)], 0))
    return pooled, batch_out, k


def max_pool_x_sized(cluster: jax.Array, x: jax.Array, batch: jax.Array,
                     num_graphs: int, size: int) -> jax.Array:
    """The fixed-size max_pool_x variant (reference layers.py:18 with
    `size`): output (num_graphs * size, F), row b*size + v = max over
    the points of graph b with per-graph voxel id v; empty rows zero
    (torch scatter-max's identity fill). `cluster` must be PER-GRAPH ids
    in [0, size) (voxel_grid WITHOUT the batch offset) — the exact
    contract of torch's scatter(dim_size=B*size) path, where the caller
    guarantees the grid has at most `size` voxels."""
    b = batch.astype(jnp.int32)
    seg = jnp.where(cluster == INVALID, num_graphs * size,
                    b * size + cluster)
    out = jax.ops.segment_max(x, seg, num_segments=num_graphs * size + 1)
    out = out[:num_graphs * size]
    empty = jax.ops.segment_sum(jnp.ones_like(seg, jnp.int32), seg,
                                num_segments=num_graphs * size + 1
                                )[:num_graphs * size] == 0
    return jnp.where(empty[:, None], 0, out)


def pool_edge(cluster: jax.Array, edge_index: jax.Array,
              edge_attr: Optional[jax.Array] = None,
              edge_valid: Optional[jax.Array] = None):
    """Remap edges onto cluster ids, drop self-loops, coalesce duplicates
    (summing attributes) — torch_geometric.nn.pool.pool.pool_edge.
    Fixed capacity: output keeps (2, E) with INVALID-padded tail; returns
    (edge_index_out, edge_attr_out, n_edges)."""
    e = edge_index.shape[1]
    if edge_valid is None:
        edge_valid = jnp.ones((e,), bool)
    src = jnp.where(edge_valid, cluster[edge_index[0]], INVALID)
    dst = jnp.where(edge_valid, cluster[edge_index[1]], INVALID)
    live = edge_valid & (src != dst) & (src != INVALID) & (dst != INVALID)
    # coalesce: lexsort by (src, dst) with dead edges last (INVALID is
    # int32 max, so they sort to the tail), mark (src, dst) firsts.
    # No packed int64 key: x64 is off and int32 src*n+dst would overflow.
    sk = jnp.where(live, src, INVALID)
    dk = jnp.where(live, dst, INVALID)
    order = jnp.lexsort((dk, sk))
    ss, ds = sk[order], dk[order]
    lives = ss != INVALID
    first = lives & jnp.concatenate(
        [jnp.ones((1,), bool), (ss[1:] != ss[:-1]) | (ds[1:] != ds[:-1])])
    rank = jnp.cumsum(first) - 1                   # unique-edge slot
    n_out = first.sum().astype(jnp.int32)
    seg = jnp.where(lives, rank, e)
    src_out = jax.ops.segment_max(src[order], seg, num_segments=e + 1)[:e]
    dst_out = jax.ops.segment_max(dst[order], seg, num_segments=e + 1)[:e]
    pad = jnp.arange(e) >= n_out
    out_idx = jnp.stack([jnp.where(pad, INVALID, src_out),
                         jnp.where(pad, INVALID, dst_out)])
    attr_out = None
    if edge_attr is not None:
        attr_out = jax.ops.segment_sum(
            jnp.where(lives[:, None], edge_attr[order], 0), seg,
            num_segments=e + 1)[:e]
        attr_out = jnp.where(pad[:, None], 0, attr_out)
    return out_idx, attr_out, n_out


def max_pool(cluster: jax.Array, x: jax.Array, pos: jax.Array,
             edge_index: jax.Array, batch: Optional[jax.Array] = None,
             edge_attr: Optional[jax.Array] = None,
             valid: Optional[jax.Array] = None,
             edge_valid: Optional[jax.Array] = None):
    """Graph coarsening by cluster (torch_geometric.nn.pool.max_pool;
    reference layers.py:40): features max-pool, positions mean-pool,
    edges remap + de-self-loop + coalesce. Fixed capacity: node outputs
    keep the input capacity with K live rows.

    Returns (x_out, pos_out, batch_out, edge_index_out, edge_attr_out,
    k_nodes, n_edges)."""
    n = x.shape[0]
    ids, k, perm = consecutive_cluster(
        cluster if valid is None else jnp.where(valid, cluster, INVALID))
    seg = _seg(ids, n)
    live_row = (jnp.arange(n) < k)[:, None]
    x_out = jnp.where(live_row,
                      jax.ops.segment_max(x, seg, num_segments=n + 1)[:n], 0)
    cnt = jax.ops.segment_sum(jnp.ones((n,), pos.dtype), seg,
                              num_segments=n + 1)[:n]
    pos_out = jnp.where(
        live_row, jax.ops.segment_sum(pos, seg, num_segments=n + 1)[:n]
        / jnp.maximum(cnt, 1)[:, None], 0)
    batch_out = (None if batch is None else
                 jnp.where(jnp.arange(n) < k,
                           batch[jnp.clip(perm, 0, n - 1)], 0))
    e_idx, e_attr, n_e = pool_edge(ids, edge_index, edge_attr, edge_valid)
    return x_out, pos_out, batch_out, e_idx, e_attr, k, n_e


class MaxPoolingX:
    """reference layers.py:8-22: voxel_grid over full pos dims, then
    fixed-size max_pool_x. Output (num_graphs * size, F)."""

    def __init__(self, voxel_size: List[float], size: int):
        self.voxel_size = voxel_size
        self.size = size

    def __call__(self, x, pos, batch=None, num_graphs: int = 1,
                 valid=None):
        if batch is None:
            batch = jnp.zeros((x.shape[0],), jnp.int32)
        # per-batch grid ids in [0, n_vox): omit the batch offset here
        # (the sized pool re-offsets by b * size itself)
        cluster = voxel_grid(pos, self.voxel_size, batch=None, valid=valid)
        return max_pool_x_sized(cluster, x, batch, num_graphs, self.size)

    def __repr__(self):
        return (f"{self.__class__.__name__}(voxel_size={self.voxel_size},"
                f" size={self.size})")


class MaxPooling:
    """reference layers.py:26-47: voxel_grid over pos[:, :2], then graph
    max_pool. `transform` (new edge attributes) maps to an optional
    callable on the output tuple."""

    def __init__(self, size: List[float], transform=None):
        self.voxel_size = list(size)
        self.transform = transform

    def __call__(self, x, pos, batch=None, edge_index=None, valid=None,
                 edge_valid=None, edge_attr=None):
        assert edge_index is not None, "edge_index must not be None"
        cluster = voxel_grid(pos[:, :2], self.voxel_size, batch=batch,
                             valid=valid)
        out = max_pool(cluster, x, pos, edge_index, batch=batch,
                       edge_attr=edge_attr, valid=valid,
                       edge_valid=edge_valid)
        if self.transform is not None:
            out = self.transform(out)
        return out

    def __repr__(self):
        return f"{self.__class__.__name__}(voxel_size={self.voxel_size})"
