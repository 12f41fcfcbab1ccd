"""Density-based review clustering on TPU: kNN graph + host union-find.

The reference's archived pipeline gets density semantics from
UMAP(50d) + HDBSCAN on CPU (nlp/_archive/05_clustering.py:27-56):
a data-derived cluster count, a noise label (-1), min_cluster_size=40 /
min_samples=10, "eom" cluster selection. Those semantics — NOT the exact
HDBSCAN algorithm — are what the topic pipeline consumes, and they are
what this module reproduces with a TPU-first split:

  device (MXU):  the O(N^2 D) part — an exact cosine kNN graph, computed
                 as blockwise (B, D) x (D, C) matmuls with a running
                 top-k merge lax.scan'd over column chunks. No UMAP:
                 the reduction exists in the reference to make CPU
                 neighbor search tractable; on the MXU the exact graph
                 at 300k x 384 is a few seconds of matmul.
  host (cheap):  the O(N k) part — DBSCAN-style core/border/noise rules
                 on the kNN lists and a union-find over mutual-core
                 edges. Linear in edges; pandas-scale trivial.

Semantics (mirroring hdbscan.HDBSCAN(min_cluster_size, min_samples)):
  - core distance  = cosine distance to the min_samples-th neighbor;
  - eps            = a percentile of the core-distance distribution when
                     not given (data-derived, like HDBSCAN's avoidance of
                     a global eps — the knob is a quantile, not a length
                     scale in embedding units);
  - edges          = mutual kNN pairs of two CORE points within eps;
  - border points  = non-core points adopted by a core neighbor within
                     eps; everything else gets the noise label -1;
  - clusters smaller than min_cluster_size dissolve into noise, so the
    cluster count is derived from the data, never passed in.

`rrt topics --cluster density` selects this path; spherical k-means
(topics/cluster.py) remains the default for fixed-K topic rollups.
"""
from __future__ import annotations

import functools
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def _knn_block(emb_chunks, block, base, n_real, *, k, chunk):
    """Exact top-k cosine neighbors of `block` (B, D) against the full
    corpus `emb_chunks` (n_chunks, chunk, D), merged chunk-by-chunk with
    lax.scan so the (B, chunk) sims tile never hits HBM at full width.

    `base` is the global row offset of each chunk's first column; columns
    past `n_real` are zero-vector padding and are masked to -inf INSIDE
    the program (a pad's raw sim of exactly 0.0 would otherwise displace
    real negative-sim neighbors from the top-k — self-review r4 root
    cause). Returns (vals (B, k), idx (B, k)) sorted desc; only rows with
    fewer than k real neighbors carry (-inf, -1) tails.
    """
    b = block.shape[0]
    init = (jnp.full((b, k), -jnp.inf, jnp.float32),
            jnp.full((b, k), -1, jnp.int32))

    def step(carry, xs):
        vals, idx = carry
        chunk_emb, off = xs
        sims = jnp.dot(block, chunk_emb.T,
                       preferred_element_type=jnp.float32)  # (B, chunk)
        cols = off + jnp.arange(chunk, dtype=jnp.int32)
        sims = jnp.where(cols[None, :] < n_real, sims, -jnp.inf)
        merged_v = jnp.concatenate([vals, sims], axis=1)
        merged_i = jnp.concatenate(
            [idx, jnp.broadcast_to(cols, (b, chunk))], axis=1)
        top_v, pos = jax.lax.top_k(merged_v, k)
        top_i = jnp.take_along_axis(merged_i, pos, axis=1)
        return (top_v, top_i), None

    (vals, idx), _ = jax.lax.scan(step, init, (emb_chunks, base))
    return vals, jnp.where(jnp.isfinite(vals), idx, -1)


def knn_graph(
    embeddings: np.ndarray,
    k: int = 16,
    batch_rows: int = 1024,
    col_chunk: int = 32768,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact cosine kNN graph of L2-normalized embeddings on device.

    Returns (sims (N, k), idx (N, k)), each row's neighbors sorted by
    descending similarity and INCLUDING the point itself (callers strip
    the self column — keeping it makes the device program rank-agnostic).
    """
    emb = np.asarray(embeddings, np.float32)
    n, d = emb.shape
    if n == 0:
        return np.zeros((0, k), np.float32), np.zeros((0, k), np.int32)
    emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)

    k_eff = min(k, n)
    pad_cols = (-n) % col_chunk
    emb_cols = np.pad(emb, [(0, pad_cols), (0, 0)])
    n_chunks = (n + pad_cols) // col_chunk
    emb_chunks = jnp.asarray(
        emb_cols.reshape(n_chunks, col_chunk, d))
    base = jnp.arange(n_chunks, dtype=jnp.int32) * col_chunk

    sims_out = np.empty((n, k_eff), np.float32)
    idx_out = np.empty((n, k_eff), np.int32)
    for lo in range(0, n, batch_rows):
        block = emb[lo:lo + batch_rows]
        bpad = (-len(block)) % batch_rows
        if bpad:
            block = np.pad(block, [(0, bpad), (0, 0)])
        vals, idx = _knn_block(emb_chunks, jnp.asarray(block), base,
                               jnp.int32(n), k=k_eff, chunk=col_chunk)
        # np.array (not asarray): jax buffers view as read-only host arrays
        vals, idx = np.array(vals), np.array(idx)
        take = len(block) - bpad
        sims_out[lo:lo + take] = vals[:take]
        idx_out[lo:lo + take] = idx[:take]
    return sims_out, idx_out


def knn_graph_sharded(
    embeddings: np.ndarray,
    k: int = 16,
    mesh=None,
    n_shards: Optional[int] = None,
    batch_rows: int = 1024,
    axis: str = "shard",
) -> Tuple[np.ndarray, np.ndarray]:
    """knn_graph over a device mesh: corpus rows sharded across devices, so
    review sets larger than one chip's HBM cluster at full exactness.

    SPMD shape (same merge-then-fuse pattern as parallel/sharded.py): each
    device scores the replicated row-block against its LOCAL corpus shard,
    takes a local top-k, then an ``all_gather`` over ICI merges the
    (n_dev, B, k) partials into the exact global top-k — per-block HBM
    traffic is one read of each device's shard, and nothing corpus-sized
    crosses the interconnect. Pad rows are masked to -inf INSIDE the
    program (both paths), so scores match knn_graph exactly including
    -inf placement; only index TIES may break differently across shard
    boundaries.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    emb = np.asarray(embeddings, np.float32)
    n, d = emb.shape
    k_eff = min(k, n)
    if n == 0:
        return np.zeros((0, k), np.float32), np.zeros((0, k), np.int32)

    if mesh is None:
        n_dev = n_shards or len(jax.devices())
        avail = len(jax.devices())
        if n_dev > avail:
            logger.warning(
                "knn_graph_sharded: %d shards requested but only %d "
                "devices available — building a %d-device mesh (per-device "
                "HBM load is larger than requested)", n_dev, avail, avail)
            n_dev = avail
        mesh = Mesh(np.array(jax.devices()[:n_dev]), (axis,))
    n_dev = mesh.shape[axis]
    emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)

    per = -(-n // n_dev)
    pad = per * n_dev - n
    emb_p = np.pad(emb, [(0, pad), (0, 0)]) if pad else emb
    emb_sh = jax.device_put(
        jnp.asarray(emb_p), NamedSharding(mesh, P(axis, None)))

    def body(emb_l, block):
        d_idx = jax.lax.axis_index(axis).astype(jnp.int32)
        sims = jnp.dot(block, emb_l.T,
                       preferred_element_type=jnp.float32)  # (B, per)
        # mask pad ROWS of the last shard in-program (same rationale as
        # _knn_block: a pad's raw 0.0 would displace real negative-sim
        # neighbors, breaking exact parity with the single-chip graph)
        gcol = d_idx * per + jnp.arange(per, dtype=jnp.int32)
        sims = jnp.where(gcol[None, :] < n, sims, -jnp.inf)
        v, i = jax.lax.top_k(sims, min(k_eff, per))
        gi = i.astype(jnp.int32) + d_idx * per
        av = jax.lax.all_gather(v, axis)   # (n_dev, B, k)
        ai = jax.lax.all_gather(gi, axis)
        b = block.shape[0]
        av = jnp.moveaxis(av, 0, 1).reshape(b, -1)
        ai = jnp.moveaxis(ai, 0, 1).reshape(b, -1)
        vv, pos = jax.lax.top_k(av, k_eff)
        ii = jnp.take_along_axis(ai, pos, axis=1)
        return vv, jnp.where(jnp.isfinite(vv), ii, -1)

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=(P(), P()), check_vma=False,
    ))

    sims_out = np.empty((n, k_eff), np.float32)
    idx_out = np.empty((n, k_eff), np.int32)
    for lo in range(0, n, batch_rows):
        block = emb[lo:lo + batch_rows]
        bpad = (-len(block)) % batch_rows
        if bpad:
            block = np.pad(block, [(0, bpad), (0, 0)])
        vals, idx = fn(emb_sh, jnp.asarray(block))
        vals, idx = np.array(vals), np.array(idx)
        take = len(block) - bpad
        sims_out[lo:lo + take] = vals[:take]
        idx_out[lo:lo + take] = idx[:take]
    return sims_out, idx_out


class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, x: int) -> int:
        p = self.parent
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:  # path compression
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def density_cluster(
    embeddings: np.ndarray,
    min_samples: int = 10,
    min_cluster_size: int = 40,
    knn: int = 16,
    eps: Optional[float] = None,
    eps_quantile: float = 0.60,
    batch_rows: int = 1024,
    col_chunk: int = 32768,
    n_shards: Optional[int] = None,
    mesh=None,
) -> Tuple[np.ndarray, dict]:
    """Density clustering with HDBSCAN's output semantics.

    Returns (labels (N,) int32 with -1 = noise and clusters renumbered
    0..n_clusters-1 by descending size, info dict with eps / counts).
    Cluster count comes from the data; `min_cluster_size` dissolves
    runt components into noise (05_clustering.py:44-49 tunables).
    n_shards / mesh > 1 device: the kNN graph shards the corpus across
    the mesh (knn_graph_sharded); the host graph stages are unchanged.
    """
    emb = np.asarray(embeddings, np.float32)
    n = len(emb)
    if n == 0:
        return np.zeros(0, np.int32), {
            "n_clusters": 0, "noise": 0, "eps": 0.0}

    k_graph = min(max(knn, min_samples) + 1, n)  # +1: self column
    if mesh is not None or (n_shards or 1) > 1:
        sims, idx = knn_graph_sharded(emb, k=k_graph, mesh=mesh,
                                      n_shards=n_shards,
                                      batch_rows=batch_rows)
    else:
        sims, idx = knn_graph(emb, k=k_graph,
                              batch_rows=batch_rows, col_chunk=col_chunk)

    # strip ONE column per row: the self column where present (rank 0 at
    # sim ~1.0 for unit vectors). With > k_graph exact-duplicate rows
    # (repeated review texts) lax.top_k's index tie-break can exclude self
    # entirely — those rows drop their LAST (worst) column instead, so the
    # reshape below is always exact.
    is_self = idx == np.arange(n)[:, None]
    drop_col = np.where(is_self.any(axis=1), is_self.argmax(axis=1),
                        k_graph - 1)
    keep = np.ones_like(idx, bool)
    keep[np.arange(n), drop_col] = False
    sims = sims[keep].reshape(n, k_graph - 1)
    idx = idx[keep].reshape(n, k_graph - 1)

    if sims.shape[1] == 0:
        # a 1-row corpus has no neighbors after the self-strip: trivially
        # all noise (HDBSCAN labels singletons -1 too)
        return np.full(n, -1, np.int32), {
            "n_clusters": 0, "noise": n, "eps": 0.0, "core_points": 0}

    ms = min(min_samples, sims.shape[1])
    core_sim = sims[:, ms - 1]  # sim to the min_samples-th neighbor
    core_dist = 1.0 - core_sim

    if eps is None:
        # data-derived scale: a quantile of the core-distance distribution.
        # HDBSCAN never picks a global eps; a quantile knob (default 0.60:
        # "the densest 60% of points are core") is the closest single-scan
        # approximation and keeps the knob unitless across corpora.
        finite = core_dist[np.isfinite(core_dist)]
        if len(finite) == 0:
            # every row has fewer than min_samples real neighbors (tiny
            # corpus): no density structure to find — all noise
            return np.full(n, -1, np.int32), {
                "n_clusters": 0, "noise": n, "eps": 0.0, "core_points": 0}
        eps = float(np.quantile(finite, eps_quantile))
    is_core = core_dist <= eps

    # mutual-core edges within eps: a -> b with b in kNN(a), both core,
    # sim >= 1 - eps. Mutuality is implied for exact kNN + shared eps when
    # both ends are core (sim is symmetric); no reverse lookup needed.
    src = np.repeat(np.arange(n), idx.shape[1])
    dst = idx.ravel()
    s = sims.ravel()
    m = (is_core[src] & is_core[dst] & (s >= 1.0 - eps) & (dst >= 0))
    uf = _UnionFind(n)
    for a, b in zip(src[m], dst[m]):
        uf.union(int(a), int(b))

    labels = np.full(n, -1, np.int32)
    roots = {}
    for i in np.flatnonzero(is_core):
        r = uf.find(int(i))
        labels[i] = roots.setdefault(r, len(roots))

    # border adoption: non-core points join their best core neighbor
    # within eps (classic DBSCAN border rule)
    for i in np.flatnonzero(~is_core):
        row_idx, row_sim = idx[i], sims[i]
        ok = is_core[row_idx] & (row_sim >= 1.0 - eps)
        if ok.any():
            labels[i] = labels[row_idx[np.argmax(np.where(
                ok, row_sim, -np.inf))]]

    # dissolve runts into noise, renumber by size desc
    lab, counts = np.unique(labels[labels >= 0], return_counts=True)
    keep_ids = lab[counts >= min_cluster_size]
    order = keep_ids[np.argsort(-counts[counts >= min_cluster_size],
                                kind="stable")]
    remap = np.full(labels.max() + 2 if len(lab) else 1, -1, np.int32)
    for newid, old in enumerate(order):
        remap[old] = newid
    labels = np.where(labels >= 0, remap[np.maximum(labels, 0)], -1)

    return labels.astype(np.int32), {
        "n_clusters": int(len(order)),
        "noise": int((labels == -1).sum()),
        "eps": float(eps),
        "core_points": int(is_core.sum()),
    }
