"""Review-embedding clustering on TPU: mini-batch spherical k-means.

The reference's archived pipeline clusters 300k review embeddings with
UMAP(50d) + HDBSCAN on CPU (nlp/_archive/05_clustering.py:27-56) — hours of
single-threaded work. The TPU-native replacement is spherical k-means
computed with MXU matmuls: assignment is one (B, D) x (D, K) product per
mini-batch, update is a segment-sum; both jitted. For L2-normalized
embeddings, cosine k-means is a solid stand-in for the density pipeline and
runs in seconds at 300k x 384.

A `kmeans_sanity` single-pass variant mirrors the archive's MiniBatchKMeans
sanity check (05a_cluster_sanity.py:21-32).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k",))
def _assign(emb, centers, valid, *, k):
    """Cosine assignment: ids (N,), one-hot counts and sums for the update."""
    sims = jnp.dot(emb, centers.T, preferred_element_type=jnp.float32)
    ids = jnp.argmax(sims, axis=1)
    ids = jnp.where(valid, ids, k)  # padding rows -> discard bucket
    onehot = jax.nn.one_hot(ids, k + 1, dtype=jnp.float32)[:, :k]  # (N, k)
    counts = jnp.sum(onehot, axis=0)  # (k,)
    sums = jnp.einsum("nk,nd->kd", onehot, emb.astype(jnp.float32))
    best = jnp.max(jnp.where(valid, jnp.max(sims, axis=1), 0.0))
    return ids, counts, sums, best


def spherical_kmeans(
    embeddings: np.ndarray,
    k: int = 60,
    iters: int = 25,
    batch_rows: int = 65536,
    seed: int = 0,
    tol: float = 1e-4,
) -> Tuple[np.ndarray, np.ndarray]:
    """Cluster L2-normalized embeddings. Returns (topic_ids (N,), centers
    (k, D) L2-normalized). Mini-batched so corpora larger than VMEM/HBM
    budgets stream through the same jitted programs."""
    emb = np.asarray(embeddings, dtype=np.float32)
    n, d = emb.shape
    if n == 0:
        return np.zeros(0, np.int32), np.zeros((k, d), np.float32)
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    emb = emb / np.maximum(norms, 1e-12)

    rng = np.random.default_rng(seed)
    # farthest-point (k-means++-style) seeding on a subsample: avoids the
    # split-cluster failure mode of uniform init
    pool_idx = (rng.choice(n, size=min(n, 20000), replace=False)
                if n > 20000 else np.arange(n))
    pool = emb[pool_idx]
    chosen = [int(rng.integers(0, len(pool)))]
    max_sim = pool @ pool[chosen[0]]
    while len(chosen) < min(k, len(pool)):
        nxt = int(np.argmin(max_sim))
        chosen.append(nxt)
        max_sim = np.maximum(max_sim, pool @ pool[nxt])
    centers = pool[chosen]
    if len(centers) < k:  # degenerate tiny input: pad with jitter
        extra = centers[rng.integers(0, len(centers), k - len(centers))]
        centers = np.concatenate([centers, extra + 1e-3])
    centers = jnp.asarray(centers)

    pad = (-n) % batch_rows
    emb_p = np.pad(emb, [(0, pad), (0, 0)])
    valid_p = np.arange(n + pad) < n
    blocks = [
        (jnp.asarray(emb_p[i : i + batch_rows]),
         jnp.asarray(valid_p[i : i + batch_rows]))
        for i in range(0, n + pad, batch_rows)
    ]

    prev = -np.inf
    for _ in range(iters):
        counts = jnp.zeros(k, jnp.float32)
        sums = jnp.zeros((k, d), jnp.float32)
        obj = 0.0
        for be, bv in blocks:
            _ids, c, s, best = _assign(be, centers, bv, k=k)
            counts = counts + c
            sums = sums + s
            obj += float(best)
        newc = sums / jnp.maximum(counts[:, None], 1.0)
        cn = jnp.linalg.norm(newc, axis=1, keepdims=True)
        newc = newc / jnp.maximum(cn, 1e-12)
        # dead centers keep their previous position
        centers = jnp.where(counts[:, None] > 0, newc, centers)
        if abs(obj - prev) < tol * max(abs(prev), 1.0):
            break
        prev = obj

    ids_out = np.empty(n + pad, np.int32)
    for bi, (be, bv) in enumerate(blocks):
        ids, *_ = _assign(be, centers, bv, k=k)
        ids_out[bi * batch_rows : (bi + 1) * batch_rows] = np.asarray(ids)
    return ids_out[:n], np.asarray(centers)


def kmeans_sanity(embeddings: np.ndarray, k: int = 60, sample: int = 50000,
                  seed: int = 0) -> dict:
    """Fast sanity check on a subsample (archive 05a parity): cluster size
    distribution + share of the largest cluster."""
    emb = np.asarray(embeddings, np.float32)
    rng = np.random.default_rng(seed)
    if len(emb) > sample:
        emb = emb[rng.choice(len(emb), sample, replace=False)]
    ids, _ = spherical_kmeans(emb, k=k, iters=8, seed=seed)
    counts = np.bincount(ids, minlength=k)
    return {
        "n": int(len(emb)),
        "k": int(k),
        "nonempty": int((counts > 0).sum()),
        "largest_share": float(counts.max() / max(len(emb), 1)),
        "median_size": float(np.median(counts[counts > 0])) if (counts > 0).any() else 0.0,
    }
