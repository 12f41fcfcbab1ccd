"""IVF (inverted-file) dense candidate pooling: sub-linear stage A.

Every existing pool mode (exact / striped) reads the WHOLE corpus per
query batch — optimal when the batch is large (one corpus read amortized
over B queries: ~2 us/query at N=200k, batch 128) but linear in N for the
single-query / small-batch regime the reference actually serves (one
Streamlit user per process, app/app_product_search.py:399). IVF makes the
single-query path sub-linear:

  offline  spherical k-means over the corpus (topics/cluster.py — MXU
           matmuls) -> C centroids; rows grouped by nearest centroid and
           packed into fixed-size BLOCKS of `block_rows` rows (a cluster
           owns ceil(size/block_rows) blocks; the last one padded).
  online   q @ centroids.T  ->  every block inherits its centroid's
           score  ->  lax.top_k picks `nprobe` blocks  ->  ONE gather of
           (nprobe, Mb, D) rows  ->  q @ rows.T  ->  top-`pool`.

Fixed-size blocks are the TPU move: cluster sizes are wildly unbalanced,
and padding every cluster to the max size would blow HBM, while ragged
clusters would mean dynamic shapes. With blocks, a big cluster simply
owns more blocks — and because each block inherits its centroid score,
big near clusters naturally consume more of the fixed `nprobe` budget.
All shapes are static; the whole query is one XLA program.

HBM read per query: nprobe * Mb * D * itemsize vs N * D * itemsize for
the full scan. Measured on the chip (evals_out/ivf_probe.json,
ivf_probe_1m.json — in-program chains): 6.6x vs the exact scan at
N=200k (1% traffic) and 15.8x at N=1M (0.8%), pool recall >=0.998 on
clustered corpora. Recall is DATA-DEPENDENT: an isotropic corpus
collapses to ~recall-at-traffic, and a weakly clustered embedding space
(from-scratch trained towers) measurably moved END metrics at the
default budget (evals_out/poolab_*) — which is why the engine runs
measure_pool_recall at init and warns below IVF_SELFCHECK_MIN.

Returned SCORES ARE EXACT for every scanned row (same matmul, same dtype
as dense_scores); only pool MEMBERSHIP is approximate — identical
contract to the striped pool. nprobe >= n_blocks degenerates to an exact
full scan (asserted in tests).

There is no counterpart in the reference (its only pool is a full numpy
argpartition scan, utils.py:111-124); this is a scale capability the
TPU build adds.
"""
from __future__ import annotations

import dataclasses
import logging

import jax
import jax.numpy as jnp
import numpy as np

from review_recommender_tpu.ops.dense import NEG_INF

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class IVFIndex:
    """Host-side IVF layout (numpy); device arrays built by the engine.

    block_row_ids[b, i] is the ORIGINAL corpus row packed at slot i of
    block b (0 where padded — masked by block_valid, never scored).
    """

    centroids: np.ndarray  # (C, D) f32, L2-normalized
    block_row_ids: np.ndarray  # (NB, Mb) int32
    block_valid: np.ndarray  # (NB, Mb) bool
    block_centroid: np.ndarray  # (NB,) int32

    @property
    def n_blocks(self) -> int:
        return int(self.block_row_ids.shape[0])

    @property
    def block_rows(self) -> int:
        return int(self.block_row_ids.shape[1])


def auto_centroids(n_valid: int) -> int:
    """Default centroid count: ~4*sqrt(N) (the classic IVF sizing band),
    clamped so tiny corpora still train and huge ones keep the centroid
    matmul negligible next to the block scan."""
    return int(np.clip(4.0 * np.sqrt(max(n_valid, 1)), 16, 65536))


def auto_block_rows(n_valid: int, n_centroids: int) -> int:
    """Default block size: the power of two nearest the mean cluster size,
    clamped to [64, 1024]. Measured at N=200k (auto centroids = 1788,
    mean cluster ~112): block_rows=512 leaves blocks 22% full — 4.6x of
    every probed block's HBM read is padding — while 128 packs ~80%+."""
    avg = max(n_valid / max(n_centroids, 1), 1.0)
    return int(np.clip(2 ** round(np.log2(avg)), 64, 1024))


def build_ivf(
    emb: np.ndarray,
    valid: np.ndarray,
    *,
    n_centroids: int = 0,
    block_rows: int = 0,
    kmeans_iters: int = 10,
    seed: int = 0,
) -> IVFIndex:
    """Train centroids and pack cluster members into fixed-size blocks.

    `emb` is the PADDED corpus matrix (N_pad, D); padding rows (valid
    False) are never assigned to any block. Clustering reuses the
    mini-batched spherical k-means (topics/cluster.py:spherical_kmeans),
    so the build runs as MXU matmuls on whatever backend is live.
    block_rows=0 (default) auto-sizes to the mean cluster size
    (auto_block_rows).
    """
    emb = np.asarray(emb, dtype=np.float32)
    valid = np.asarray(valid, dtype=bool)
    rows = np.nonzero(valid)[0].astype(np.int32)
    if rows.size == 0:
        mb = max(int(block_rows), 1) if block_rows else 64
        return IVFIndex(
            centroids=np.zeros((1, emb.shape[1]), np.float32),
            block_row_ids=np.zeros((1, mb), np.int32),
            block_valid=np.zeros((1, mb), bool),
            block_centroid=np.zeros(1, np.int32),
        )

    from review_recommender_tpu.topics.cluster import spherical_kmeans

    k = int(n_centroids) if n_centroids else auto_centroids(rows.size)
    k = min(k, rows.size)
    mb = (int(block_rows) if block_rows
          else auto_block_rows(rows.size, k))
    ids, centers = spherical_kmeans(
        emb[rows], k=k, iters=kmeans_iters, seed=seed
    )

    blk_rows: list[np.ndarray] = []
    blk_cent: list[int] = []
    order = np.argsort(ids, kind="stable")
    sorted_ids = ids[order]
    sorted_rows = rows[order]
    starts = np.searchsorted(sorted_ids, np.arange(k))
    ends = np.searchsorted(sorted_ids, np.arange(k), side="right")
    for c in range(k):
        members = sorted_rows[starts[c] : ends[c]]
        for off in range(0, len(members), mb):
            blk_rows.append(members[off : off + mb])
            blk_cent.append(c)

    nb = len(blk_rows)
    row_ids = np.zeros((nb, mb), np.int32)
    bvalid = np.zeros((nb, mb), bool)
    for b, members in enumerate(blk_rows):
        row_ids[b, : len(members)] = members
        bvalid[b, : len(members)] = True
    fill = float(bvalid.mean()) if nb else 0.0
    logger.info(
        "IVF: %d rows -> %d centroids, %d blocks x %d rows (fill %.0f%%)",
        rows.size, k, nb, mb, 100 * fill,
    )
    return IVFIndex(
        centroids=np.asarray(centers, np.float32),
        block_row_ids=row_ids,
        block_valid=bvalid,
        block_centroid=np.asarray(blk_cent, np.int32),
    )


def ivf_device_arrays(ivf: IVFIndex, emb, emb_dtype=jnp.bfloat16) -> dict:
    """Device pytree for ivf_topk: packed block embeddings + bookkeeping.

    The (NB, Mb, D) block tensor is the corpus re-gathered in cluster
    order (plus <= C*Mb - N pad rows) — like the striped slices, IVF
    keeps a second copy of `emb` in HBM (index/schema.py:footprint_total
    accounts for it)."""
    emb_np = np.asarray(emb)
    blocks = emb_np[ivf.block_row_ids.reshape(-1)].reshape(
        ivf.n_blocks, ivf.block_rows, emb_np.shape[1]
    )
    return {
        "ivf_centroids": jnp.asarray(ivf.centroids, dtype=emb_dtype),
        "ivf_blocks": jnp.asarray(blocks, dtype=emb_dtype),
        "ivf_block_valid": jnp.asarray(ivf.block_valid),
        "ivf_block_rows": jnp.asarray(ivf.block_row_ids),
        "ivf_block_centroid": jnp.asarray(ivf.block_centroid),
    }


def measure_pool_recall(
    emb: jax.Array,  # (N_pad, D) engine corpus matrix
    valid: jax.Array,  # (N_pad,) bool
    dev: tuple,  # ivf_device_arrays values in ivf_topk argument order
    pool: int,
    nprobe: int,
    n_queries: int = 16,
    seed: int = 0,
) -> float:
    """Fraction of the exact top-`pool` the IVF probe recovers, sampled
    with corpus rows as queries — the 'own your approximation' check.

    IVF recall is DATA-DEPENDENT: the synthetic clustered probe measures
    ~0.999 (evals_out/ivf_probe.json) but a weakly-clustered embedding
    space (e.g. from-scratch trained towers on the quality corpus) lost
    enough pool recall at the default budget to move END metrics
    (evals_out/ivf/ vs evals_out/readme_table.md, round 5). The engine
    therefore runs this at init when DENSE_POOL_MODE=ivf and warns below
    IVF_SELFCHECK_MIN — raise IVF_NPROBE (or drop ivf) when it fires.
    """
    import numpy as np

    from review_recommender_tpu.ops.dense import dense_topk

    valid_np = np.asarray(valid)
    rows = np.nonzero(valid_np)[0]
    if rows.size == 0:
        return 1.0
    rng = np.random.default_rng(seed)
    sel = rows[rng.integers(0, rows.size, min(n_queries, rows.size))]
    qv = jnp.asarray(np.asarray(emb)[sel], jnp.float32)

    ref_fn = jax.jit(lambda e, v, q: jax.vmap(
        lambda qq: dense_topk(e, qq, v, pool))(q))
    ivf_fn = jax.jit(lambda cen, blk, bv, br, bc, q: jax.vmap(
        lambda qq: ivf_topk(cen, blk, bv, br, bc, qq, pool, nprobe))(q))
    _, i_ref = ref_fn(emb, valid, qv)
    _, i_ivf = ivf_fn(*dev, qv)
    i_ref, i_ivf = np.asarray(i_ref), np.asarray(i_ivf)
    return float(np.mean([
        len(set(i_ref[i]) & set(i_ivf[i])) / max(i_ref.shape[1], 1)
        for i in range(len(sel))
    ]))


def ivf_topk(
    centroids: jax.Array,  # (C, D)
    blocks: jax.Array,  # (NB, Mb, D)
    block_valid: jax.Array,  # (NB, Mb) bool
    block_row_ids: jax.Array,  # (NB, Mb) int32
    block_centroid: jax.Array,  # (NB,) int32
    qvec: jax.Array,  # (D,) f32
    pool: int,
    nprobe: int,
) -> tuple[jax.Array, jax.Array]:
    """Top-`pool` rows from the `nprobe` most-promising blocks.

    Returns (scores (P,) f32 desc — EXACT cosines, -inf pad tail; row ids
    (P,) int32 in the ORIGINAL corpus row space). vmap over `qvec` for
    batches; `pool` and `nprobe` are static.
    """
    nb, mb, _d = blocks.shape
    np_ = min(int(nprobe), nb)
    cscores = jnp.dot(qvec.astype(centroids.dtype), centroids.T,
                      preferred_element_type=jnp.float32)  # (C,)
    bscores = jnp.take(cscores, block_centroid)  # (NB,)
    # dead blocks (all slots padded — mesh shards pad to a common block
    # count, parallel/sharded.py) must never win a probe slot
    bscores = jnp.where(jnp.any(block_valid, axis=1), bscores, NEG_INF)
    _, bids = jax.lax.top_k(bscores, np_)  # (np,)

    sub = jnp.take(blocks, bids, axis=0)  # (np, Mb, D)
    sims = jnp.dot(qvec.astype(sub.dtype),
                   sub.reshape(np_ * mb, -1).T,
                   preferred_element_type=jnp.float32)  # (np*Mb,)
    svalid = jnp.take(block_valid, bids, axis=0).reshape(np_ * mb)
    sims = jnp.where(svalid, sims, NEG_INF)
    kk = min(int(pool), np_ * mb)
    top, j = jax.lax.top_k(sims, kk)
    rows = jnp.take(block_row_ids, bids, axis=0).reshape(np_ * mb)
    idx = jnp.take(rows, j).astype(jnp.int32)
    if kk < int(pool):
        # keep the (pool,) contract callers size their buffers to
        pad = int(pool) - kk
        top = jnp.pad(top, (0, pad), constant_values=-jnp.inf)
        idx = jnp.pad(idx, (0, pad))
    return top, idx
