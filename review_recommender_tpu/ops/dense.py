"""Dense cosine retrieval: one MXU matmul + lax.top_k.

Replaces the reference's numpy argpartition path
(/root/reference/utils.py:111-124, app/app_product_search.py:192-195).

The corpus matrix is stored in bf16 (halves HBM traffic — the matmul reads
N x D bytes per query and is bandwidth-bound at batch 1); accumulation is
always f32 via preferred_element_type. Padding rows are masked to -inf so
they can never enter the pool.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)


def dense_scores(emb: jax.Array, qvec: jax.Array, valid: jax.Array) -> jax.Array:
    """Cosine scores (N_pad,) f32; padding lanes are -inf.

    Written q @ emb.T (not emb @ q): under vmap over the query axis this
    batches to (B, D) @ (D, N) with the OUTPUT laid out (B, N) — measured
    2.3x faster on v5e than the (N, D) @ (D, B) orientation, whose (N, B)
    result must be re-tiled before the per-query top-k."""
    sims = jnp.dot(qvec.astype(emb.dtype), emb.T,
                   preferred_element_type=jnp.float32)
    return jnp.where(valid, sims, NEG_INF)


def dense_topk(
    emb: jax.Array, qvec: jax.Array, valid: jax.Array, pool: int
) -> tuple[jax.Array, jax.Array]:
    """Top-`pool` candidates by cosine similarity.

    Returns (scores (P,), idx (P,)) sorted descending. If fewer than P valid
    rows exist the tail scores are -inf (callers derive a candidate-valid
    mask from that).
    """
    sims = dense_scores(emb, qvec, valid)
    k = min(int(pool), sims.shape[0])
    scores, idx = jax.lax.top_k(sims, k)
    return scores, idx


def striped_topk(
    sims: jax.Array, pool: int, stripes: int = 8192
) -> tuple[jax.Array, jax.Array]:
    """Two-stage top-`pool` over the last axis: per-stripe max+argmax, then
    an exact top-k over the stripe maxima.

    `lax.top_k` over the full corpus axis costs ~2.3 ms per 32-query batch
    at N=200k on v5e (a bitonic sort over 200k lanes); the stripe reduction
    replaces it with a (G, S) max — measured ~0.2 ms — plus a top-k over
    only G stripe maxima. Returned SCORES ARE EXACT; only pool MEMBERSHIP
    is approximate: a true top-pool row is lost iff another pool row lands
    in its stripe, so expected recall ≈ 1 - pool/(2G) (~0.991 at pool=150,
    G=8192; measured 0.9875 at N=200k). For n <= stripes the stripe size
    is 1 and the result is EXACT. Callers gate this behind
    DENSE_POOL_MODE=striped (config.py) — the default engine path stays
    exact for oracle parity.
    """
    n = sims.shape[-1]
    g = min(int(stripes), n)
    s = -(-n // g)  # ceil div: rows per stripe
    padded = g * s
    if padded != n:
        pad = [(0, 0)] * (sims.ndim - 1) + [(0, padded - n)]
        sims = jnp.pad(sims, pad, constant_values=-jnp.inf)
    x = sims.reshape(*sims.shape[:-1], g, s)
    smax = jnp.max(x, axis=-1)
    sarg = jnp.argmax(x, axis=-1).astype(jnp.int32)
    kk = min(int(pool), g)
    top, gi = jax.lax.top_k(smax, kk)
    idx = gi * s + jnp.take_along_axis(sarg, gi, axis=-1)
    return top, idx


def slice_corpus_for_striped(emb, valid, stripes: int):
    """One-time host/device prep for dense_striped_topk_scan: pad the corpus
    to s*G rows and view it as (s, G, D) slices + (s, G) validity.

    Stripe g is the STRIDED row set {g, G+g, 2G+g, ...} (slice r holds row
    r*G+g), so the (s, G, D) view is a plain reshape of the contiguous
    buffer — no permutation, and stripe membership is as score-independent
    as the contiguous blocks striped_topk uses."""
    n, d = emb.shape
    g = min(int(stripes), n)
    s = -(-n // g)
    pad = s * g - n
    emb_p = jnp.pad(emb, ((0, pad), (0, 0))) if pad else emb
    valid_p = jnp.pad(valid, (0, pad)) if pad else valid
    return emb_p.reshape(s, g, d), valid_p.reshape(s, g)


def dense_striped_topk_scan(
    emb_s: jax.Array, valid_s: jax.Array, qvec: jax.Array, pool: int
) -> tuple[jax.Array, jax.Array]:
    """Fused dense scoring + striped top-`pool` WITHOUT materializing the
    (B, N) similarity matrix.

    The separate dense_scores -> striped_topk pipeline writes the full
    (B, N) f32 sims to HBM and reads it back for the stripe reduction —
    measured 2.6 ms per 32-query batch at N=200k on v5e, vs a ~0.25 ms
    corpus-bandwidth bound. Here a lax.scan walks the (s, G, D) corpus
    slices (slice_corpus_for_striped), each step one (B, D) @ (D, G)
    matmul whose (B, G) result immediately folds into running per-stripe
    max/argmax carries — elementwise selects, no lane reductions, nothing
    corpus-sized ever leaves the compute units. Scores are EXACT; pool
    membership recall is the striped_topk bound (~1 - pool/(2G)).

    qvec: (D,) — vmap for batches (scan and the matmul batch cleanly).
    Returns (scores (pool,) f32 desc, row indices (pool,) int32 into the
    ORIGINAL corpus row space: row = r*G + g).
    """
    s, g, _d = emb_s.shape
    kk = min(int(pool), g)

    def body(carry, sl):
        best, best_r, r = carry
        emb_r, valid_r = sl
        sims = jnp.dot(qvec.astype(emb_r.dtype), emb_r.T,
                       preferred_element_type=jnp.float32)
        sims = jnp.where(valid_r, sims, NEG_INF)
        upd = sims > best
        best = jnp.where(upd, sims, best)
        best_r = jnp.where(upd, r, best_r)
        return (best, best_r, r + jnp.int32(1)), None

    init = (jnp.full((g,), NEG_INF, jnp.float32),
            jnp.zeros((g,), jnp.int32), jnp.int32(0))
    # full unroll: s is small (~N/8192) and static; unrolling lets XLA
    # software-pipeline slice i+1's matmul under slice i's fold (measured
    # 1.58 -> 1.29 ms per 32-query batch at N=200k)
    (best, best_r, _), _ = jax.lax.scan(body, init, (emb_s, valid_s),
                                        unroll=True)
    top, gi = jax.lax.top_k(best, kk)
    idx = jnp.take(best_r, gi) * g + gi
    return top, idx.astype(jnp.int32)


def quantize_corpus_int8(emb: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8 quantization of an L2-normalized corpus matrix.

    Returns (emb_q (N, D) int8, row_scale (N,) f32). Halves HBM footprint
    and bandwidth vs bf16 again (2x corpus per chip); the v5e MXU multiplies
    int8 natively. Cosine error is ~0.3% of score magnitude — far below the
    fusion signal noise floor; the pool top-k recall vs f32 stays >0.99.
    """
    import numpy as np

    emb = np.asarray(emb, dtype=np.float32)
    scale = np.abs(emb).max(axis=1) / 127.0
    scale = np.maximum(scale, 1e-12)
    q = np.clip(np.rint(emb / scale[:, None]), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def dense_scores_int8(
    emb_q: jax.Array,  # (N, D) int8
    row_scale: jax.Array,  # (N,) f32
    qvec: jax.Array,  # (D,) f32
    valid: jax.Array,
) -> jax.Array:
    """Cosine scores with an int8 corpus: quantize the query symmetrically,
    int8 x int8 -> int32 on the MXU, rescale in f32."""
    q_scale = jnp.maximum(jnp.max(jnp.abs(qvec)) / 127.0, 1e-12)
    q_q = jnp.clip(jnp.round(qvec / q_scale), -127, 127).astype(jnp.int8)
    # q @ emb.T orientation: see dense_scores
    acc = jnp.dot(q_q, emb_q.T, preferred_element_type=jnp.int32)
    sims = acc.astype(jnp.float32) * (row_scale * q_scale)
    return jnp.where(valid, sims, NEG_INF)


def dense_topk_int8(emb_q, row_scale, qvec, valid, pool: int):
    sims = dense_scores_int8(emb_q, row_scale, qvec, valid)
    k = min(int(pool), sims.shape[0])
    return jax.lax.top_k(sims, k)


def slice_corpus_for_striped_int8(emb_q, row_scale, valid, stripes: int):
    """int8 variant of slice_corpus_for_striped: (s, G, D) int8 slices plus
    (s, G) row scales and validity."""
    n, d = emb_q.shape
    g = min(int(stripes), n)
    s = -(-n // g)
    pad = s * g - n
    if pad:
        emb_q = jnp.pad(emb_q, ((0, pad), (0, 0)))
        row_scale = jnp.pad(row_scale, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    return (emb_q.reshape(s, g, d), row_scale.reshape(s, g),
            valid.reshape(s, g))


def dense_striped_topk_scan_int8(
    emb_qs: jax.Array, scale_s: jax.Array, valid_s: jax.Array,
    qvec: jax.Array, pool: int
) -> tuple[jax.Array, jax.Array]:
    """int8 fused score+pool scan (see dense_striped_topk_scan): the query
    quantizes once, each slice does int8 x int8 -> int32 on the MXU and
    rescales in f32 before folding into the stripe max/argmax carries.
    Slice reads are half the bf16 scan's."""
    s, g, _d = emb_qs.shape
    kk = min(int(pool), g)
    q_scale = jnp.maximum(jnp.max(jnp.abs(qvec)) / 127.0, 1e-12)
    q_q = jnp.clip(jnp.round(qvec / q_scale), -127, 127).astype(jnp.int8)

    def body(carry, sl):
        best, best_r, r = carry
        emb_r, scale_r, valid_r = sl
        acc = jnp.dot(q_q, emb_r.T, preferred_element_type=jnp.int32)
        sims = acc.astype(jnp.float32) * (scale_r * q_scale)
        sims = jnp.where(valid_r, sims, NEG_INF)
        upd = sims > best
        best = jnp.where(upd, sims, best)
        best_r = jnp.where(upd, r, best_r)
        return (best, best_r, r + jnp.int32(1)), None

    init = (jnp.full((g,), NEG_INF, jnp.float32),
            jnp.zeros((g,), jnp.int32), jnp.int32(0))
    (best, best_r, _), _ = jax.lax.scan(
        body, init, (emb_qs, scale_s, valid_s), unroll=True)
    top, gi = jax.lax.top_k(best, kk)
    idx = jnp.take(best_r, gi) * g + gi
    return top, idx.astype(jnp.int32)


def quantize_corpus_int8_global(emb: jax.Array) -> tuple[jax.Array, float]:
    """Symmetric int8 quantization with ONE corpus-wide scale.

    Coarser than the per-row scheme (rows whose max component is far below
    the corpus max get fewer effective levels — measured in
    tests/test_int8.py; on L2-normalized embeddings the max-component
    spread is small so the cosine error stays ~1e-2 absolute), but it buys
    a pure-integer scan epilogue: stripe max/argmax carries compare RAW
    int32 accumulators, deleting the per-slice int32->f32 convert and the
    per-row scale multiply/read (VERDICT r4 item 6)."""
    import numpy as np

    emb = np.asarray(emb, dtype=np.float32)
    scale = max(float(np.abs(emb).max()) / 127.0, 1e-12)
    q = np.clip(np.rint(emb / scale), -127, 127).astype(np.int8)
    return q, scale


_INT32_MIN = jnp.int32(-2**31 + 1)


def dense_striped_topk_scan_int8_global(
    emb_qs: jax.Array,  # (s, G, D) int8, ONE shared scale
    valid_s: jax.Array,  # (s, G) bool
    qvec: jax.Array,  # (D,) f32
    pool: int,
    corpus_scale: jax.Array | float,
) -> tuple[jax.Array, jax.Array]:
    """Global-scale int8 fused score+pool scan: per slice ONE int8 MXU
    matmul and integer max/argmax selects — nothing converts to float
    until the final `pool` scores are rescaled once. Compare
    dense_striped_topk_scan_int8 (per-row scales force a float epilogue
    on every slice); examples/int8_scan_tuning.py measures both."""
    s, g, _d = emb_qs.shape
    kk = min(int(pool), g)
    q_scale = jnp.maximum(jnp.max(jnp.abs(qvec)) / 127.0, 1e-12)
    q_q = jnp.clip(jnp.round(qvec / q_scale), -127, 127).astype(jnp.int8)

    def body(carry, sl):
        best, best_r, r = carry
        emb_r, valid_r = sl
        acc = jnp.dot(q_q, emb_r.T, preferred_element_type=jnp.int32)
        acc = jnp.where(valid_r, acc, _INT32_MIN)
        upd = acc > best
        best = jnp.where(upd, acc, best)
        best_r = jnp.where(upd, r, best_r)
        return (best, best_r, r + jnp.int32(1)), None

    init = (jnp.full((g,), _INT32_MIN, jnp.int32),
            jnp.zeros((g,), jnp.int32), jnp.int32(0))
    (best, best_r, _), _ = jax.lax.scan(
        body, init, (emb_qs, valid_s), unroll=True)
    top, gi = jax.lax.top_k(best, kk)
    scores = jnp.where(
        top <= _INT32_MIN, NEG_INF,
        top.astype(jnp.float32) * (jnp.float32(corpus_scale) * q_scale))
    idx = jnp.take(best_r, gi) * g + gi
    return scores, idx.astype(jnp.int32)


def dense_topk_batched(
    emb: jax.Array, qvecs: jax.Array, valid: jax.Array, pool: int
) -> tuple[jax.Array, jax.Array]:
    """Batched variant: qvecs (B, D) -> (B, P) scores and indices.

    One (N, D) x (D, B) matmul keeps the MXU busy across a query batch —
    this is the high-QPS serving path (the reference can only do one query
    at a time).
    """
    sims = jnp.dot(qvecs.astype(emb.dtype), emb.T,
                   preferred_element_type=jnp.float32)  # (B, N)
    sims = jnp.where(valid[None, :], sims, NEG_INF)
    k = min(int(pool), sims.shape[1])
    scores, idx = jax.lax.top_k(sims, k)
    return scores, idx
