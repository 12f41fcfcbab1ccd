"""Pallas TPU kernel: full-corpus BM25 scoring in ONE pass over the postings.

The XLA fallback (ops/bm25.py:bm25_full_scores) scans over the Q query terms
with lax.scan, so the (N, L) doc_terms/doc_tf arrays stream from HBM once
PER TERM — Q x (N*L*8) bytes. At N=1M, L=512, Q=32 that is ~130 GB of HBM
traffic for one query. This kernel tiles the postings into VMEM and computes
all Q term contributions per tile while the block is resident: postings are
read exactly once (~4 GB in the same scenario), a ~Q x reduction in the
dominant cost of the BM25-only retrieval config (BASELINE.json config 2).

Grid: one program per row tile (TILE_N docs). Per tile:
  terms (TILE_N, L) i32, tf (TILE_N, L) f32 in VMEM
  for each query slot q (static Q up to QUERY_TERMS_CAP):
      tf_q   = sum(where(terms == q_terms[q], tf, 0), axis=1)     # VPU
      score += idf[q] * tf_q * (k1+1) / (tf_q + norm)
  norm = k1 * (1 - b + b * doc_len / avgdl)

Query features ride in SMEM (scalars, prefetch-friendly); PAD slots have
idf 0 so they contribute nothing — no branching needed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from review_recommender_tpu.ops.bm25 import B, K1

TILE_N = 256


def _bm25_kernel(q_feat_ref, len_avg_ref, terms_ref, tf_ref, out_ref):
    """q_feat_ref: (2, Q) f32 in SMEM — row 0 term ids (as f32), row 1 idf.
    len_avg_ref: (TILE_N, 1) f32 doc_len block. terms/tf: (TILE_N, L).
    out_ref: (TILE_N, 1) f32 scores."""
    terms = terms_ref[:]  # (Tn, L) int32
    tf = tf_ref[:]  # (Tn, L) f32
    avgdl = q_feat_ref[0, 0]  # slot 0 carries avgdl (see wrapper)
    norm = K1 * (1.0 - B + B * len_avg_ref[:] / avgdl)  # (Tn, 1)

    q = q_feat_ref.shape[1]
    acc = jnp.zeros_like(out_ref)
    for i in range(1, q):  # slot 0 is avgdl; 1..Q are query terms
        tid = q_feat_ref[0, i].astype(jnp.int32)
        idf = q_feat_ref[1, i]
        tf_q = jnp.sum(
            jnp.where(terms == tid, tf, 0.0), axis=1, keepdims=True
        )  # (Tn, 1)
        acc = acc + idf * tf_q * (K1 + 1.0) / (tf_q + norm)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def bm25_full_scores_pallas(
    doc_terms: jax.Array,  # (N, L) int32, N % TILE_N == 0
    doc_tf: jax.Array,  # (N, L) f32
    doc_len: jax.Array,  # (N,) f32
    q_terms: jax.Array,  # (Q,) int32
    q_idf: jax.Array,  # (Q,) f32
    avgdl: jax.Array,  # scalar f32
    interpret: bool = False,
) -> jax.Array:
    n, l = doc_terms.shape
    assert n % TILE_N == 0, f"N={n} must be a multiple of {TILE_N}"
    q = q_terms.shape[0]

    # SMEM payload: [avgdl | term ids] / [0 | idf], f32. PAD terms carry
    # idf 0 => zero contribution. Term ids fit f32 exactly below 2^24
    # (DOC_TERMS vocab ids are far smaller).
    feat = jnp.stack([
        jnp.concatenate([avgdl.reshape(1), q_terms.astype(jnp.float32)]),
        jnp.concatenate([jnp.zeros(1, jnp.float32), q_idf]),
    ])  # (2, Q+1)

    grid = (n // TILE_N,)
    out = pl.pallas_call(
        _bm25_kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # feat rides ahead of the tile stream
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_N, 1), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_N, l), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_N, l), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_N, 1), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * n * l * (q + 1),
            bytes_accessed=n * l * 8 + n * 8,
            transcendentals=0,
        ),
    )(feat, doc_len.reshape(n, 1), doc_terms, doc_tf)
    return out[:, 0]


def bm25_topk_pallas(doc_terms, doc_tf, doc_len, valid, q_terms, q_idf,
                     avgdl, k: int, interpret: bool = False):
    """Standalone BM25 retrieval with the single-pass kernel + lax.top_k."""
    scores = bm25_full_scores_pallas(
        doc_terms, doc_tf, doc_len, q_terms, q_idf, avgdl, interpret=interpret
    )
    scores = jnp.where(valid, scores, -jnp.inf)
    kk = min(int(k), scores.shape[0])
    return jax.lax.top_k(scores, kk)


# --------------------------------------------------------- packed-transposed
# Speed-of-light follow-up (examples/roofline.py): the kernel above measures
# ~15% of its bandwidth bound at the bench shape (N=200k, L=64) for two
# layout reasons: (a) terms (i32) + tf (f32) are separate arrays, 8 bytes of
# HBM per posting for ~12 bits of real information, and (b) L is the minor
# (lane) axis, so at L=64 every vector op wastes half of the VPU's 128
# lanes. The packed variant fixes both: one int32 word per posting,
# (tf << 24) | term_id, stored TRANSPOSED as (L, N) so the lane axis is the
# corpus axis (always tile-aligned). Measured on the v5e chip at N=200k,
# L=64, Q=8: 0.291 ms vs 0.726 ms for the unpacked kernel (2.5x), vs a
# ~0.15 ms VPU/HBM composite bound. Scores are bit-identical (same f32 op
# order; tf round-trips exactly through the 8-bit field).
#
# Applicability is guarded at pack time: integer tf in [0, 255] and term
# ids < 2^24. The reference tokenizer caps docs at 5000 tokens
# (/root/reference/nlp/12_product_prep.py:78) so real tf fits comfortably;
# pack_postings returns None for corpora that don't, and callers fall back
# to the unpacked kernel.

TILE_N_PACKED = 512
_TF_BITS = 8
_TERM_MASK = (1 << 24) - 1


def pack_postings(doc_terms, doc_tf):
    """Host-side pack: (N, L) i32 terms + f32 tf -> (L, N_pad) int32, where
    N_pad rounds N up to TILE_N_PACKED. Returns None when the corpus cannot
    be packed losslessly (non-integer tf, tf > 255, or term ids >= 2^24)."""
    import numpy as np

    terms = np.asarray(doc_terms)
    tf = np.asarray(doc_tf)
    tfi = tf.astype(np.int32)
    if not (
        (tfi == tf).all()
        and 0 <= tfi.min()
        and tfi.max() <= (1 << _TF_BITS) - 1
        and terms.min() >= 0
        and terms.max() <= _TERM_MASK
    ):
        return None
    packed = (tfi << 24) | terms  # tf >= 128 sets the sign bit: fine, the
    # kernel re-extracts it with a masked shift
    n = packed.shape[0]
    n_pad = -(-n // TILE_N_PACKED) * TILE_N_PACKED
    if n_pad != n:
        packed = np.pad(packed, ((0, n_pad - n), (0, 0)))
    return np.ascontiguousarray(packed.T.astype(np.int32))  # (L, N_pad)


def _bm25_packed_kernel(q_feat_ref, len_ref, pk_ref, out_ref):
    """q_feat_ref: (2, Q+1) f32 SMEM (slot 0 = avgdl, see wrapper).
    len_ref: (1, Tn) f32. pk_ref: (L, Tn) int32. out_ref: (1, Tn) f32."""
    pk = pk_ref[:]  # (L, Tn)
    terms = pk & jnp.int32(_TERM_MASK)
    # (pk >> 24) on int32 is an ARITHMETIC shift — tf >= 128 puts the packed
    # word's sign bit on, so mask the low 8 bits after shifting
    tf = ((pk >> 24) & jnp.int32((1 << _TF_BITS) - 1)).astype(jnp.float32)
    avgdl = q_feat_ref[0, 0]
    norm = K1 * (1.0 - B + B * len_ref[:] / avgdl)  # (1, Tn)

    q = q_feat_ref.shape[1]
    acc = jnp.zeros_like(out_ref)
    for i in range(1, q):
        tid = q_feat_ref[0, i].astype(jnp.int32)
        idf = q_feat_ref[1, i]
        tf_q = jnp.sum(jnp.where(terms == tid, tf, 0.0), axis=0,
                       keepdims=True)  # (1, Tn): sum over L = sublane rows
        acc = acc + idf * tf_q * (K1 + 1.0) / (tf_q + norm)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def bm25_full_scores_packed_pallas(
    packed_t: jax.Array,  # (L, N_pad) int32 from pack_postings
    doc_len: jax.Array,  # (N_pad,) f32 (0 on pad rows is fine)
    q_terms: jax.Array,  # (Q,) int32
    q_idf: jax.Array,  # (Q,) f32
    avgdl: jax.Array,  # scalar f32
    interpret: bool = False,
) -> jax.Array:
    """Packed-transposed single-pass BM25: postings read once, 4 B/posting,
    full 128-lane occupancy on the corpus axis. Pad rows (term 0, tf 0)
    score exactly 0 — callers mask with `valid` before top-k anyway."""
    l, n = packed_t.shape
    assert n % TILE_N_PACKED == 0, f"N={n} not {TILE_N_PACKED}-aligned"

    feat = jnp.stack([
        jnp.concatenate([avgdl.reshape(1), q_terms.astype(jnp.float32)]),
        jnp.concatenate([jnp.zeros(1, jnp.float32), q_idf]),
    ])  # (2, Q+1)

    out = pl.pallas_call(
        _bm25_packed_kernel,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // TILE_N_PACKED,),
            in_specs=[
                pl.BlockSpec((1, TILE_N_PACKED), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((l, TILE_N_PACKED), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TILE_N_PACKED), lambda i, *_: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * n * l * (q_terms.shape[0] + 1),
            bytes_accessed=n * l * 4 + n * 8,
            transcendentals=0,
        ),
    )(feat, doc_len.reshape(1, n).astype(jnp.float32), packed_t)
    return out[0]


def bm25_topk_packed_pallas(packed_t, doc_len, valid, q_terms, q_idf,
                            avgdl, k: int, interpret: bool = False):
    """Standalone BM25 retrieval with the packed kernel + lax.top_k.
    `valid`/`doc_len` must be padded to packed_t.shape[1] (pad rows False/0);
    returned indices are corpus row ids (pad rows can't win: -inf)."""
    scores = bm25_full_scores_packed_pallas(
        packed_t, doc_len, q_terms, q_idf, avgdl, interpret=interpret
    )
    scores = jnp.where(valid, scores, -jnp.inf)
    kk = min(int(k), scores.shape[0])
    return jax.lax.top_k(scores, kk)
