"""Pallas TPU kernel prototype: fused stage-A — dense matmul + per-tile
partial top-k in ONE pass over the corpus, winner postings gathered in XLA
(ROADMAP round-1 item #4; VERDICT r1 next-step 6).

Motivation: the XLA stage-A program reads the (N, D) embedding matrix,
materializes (B, N) scores, and runs a global lax.top_k sweep. This kernel
computes, per (TILE_N x D) embedding tile resident in VMEM:

  1. dense scores for the tile:  (TILE_N, D) @ (D, B) on the MXU
  2. per-tile partial top-M per query (M max+mask rounds on the VPU — the
     tile is already in VMEM, so the extra passes are free vs HBM)

so the (B, N) score matrix never materializes in HBM: only (n_tiles, M, B)
tile winners are written. The global merge (top-pool over n_tiles*M) and
the candidate postings gather + masked eager-BM25 run in XLA afterwards —
the pool is ~150 rows, microseconds of work.

NEGATIVE RESULT, RECORDED: a variant that also DMA'd each winner's postings
row from HBM inside the kernel (fusing the BM25 gather into the scan) does
not compile on Mosaic — reading a winner row id back from a VMEM output
needs a dynamic-lane scalar load ("cannot statically prove index in
dimension 2 is a multiple of 128"); routing the ids through SMEM requires
per-lane scalar extracts with the same constraint. The gather belongs in
XLA, where a 150-row take is free. (Interpret-mode worked; compiled did
not — kept here as documentation so the next round doesn't re-walk it.)

MEASURED RESULT — REVISED in round 4: the early "parity" readings (11.5
vs 10.3 ms, 8.2 vs 8.9 ms) were a TIMING ARTIFACT of chaining 20 separate
dispatches, each inheriting ~1.4 ms of tunnel RPC. With the honest
in-program chain (dynamic-trip fori_loop + pair medians, bench._chain_ms)
the kernel measures **1.57 ms vs 7.27 ms XLA (4.64x, pool recall 1.0)**
at N=200k batch=32 against the matmul + global-top_k + gather stage-A
formulation. It still does NOT serve production: the engine's pure-XLA
fused score+pool scan (ops/dense.py:dense_striped_topk_scan) does the
pool in ~0.27 ms per 128-QUERY batch (~2 us/query vs this kernel's
~49 us/query at batch 32) because the scan shares one corpus read across
the whole batch while this kernel's per-tile top-M rounds scale with B.
Kept as measured evidence: Pallas beats XLA's naive stage-A soundly, and
the batch-amortized XLA scan beats both.

APPROXIMATION CONTRACT: the global top-pool is exact only if no single tile
contains more than M of the true top-pool rows. For pool=150 over randomly
distributed scores and M=16 x 98 tiles, recall vs exact top-k is >0.999 in
practice (tested); callers that need exactness use the XLA path. This
mirrors lax.approx_max_k's trade — the kernel exists to measure whether the
blockwise scan beats XLA's matmul+top_k (record the result either way).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 2048
M_PER_TILE = 16


def _stage_a_kernel(q_ref, emb_ref, valid_ref, out_s_ref, out_i_ref):
    """One grid step = one corpus tile.

    q_ref      (D, B) f32 VMEM — query matrix (replicated per tile)
    emb_ref    (TILE_N, D) VMEM tile of the corpus
    valid_ref  (TILE_N, 1) f32 tile (1.0 = real row)
    out_*      (1, M, B) winner dense scores / LOCAL row ids
    """
    emb = emb_ref[:]
    scores = jnp.dot(emb, q_ref[:].astype(emb.dtype),
                     preferred_element_type=jnp.float32)  # (Tn, B)
    neg = jnp.float32(-3.4e38)
    scores = jnp.where(valid_ref[:] > 0, scores, neg)

    tn = scores.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tn, 1), 0)

    # M rounds of (max, argmax, mask) per query — VPU work on a resident tile
    def round_body(m, carry):
        sc = carry
        best = jnp.max(sc, axis=0)  # (B,)
        arg = jnp.argmax(sc, axis=0).astype(jnp.int32)  # (B,)
        out_s_ref[0, m, :] = best
        out_i_ref[0, m, :] = arg
        hit = row_ids == arg[None, :]  # (Tn, B)
        return jnp.where(hit, neg, sc)

    jax.lax.fori_loop(0, M_PER_TILE, round_body, scores)


@functools.partial(jax.jit, static_argnames=("pool", "interpret"))
def stage_a_fused_pallas(
    emb: jax.Array,      # (N, D) bf16/f32, N % TILE_N == 0
    valid: jax.Array,    # (N,) bool
    doc_terms: jax.Array,  # (N, L) i32
    doc_bm25: jax.Array,   # (N, L) f32 eager contributions
    qvecs: jax.Array,    # (B, D) f32
    q_terms: jax.Array,  # (Q,) i32 shared, or (B, Q) per-query term ids
    pool: int,
    interpret: bool = False,
):
    """Fused stage-A: returns (dense (B, pool), idx (B, pool),
    bm25 (B, pool)) — approximate per the module contract."""
    n, d = emb.shape
    assert n % TILE_N == 0, (n, TILE_N)
    b = qvecs.shape[0]
    n_tiles = n // TILE_N

    out_s, out_i = pl.pallas_call(
        _stage_a_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, M_PER_TILE, b), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, M_PER_TILE, b), jnp.int32),
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((d, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, M_PER_TILE, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M_PER_TILE, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * b,
            bytes_accessed=n * d * emb.dtype.itemsize
            + n_tiles * M_PER_TILE * b * 8,
            transcendentals=0,
        ),
    )(
        jnp.asarray(qvecs, jnp.float32).T,
        emb,
        valid.astype(jnp.float32).reshape(n, 1),
    )

    # global merge + winner postings gather + masked BM25, all in XLA:
    # tiny (n_tiles*M, B) tensors and a (B, pool, L) gather
    base = (jnp.arange(n_tiles, dtype=jnp.int32) * TILE_N)[:, None, None]
    flat_s = out_s.reshape(-1, b).T          # (B, n_tiles*M)
    flat_i = (out_i + base).reshape(-1, b).T
    kk = min(pool, flat_s.shape[1])
    dense, sel = jax.lax.top_k(flat_s, kk)
    idx = jnp.take_along_axis(flat_i, sel, axis=1)

    cand_terms = jnp.take(doc_terms, idx, axis=0)   # (B, pool, L)
    cand_bm25 = jnp.take(doc_bm25, idx, axis=0)
    if q_terms.ndim == 1:
        q_terms = jnp.broadcast_to(q_terms[None, :], (b, q_terms.shape[0]))
    match = cand_terms[:, :, :, None] == q_terms[:, None, None, :]
    bm25 = jnp.sum(jnp.where(match, cand_bm25[:, :, :, None], 0.0),
                   axis=(2, 3))
    return dense, idx, bm25
