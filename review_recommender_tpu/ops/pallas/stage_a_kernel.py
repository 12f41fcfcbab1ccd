"""Pallas TPU kernel prototype: fused stage-A — dense matmul + per-tile
partial top-k + candidate postings gather + masked BM25, in ONE pass over
the corpus (ROADMAP round-1 item #4; VERDICT r1 next-step 6).

Motivation: the XLA stage-A program reads the (N, D) embedding matrix for
the matmul, materializes (B, N) scores, runs a global lax.top_k sweep, then
gathers candidate postings in a separate pass. This kernel computes, per
(TILE_N x D) embedding tile resident in VMEM:

  1. dense scores for the tile:  (TILE_N, D) @ (D, B) on the MXU
  2. per-tile partial top-M per query (M max+mask rounds on the VPU — the
     tile is already in VMEM, so the extra passes are free vs HBM)
  3. for each winner row: DMA its (L,) eager-BM25 postings row from HBM
     (~KBs per tile instead of streaming the full (N, L) postings), masked
     sum against the query term ids = the BM25 signal for that candidate

Outputs (n_tiles, M, B) winner scores / global ids / BM25 scores; the tiny
global merge (top-pool over n_tiles*M tile winners) runs in XLA after the
kernel.

APPROXIMATION CONTRACT: the global top-pool is exact only if no single tile
contains more than M of the true top-pool rows. For pool=150 over randomly
distributed scores and M=16, recall vs exact top-k is >0.999 in practice
(tested); callers that need exactness use the XLA path. This mirrors
lax.approx_max_k's trade — the kernel exists to measure whether fusing the
gather+BM25 into the scan pays (record the result either way).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 2048
M_PER_TILE = 16


def _stage_a_kernel(q_ref, qterms_ref, emb_ref, valid_ref, terms_hbm,
                    bm25_hbm, out_s_ref, out_i_ref, out_b_ref,
                    terms_vmem, bm25_vmem, sem):
    """One grid step = one corpus tile.

    q_ref      (D, B) f32 VMEM — query matrix (replicated per tile)
    qterms_ref (1, Q) i32 SMEM-ish VMEM — query term ids (0 = PAD)
    emb_ref    (TILE_N, D) VMEM tile of the corpus
    valid_ref  (TILE_N, 1) f32 tile (1.0 = real row)
    terms_hbm  (N, L) i32 in HBM — postings term ids (manual DMA)
    bm25_hbm   (N, L) f32 in HBM — eager BM25 contributions
    out_*      (M, B) winner dense scores / LOCAL row ids / bm25 scores
    terms_vmem/bm25_vmem (M, L) scratch; sem: DMA semaphores (2,)
    """
    i = pl.program_id(0)
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

    scores = jax.lax.fori_loop(0, M_PER_TILE, round_body, scores)

    # candidate postings gather: for every (round m, query b) winner, DMA
    # its postings row from HBM into a 1-row VMEM slot and compute the
    # masked eager-BM25 sum — M*B tiny row DMAs (~KBs/tile) instead of
    # streaming the full (N, L) postings like the XLA full-corpus scan.
    q_terms = qterms_ref[0, :]  # (Q,) i32

    def bm25_for(m, b, slot):
        row = out_i_ref[0, m, b] + i * TILE_N
        dma_t = pltpu.make_async_copy(
            terms_hbm.at[pl.ds(row, 1), :], terms_vmem.at[pl.ds(slot, 1), :],
            sem.at[0],
        )
        dma_b = pltpu.make_async_copy(
            bm25_hbm.at[pl.ds(row, 1), :], bm25_vmem.at[pl.ds(slot, 1), :],
            sem.at[1],
        )
        dma_t.start()
        dma_b.start()
        dma_t.wait()
        dma_b.wait()
        t = terms_vmem[slot, :]  # (L,)
        v = bm25_vmem[slot, :]
        match = t[:, None] == q_terms[None, :]  # (L, Q)
        return jnp.sum(jnp.where(match, v[:, None], 0.0))

    def m_body(m, _):
        def b_body(b, _):
            out_b_ref[0, m, b] = bm25_for(m, b, 0)
            return 0
        jax.lax.fori_loop(0, out_b_ref.shape[2], b_body, 0)
        return 0

    jax.lax.fori_loop(0, M_PER_TILE, m_body, 0)


@functools.partial(jax.jit, static_argnames=("pool", "interpret"))
def stage_a_fused_pallas(
    emb: jax.Array,      # (N, D) bf16/f32, N % TILE_N == 0
    valid: jax.Array,    # (N,) bool
    doc_terms: jax.Array,  # (N, L) i32
    doc_bm25: jax.Array,   # (N, L) f32 eager contributions
    qvecs: jax.Array,    # (B, D) f32
    q_terms: jax.Array,  # (Q,) i32
    pool: int,
    interpret: bool = False,
):
    """Fused stage-A: returns (dense (B, pool), idx (B, pool),
    bm25 (B, pool)) — approximate per the module contract."""
    n, d = emb.shape
    assert n % TILE_N == 0, (n, TILE_N)
    b = qvecs.shape[0]
    l = doc_terms.shape[1]
    n_tiles = n // TILE_N

    grid = (n_tiles,)
    out_s, out_i, out_b = pl.pallas_call(
        _stage_a_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, M_PER_TILE, b), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, M_PER_TILE, b), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, M_PER_TILE, b), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_terms.shape[0]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # postings stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, M_PER_TILE, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M_PER_TILE, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M_PER_TILE, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, l), jnp.int32),
            pltpu.VMEM((1, l), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * b,
            bytes_accessed=n * d * emb.dtype.itemsize + n_tiles * M_PER_TILE
            * b * (2 * l * 4 + 12),
            transcendentals=0,
        ),
    )(
        jnp.asarray(qvecs, jnp.float32).T,
        q_terms.reshape(1, -1),
        emb,
        valid.astype(jnp.float32).reshape(n, 1),
        doc_terms,
        doc_bm25,
    )

    # global merge in XLA: tiny (n_tiles*M, B) tensors
    base = (jnp.arange(n_tiles, dtype=jnp.int32) * TILE_N)[:, None, None]
    flat_s = out_s.reshape(-1, b).T          # (B, n_tiles*M)
    flat_i = (out_i + base).reshape(-1, b).T
    flat_b = out_b.reshape(-1, b).T
    kk = min(pool, flat_s.shape[1])
    dense, sel = jax.lax.top_k(flat_s, kk)
    idx = jnp.take_along_axis(flat_i, sel, axis=1)
    bm25 = jnp.take_along_axis(flat_b, sel, axis=1)
    return dense, idx, bm25
