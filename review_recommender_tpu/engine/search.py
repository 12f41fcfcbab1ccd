"""SearchEngine: the end-to-end hybrid query path.

One engine object owns the device-resident corpus arrays and exposes
`run_search` with the exact parameter surface of the reference engine
(app/app_product_search.py:245-248), consumed by the CLI, the HTTP server
and the eval harness alike (the reference shipped two divergent engine
copies — SURVEY.md §3.2; this build has one).

Execution plan per query:

  host   encode query (injectable encoder; JAX bi-encoder by default)
  host   featurize: query term ids + idf, gate masks      (engine/featurize)
  jit A  dense top-pool -> gather candidate features -> BM25 -> device gate
  host   (optional) cross-encoder scores for the first rr_k candidates
  host   (optional, GATE_MODE=host) exact substring gate over the pool
  jit B  fused scoring (minmax/prior/trust/gate/blend) -> top-k
  jit S  (optional) snippet segment-max over review embeddings

Stages A and B are separate compiled programs only because the cross-encoder
and exact-gate hooks need candidate identity on host between them; the
rerank-free path can use `query_fused` (single compiled program, used by the
benchmark and the sharded engine).
"""
from __future__ import annotations

import functools
import logging
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from review_recommender_tpu.config import config
from review_recommender_tpu.engine.featurize import QueryFeaturizer
from review_recommender_tpu.engine.hooks import (
    SIGNAL_ORDER,
    SNIPPET_NONE,
    SplitPathHooksMixin,
    assemble_result_rows,
    resolve_search_knobs,
)
from review_recommender_tpu.engine.rerank_coalesce import RerankCoalesceMixin
from review_recommender_tpu.engine.snippets import HostSnippetsMixin
from review_recommender_tpu.index.schema import IndexBundle
from review_recommender_tpu.ops.bm25 import bm25_candidate_scores

from review_recommender_tpu.ops.fusion import (
    FusionWeights,
    final_topk,
    fuse_candidates,
)
from review_recommender_tpu.ops.gate import gate_factors_device
from review_recommender_tpu.ops.segment import best_review_scores
from review_recommender_tpu.utils.numerics import device_fetch

logger = logging.getLogger(__name__)

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}


def build_pairs_device(cls_id, sep_id, q_raw, q_len, d_tok, d_len):
    """Device-side [CLS] q [SEP] d [SEP] pair assembly with exact HF layout
    (no gaps: dynamic_update_slice at the true query length). Shared by the
    single-chip and sharded e2e paths."""
    Lq = q_raw.shape[0]
    Sd = d_tok.shape[1]
    W = Lq + Sd + 3

    pos = jnp.arange(W)
    head = jnp.zeros(W, jnp.int32).at[0].set(cls_id)
    head = jax.lax.dynamic_update_slice(head, q_raw, (1,))
    # zero q padding past q_len, THEN place the sep (order matters)
    head = jnp.where((pos > q_len) & (pos < 1 + Lq), 0, head)
    head = head.at[1 + q_len].set(sep_id)

    def one(drow, dlen):
        dd = jnp.zeros(Sd + 1, jnp.int32)
        dd = jax.lax.dynamic_update_slice(dd, drow, (0,))
        dd = jnp.where(jnp.arange(Sd + 1) >= dlen, 0, dd)
        dd = dd.at[dlen].set(sep_id)
        row = jax.lax.dynamic_update_slice(head, dd, (q_len + 2,))
        total = q_len + 2 + dlen + 1
        mask = (pos < total).astype(jnp.int32)
        tt = ((pos >= q_len + 2) & (pos < total)).astype(jnp.int32)
        return row, mask, tt

    return jax.vmap(one)(d_tok, d_len)


def encode_query_ids_device(cls_id, sep_id, q_raw, q_len):
    """[CLS] q [SEP] input assembly for the bi-encoder query forward."""
    Lq = q_raw.shape[0]
    bpos = jnp.arange(Lq + 2)
    b_ids = jnp.zeros(Lq + 2, jnp.int32).at[0].set(cls_id)
    b_ids = jax.lax.dynamic_update_slice(b_ids, q_raw, (1,))
    b_ids = jnp.where((bpos > q_len) & (bpos < 1 + Lq), 0, b_ids)
    b_ids = b_ids.at[1 + q_len].set(sep_id)
    b_mask = (bpos < q_len + 2).astype(jnp.int32)
    return b_ids, b_mask


class SearchEngine(HostSnippetsMixin, RerankCoalesceMixin,
                   SplitPathHooksMixin):
    def __init__(
        self,
        bundle: IndexBundle,
        *,
        emb_dtype: Optional[str] = None,
        query_encoder: Optional[Callable[[str], np.ndarray]] = None,
        cross_encoder: Optional[Callable[[str, List[str]], np.ndarray]] = None,
        gate_mode: Optional[str] = None,
        dense_pool: Optional[str] = None,
    ):
        self.bundle = bundle
        self.products = bundle.products
        self.reviews = bundle.reviews
        raw_dtype = emb_dtype or config.EMB_DTYPE
        self.int8_mode = raw_dtype == "int8"
        self.dtype = jnp.bfloat16 if self.int8_mode else _DTYPES[raw_dtype]
        self.gate_mode = gate_mode or config.GATE_MODE
        # "exact" = lax.top_k over the corpus (oracle parity); "striped" =
        # two-stage stripe-max pool (ops/dense.py:striped_topk, ~2x faster
        # stage-A, exact scores, ~0.99 pool recall); "auto" resolves by
        # corpus size (config.resolve_pool_mode — striped from
        # DENSE_POOL_AUTO_MIN padded rows up, where the measured win is
        # 1.3x at batch>=128; exact below, keeping test/parity corpora
        # bit-identical to the reference oracle)
        self.dense_pool = config.resolve_pool_mode(
            dense_pool or config.DENSE_POOL_MODE,
            bundle.products.n_padded,
        )
        self.dense_stripes = config.DENSE_POOL_STRIPES
        self.query_encoder = query_encoder
        self.cross_encoder = cross_encoder

        # own the HBM budget BEFORE placing anything: the padded postings
        # alone cost 4 KB/doc at L=512 (~4 GB at N=1M), and discovering
        # that via a device OOM mid-placement is not a load-time contract
        from review_recommender_tpu.index.schema import enforce_hbm_fit

        if self.dense_pool == "ivf" and self.int8_mode:
            raise ValueError(
                "DENSE_POOL_MODE=ivf needs a bf16/f32 corpus (the block "
                "tensor is packed from `emb`); use EMB_DTYPE=bfloat16 or "
                "the striped pool for int8 corpora"
            )
        self.hbm_report = enforce_hbm_fit(
            bundle, self.dtype, quantize_int8=self.int8_mode,
            striped=(self.dense_pool == "striped"),
            ivf=(self.dense_pool == "ivf"), n_shards=1,
        )

        self.arrays = self.products.device_arrays(
            self.dtype, quantize_int8=self.int8_mode
        )
        if self.dense_pool == "striped" and "emb" in self.arrays:
            # one-time (s, G, D) slicing for the fused score+pool scan;
            # the flat emb stays for the exact/full-scan paths (~+1 corpus
            # of HBM, 153 MB at N=200k bf16 — cheap next to the 2.6->1.3 ms
            # stage-A saving)
            from review_recommender_tpu.ops.dense import (
                slice_corpus_for_striped,
            )

            self.arrays["emb_s"], self.arrays["valid_s"] = (
                slice_corpus_for_striped(self.arrays["emb"],
                                         self.arrays["valid"],
                                         self.dense_stripes)
            )
        elif self.dense_pool == "striped" and "emb_q" in self.arrays:
            from review_recommender_tpu.ops.dense import (
                slice_corpus_for_striped_int8,
            )

            (self.arrays["emb_qs"], self.arrays["emb_scale_s"],
             self.arrays["valid_s"]) = slice_corpus_for_striped_int8(
                self.arrays["emb_q"], self.arrays["emb_scale"],
                self.arrays["valid"], self.dense_stripes)
        elif self.dense_pool == "ivf":
            # one-time k-means + cluster-order packing (ops/ivf.py); the
            # block tensor is the corpus re-gathered in cluster order, so
            # like the striped slices it adds ~1 corpus of emb to HBM
            from review_recommender_tpu.ops.ivf import (
                build_ivf,
                ivf_device_arrays,
            )

            self.ivf = build_ivf(
                self.products.emb, self.products.valid,
                n_centroids=config.IVF_CENTROIDS,
                block_rows=config.IVF_BLOCK_ROWS,
            )
            self.ivf_nprobe = config.IVF_NPROBE
            self.arrays.update(
                ivf_device_arrays(self.ivf, self.products.emb, self.dtype)
            )
            if config.IVF_SELFCHECK_QUERIES > 0:
                from review_recommender_tpu.ops.ivf import (
                    measure_pool_recall,
                )

                a = self.arrays
                self.ivf_pool_recall = measure_pool_recall(
                    a["emb"], a["valid"],
                    (a["ivf_centroids"], a["ivf_blocks"],
                     a["ivf_block_valid"], a["ivf_block_rows"],
                     a["ivf_block_centroid"]),
                    pool=min(config.DEFAULT_POOL_SIZE,
                             self.products.n_padded),
                    nprobe=self.ivf_nprobe,
                    n_queries=config.IVF_SELFCHECK_QUERIES,
                )
                if self.ivf_pool_recall < config.IVF_SELFCHECK_MIN:
                    logger.warning(
                        "IVF pool recall self-check: %.3f < %.2f on this "
                        "corpus (recall is data-dependent; this embedding "
                        "space may be weakly clustered). Raise IVF_NPROBE "
                        "(now %d) or use the exact/striped pool.",
                        self.ivf_pool_recall, config.IVF_SELFCHECK_MIN,
                        self.ivf_nprobe,
                    )
                else:
                    logger.info("IVF pool recall self-check: %.3f "
                                "(nprobe=%d)", self.ivf_pool_recall,
                                self.ivf_nprobe)
        self.avgdl = jnp.float32(self.products.avgdl if self.products.avgdl else 1.0)
        self.n_docs = self.products.n_docs

        self.rev_arrays = None
        if self.reviews is not None:
            self.rev_arrays = self.reviews.device_arrays(self.dtype)
        # host CSR over reviews for snippet-text recovery
        self._build_rev_csr()

        self.featurizer = QueryFeaturizer(
            self.products, query_terms_cap=config.QUERY_TERMS_CAP
        )
        self._pallas_usable = None  # resolved lazily by _pallas_ok()
        self._bm25_packed_cache = False  # False = unresolved, None = n/a
        self._be = None  # JAX towers for query_e2e (attach_models)
        self._ce = None

        self._stage_a = jax.jit(self._stage_a_impl, static_argnames=("pool",))
        self._stage_b = jax.jit(self._stage_b_impl, static_argnames=("k",))
        self._snippet_scores = jax.jit(self._snippet_scores_impl)
        self._fused = jax.jit(self._fused_impl, static_argnames=("pool", "k"))
        self._fused_batch = jax.jit(
            self._fused_batch_impl, static_argnames=("pool", "k")
        )
        self._fused_packed = jax.jit(
            self._fused_packed_impl, static_argnames=("pool", "k")
        )
        self._fused_packed_batch = jax.jit(
            self._fused_packed_batch_impl, static_argnames=("pool", "k")
        )
        self._fused_packed_pw = jax.jit(
            self._fused_packed_pw_impl, static_argnames=("pool", "k")
        )
        self._fused_packed1 = jax.jit(
            self._fused_packed1_impl, static_argnames=("pool", "k")
        )
        self._rerank_a = jax.jit(
            self._rerank_a_impl, static_argnames=("pool",)
        )

    def _dense_topk(self, a, qvec, pool):
        """f32/bf16 or int8-quantized dense pool, by what the arrays hold;
        pool selection per self.dense_pool (exact top_k | striped). Striped
        indices are clamped into [0, n_padded): -inf pad lanes can carry
        stripe-padding row ids past the corpus, and host callers index
        products.skus with the returned ids (the sharded path clamps the
        same way, parallel/sharded.py)."""
        n_hi = self.products.n_padded - 1
        if self.dense_pool == "ivf" and "ivf_blocks" in a:
            from review_recommender_tpu.ops.ivf import ivf_topk

            s, i = ivf_topk(
                a["ivf_centroids"], a["ivf_blocks"], a["ivf_block_valid"],
                a["ivf_block_rows"], a["ivf_block_centroid"], qvec,
                pool, self.ivf_nprobe,
            )
            return s, jnp.minimum(i, n_hi)
        if "emb_q" in a:
            if self.dense_pool == "striped" and "emb_qs" in a:
                from review_recommender_tpu.ops.dense import (
                    dense_striped_topk_scan_int8,
                )

                s, i = dense_striped_topk_scan_int8(
                    a["emb_qs"], a["emb_scale_s"], a["valid_s"], qvec, pool)
                return s, jnp.minimum(i, n_hi)
            from review_recommender_tpu.ops.dense import dense_scores_int8

            sims = dense_scores_int8(a["emb_q"], a["emb_scale"], qvec,
                                     a["valid"])
        else:
            if self.dense_pool == "striped" and "emb_s" in a:
                # fused score+pool scan: the (B, N) sims never hit HBM
                # (ops/dense.py:dense_striped_topk_scan — 2.6 -> ~0.4 ms
                # per 32-query batch at N=200k)
                from review_recommender_tpu.ops.dense import (
                    dense_striped_topk_scan,
                )

                s, i = dense_striped_topk_scan(a["emb_s"], a["valid_s"],
                                               qvec, pool)
                return s, jnp.minimum(i, n_hi)
            from review_recommender_tpu.ops.dense import dense_scores

            sims = dense_scores(a["emb"], qvec, a["valid"])
        if self.dense_pool == "striped":
            from review_recommender_tpu.ops.dense import striped_topk

            s, i = striped_topk(sims, pool, self.dense_stripes)
            return s, jnp.minimum(i, n_hi)
        k = min(int(pool), sims.shape[-1])
        return jax.lax.top_k(sims, k)

    # ------------------------------------------------------------------ jit A
    # NOTE: all jitted impls take the corpus arrays as ARGUMENTS rather than
    # closures — closed-over arrays get serialized into the (remote) compile
    # payload, which breaks large corpora; as parameters they are runtime
    # buffers, invisible to the compiler.
    def _stage_a_impl(self, a, qvec, q_terms, q_idf, gp_mask, gt_ids, g_valid, *, pool):
        dense_raw, idx = self._dense_topk(a, qvec, pool)
        cand_valid = jnp.isfinite(dense_raw)
        take = lambda arr: jnp.take(arr, idx, axis=0)
        doc_terms = take(a["doc_terms"])
        if "doc_bm25" in a:  # eager-scored postings: masked sum only
            from review_recommender_tpu.ops.bm25 import bm25_candidate_scores_eager

            bm25_raw = bm25_candidate_scores_eager(
                doc_terms, take(a["doc_bm25"]), q_terms
            )
        else:
            bm25_raw = bm25_candidate_scores(
                doc_terms, take(a["doc_tf"]), take(a["doc_len"]),
                q_terms, q_idf, self.avgdl,
            )
        gate_dev, gate_hits = gate_factors_device(
            take(a["gate_bits"]), doc_terms, gp_mask, gt_ids, g_valid,
            jnp.float32(1.0),  # penalty applied in stage B: return miss counts
        )
        return {
            "idx": idx,
            "dense_raw": dense_raw,
            "cand_valid": cand_valid,
            "bm25_raw": bm25_raw,
            "gate_hits": gate_hits,
            "n_groups": jnp.sum(g_valid.astype(jnp.int32)),
            "n_reviews": take(a["n_reviews"]),
            "avg_stars": take(a["avg_stars"]),
        }

    # ------------------------------------------------------------------ jit B
    def _stage_b_impl(
        self, st, rerank_raw, rerank_mask, best_raw, has_snippets, gate, w, *, k
    ):
        res = fuse_candidates(
            st["dense_raw"], st["bm25_raw"], rerank_raw, rerank_mask,
            best_raw, has_snippets, st["n_reviews"], st["avg_stars"],
            gate, st["cand_valid"], w,
        )
        scores, pos = final_topk(res, k)
        return res, scores, pos

    # ------------------------------------------------------------- jit snippets
    def _snippet_scores_full(self, qvec):
        """SplitPathHooksMixin hook: (n_docs,) best review sim per product
        (SNIPPET_NONE where a product has none)."""
        return self._snippet_scores(self.rev_arrays, qvec)

    def _snippet_scores_impl(self, r, qvec):
        return best_review_scores(
            r["rev_emb"], r["rev_product"], r["rev_valid"], qvec, self.n_docs
        )

    # --------------------------------------------------------------- fused path
    def _fused_impl(self, a, rev, qvec, q_terms, q_idf, gp_mask, gt_ids,
                    g_valid, w, use_snips, *, pool, k):
        """Single-program query (no cross-encoder, device gate)."""
        st = self._stage_a_impl(a, qvec, q_terms, q_idf, gp_mask, gt_ids,
                                g_valid, pool=pool)
        P = pool
        if rev is not None:
            best_full = self._snippet_scores_impl(rev, qvec)
            best_pad = jnp.zeros(self.products.n_padded, jnp.float32)
            best_pad = best_pad.at[: self.n_docs].set(
                jnp.where(best_full > SNIPPET_NONE, best_full, 0.0)
            )
            best_raw = jnp.where(use_snips, jnp.take(best_pad, st["idx"]), 0.0)
            has_snips = use_snips & jnp.any(best_raw != 0)  # != 0, not > 0:
                # the host split path keeps all-negative sims as a computed
                # lane ((best_raw != 0).any()) and the fusion minmaxes them;
                # > 0 would silently zero the lane and drift from run_search
        else:
            best_raw = jnp.zeros(P, jnp.float32)
            has_snips = jnp.bool_(False)
        gate = jnp.power(
            w.gate_penalty,
            (st["n_groups"] - st["gate_hits"]).astype(jnp.float32),
        )
        res = fuse_candidates(
            st["dense_raw"], st["bm25_raw"],
            jnp.zeros(P, jnp.float32), jnp.zeros(P, jnp.bool_),
            best_raw, has_snips, st["n_reviews"], st["avg_stars"],
            gate, st["cand_valid"], w,
        )
        scores, pos = final_topk(res, k)
        # per-signal breakdown gathered at the winners ON DEVICE, so a full
        # /search response costs one tiny (k, 7) fetch instead of 8 pool-
        # sized fetches (serve/api micro-batching path)
        bd = jnp.stack(
            [jnp.take(x, pos) for x in (res.dense, res.bm25, res.rerank,
                                        res.prior, res.best, res.trust,
                                        res.gate)],
            axis=-1,
        )
        return jnp.take(st["idx"], pos), scores, bd

    # ------------------------------------------- coalesced rerank (2 programs)
    def _rerank_a_impl(self, a, rev, qp, use_snips, *, pool):
        """Batched stage A for the rerank-coalescing server path: everything
        the fused program computes BEFORE fusion (pool, BM25, gate, snippet
        scores), returned batched so the host can run ONE cross-encoder pass
        over every rider's pairs between this and _rerank_b_impl. Rows of qp
        are [qvec | packed features | 8 fusion weights] (per-query knobs,
        same layout as _fused_packed_pw_impl)."""
        d = self.products.dim

        def one(row):
            qvec = row[:d]
            packed = row[d:-8]
            w = FusionWeights(*(row[-8 + i] for i in range(8)))
            st = self._stage_a_impl(a, qvec, *self._unpack(packed), pool=pool)
            if rev is not None:
                best_full = self._snippet_scores_impl(rev, qvec)
                best_pad = jnp.zeros(self.products.n_padded, jnp.float32)
                best_pad = best_pad.at[: self.n_docs].set(
                    jnp.where(best_full > SNIPPET_NONE, best_full, 0.0)
                )
                best_raw = jnp.where(
                    use_snips, jnp.take(best_pad, st["idx"]), 0.0
                )
                has_snips = use_snips & jnp.any(best_raw != 0)  # != 0, not > 0:
                # the host split path keeps all-negative sims as a computed
                # lane ((best_raw != 0).any()) and the fusion minmaxes them;
                # > 0 would silently zero the lane and drift from run_search
            else:
                best_raw = jnp.zeros(pool, jnp.float32)
                has_snips = jnp.bool_(False)
            gate = jnp.power(
                w.gate_penalty,
                (st["n_groups"] - st["gate_hits"]).astype(jnp.float32),
            )
            return st, best_raw, has_snips, gate

        return jax.vmap(one)(qp)

    def _rerank_stage_a(self, qp, use_snips, pool):
        """RerankCoalesceMixin hook: one jitted batched stage-A call.
        query_rerank_batched_pw (the host orchestration + stage B) lives in
        engine/rerank_coalesce.py, shared with the mesh engine."""
        return self._rerank_a(
            self.arrays, self.rev_arrays, jnp.asarray(qp),
            jnp.bool_(use_snips), pool=pool,
        )

    # --------------------------------------------------- fully on-device e2e
    def attach_models(self, biencoder, crossencoder=None):
        """Attach JAX towers for query_e2e: the WHOLE query — bi-encoder
        forward, dense+BM25 retrieval, on-device cross-encoder rerank over
        pre-tokenized doc tokens (index/build.py:attach_rerank_tokens),
        fusion, top-k — compiles into ONE XLA program with zero host round
        trips after tokenization. Also wires the host-path hooks so
        run_search uses the same towers."""
        self._be = biencoder
        self._ce = crossencoder
        if self.query_encoder is None:
            self.query_encoder = biencoder
        if self.cross_encoder is None and crossencoder is not None:
            self.cross_encoder = crossencoder
        self._e2e = jax.jit(
            self._e2e_impl, static_argnames=("pool", "k", "rr_k")
        )

    def _build_pairs(self, q_raw, q_len, d_tok, d_len):
        be_tok = self._be.tokenizer
        return build_pairs_device(
            be_tok.cls_id, be_tok.sep_id, q_raw, q_len, d_tok, d_len
        )

    def _e2e_impl(self, a, be_params, ce_params, q_raw, q_len, packed, w,
                  *, pool, k, rr_k):
        be = self._be
        Lq = q_raw.shape[0]
        # bi-encoder forward: [CLS] q [SEP]
        b_ids, b_mask = encode_query_ids_device(
            be.tokenizer.cls_id, be.tokenizer.sep_id, q_raw, q_len
        )
        qvec = be.model.apply(
            {"params": be_params}, b_ids[None], b_mask[None]
        )[0]

        st = self._stage_a_impl(a, qvec, *self._unpack(packed), pool=pool)
        P = st["idx"].shape[0]

        if rr_k > 0 and self._ce is not None:
            rows = st["idx"][:rr_k]
            d_tok = jnp.take(a["doc_tokens"], rows, axis=0)
            d_len = jnp.take(a["doc_token_len"], rows)
            # pair width [CLS] q [SEP] d [SEP] must fit the cross-encoder's
            # position budget
            sd_max = self._ce.cfg.max_position - Lq - 3
            if sd_max < d_tok.shape[1]:
                d_tok = d_tok[:, :sd_max]
                d_len = jnp.minimum(d_len, sd_max)
            p_ids, p_mask, p_tt = self._build_pairs(q_raw, q_len, d_tok, d_len)
            ce_scores = self._ce.model.apply(
                {"params": ce_params}, p_ids, p_mask, p_tt
            )  # (rr_k,)
            rerank_raw = jnp.zeros(P, jnp.float32).at[:rr_k].set(ce_scores)
            rerank_mask = (jnp.arange(P) < rr_k) & st["cand_valid"]
        else:
            rerank_raw = jnp.zeros(P, jnp.float32)
            rerank_mask = jnp.zeros(P, jnp.bool_)

        gate = jnp.power(
            w.gate_penalty,
            (st["n_groups"] - st["gate_hits"]).astype(jnp.float32),
        )
        res = fuse_candidates(
            st["dense_raw"], st["bm25_raw"], rerank_raw, rerank_mask,
            jnp.zeros(P, jnp.float32), jnp.bool_(False),
            st["n_reviews"], st["avg_stars"], gate, st["cand_valid"], w,
        )
        scores, posn = final_topk(res, min(k, P))
        return jnp.take(st["idx"], posn), scores, qvec

    def query_e2e(self, query: str, w: FusionWeights, pool: int, k: int,
                  rr_k: int = 0):
        """One-device-program query including the encoder(s). Requires
        attach_models(); rerank additionally requires an index built with
        attach_rerank_tokens. Returns (row ids (k,), scores (k,))."""
        if not hasattr(self, "_e2e"):
            raise RuntimeError("call attach_models(biencoder[, crossencoder]) first")
        if not config.ENABLE_RERANKING:
            rr_k = 0
        if rr_k > 0 and "doc_tokens" not in self.arrays:
            raise RuntimeError(
                "index has no doc_tokens; build with attach_rerank_tokens()"
            )
        Lq_cap = 30  # query token budget ([CLS] + 30 + [SEP] = 32 lanes)
        ids = self._be.tokenizer.token_ids(query)[:Lq_cap]
        q_raw = np.zeros(Lq_cap, np.int32)
        q_raw[: len(ids)] = ids
        packed = self.featurizer.featurize_packed(query)
        ce_params = self._ce.params if self._ce is not None else None
        rows, scores, _q = self._e2e(
            self.arrays, self._be.params, ce_params,
            jnp.asarray(q_raw), jnp.int32(len(ids)),
            jnp.asarray(packed), w,
            pool=min(pool, self.products.n_padded), k=k, rr_k=rr_k,
        )
        return rows, scores

    # ------------------------------------------------------------- packed entry
    def _unpack(self, packed):
        from review_recommender_tpu.engine.featurize import unpack_features

        return unpack_features(
            packed, self.featurizer.query_terms_cap,
            self.featurizer.gate_terms_cap,
        )

    def _fused_packed_impl(self, a, rev, qp, w, use_snips, *, pool, k):
        """query_fused with the query vector AND features in ONE combined
        buffer [qvec (D,) | packed features]: a query costs a single
        host->device transfer (each transfer to the tunneled TPU costs
        ~0.15-1 ms of latency, so transfer COUNT dominates single-stream
        QPS)."""
        d = self.products.dim
        qvec, packed = qp[:d], qp[d:]
        return self._fused_impl(a, rev, qvec, *self._unpack(packed), w,
                                use_snips, pool=pool, k=k)

    def _fused_packed_batch_impl(self, a, rev, qp, w, use_snips, *, pool, k):
        f = functools.partial(self._fused_packed_impl, pool=pool, k=k)
        return jax.vmap(f, in_axes=(None, None, 0, None, None))(
            a, rev, qp, w, use_snips
        )

    def _fused_packed_pw_impl(self, a, rev, qp, use_snips, *, pool, k):
        """Per-query fusion weights: each combined row carries its own 8
        weight scalars at the tail ([qvec | features | weights]), so a
        coalesced batch of requests with DIFFERENT knobs still runs as ONE
        device program with ONE transfer (serve/api.py micro-batcher)."""
        d = self.products.dim

        def one(row):
            qvec = row[:d]
            packed = row[d:-8]
            w = FusionWeights(*(row[-8 + i] for i in range(8)))
            return self._fused_impl(a, rev, qvec, *self._unpack(packed), w,
                                    use_snips, pool=pool, k=k)

        return jax.vmap(one)(qp)

    def _fused_packed1_impl(self, a, rev, qp, w, use_snips, *, pool, k):
        """Fused query with ONE output buffer (k, 9) f32 = [row id, final,
        dense, bm25, rerank, prior, best, trust, gate]: a streaming client
        pays a single device->host read per query (row ids are exact in f32
        below 2^24 rows). See bench.py chunked streaming."""
        rows, scores, bd = self._fused_packed_impl(a, rev, qp, w, use_snips,
                                                   pool=pool, k=k)
        return jnp.concatenate(
            [rows.astype(jnp.float32)[:, None], scores[:, None], bd], axis=1
        )

    def query_fused1(self, qvec, query: str, w: FusionWeights, pool: int,
                     k: int, use_snips: bool = False):
        """query_fused variant returning ONE device array (k, 9) f32 —
        split host-side with split_fused1. One h2d transfer in, one d2h
        read out: the minimum possible tunnel round trips per query."""
        use_snips = bool(use_snips) and config.ENABLE_SNIPPETS
        packed = self.featurizer.featurize_packed(query)
        return self._fused_packed1(
            self.arrays, self.rev_arrays,
            jnp.asarray(self._combined(qvec, packed)),
            w, jnp.bool_(use_snips),
            pool=min(pool, self.products.n_padded), k=k,
        )

    @staticmethod
    def split_fused1(out: np.ndarray):
        """(k, 9) host buffer -> (row ids (k,) int64, final scores (k,))."""
        out = np.asarray(out)
        return out[:, 0].astype(np.int64), out[:, 1]

    def _combined(self, qvec, packed) -> np.ndarray:
        qv = np.asarray(qvec, np.float32).reshape(-1)
        return np.concatenate([qv, packed])

    # ------------------------------------------------------------ batched fused
    def _fused_batch_impl(self, self_arrays, rev, qvecs, q_terms, q_idf,
                          gp_mask, gt_ids, g_valid, w, use_snips, *, pool, k):
        """vmap of the fused query over the batch axis. XLA turns the B
        vmapped (N, D) @ (D,) products into ONE (N, D) @ (D, B) matmul, so
        the MXU amortizes the HBM sweep of the corpus across the batch —
        the reference's architecture (one pandas pass per query) cannot do
        this at all."""
        f = functools.partial(self._fused_impl, pool=pool, k=k)
        return jax.vmap(
            f, in_axes=(None, None, 0, 0, 0, 0, 0, 0, None, None)
        )(self_arrays, rev, qvecs, q_terms, q_idf, gp_mask, gt_ids, g_valid,
          w, use_snips)

    def query_fused_batched(self, qvecs, queries: List[str], w: FusionWeights,
                            pool: int, k: int, use_snips: bool = False):
        """Batched single-program hybrid search (no rerank): qvecs (B, D),
        B query strings -> (row ids (B, k), scores (B, k))."""
        use_snips = bool(use_snips) and config.ENABLE_SNIPPETS
        packed = self.featurizer.featurize_packed_batch(queries)
        qp = np.concatenate(
            [np.asarray(qvecs, np.float32), packed], axis=1
        )
        rows, scores, _bd = self._fused_packed_batch(
            self.arrays, self.rev_arrays, jnp.asarray(qp),
            w, jnp.bool_(use_snips),
            pool=min(pool, self.products.n_padded), k=k,
        )
        return rows, scores

    def query_fused_batched_pw(self, qvecs, queries: List[str],
                               weights: List[FusionWeights], pool: int,
                               k: int, use_snips: bool = False):
        """Batched fused search with PER-QUERY fusion weights (the
        micro-batching server coalesces concurrent requests with different
        knobs into one program). `weights` entries are 8-float sequences in
        FusionWeights field order (pass plain floats — device scalars would
        cost 8 d2h syncs each). Returns (rows (B,k), scores (B,k),
        breakdown (B,k,7) [dense,bm25,rerank,prior,best,trust,gate])."""
        use_snips = bool(use_snips) and config.ENABLE_SNIPPETS
        packed = self.featurizer.featurize_packed_batch(queries)
        wmat = np.asarray([tuple(map(float, w)) for w in weights], np.float32)
        qp = np.concatenate(
            [np.asarray(qvecs, np.float32), packed, wmat], axis=1
        )
        rows, scores, bd = self._fused_packed_pw(
            self.arrays, self.rev_arrays, jnp.asarray(qp),
            jnp.bool_(use_snips),
            pool=min(pool, self.products.n_padded), k=k,
        )
        return rows, scores, bd

    # ------------------------------------------------------------------ public
    def encode_query(self, query: str) -> np.ndarray:
        if self.query_encoder is None:
            raise RuntimeError(
                "No query encoder configured. Pass query_encoder= to "
                "SearchEngine (e.g. models.biencoder JAX encoder) or supply "
                "precomputed query vectors via run_search(qvec=...)."
            )
        v = np.asarray(self.query_encoder(query), dtype=np.float32).reshape(-1)
        n = np.linalg.norm(v)
        return v / max(n, 1e-12)

    def run_search(
        self,
        query: str,
        k: int = None,
        rerank_k: int = None,
        w_dense: float = None,
        w_bm25: float = None,
        w_rerank: float = None,
        w_prior: float = None,
        w_best: float = None,
        prior_C: float = None,
        use_snips: bool = False,
        max_scan: int = 0,  # 0 = full device scan; >0 / -1 = exact host mode
        min_reviews: int = None,
        gate_penalty: float = None,
        qvec: Optional[np.ndarray] = None,
    ):
        """Hybrid search. Returns (DataFrame, snippets, debug) like the
        reference run_search (app/app_product_search.py:245-317).

        `max_scan` semantics: the default (0) scans ALL review embeddings in
        one device HBM sweep — the reference caps scanned rows at max_scan
        (default 300k) only because its numpy path is CPU-bound
        (app:320-346), so truncating here would only lose recall. Passing
        max_scan > 0 opts into the EXACT reference semantics for eval-parity
        runs: candidate review rows taken in file order, truncated at
        max_scan, scored on host (_exact_snippets). max_scan == -1 uses
        config.MAX_REVIEWS_SCAN as the cap (the reference's default)."""
        c = config
        k, rerank_k, gate_pen_h, w = resolve_search_knobs(
            k, rerank_k, w_dense, w_bm25, w_rerank, w_prior, w_best,
            prior_C, min_reviews, gate_penalty,
        )

        from review_recommender_tpu.utils.profiling import StageTimer

        timer = StageTimer()
        if qvec is None:
            with timer.stage("encode_query"):
                qvec = self.encode_query(query)
        # keep a HOST copy: converting to device here and reading it back in
        # the fast path would cost a full tunnel sync (device_fetch doc)
        qvec_h = (np.asarray(qvec, dtype=np.float32)
                  if not isinstance(qvec, jax.Array) else qvec)
        qvec = jnp.asarray(qvec, dtype=jnp.float32)

        with timer.stage("featurize"):
            qf = self.featurizer.featurize(query)
        pool = max(k, rerank_k, c.DEFAULT_POOL_SIZE)
        pool = min(pool, self.products.n_padded)

        # ---- single-program fast path ----
        # When no host hook needs candidate identity mid-query (no live
        # cross-encoder, device gate, no exact/text snippets), the whole
        # query runs as ONE fused program with ONE result fetch. On the
        # tunneled TPU every device-blocking op pays a ~31 ms polling stall,
        # so halving the sync points halves single-request latency.
        rerank_live = (rerank_k > 0 and self.cross_encoder is not None
                       and c.ENABLE_RERANKING)
        use_snips_eff = (bool(use_snips) and c.ENABLE_SNIPPETS
                         and self.reviews is not None)
        if (self.gate_mode == "device" and not rerank_live
                and not use_snips_eff and int(max_scan or 0) == 0
                and not isinstance(qvec_h, jax.Array)):
            if not hasattr(self, "_false"):
                self._false = jnp.bool_(False)  # cached device scalar
            with timer.stage("fused_query"):
                out = self._fused_packed1(
                    self.arrays, self.rev_arrays,
                    jnp.asarray(self._combined(qvec_h, qf.pack())),
                    w, self._false, pool=pool, k=min(k, pool),
                )
            with timer.stage("fetch"):
                (buf,) = device_fetch(out)
            return self._rows_from_fused1(buf, qf, pool, timer)

        with timer.stage("retrieve"):
            st = self._stage_a(
                self.arrays, qvec,
                jnp.asarray(qf.q_terms), jnp.asarray(qf.q_idf),
                jnp.asarray(qf.group_phrase_mask),
                jnp.asarray(qf.group_term_ids),
                jnp.asarray(qf.group_valid),
                pool=pool,
            )
            # ONE async round trip for both stage-A outputs (sync per-array
            # reads pay the full tunnel RTT each — utils/numerics.device_fetch)
            idx, cand_valid_h = device_fetch(st["idx"], st["cand_valid"])
        n_cand = int(cand_valid_h.sum())
        cand_rows = idx[:n_cand]

        P = idx.shape[0]

        # host hooks (rerank lanes / gate / snippets): ONE shared block for
        # both engines — engine/hooks.py (the predicates here drifted once)
        (rerank_raw, rerank_mask, gate, best_raw, has_snips,
         snips) = self._split_host_hooks(
            query, qf.groups, qvec, cand_rows, P,
            rerank_k=rerank_k, gate_pen_h=gate_pen_h,
            use_snips_eff=use_snips_eff, max_scan=int(max_scan or 0),
            gate_hits=st["gate_hits"], n_groups=st["n_groups"], timer=timer,
        )

        timer_fuse = timer.stage("fuse")
        timer_fuse.__enter__()
        res, scores, pos = self._stage_b(
            st,
            jnp.asarray(rerank_raw), jnp.asarray(rerank_mask),
            jnp.asarray(best_raw), jnp.bool_(has_snips), gate, w,
            k=min(k, P),
        )
        # one async fetch for scores/positions AND every signal column
        # (previously each float(np.asarray(res.x)[p]) was its own sync
        # round trip: k rows x 7 signals = 70 tunnel RTTs per query)
        (pos, scores, r_dense, r_bm25, r_rerank, r_prior, r_best, r_trust,
         r_gate) = device_fetch(
            pos, scores, res.dense, res.bm25, res.rerank, res.prior,
            res.best, res.trust, res.gate,
        )
        timer_fuse.__exit__(None, None, None)
        # gather pool-position-indexed columns into rank order, then build
        # rows with the one shared assembler (engine/hooks.py)
        pos = np.asarray(pos)
        sig = dict(zip(SIGNAL_ORDER,
                       (np.asarray(a)[pos] for a in
                        (r_dense, r_bm25, r_rerank, r_prior, r_best,
                         r_trust, r_gate))))
        df = pd.DataFrame(assemble_result_rows(
            self.products, np.asarray(idx)[pos], np.asarray(scores), sig
        ))

        debug = {
            "bm25_active": bool(np.any(qf.q_idf > 0)),
            "tokens": qf.tokens,
            "groups": [sorted(g) for g in qf.groups],
            "pool": pool,
            "gate_mode": self.gate_mode,
            "n_candidates": n_cand,
            "stage_ms": {name: v["total_ms"]
                         for name, v in timer.summary().items()},
        }
        return df, snips, debug

    def _rows_from_fused1(self, buf: np.ndarray, qf, pool: int, timer):
        """(k, 9) fused-program output -> the run_search (df, snips, debug)
        contract. Column layout per _fused_packed1_impl: [row id, final,
        dense, bm25, rerank, prior, best, trust, gate]."""
        sig = {name: buf[:, 2 + i] for i, name in enumerate(SIGNAL_ORDER)}
        rows = assemble_result_rows(self.products, buf[:, 0], buf[:, 1],
                                    sig)
        debug = {
            "bm25_active": bool(np.any(qf.q_idf > 0)),
            "tokens": qf.tokens,
            "groups": [sorted(g) for g in qf.groups],
            "pool": pool,
            "gate_mode": self.gate_mode,
            "n_results": len(rows),
            "fused": True,
            "stage_ms": {name: v["total_ms"]
                         for name, v in timer.summary().items()},
        }
        return pd.DataFrame(rows), {}, debug

    # snippets: _snippet_texts / _exact_snippets provided by HostSnippetsMixin

    # ------------------------------------------------- standalone retrieval
    def search_dense(self, qvec, k: int):
        """Pure dense retrieval (BASELINE config 1): (row ids, scores)."""
        scores, idx = self._dense_topk(
            self.arrays, jnp.asarray(qvec, jnp.float32),
            min(int(k), self.products.n_padded),
        )
        return idx, scores

    def search_bm25(self, query: str, k: int):
        """TRUE sparse retrieval over the full corpus (BASELINE config 2).

        The reference's 'BM25 Only' mode still draws candidates from the
        dense pool (evals/test_queries.py config + app:253-264); this scores
        every document's postings. Uses the single-pass Pallas kernel on
        TPU (ops/pallas/bm25_kernel.py), the XLA scan elsewhere."""
        from review_recommender_tpu.ops.bm25 import bm25_topk

        qf = self.featurizer.featurize(query)
        a = self.arrays
        kk = min(int(k), self.products.n_padded)
        packed = self._bm25_packed() if self._pallas_ok() else None
        if packed is not None:
            # packed-transposed single-pass kernel: 4 B/posting, corpus on
            # the lane axis — measured 2.5x the unpacked kernel at N=200k
            # (ops/pallas/bm25_kernel.py, packed section). Scores equal the
            # classic path bit-for-bit (tested), which equals the eager
            # path by the eager/classic invariant, so this services eager
            # bundles too.
            from review_recommender_tpu.ops.pallas import (
                bm25_topk_packed_pallas,
            )

            pk_t, dl_p, valid_p = packed
            scores, idx = bm25_topk_packed_pallas(
                pk_t, dl_p, valid_p, jnp.asarray(qf.q_terms),
                jnp.asarray(qf.q_idf), self.avgdl, k=kk)
            # -inf tail slots may index the 512-alignment pad rows; clamp
            # into the bundle's row space (same contract as the striped
            # clamp in _dense_topk)
            idx = jnp.minimum(idx, self.products.n_padded - 1)
        elif "doc_bm25" in a:
            from review_recommender_tpu.ops.bm25 import bm25_full_scores_eager

            scores = bm25_full_scores_eager(
                a["doc_terms"], a["doc_bm25"], jnp.asarray(qf.q_terms)
            )
            scores = jnp.where(a["valid"], scores, -jnp.inf)
            scores, idx = jax.lax.top_k(scores, kk)
        else:
            args = (a["doc_terms"], a["doc_tf"], a["doc_len"], a["valid"],
                    jnp.asarray(qf.q_terms), jnp.asarray(qf.q_idf), self.avgdl)
            if self._pallas_ok():
                from review_recommender_tpu.ops.pallas import bm25_topk_pallas

                scores, idx = bm25_topk_pallas(*args, k=kk)
            else:
                scores, idx = bm25_topk(*args, k=kk)
        return idx, scores

    def _pallas_ok(self) -> bool:
        """Pallas kernels: enabled + TPU backend + tile-aligned corpus.
        Allowlist on the platform name ("tpu"; the axon plugin also reports
        tpu) — safer than the old cpu/gpu denylist for future platforms."""
        if self._pallas_usable is None:
            usable = False
            if config.USE_PALLAS:
                try:
                    from review_recommender_tpu.ops.pallas.bm25_kernel import TILE_N

                    plat = jax.devices()[0].platform.lower()
                    usable = (
                        self.products.n_padded % TILE_N == 0
                        and plat in ("tpu", "axon")
                    )
                except Exception:
                    usable = False
            self._pallas_usable = usable
        return self._pallas_usable

    def _bm25_packed(self):
        """Lazy packed-transposed postings for the full-scan BM25 path
        (ops/pallas/bm25_kernel.py packed section): one int32 per posting,
        (L, N) layout. Built on first search_bm25 on a Pallas-capable
        backend; None when the corpus can't pack losslessly (tf > 255 /
        huge vocab) or the extra array would blow the HBM budget — callers
        fall back to the unpacked kernel."""
        if self._bm25_packed_cache is False:
            self._bm25_packed_cache = None
            try:
                from review_recommender_tpu.index.schema import check_hbm_fit
                from review_recommender_tpu.ops.pallas.bm25_kernel import (
                    pack_postings,
                )

                pk = pack_postings(self.products.doc_terms,
                                   self.products.doc_tf)
                if pk is not None:
                    extra = pk.nbytes
                    base = int(self.hbm_report.get("per_device_bytes") or 0)
                    fit = check_hbm_fit(base + extra)
                    if fit["fits"]:
                        n_pad = pk.shape[1]
                        pad = n_pad - self.products.n_padded
                        dl = np.pad(self.products.doc_len, (0, pad))
                        vd = np.pad(self.products.valid, (0, pad))
                        self._bm25_packed_cache = (
                            jnp.asarray(pk),
                            jnp.asarray(dl, jnp.float32),
                            jnp.asarray(vd, jnp.bool_),
                        )
                    else:
                        logger.warning(
                            "skipping packed BM25 postings: +%d MiB would "
                            "exceed the HBM budget", extra >> 20)
            except Exception:  # pragma: no cover - degrade to unpacked
                logger.warning("packed BM25 postings unavailable",
                               exc_info=True)
        return self._bm25_packed_cache

    # ------------------------------------------------------------- fused query
    def query_fused(self, qvec, query: str, w: FusionWeights, pool: int, k: int,
                    use_snips: bool = False):
        """Single-compiled-program query (no rerank): returns
        (corpus row ids (k,), final scores (k,)). The query vector and all
        features travel in ONE combined buffer — a single host->device
        transfer per query."""
        use_snips = bool(use_snips) and config.ENABLE_SNIPPETS
        packed = self.featurizer.featurize_packed(query)
        rows, scores, _bd = self._fused_packed(
            self.arrays, self.rev_arrays,
            jnp.asarray(self._combined(qvec, packed)),
            w, jnp.bool_(use_snips),
            pool=min(pool, self.products.n_padded), k=k,
        )
        return rows, scores
