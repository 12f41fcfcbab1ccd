"""Index bundle schema: the device-ready representation of the corpus.

The whole corpus lives as dense, statically-shaped arrays so that a query is
one jitted program (SURVEY.md §7 design stance). Strings never reach the
device: term ids, term frequencies, gate bitsets and per-product scalars are
precomputed at build time; SKUs and display text stay host-side.

Array inventory (N_pad = N padded; L = DOC_TERMS_CAP; G = len(GATE_PHRASES)):

  emb        (N_pad, D)  emb_dtype  L2-normalized product embeddings
  n_reviews  (N_pad,)    float32    review counts (0 for padding)
  avg_stars  (N_pad,)    float32    mean star rating (NaN allowed, 0 pad)
  doc_terms  (N_pad, L)  int32      unique term ids per doc, 0 = PAD
  doc_tf     (N_pad, L)  float32    term frequency for doc_terms
  doc_len    (N_pad,)    float32    total token count incl. duplicates
  gate_bits  (N_pad, G)  bool       GATE_PHRASES[i] substring-present in
                                    agg_text[:6000] (host-precomputed)
  valid      (N_pad,)    bool       real row vs padding
  doc_tokens (N_pad, S)  int32      OPTIONAL: model-tokenizer ids of
                                    agg_text for on-device reranking
  doc_token_len (N_pad,) int32      OPTIONAL: real token count per row

Host-side (never on device):
  skus, agg_texts, vocab (term -> id, id 0 reserved), idf (V+1,) f32 with
  rank_bm25-compatible epsilon floor, df, avgdl, n_docs.

Review index (optional, for best-snippet scoring):
  rev_emb      (M_pad, D)  emb_dtype  L2-normalized review embeddings
  rev_product  (M_pad,)    int32      owning product row (N = padding bucket)
  rev_valid    (M_pad,)    bool
  host: rev_texts, rev_stars (for displaying the chosen snippet)
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from review_recommender_tpu.utils.text import GATE_PHRASES

SCHEMA_VERSION = 1
PAD_TERM_ID = 0


def pad_rows(n: int, multiple: int) -> int:
    """Round n up to a multiple (>= multiple so tiny corpora still tile)."""
    m = max(int(multiple), 1)
    return max(((n + m - 1) // m) * m, m)


@dataclasses.dataclass
class ProductIndex:
    """Device arrays + host metadata for the product corpus."""

    # device arrays (numpy on host until .to_device())
    emb: np.ndarray
    n_reviews: np.ndarray
    avg_stars: np.ndarray
    doc_terms: np.ndarray
    doc_tf: np.ndarray
    doc_len: np.ndarray
    gate_bits: np.ndarray
    valid: np.ndarray
    # host metadata
    skus: List[str]
    agg_texts: List[str]
    vocab: Dict[str, int]
    idf: np.ndarray  # (V+1,) f32, idf[0] = 0 for PAD
    df: np.ndarray  # (V+1,) i32
    avgdl: float
    n_docs: int
    # optional: model-tokenizer ids for on-device cross-encoder reranking
    doc_tokens: Optional[np.ndarray] = None
    doc_token_len: Optional[np.ndarray] = None
    # optional: eager per-(term, doc) BM25 contributions (BM25S,
    # arXiv:2407.03618) — when present, query scoring is a masked sum and
    # doc_tf/doc_len never ship to the device
    doc_bm25: Optional[np.ndarray] = None
    # optional host metadata: most-recent review timestamp per product
    # (reference meta column carried into result rows, app:255)
    last_ts: Optional[List[str]] = None

    @property
    def n_padded(self) -> int:
        return int(self.emb.shape[0])

    @property
    def dim(self) -> int:
        return int(self.emb.shape[1])

    @property
    def terms_cap(self) -> int:
        return int(self.doc_terms.shape[1])

    def device_arrays(self, emb_dtype=jnp.bfloat16,
                      quantize_int8: bool = False) -> dict:
        """The pytree of arrays the query engine closes over.

        quantize_int8=True replaces "emb" with symmetric per-row int8
        ("emb_q" int8 + "emb_scale" f32): half the HBM of bf16, native
        int8 MXU matmuls (ops/dense.py:dense_scores_int8)."""
        if quantize_int8:
            from review_recommender_tpu.ops.dense import quantize_corpus_int8

            q, s = quantize_corpus_int8(self.emb)
            emb_entries = {
                "emb_q": jnp.asarray(q),
                "emb_scale": jnp.asarray(s),
            }
        else:
            emb_entries = {"emb": jnp.asarray(self.emb, dtype=emb_dtype)}
        out = {
            **emb_entries,
            "n_reviews": jnp.asarray(self.n_reviews, dtype=jnp.float32),
            "avg_stars": jnp.asarray(self.avg_stars, dtype=jnp.float32),
            "doc_terms": jnp.asarray(self.doc_terms, dtype=jnp.int32),
            "gate_bits": jnp.asarray(self.gate_bits, dtype=jnp.bool_),
            "valid": jnp.asarray(self.valid, dtype=jnp.bool_),
        }
        if self.doc_bm25 is not None:
            # eager mode: same device memory as (tf + len) but zero query
            # arithmetic beyond the masked sum
            out["doc_bm25"] = jnp.asarray(self.doc_bm25, dtype=jnp.float32)
        else:
            out["doc_tf"] = jnp.asarray(self.doc_tf, dtype=jnp.float32)
            out["doc_len"] = jnp.asarray(self.doc_len, dtype=jnp.float32)
        if self.doc_tokens is not None:
            out["doc_tokens"] = jnp.asarray(self.doc_tokens, dtype=jnp.int32)
            out["doc_token_len"] = jnp.asarray(
                self.doc_token_len, dtype=jnp.int32
            )
        return out

    def device_footprint(self, emb_dtype=jnp.bfloat16,
                         quantize_int8: bool = False) -> Dict[str, int]:
        """Bytes each device array will occupy in HBM, computed from host
        shapes/dtypes WITHOUT placing anything (VERDICT r2 weak #6: padded
        postings cost 4 KB/doc at L=512 — ~4 GB at N=1M — and load time
        must own that, not discover it via OOM)."""
        n_pad = self.n_padded
        out: Dict[str, int] = {}
        if quantize_int8:
            out["emb_q"] = n_pad * self.dim  # int8
            out["emb_scale"] = n_pad * 4
        else:
            itemsize = jnp.dtype(emb_dtype).itemsize
            out["emb"] = n_pad * self.dim * itemsize
        out["n_reviews"] = n_pad * 4
        out["avg_stars"] = n_pad * 4
        out["doc_terms"] = n_pad * self.terms_cap * 4
        out["gate_bits"] = n_pad * len(GATE_PHRASES)
        out["valid"] = n_pad
        if self.doc_bm25 is not None:
            out["doc_bm25"] = n_pad * self.terms_cap * 4
        else:
            out["doc_tf"] = n_pad * self.terms_cap * 4
            out["doc_len"] = n_pad * 4
        if self.doc_tokens is not None:
            out["doc_tokens"] = n_pad * self.doc_tokens.shape[1] * 4
            out["doc_token_len"] = n_pad * 4
        return out

    def validate(self) -> None:
        n_pad = self.n_padded
        assert self.n_docs <= n_pad
        for name in ("n_reviews", "avg_stars", "doc_len", "valid"):
            arr = getattr(self, name)
            assert arr.shape == (n_pad,), f"{name}: {arr.shape} != ({n_pad},)"
        assert self.doc_terms.shape == self.doc_tf.shape
        assert self.doc_terms.shape[0] == n_pad
        assert self.gate_bits.shape == (n_pad, len(GATE_PHRASES))
        assert len(self.skus) == self.n_docs
        assert len(self.agg_texts) == self.n_docs
        assert self.idf.shape[0] == len(self.vocab) + 1
        assert int(self.valid.sum()) == self.n_docs


@dataclasses.dataclass
class ReviewIndex:
    """Device arrays + host metadata for per-review embeddings (snippets)."""

    rev_emb: np.ndarray
    rev_product: np.ndarray
    rev_valid: np.ndarray
    rev_texts: List[str]
    rev_stars: np.ndarray  # (M,) host, f32 (NaN allowed)
    n_reviews_total: int

    @property
    def m_padded(self) -> int:
        return int(self.rev_emb.shape[0])

    def device_arrays(self, emb_dtype=jnp.bfloat16) -> dict:
        return {
            "rev_emb": jnp.asarray(self.rev_emb, dtype=emb_dtype),
            "rev_product": jnp.asarray(self.rev_product, dtype=jnp.int32),
            "rev_valid": jnp.asarray(self.rev_valid, dtype=jnp.bool_),
        }

    def device_footprint(self, emb_dtype=jnp.bfloat16) -> Dict[str, int]:
        m_pad = self.m_padded
        dim = int(self.rev_emb.shape[1])
        return {
            "rev_emb": m_pad * dim * jnp.dtype(emb_dtype).itemsize,
            "rev_product": m_pad * 4,
            "rev_valid": m_pad,
        }


@dataclasses.dataclass
class IndexBundle:
    """A versioned pairing of the product index and optional review index."""

    products: ProductIndex
    reviews: Optional[ReviewIndex] = None
    version: int = SCHEMA_VERSION
    meta: dict = dataclasses.field(default_factory=dict)

    def device_footprint(self, emb_dtype=jnp.bfloat16,
                         quantize_int8: bool = False) -> Dict[str, int]:
        """Per-array HBM bytes for the whole bundle (striped-pool extra
        slices excluded — they add ~1 corpus of `emb` when enabled)."""
        out = self.products.device_footprint(emb_dtype, quantize_int8)
        if self.reviews is not None:
            out.update(self.reviews.device_footprint(emb_dtype))
        return out


def footprint_total(bundle: "IndexBundle", emb_dtype=jnp.bfloat16,
                    quantize_int8: bool = False,
                    striped: bool = False,
                    ivf: bool = False) -> tuple[Dict[str, int], int]:
    """(per-array footprint, total bytes) for a bundle under the given
    engine config — the ONE cost model shared by the load-time refusal
    (enforce_hbm_fit) and the audit report (serve/audit.py), so the two
    can never disagree. The striped pool keeps BOTH the flat emb and the
    (s, G, D) slices, adding ~1 corpus of `emb`; the IVF pool likewise
    keeps the cluster-packed block tensor (~1 corpus + block padding,
    bounded at 1.25x here — build logs report the true fill)."""
    fp = bundle.device_footprint(emb_dtype, quantize_int8)
    total = sum(fp.values())
    emb_bytes = fp.get("emb", fp.get("emb_q", 0) + fp.get("emb_scale", 0))
    if striped:
        total += emb_bytes
    if ivf:
        total += int(1.25 * emb_bytes)
    return fp, total


def device_memory_limit() -> Optional[int]:
    """The backend's per-device memory budget in bytes, or None when the
    runtime doesn't report one (CPU backend, some plugins)."""
    try:
        import jax

        stats = jax.devices()[0].memory_stats()
        if stats:
            return int(stats.get("bytes_limit") or 0) or None
    except Exception:
        pass
    return None


def enforce_hbm_fit(bundle: "IndexBundle", emb_dtype=jnp.bfloat16,
                    quantize_int8: bool = False, striped: bool = False,
                    ivf: bool = False, n_shards: int = 1) -> Dict:
    """Load-time HBM ownership for an engine about to place `bundle`:
    refuse (RuntimeError) when the corpus cannot fit the backend's
    per-device memory, warn above 80%. RRT_IGNORE_HBM_CHECK=true downgrades
    the refusal to a warning (escape hatch for plugins that misreport
    bytes_limit). Returns the check_hbm_fit report."""
    import logging
    import os

    log = logging.getLogger(__name__)
    fp, total = footprint_total(bundle, emb_dtype, quantize_int8, striped,
                                ivf)
    rep = check_hbm_fit(total, n_shards)
    gib = rep["per_device_bytes"] / 2**30
    if not rep["fits"]:
        msg = (f"index bundle needs {gib:.2f} GiB per device but the "
               f"backend reports {rep['limit_bytes'] / 2**30:.2f} GiB HBM; "
               f"shard the corpus over more devices (MESH_SHARDS), use "
               f"EMB_DTYPE=int8, or lower DOC_TERMS_CAP "
               f"(largest arrays: "
               f"{sorted(fp, key=fp.get, reverse=True)[:3]})")
        if os.getenv("RRT_IGNORE_HBM_CHECK", "").lower() == "true":
            log.warning("%s (RRT_IGNORE_HBM_CHECK=true: continuing)", msg)
        else:
            raise RuntimeError(msg)
    elif rep["warn"]:
        log.warning(
            "index bundle uses %.2f GiB per device (%.0f%% of HBM) — "
            "close to the limit; consider MESH_SHARDS/int8/DOC_TERMS_CAP",
            gib, 100 * rep["frac"],
        )
    return rep


def check_hbm_fit(total_bytes: int, n_shards: int = 1,
                  warn_frac: float = 0.8,
                  limit_bytes: Optional[int] = None) -> Dict:
    """Fit report for a corpus footprint against the backend's per-device
    memory. Sharding divides the row-sharded bytes evenly, so per-device
    load is total/n_shards. `limit_bytes` overrides the backend-reported
    budget (capacity planning for hardware this process isn't running on,
    e.g. the v5e-8 table in examples/capacity_table.py). Returns
    {total_bytes, per_device_bytes, limit_bytes, frac, fits, warn};
    callers decide whether to refuse."""
    per_dev = int(total_bytes) // max(int(n_shards), 1)
    limit = device_memory_limit() if limit_bytes is None else int(limit_bytes)
    frac = (per_dev / limit) if limit else None
    return {
        "total_bytes": int(total_bytes),
        "per_device_bytes": per_dev,
        "limit_bytes": limit,
        "frac": frac,
        "fits": (frac is None or frac <= 1.0),
        "warn": (frac is not None and frac > warn_frac),
    }
