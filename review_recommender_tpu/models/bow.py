"""Deterministic lightweight text scorers: random-projection bag-of-words
encoder and a lexical overlap cross-scorer.

These are real (if simple) text models, not mocks: the BoW encoder embeds a
text as the L2-normalized sum of fixed random vectors assigned to its
tokens, so texts sharing vocabulary land near each other — good enough to
exercise and *evaluate* the full retrieval stack (dense signal included)
in environments with no pretrained weights (zero-egress CI, demos, the
quality-table example). They also serve as the graceful-degradation tier:
the engine stays useful if checkpoint conversion hasn't happened yet.

Both plug into the SearchEngine hooks (`query_encoder`, `cross_encoder`)
exactly like the transformer towers in models/encoder.py.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from review_recommender_tpu.models.tokenizer import HashTokenizer


class BowProjectionEncoder:
    """text -> L2-normalized sum of per-token random projections.

    Deterministic in (vocab_size, dim, seed). Token weighting is sublinear
    (sqrt of count) so long documents don't drown in their frequent terms.
    """

    def __init__(self, dim: int = 384, vocab_size: int = 30522, seed: int = 0,
                 tokenizer=None):
        self.dim = dim
        self.tokenizer = tokenizer or HashTokenizer(vocab_size)
        rng = np.random.default_rng(seed)
        self._proj = rng.standard_normal((vocab_size, dim)).astype(np.float32)
        self._proj /= np.linalg.norm(self._proj, axis=1, keepdims=True)

    def encode(self, texts: Sequence[str], batch_size: int = 0) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            ids = self.tokenizer.token_ids(str(t))
            if not ids:
                out[i, 0] = 1.0
                continue
            uniq, counts = np.unique(ids, return_counts=True)
            vec = (np.sqrt(counts.astype(np.float32))[:, None]
                   * self._proj[uniq]).sum(axis=0)
            n = np.linalg.norm(vec)
            out[i] = vec / max(n, 1e-12)
        return out

    def __call__(self, text: str) -> np.ndarray:
        return self.encode([text])[0]


class OverlapCrossScorer:
    """(query, doc) relevance by idf-weighted query-term coverage — a
    deterministic cross-encoder stand-in with the right signature.

    coverage = sum(w(t) for t in q ∩ d) / sum(w(t) for t in q), with w(t)
    the supplied idf weight (1.0 when none given). Rare query terms — the
    discriminative ones — dominate, which is the classic weighted-overlap
    relevance heuristic; a plain F1 variant (round-1 behavior) penalized
    long relevant documents through its precision term and made the rerank
    lane NOISIER than hybrid fusion alone in the quality table.

    The emitted score sharpens coverage two ways (defaults measured-best
    across 2 corpus sizes x 2 seeds on the quality-table generator):
    term weights are raised to ``idf_power`` (default 2 — rare,
    anchor-specific query terms dominate; theme-frequency terms fade),
    and the final score is ``min(coverage / cap, 1)**power`` (defaults
    cap=1, power=2 — squashes the mid-coverage distractor band toward 0
    while near-full coverage stays near 1).

    Measured context for those defaults (oracle sweep, 51.2k-doc corpus;
    /tmp-sweep summaries graduated into examples/rerank_experiments.py):
    the engine minmax-normalizes rerank scores over the rerank pool
    (reference app/app_product_search.py:277-287 semantics), so only
    ordering + relative spacing survive; saturation caps (cap<1)
    create ties that won at small corpus scale but regressed at full
    scale; idf^2+pow2 beat or tied Hybrid on MRR in 4/4 size x seed
    configs and lifted nDCG@10 in 3/4. A hard finding, kept honest: the
    entire heuristic family leaves MRR *pinned exactly at the Hybrid
    lane's value* at full size — lexical coverage carries no top-1
    information beyond the engine's already-fused lexical signals,
    while an injected perfect binary rerank lifts MRR 0.878->0.925.
    Beating Hybrid across the board requires NEW information, i.e. the
    trained cross-encoder (train/cross_encoder.py, the quality table's
    default lane) — same reason the reference's rerank win comes from
    its ms-marco-trained model. Raw coverage is available with
    ``idf_power=1, cap=1, power=1``."""

    def __init__(self, tokenizer=None, doc_prefix_chars: int = 2000,
                 idf=None, cap: float = 1.0, power: float = 2.0,
                 idf_power: float = 2.0):
        self.tokenizer = tokenizer or HashTokenizer()
        self.doc_prefix_chars = doc_prefix_chars
        #: optional token -> weight mapping (e.g. the index vocab idf)
        self.idf = dict(idf) if idf else None
        self.cap = float(cap)
        self.power = float(power)
        self.idf_power = float(idf_power)

    def _w(self, token: str) -> float:
        if self.idf is None:
            return 1.0
        return float(self.idf.get(token, self._default_w)) ** self.idf_power

    @property
    def _default_w(self) -> float:
        # unseen tokens get the median known weight (neutral, not dominant)
        if not hasattr(self, "_default_cache"):
            vals = sorted(self.idf.values()) if self.idf else [1.0]
            self._default_cache = float(vals[len(vals) // 2])
        return self._default_cache

    def score_pairs(self, queries: Sequence[str], docs: Sequence[str]) -> np.ndarray:
        out = np.zeros(len(docs), np.float32)
        for i, (q, d) in enumerate(zip(queries, docs)):
            qs = set(self.tokenizer.tokenize(str(q)))
            ds = set(self.tokenizer.tokenize(str(d)[: self.doc_prefix_chars]))
            if not qs or not ds:
                continue
            denom = sum(self._w(t) for t in qs)
            if denom > 0:
                out[i] = sum(self._w(t) for t in qs & ds) / denom
        return np.minimum(out / self.cap, 1.0) ** self.power

    def __call__(self, query: str, texts: Sequence[str]) -> np.ndarray:
        return self.score_pairs([query] * len(texts), texts)
