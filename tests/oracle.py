"""Numpy oracle of the reference engine's numeric semantics.

An independent, host-side reimplementation of the math the reference performs
(documented in /root/repo/SURVEY.md §3.1 and /root/reference/utils.py,
app/app_product_search.py:245-317). The JAX/TPU engine is tested for
numerical parity against this oracle on small corpora.

Also includes a from-the-formula BM25 Okapi oracle matching the rank_bm25
BM25Okapi defaults the reference relies on (k1=1.5, b=0.75, epsilon=0.25,
idf = ln((N - df + 0.5) / (df + 0.5)), negative idf floored at
epsilon * mean(idf)).
"""
from __future__ import annotations

import math
from typing import Dict, List, Sequence, Set

import numpy as np


def l2_normalize_np(x, axis=1, eps=1e-12):
    n = np.linalg.norm(x, axis=axis, keepdims=True)
    return x / np.maximum(n, eps)


def minmax_np(x):
    x = np.asarray(x)
    if x.size == 0:
        return x.astype(np.float32)
    lo, hi = float(np.min(x)), float(np.max(x))
    if not math.isfinite(lo) or not math.isfinite(hi) or hi - lo < 1e-12:
        return np.zeros_like(x, dtype=np.float32)
    return ((x - lo) / (hi - lo + 1e-12)).astype(np.float32)


def bayes_prior_np(avg, n, C=20.0, gmean=None):
    g = float(np.nanmean(avg)) if gmean is None else float(gmean)
    return ((avg * n) + (g * C)) / (n + C + 1e-9)


def trust_np(n, min_reviews=8, sat=50):
    ramp = np.clip(n / max(min_reviews, 1), 0, 1)
    satv = np.minimum(1.0, np.log1p(n) / np.log1p(max(sat, 1)))
    return (0.6 * ramp + 0.4 * satv).astype(np.float32)


def cosine_topk_np(qvec, mat, k):
    sims = mat @ qvec
    k = min(k, len(sims))
    idx = np.argpartition(-sims, k - 1)[:k]
    idx = idx[np.argsort(-sims[idx])]
    return idx, sims[idx]


class BM25OkapiOracle:
    """BM25 Okapi with rank_bm25's exact parameterization.

    Scores follow the Okapi formula with the library's idf convention:
    idf(t) = ln((N - df + 0.5) / (df + 0.5)); any non-positive idf is
    replaced by epsilon * average_idf (epsilon=0.25) computed over the raw
    idfs. Per-doc score(t) = idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    """

    K1 = 1.5
    B = 0.75
    EPSILON = 0.25

    def __init__(self, corpus: Sequence[Sequence[str]]):
        self.corpus = [list(doc) for doc in corpus]
        self.N = len(self.corpus)
        self.doc_len = np.array([len(d) for d in self.corpus], dtype=np.float64)
        self.avgdl = float(self.doc_len.mean()) if self.N else 0.0
        self.tf: List[Dict[str, int]] = []
        df: Dict[str, int] = {}
        for doc in self.corpus:
            freqs: Dict[str, int] = {}
            for tok in doc:
                freqs[tok] = freqs.get(tok, 0) + 1
            self.tf.append(freqs)
            for tok in freqs:
                df[tok] = df.get(tok, 0) + 1
        # idf with epsilon floor for non-positive values
        idf: Dict[str, float] = {}
        idf_sum = 0.0
        negative: List[str] = []
        for tok, d in df.items():
            v = math.log(self.N - d + 0.5) - math.log(d + 0.5)
            idf[tok] = v
            idf_sum += v
            if v < 0:
                negative.append(tok)
        avg_idf = idf_sum / len(idf) if idf else 0.0
        eps = self.EPSILON * avg_idf
        for tok in negative:
            idf[tok] = eps
        self.idf = idf

    def get_scores(self, query_tokens: Sequence[str]) -> np.ndarray:
        scores = np.zeros(self.N, dtype=np.float64)
        norm = self.K1 * (1 - self.B + self.B * self.doc_len / (self.avgdl or 1.0))
        for tok in query_tokens:
            if tok not in self.idf:
                continue
            tf = np.array([d.get(tok, 0) for d in self.tf], dtype=np.float64)
            scores += self.idf[tok] * tf * (self.K1 + 1) / (tf + norm)
        return scores


def gate_groups_np(query: str, synonyms, colors, stop_words, token_re) -> List[Set[str]]:
    ql = query.lower()
    groups: List[Set[str]] = []
    for _c, syns in colors.items():
        if any(w in ql for w in syns):
            groups.append(syns)
    toks = [t for t in token_re.findall(ql) if t not in stop_words]
    for t in toks:
        if t in synonyms:
            groups.append(synonyms[t])
        elif len(t) >= 4:
            groups.append({t})
    uniq: List[Set[str]] = []
    for g in groups:
        if g not in uniq:
            uniq.append(g)
    return uniq[:6]


def gate_factor_np(text: str, groups, penalty=0.5):
    tl = text.lower()
    factor = 1.0
    hits = 0
    for g in groups:
        if any(s in tl for s in g):
            hits += 1
        else:
            factor *= penalty
    return factor, hits, len(groups)


def reference_search_oracle(
    qvec: np.ndarray,
    query: str,
    V: np.ndarray,
    skus: List[str],
    agg_texts: List[str],
    n_reviews: np.ndarray,
    avg_stars: np.ndarray,
    bm25: BM25OkapiOracle | None,
    bm25_skus: List[str] | None,
    *,
    k: int,
    rerank_k: int,
    w_dense: float,
    w_bm25: float,
    w_rerank: float,
    w_prior: float,
    w_best: float,
    prior_C: float,
    min_reviews: int,
    gate_penalty: float,
    rerank_scores: np.ndarray | None = None,
    best_scores_by_sku: Dict[str, float] | None = None,
    tokenize_query_fn=None,
    build_gate_groups_fn=None,
):
    """End-to-end oracle of run_search (app/app_product_search.py:245-317).

    Model forwards are injected (rerank_scores over the first rr_k candidates,
    best_scores_by_sku for snippets) so the oracle is deterministic.
    Returns (ordered skus, final scores, per-signal dict) for the top-k.
    """
    from review_recommender_tpu.utils import text as T

    tokenize_query_fn = tokenize_query_fn or T.tokenize_query
    build_gate_groups_fn = build_gate_groups_fn or T.build_gate_groups

    pool = max(k, rerank_k, 150)
    cand_idx, dense_scores = cosine_topk_np(qvec, V, pool)
    P = len(cand_idx)
    cand_skus = [str(skus[i]) for i in cand_idx]

    dense = minmax_np(dense_scores.astype(np.float32))

    # BM25 over candidates (score values identical to whole-corpus scoring)
    if bm25 is not None:
        toks = tokenize_query_fn(query)
        if toks:
            scores_all = bm25.get_scores(toks).astype(np.float32)
            by_sku = {str(bm25_skus[i]): scores_all[i] for i in range(len(bm25_skus))}
            bm25_raw = np.array([by_sku.get(s, 0.0) for s in cand_skus], np.float32)
        else:
            bm25_raw = np.zeros(P, np.float32)
    else:
        bm25_raw = np.zeros(P, np.float32)
    bm25_n = minmax_np(bm25_raw)

    n = np.nan_to_num(n_reviews[cand_idx].astype(np.float64), nan=0.0)
    r = avg_stars[cand_idx].astype(np.float64)
    prior_rating = bayes_prior_np(r, n, C=prior_C)
    prior_volume = np.log1p(n) / (np.log1p(n).max() + 1e-9)
    prior = minmax_np(prior_rating) * 0.7 + 0.3 * prior_volume

    rerank = np.zeros(P, np.float32)
    if rerank_k > 0:
        rr_k = min(rerank_k, P)
        rr = (
            rerank_scores[:rr_k].astype(np.float32)
            if rerank_scores is not None
            else np.zeros(rr_k, np.float32)
        )
        rerank[:rr_k] = minmax_np(rr)

    best = np.zeros(P, np.float32)
    if best_scores_by_sku:
        for i, s in enumerate(cand_skus):
            v = best_scores_by_sku.get(s)
            if v is not None:
                best[i] = v
        best = minmax_np(best)

    groups = build_gate_groups_fn(query)
    gate = np.array(
        [gate_factor_np(t[:6000], groups, gate_penalty)[0] for t in
         (agg_texts[i] for i in cand_idx)],
        dtype=np.float32,
    )
    trust = trust_np(n, min_reviews=min_reviews, sat=80)

    final = (
        w_dense * dense + w_bm25 * bm25_n + w_rerank * rerank
        + w_prior * prior + w_best * best
    ).astype(np.float32)
    final = final * trust * gate

    order = np.argsort(-final, kind="stable")[:k]
    return (
        [cand_skus[i] for i in order],
        final[order],
        {
            "dense": dense[order], "bm25": bm25_n[order], "prior": prior[order],
            "rerank": rerank[order], "best": best[order], "trust": trust[order],
            "gate": gate[order], "cand_idx": cand_idx, "pool": pool,
        },
    )
