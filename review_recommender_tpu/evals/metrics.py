"""IR quality metrics: DCG/nDCG@k, MRR, Recall@k, Precision@k, plus the
per-query accumulator and the method-sweep driver.

Functional parity with the reference metric suite
(/root/reference/evals/performance_metrics.py:19-294): same DCG definition
(rel / log2(rank+1) over 1-indexed ranks), same aggregate surface
(IRMetrics.evaluate_query / aggregate_metrics / detailed_report,
evaluate_ranking_methods). Implementation is vectorized numpy — metrics run
on host; they are bookkeeping, not kernels.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Mapping, Sequence

import numpy as np
import pandas as pd


def dcg_at_k(relevances: Sequence[float], k: int) -> float:
    """Discounted cumulative gain: sum_i rel_i / log2(i+1), ranks 1-indexed."""
    rel = np.asarray(relevances, dtype=np.float64)[: int(k)]
    if rel.size == 0:
        return 0.0
    discounts = np.log2(np.arange(2, rel.size + 2))
    return float(np.sum(rel / discounts))


def ndcg_at_k(
    relevances: Sequence[float],
    k: int,
    ideal_relevances: Sequence[float] | None = None,
) -> float:
    """Normalized DCG: DCG@k / ideal-DCG@k (0 when there is no relevance).

    When `ideal_relevances` is None the ideal ranking is derived from the
    retrieved relevances themselves (the reference UI's inline semantics,
    app/app_product_search.py:449-451). Passing the full judgment set's
    relevances matches the reference's IRMetrics semantics
    (evals/performance_metrics.py:186-189), where the ideal DCG counts
    relevant items NOT retrieved — the standard definition, and the one the
    README table is produced with. IRMetrics below uses the latter.
    """
    if ideal_relevances is None:
        ideal_relevances = sorted(relevances, reverse=True)
    else:
        ideal_relevances = sorted(ideal_relevances, reverse=True)
    ideal = dcg_at_k(ideal_relevances, k)
    if ideal <= 0.0:
        return 0.0
    return dcg_at_k(relevances, k) / ideal


def mrr_score(ranked_ids: Sequence[str], relevant: set, k: int | None = None) -> float:
    """Reciprocal rank of the first relevant item (0 if none in top-k)."""
    ids = list(ranked_ids)[: int(k)] if k is not None else list(ranked_ids)
    for i, rid in enumerate(ids, start=1):
        if rid in relevant:
            return 1.0 / i
    return 0.0


def recall_at_k(ranked_ids: Sequence[str], relevant: set, k: int) -> float:
    if not relevant:
        return 0.0
    hits = sum(1 for rid in list(ranked_ids)[: int(k)] if rid in relevant)
    return hits / len(relevant)


def precision_at_k(ranked_ids: Sequence[str], relevant: set, k: int) -> float:
    if k <= 0:
        return 0.0
    top = list(ranked_ids)[: int(k)]
    if not top:
        return 0.0
    hits = sum(1 for rid in top if rid in relevant)
    return hits / len(top)


class IRMetrics:
    """Per-query metric accumulator with aggregate/report surface."""

    def __init__(self, k_values: Sequence[int] = (5, 10, 20)):
        self.k_values = tuple(int(k) for k in k_values)
        self.rows: List[Dict] = []

    def evaluate_query(
        self, query_id: str, ranked_ids: Sequence[str], relevant: set
    ) -> Dict[str, float]:
        rels = [1.0 if rid in relevant else 0.0 for rid in ranked_ids]
        # Ideal DCG from the FULL relevant set (reference IRMetrics
        # semantics, performance_metrics.py:186-189): a relevant item the
        # engine failed to retrieve still counts against the ideal, so nDCG
        # penalizes missed recall — unlike the inline-UI variant that
        # normalizes only over what was retrieved.
        ideal = [1.0] * len(relevant)
        row: Dict[str, float] = {"query_id": query_id}
        for k in self.k_values:
            row[f"ndcg@{k}"] = ndcg_at_k(rels, k, ideal_relevances=ideal)
            row[f"recall@{k}"] = recall_at_k(ranked_ids, relevant, k)
            row[f"precision@{k}"] = precision_at_k(ranked_ids, relevant, k)
        row["mrr"] = mrr_score(ranked_ids, relevant)
        self.rows.append(row)
        return row

    def aggregate_metrics(self) -> Dict[str, float]:
        if not self.rows:
            return {}
        df = pd.DataFrame(self.rows)
        out = {}
        for col in df.columns:
            if col != "query_id":
                out[col] = float(df[col].mean())
        out["n_queries"] = len(self.rows)
        return out

    def detailed_report(self) -> pd.DataFrame:
        return pd.DataFrame(self.rows)

    def reset(self) -> None:
        self.rows = []


def evaluate_ranking_methods(
    search_fn: Callable[..., Sequence[str]],
    queries: Sequence[Mapping],
    method_configs: Mapping[str, Mapping],
    k_values: Sequence[int] = (5, 10, 20),
) -> Dict[str, Dict]:
    """Sweep method configs x queries.

    search_fn(query_text, **config) must return ranked ids (or a pandas
    DataFrame with a 'sku' column, which is what the engine returns).
    Each query mapping needs 'query' and 'relevant_skus'.
    """
    results: Dict[str, Dict] = {}
    for method, cfg in method_configs.items():
        metrics = IRMetrics(k_values)
        for q in queries:
            ranked = search_fn(q["query"], **dict(cfg))
            if isinstance(ranked, tuple):
                ranked = ranked[0]
            if isinstance(ranked, pd.DataFrame):
                ranked = ranked["sku"].tolist()
            metrics.evaluate_query(
                q.get("id", q["query"]), list(ranked), set(q["relevant_skus"])
            )
        results[method] = {
            "aggregate": metrics.aggregate_metrics(),
            "detail": metrics.detailed_report(),
        }
    return results
