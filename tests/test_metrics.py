"""IR metric tests: textbook values, bounds, accumulator behavior
(mirrors the reference's tests/test_performance_metrics.py coverage)."""
import numpy as np
import pytest

from review_recommender_tpu.evals.metrics import (
    IRMetrics,
    dcg_at_k,
    evaluate_ranking_methods,
    mrr_score,
    ndcg_at_k,
    precision_at_k,
    recall_at_k,
)
from review_recommender_tpu.evals.queries import (
    synthetic_ground_truth,
    validate_ground_truth,
)


class TestDCG:
    def test_textbook_value(self):
        # DCG@3 of [3,2,1] = 3/log2(2) + 2/log2(3) + 1/log2(4)
        want = 3 / np.log2(2) + 2 / np.log2(3) + 1 / np.log2(4)
        assert dcg_at_k([3, 2, 1], 3) == pytest.approx(want)

    def test_k_truncation(self):
        assert dcg_at_k([1, 1, 1, 1], 2) == pytest.approx(1 + 1 / np.log2(3))

    def test_empty(self):
        assert dcg_at_k([], 5) == 0.0


class TestNDCG:
    def test_perfect_ranking_is_one(self):
        assert ndcg_at_k([1, 1, 0, 0], 4) == pytest.approx(1.0)

    def test_zero_relevance(self):
        assert ndcg_at_k([0, 0, 0], 3) == 0.0

    def test_bounded(self):
        v = ndcg_at_k([0, 1, 0, 1], 4)
        assert 0.0 < v < 1.0


class TestMRR:
    def test_first_position(self):
        assert mrr_score(["a", "b"], {"a"}) == 1.0

    def test_third_position(self):
        assert mrr_score(["x", "y", "a"], {"a"}) == pytest.approx(1 / 3)

    def test_not_found(self):
        assert mrr_score(["x", "y"], {"a"}) == 0.0

    def test_k_cutoff(self):
        assert mrr_score(["x", "y", "a"], {"a"}, k=2) == 0.0


class TestRecallPrecision:
    def test_recall(self):
        assert recall_at_k(["a", "b", "c"], {"a", "z"}, 3) == 0.5

    def test_recall_empty_relevant(self):
        assert recall_at_k(["a"], set(), 1) == 0.0

    def test_precision(self):
        assert precision_at_k(["a", "b", "c", "d"], {"a", "c"}, 4) == 0.5

    def test_precision_k_zero(self):
        assert precision_at_k(["a"], {"a"}, 0) == 0.0


class TestIRMetrics:
    def test_accumulate_and_aggregate(self):
        m = IRMetrics(k_values=(2,))
        m.evaluate_query("q1", ["a", "b"], {"a"})  # ndcg@2=1, recall=1
        m.evaluate_query("q2", ["x", "a"], {"a"})  # first rel at rank 2
        agg = m.aggregate_metrics()
        assert agg["n_queries"] == 2
        assert agg["recall@2"] == 1.0
        assert agg["mrr"] == pytest.approx((1.0 + 0.5) / 2)
        df = m.detailed_report()
        assert len(df) == 2 and "ndcg@2" in df.columns
        m.reset()
        assert m.aggregate_metrics() == {}


class TestMethodSweep:
    def test_sweep_with_dataframe_return(self):
        import pandas as pd

        def fake_search(query, **cfg):
            order = ["a", "b", "c"] if cfg["w_dense"] else ["c", "b", "a"]
            return pd.DataFrame({"sku": order})

        queries = [{"id": "q1", "query": "x", "relevant_skus": ["a"]}]
        res = evaluate_ranking_methods(
            fake_search, queries,
            {"dense": {"w_dense": 1}, "rev": {"w_dense": 0}},
            k_values=(3,),
        )
        assert res["dense"]["aggregate"]["mrr"] == 1.0
        assert res["rev"]["aggregate"]["mrr"] == pytest.approx(1 / 3)


class TestGroundTruth:
    def test_synthetic_is_self_consistent(self):
        skus = [f"S{i}" for i in range(20)]
        texts = [
            f"unique{i}word another{i}term third{i}token fourth{i}item extra{i}bit"
            for i in range(20)
        ]
        qs = synthetic_ground_truth(skus, texts, n_queries=5, seed=1)
        assert len(qs) == 5
        for q in qs:
            # anchor product's own words form the query => anchor is relevant
            assert len(q["relevant_skus"]) >= 1
            rep = validate_ground_truth([q], skus)
            assert rep["coverage"] == 1.0

    def test_validate_reports_missing(self):
        rep = validate_ground_truth(
            [{"id": "q", "query": "x", "relevant_skus": ["NOPE", "S1"]}],
            ["S1"],
        )
        assert rep["found"] == 1 and rep["total_judged"] == 2
        assert rep["missing"] == ["NOPE"]
