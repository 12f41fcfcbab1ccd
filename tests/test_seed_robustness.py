"""Unit tests for the paired-statistics helpers in examples/seed_robustness.py.

These back the README's significance claims for the rerank win (exact sign
test + bootstrap CI over per-query deltas), so their arithmetic is pinned
here against hand-computed values.
"""
import csv
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.seed_robustness import (  # noqa: E402
    bootstrap_ci,
    load_query_deltas,
    sign_test_p,
)


class TestSignTest:
    def test_all_ties_is_one(self):
        assert sign_test_p(0, 0) == 1.0

    def test_balanced_is_one(self):
        # Balanced wins/losses can never be significant: for 2/2,
        # tail = sum_{i<=2} C(4,i) / 2^4 / 2 = 11/32, p = 11/16.
        assert sign_test_p(2, 2) > 0.5

    def test_one_sided_small(self):
        # 5 wins / 0 losses: p = 2 * C(5,0)/2^5 = 2/32 = 0.0625
        assert sign_test_p(5, 0) == pytest.approx(0.0625)

    def test_strong_imbalance_significant(self):
        assert sign_test_p(69, 30) < 0.001

    def test_symmetry(self):
        assert sign_test_p(3, 9) == pytest.approx(sign_test_p(9, 3))

    def test_capped_at_one(self):
        assert sign_test_p(1, 1) <= 1.0


class TestBootstrapCI:
    def test_constant_data(self):
        mean, lo, hi = bootstrap_ci([0.5] * 20, iters=200, seed=1)
        assert mean == lo == hi == pytest.approx(0.5)

    def test_ci_brackets_mean(self):
        vals = [0.1, 0.2, -0.05, 0.3, 0.15, 0.0, 0.25, -0.1]
        mean, lo, hi = bootstrap_ci(vals, iters=2000, seed=2)
        assert lo <= mean <= hi
        assert mean == pytest.approx(sum(vals) / len(vals))

    def test_deterministic_for_seed(self):
        vals = list(range(10))
        assert bootstrap_ci(vals, seed=3) == bootstrap_ci(vals, seed=3)


class TestLoadQueryDeltas:
    def test_pairs_by_query_and_method(self, tmp_path):
        rows = [
            # q0: H+R beats H on ndcg@10 by 0.2
            {"query_id": "q0", "method": "Hybrid", "ndcg@10": "0.5",
             "mrr": "1.0", "recall@20": "0.4"},
            {"query_id": "q0", "method": "Hybrid + Rerank", "ndcg@10": "0.7",
             "mrr": "1.0", "recall@20": "0.6"},
            # q1: only Hybrid present -> dropped
            {"query_id": "q1", "method": "Hybrid", "ndcg@10": "0.9",
             "mrr": "0.5", "recall@20": "0.8"},
            # other methods are ignored
            {"query_id": "q0", "method": "Dense Only", "ndcg@10": "0.1",
             "mrr": "0.1", "recall@20": "0.1"},
        ]
        path = tmp_path / "detailed_results.csv"
        with path.open("w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)

        deltas = load_query_deltas([tmp_path])
        assert deltas["ndcg@10"] == pytest.approx([0.2])
        assert deltas["mrr"] == pytest.approx([0.0])
        assert deltas["recall@20"] == pytest.approx([0.2])

    def test_missing_dir_is_empty(self, tmp_path):
        deltas = load_query_deltas([tmp_path / "nope"])
        assert all(v == [] for v in deltas.values())
