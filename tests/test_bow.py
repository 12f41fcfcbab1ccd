"""BoW projection encoder + overlap cross-scorer tests."""
import numpy as np

from review_recommender_tpu.models.bow import (
    BowProjectionEncoder,
    OverlapCrossScorer,
)


class TestBowEncoder:
    def test_deterministic_and_normalized(self):
        a = BowProjectionEncoder(dim=32, seed=1)
        b = BowProjectionEncoder(dim=32, seed=1)
        e1 = a.encode(["wireless headphones", ""])
        e2 = b.encode(["wireless headphones", ""])
        np.testing.assert_array_equal(e1, e2)
        np.testing.assert_allclose(np.linalg.norm(e1, axis=1), 1.0, atol=1e-5)

    def test_semantic_neighborhood(self):
        enc = BowProjectionEncoder(dim=64, seed=0)
        e = enc.encode([
            "wireless bluetooth headphones bass",
            "bluetooth headphones wireless sound",
            "stainless steel kitchen knife",
        ])
        same = float(e[0] @ e[1])
        diff = float(e[0] @ e[2])
        assert same > diff + 0.2

    def test_query_hook_signature(self):
        enc = BowProjectionEncoder(dim=16)
        v = enc("some query")
        assert v.shape == (16,)


class TestOverlapScorer:
    def test_f1_overlap_ordering(self):
        ce = OverlapCrossScorer()
        scores = ce("wireless headphones", [
            "wireless bluetooth headphones with great bass",
            "wireless charger for phones",
            "kitchen knife set",
        ])
        assert scores[0] > scores[1] > scores[2]
        assert scores[2] == 0.0

    def test_empty_inputs(self):
        ce = OverlapCrossScorer()
        assert ce("", ["doc"])[0] == 0.0
        assert ce("query", [""])[0] == 0.0
