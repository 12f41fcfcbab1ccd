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
    def test_overlap_ordering_raw(self):
        # raw coverage (no saturation) is strictly ordered by hit fraction
        ce = OverlapCrossScorer(cap=1.0, power=1.0)
        scores = ce("wireless headphones", [
            "wireless bluetooth headphones with great bass",
            "wireless charger for phones",
            "kitchen knife set",
        ])
        assert scores[0] > scores[1] > scores[2]
        assert scores[2] == 0.0

    def test_default_sharpening(self):
        # defaults: score = coverage**2 (cap=1, power=2) — the measured-best
        # variant; mid-coverage distractors are squashed toward 0
        ce = OverlapCrossScorer()
        scores = ce("alpha beta gamma delta", [
            "alpha beta gamma delta doc",   # coverage 1.0  -> 1.0
            "alpha beta doc",               # coverage 0.5  -> 0.25
            "alpha doc",                    # coverage 0.25 -> 0.0625
            "unrelated doc",                # 0
        ])
        np.testing.assert_allclose(scores, [1.0, 0.25, 0.0625, 0.0], atol=1e-6)

    def test_idf_power_sharpens_rare_terms(self):
        # idf_power=2 (default) squares the term weights: a rare term's
        # dominance over a common one grows from 3:1 to 9:1
        idf = {"alpha": 3.0, "beta": 1.0}
        doc = ["alpha doc"]
        sharp = OverlapCrossScorer(idf=idf)("alpha beta", doc)[0]
        flat = OverlapCrossScorer(idf=idf, idf_power=1.0, power=1.0)(
            "alpha beta", doc)[0]
        np.testing.assert_allclose(flat, 0.75, atol=1e-6)       # 3/4
        np.testing.assert_allclose(sharp, 0.81, atol=1e-6)      # (9/10)**2

    def test_empty_inputs(self):
        ce = OverlapCrossScorer()
        assert ce("", ["doc"])[0] == 0.0
        assert ce("query", [""])[0] == 0.0
