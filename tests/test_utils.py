"""Unit tests for utils: text kernels and jnp numeric kernels.

Mirrors the reference's test strategy for utility kernels
(/root/reference/tests/test_utils.py — edge cases per function) and adds
numpy-oracle parity checks for the jnp implementations.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from review_recommender_tpu.utils import (
    SYNONYMS,
    bayesian_prior,
    build_gate_groups,
    calculate_gate_factor,
    cosine_similarity_search,
    l2_normalize,
    minmax_normalize,
    tokenize_document,
    tokenize_query,
    trust_score_from_reviews,
)
from review_recommender_tpu.utils.numerics import minmax_normalize_masked
from tests import oracle


class TestTokenize:
    def test_basic(self):
        assert tokenize_query("Wireless Bluetooth Headphones!") == [
            "wireless", "bluetooth", "headphones",
        ]

    def test_stop_words_removed(self):
        assert tokenize_query("the best of the socks") == ["best", "socks"]

    def test_apostrophes(self):
        assert tokenize_query("don't stop") == ["don't", "stop"]

    def test_empty(self):
        assert tokenize_query("") == []
        assert tokenize_query("the and of") == []

    def test_document_tokenizer_len_filter_and_stoplist(self):
        # len>1 filter drops single chars; doc stoplist drops "i"/"was" etc.
        toks = tokenize_document("I was a big fan of x and the KEYBOARD!!")
        assert toks == ["big", "fan", "keyboard"]

    def test_document_tokenizer_cap(self):
        text = " ".join(f"tok{i}" for i in range(100))
        assert len(tokenize_document(text, cap=10)) == 10


class TestGateGroups:
    def test_color_and_synonym_groups(self):
        groups = build_gate_groups("yellow cat socks")
        assert {"yellow", "mustard", "lemon", "gold", "golden"} in groups
        assert SYNONYMS["cat"] in groups
        assert SYNONYMS["sock"] not in groups  # "socks" is not the SYN key
        assert {"socks"} in groups  # len>=4 singleton

    def test_cap_at_six(self):
        q = "alpha bravo charlie delta echo foxtrot golf hotel"
        assert len(build_gate_groups(q)) == 6

    def test_dedup(self):
        groups = build_gate_groups("cat cats cat")
        assert len([g for g in groups if g == SYNONYMS["cat"]]) == 1

    def test_gate_factor_penalty_arithmetic(self):
        groups = [{"yellow"}, {"cat"}, {"sock"}]
        f, hits, total = calculate_gate_factor("yellow dog boots", groups, 0.5)
        assert hits == 1 and total == 3
        assert f == pytest.approx(0.25)

    def test_gate_factor_no_groups(self):
        f, hits, total = calculate_gate_factor("anything", [], 0.5)
        assert f == 1.0 and hits == 0 and total == 0


class TestNumerics:
    def test_l2_normalize_matches_oracle(self, rng):
        x = rng.standard_normal((10, 16)).astype(np.float32)
        got = np.asarray(l2_normalize(jnp.asarray(x)))
        np.testing.assert_allclose(got, oracle.l2_normalize_np(x), rtol=1e-6)

    def test_l2_normalize_zero_vector(self):
        x = np.zeros((2, 4), np.float32)
        got = np.asarray(l2_normalize(jnp.asarray(x)))
        assert np.all(np.isfinite(got)) and np.all(got == 0)

    def test_minmax_matches_oracle(self, rng):
        x = rng.standard_normal(50).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(minmax_normalize(jnp.asarray(x))), oracle.minmax_np(x),
            rtol=1e-6,
        )

    def test_minmax_constant_is_zeros(self):
        x = np.full(7, 3.25, np.float32)
        assert np.all(np.asarray(minmax_normalize(jnp.asarray(x))) == 0)

    def test_minmax_nonfinite_is_zeros(self):
        x = np.array([1.0, np.inf, 2.0], np.float32)
        assert np.all(np.asarray(minmax_normalize(jnp.asarray(x))) == 0)

    def test_minmax_masked_ignores_padding(self, rng):
        x = rng.standard_normal(20).astype(np.float32)
        valid = np.zeros(20, bool)
        valid[:12] = True
        got = np.asarray(
            minmax_normalize_masked(jnp.asarray(x), jnp.asarray(valid))
        )
        np.testing.assert_allclose(got[:12], oracle.minmax_np(x[:12]), rtol=1e-5)
        assert np.all(got[12:] == 0)

    def test_bayesian_prior_shrinkage(self):
        avg = np.array([5.0, 5.0], np.float64)
        n = np.array([1.0, 1000.0], np.float64)
        out = np.asarray(bayesian_prior(jnp.asarray(avg), jnp.asarray(n), 20.0))
        # low-volume item shrinks toward the global mean (5.0) — equal here,
        # so use asymmetric ratings instead:
        avg = np.array([5.0, 1.0], np.float64)
        out = np.asarray(bayesian_prior(jnp.asarray(avg), jnp.asarray(n), 20.0))
        ref = oracle.bayes_prior_np(avg, n, 20.0)
        np.testing.assert_allclose(out, ref, rtol=1e-6)
        g = np.nanmean(avg)
        assert abs(out[0] - g) < abs(5.0 - g)  # shrunk toward mean

    def test_trust_monotone_and_saturating(self):
        n = np.array([0, 1, 4, 8, 20, 50, 500], np.float32)
        t = np.asarray(trust_score_from_reviews(jnp.asarray(n), 8, 50))
        np.testing.assert_allclose(t, oracle.trust_np(n, 8, 50), rtol=1e-4)
        assert np.all(np.diff(t) >= 0)
        assert t[-1] <= 1.0

    def test_cosine_topk_matches_oracle(self, rng, sample_embeddings):
        q = rng.standard_normal(64).astype(np.float32)
        q /= np.linalg.norm(q)
        idx, scores = cosine_similarity_search(
            jnp.asarray(q), jnp.asarray(sample_embeddings), 5
        )
        ref_idx, ref_scores = oracle.cosine_topk_np(q, sample_embeddings, 5)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)
        np.testing.assert_allclose(np.asarray(scores), ref_scores, rtol=1e-5)

    def test_cosine_topk_clamps_k(self, rng, sample_embeddings):
        q = rng.standard_normal(64).astype(np.float32)
        idx, scores = cosine_similarity_search(
            jnp.asarray(q), jnp.asarray(sample_embeddings), 1000
        )
        assert idx.shape[0] == sample_embeddings.shape[0]
