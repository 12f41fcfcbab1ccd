"""int8-quantized corpus mode: recall vs f32 pool, engine end-to-end."""
import numpy as np
import pytest

import jax.numpy as jnp

from review_recommender_tpu.engine.search import SearchEngine
from review_recommender_tpu.index.build import build_bundle_from_products
from review_recommender_tpu.ops.dense import (
    dense_topk,
    dense_topk_int8,
    quantize_corpus_int8,
)
from review_recommender_tpu.ops.fusion import FusionWeights
from tests.test_engine_parity import make_corpus


class TestGlobalScaleScan:
    """Global-scale int8 fused scan (integer carries, one final rescale)."""

    def test_matches_per_row_scan_ranking(self):
        from review_recommender_tpu.ops.dense import (
            dense_striped_topk_scan_int8_global,
            quantize_corpus_int8_global,
            slice_corpus_for_striped_int8,
        )

        rng = np.random.default_rng(5)
        n, d, pool, stripes = 512, 32, 50, 64
        emb = rng.standard_normal((n, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        valid = np.ones(n, bool)
        valid[-7:] = False
        q_glob, g_scale = quantize_corpus_int8_global(emb)
        emb_gs, _z, valid_gs = slice_corpus_for_striped_int8(
            jnp.asarray(q_glob), jnp.zeros(n, jnp.float32),
            jnp.asarray(valid), stripes)
        qvec = rng.standard_normal(d).astype(np.float32)
        qvec /= np.linalg.norm(qvec)
        scores, idx = dense_striped_topk_scan_int8_global(
            emb_gs, valid_gs, jnp.asarray(qvec), pool, g_scale)
        scores, idx = np.asarray(scores), np.asarray(idx)
        # invalid rows never surface
        assert not (set(idx.tolist()) & set(range(n - 7, n)))
        # pool overlap vs the per-row int8 striped scan at the SAME
        # geometry — isolates quantization-grid effects from the striped
        # pool's structural recall (one winner per stripe; at G=64 that
        # bound dominates and applies to both variants equally)
        from review_recommender_tpu.ops.dense import (
            dense_striped_topk_scan_int8,
            quantize_corpus_int8,
        )

        q_row, row_scale = quantize_corpus_int8(emb)
        emb_qs, scale_s, valid_qs = slice_corpus_for_striped_int8(
            jnp.asarray(q_row), jnp.asarray(row_scale),
            jnp.asarray(valid), stripes)
        _s_row, idx_row = dense_striped_topk_scan_int8(
            emb_qs, scale_s, valid_qs, jnp.asarray(qvec), pool)
        overlap = len(set(idx.tolist())
                      & set(np.asarray(idx_row).tolist())) / pool
        assert overlap >= 0.9
        # scores match the true cosine within the global-grid error
        sims = emb @ qvec
        for s, i in zip(scores, idx):
            assert abs(s - sims[i]) < 0.03

    def test_global_quantization_error_bounded(self):
        from review_recommender_tpu.ops.dense import (
            quantize_corpus_int8_global,
        )

        rng = np.random.default_rng(6)
        emb = rng.standard_normal((256, 64)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        q, s = quantize_corpus_int8_global(emb)
        assert q.dtype == np.int8 and np.isscalar(s)
        recon = q.astype(np.float32) * s
        assert np.abs(recon - emb).max() <= s / 2 + 1e-7


class TestQuantization:
    def test_roundtrip_error_small(self):
        rng = np.random.default_rng(0)
        emb = rng.standard_normal((64, 32)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        q, s = quantize_corpus_int8(emb)
        assert q.dtype == np.int8 and s.shape == (64,)
        recon = q.astype(np.float32) * s[:, None]
        assert np.abs(recon - emb).max() < 0.01

    def test_pool_recall_vs_f32(self):
        rng = np.random.default_rng(1)
        n, d, pool = 2048, 64, 100
        emb = rng.standard_normal((n, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        valid = jnp.ones(n, bool)
        qv = rng.standard_normal(d).astype(np.float32)
        _s_f, i_f = dense_topk(jnp.asarray(emb), jnp.asarray(qv), valid, pool)
        q, s = quantize_corpus_int8(emb)
        _s_q, i_q = dense_topk_int8(jnp.asarray(q), jnp.asarray(s),
                                    jnp.asarray(qv), valid, pool)
        recall = len(set(np.asarray(i_f).tolist())
                     & set(np.asarray(i_q).tolist())) / pool
        assert recall >= 0.97, recall

    def test_score_accuracy(self):
        rng = np.random.default_rng(2)
        emb = rng.standard_normal((128, 32)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        qv = rng.standard_normal(32).astype(np.float32)
        q, s = quantize_corpus_int8(emb)
        sims_q, _ = dense_topk_int8(jnp.asarray(q), jnp.asarray(s),
                                    jnp.asarray(qv), jnp.ones(128, bool), 128)
        sims_f, _ = dense_topk(jnp.asarray(emb), jnp.asarray(qv),
                               jnp.ones(128, bool), 128)
        # sorted scores agree to quantization noise
        np.testing.assert_allclose(np.asarray(sims_q), np.asarray(sims_f),
                                   atol=0.02)


class TestEngineInt8:
    def test_end_to_end(self):
        products, emb, _r, _re = make_corpus(n=48, dim=32, seed=31)
        bundle = build_bundle_from_products(products, emb, pad_multiple=8,
                                            doc_terms_cap=32)
        e8 = SearchEngine(bundle, emb_dtype="int8", gate_mode="device")
        ef = SearchEngine(bundle, emb_dtype="float32", gate_mode="device")
        assert "emb_q" in e8.arrays and "emb" not in e8.arrays

        rng = np.random.default_rng(0)
        qv = rng.standard_normal(32).astype(np.float32)
        qv /= np.linalg.norm(qv)
        w = FusionWeights.make()
        r8, s8 = e8.query_fused(qv, "wireless headphones", w, pool=32, k=10)
        rf, sf = ef.query_fused(qv, "wireless headphones", w, pool=32, k=10)
        # same candidates modulo quantization-level reordering
        overlap = len(set(np.asarray(r8).tolist())
                      & set(np.asarray(rf).tolist())) / 10
        assert overlap >= 0.8
        assert np.isfinite(np.asarray(s8)).all()

    def test_run_search_int8(self):
        products, emb, _r, _re = make_corpus(n=32, dim=32, seed=32)
        bundle = build_bundle_from_products(products, emb, pad_multiple=8,
                                            doc_terms_cap=32)
        e8 = SearchEngine(bundle, emb_dtype="int8", gate_mode="device")
        qv = np.random.default_rng(1).standard_normal(32).astype(np.float32)
        df, _s, _d = e8.run_search("yellow socks", qvec=qv, k=5, rerank_k=0)
        assert len(df) == 5 and np.isfinite(df["_final"]).all()
