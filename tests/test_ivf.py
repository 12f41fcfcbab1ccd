"""IVF pool (ops/ivf.py): packing invariants, full-probe exactness,
clustered-corpus recall, and engine integration.

The IVF contract mirrors the striped pool's: scores of scanned rows are
EXACT; only pool membership is approximate — and probing every block
degenerates to a full exact scan (test_full_probe_matches_exact).
"""
import numpy as np
import pytest

from review_recommender_tpu.config import config
from review_recommender_tpu.ops.dense import dense_topk
from review_recommender_tpu.ops.ivf import (
    auto_centroids,
    build_ivf,
    ivf_device_arrays,
    ivf_topk,
)

import jax.numpy as jnp


def clustered_emb(n=512, dim=32, k=8, noise=0.15, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    ids = rng.integers(0, k, n)
    emb = centers[ids] + noise * rng.standard_normal((n, dim))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    return emb.astype(np.float32), centers.astype(np.float32)


def _device(ivf, emb):
    a = ivf_device_arrays(ivf, emb, emb_dtype=jnp.float32)
    return (a["ivf_centroids"], a["ivf_blocks"], a["ivf_block_valid"],
            a["ivf_block_rows"], a["ivf_block_centroid"])


class TestBuild:
    def test_partition_invariants(self):
        emb, _ = clustered_emb(n=300)
        n_pad = 320
        emb_p = np.zeros((n_pad, emb.shape[1]), np.float32)
        emb_p[:300] = emb
        valid = np.arange(n_pad) < 300
        ivf = build_ivf(emb_p, valid, n_centroids=12, block_rows=32)
        # every valid row appears exactly once; no padding row ever does
        seen = ivf.block_row_ids[ivf.block_valid]
        assert sorted(seen.tolist()) == list(range(300))
        assert ivf.block_centroid.min() >= 0
        assert ivf.block_centroid.max() < len(ivf.centroids)
        # centroids are L2-normalized
        norms = np.linalg.norm(ivf.centroids, axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)
        # blocks of one cluster are contiguous in centroid order
        assert (np.diff(ivf.block_centroid) >= 0).all()

    def test_empty_corpus(self):
        ivf = build_ivf(np.zeros((8, 4), np.float32), np.zeros(8, bool))
        assert ivf.n_blocks == 1
        assert not ivf.block_valid.any()

    def test_auto_centroids_band(self):
        assert auto_centroids(0) == 16
        assert auto_centroids(200_000) == int(4 * np.sqrt(200_000))
        assert auto_centroids(10**9) == 65536

    def test_auto_block_rows(self):
        from review_recommender_tpu.ops.ivf import auto_block_rows

        # mean cluster ~112 at the headline shape -> 128-row blocks
        # (512-row blocks measured 22% full on the chip — 4.6x padding
        # read per probe)
        assert auto_block_rows(200_000, 1788) == 128
        assert auto_block_rows(100, 100) == 64      # floor
        assert auto_block_rows(10**7, 100) == 1024  # ceiling

    def test_build_auto_block_rows(self):
        emb, _ = clustered_emb(n=600, dim=16, seed=7)
        ivf = build_ivf(emb, np.ones(600, bool), n_centroids=8)
        assert ivf.block_rows in (64, 128)
        assert float(ivf.block_valid.mean()) > 0.5


class TestTopk:
    def test_full_probe_matches_exact(self):
        emb, _ = clustered_emb(n=257, dim=16, seed=3)
        valid = np.ones(257, bool)
        ivf = build_ivf(emb, valid, n_centroids=10, block_rows=32)
        rng = np.random.default_rng(0)
        for qseed in range(3):
            q = rng.standard_normal(16).astype(np.float32)
            q /= np.linalg.norm(q)
            s_ref, i_ref = dense_topk(
                jnp.asarray(emb), jnp.asarray(q), jnp.asarray(valid), 20
            )
            s_ivf, i_ivf = ivf_topk(
                *_device(ivf, emb), jnp.asarray(q), 20, ivf.n_blocks
            )
            np.testing.assert_allclose(
                np.asarray(s_ivf), np.asarray(s_ref), rtol=1e-5, atol=1e-6
            )
            assert set(np.asarray(i_ivf).tolist()) == set(
                np.asarray(i_ref).tolist()
            )

    def test_recall_on_clustered_corpus(self):
        emb, centers = clustered_emb(n=2048, dim=32, k=16, noise=0.10,
                                     seed=1)
        valid = np.ones(2048, bool)
        ivf = build_ivf(emb, valid, n_centroids=16, block_rows=64)
        rng = np.random.default_rng(2)
        recalls = []
        for _ in range(8):
            c = centers[rng.integers(0, 16)]
            q = c + 0.05 * rng.standard_normal(32).astype(np.float32)
            q = (q / np.linalg.norm(q)).astype(np.float32)
            _, i_ref = dense_topk(
                jnp.asarray(emb), jnp.asarray(q), jnp.asarray(valid), 10
            )
            _, i_ivf = ivf_topk(*_device(ivf, emb), jnp.asarray(q), 10, 4)
            ref = set(np.asarray(i_ref).tolist())
            got = set(np.asarray(i_ivf).tolist())
            recalls.append(len(ref & got) / len(ref))
        assert np.mean(recalls) >= 0.9, recalls

    def test_pool_larger_than_scanned(self):
        emb, _ = clustered_emb(n=64, dim=8, k=2, seed=4)
        ivf = build_ivf(emb, np.ones(64, bool), n_centroids=4, block_rows=16)
        s, i = ivf_topk(*_device(ivf, emb), jnp.asarray(emb[0]), 40, 1)
        s = np.asarray(s)
        assert s.shape == (40,)
        assert np.isinf(s[16:]).all() and (s[16:] < 0).all()
        # finite prefix is sorted descending
        fin = s[np.isfinite(s)]
        assert (np.diff(fin) <= 1e-6).all()


class TestEngine:
    def _bundle(self, n=64, dim=32, seed=0):
        from tests.test_engine_parity import make_corpus
        from review_recommender_tpu.index.build import (
            build_bundle_from_products,
        )

        products, emb, reviews, remb = make_corpus(n=n, dim=dim, seed=seed)
        return build_bundle_from_products(
            products, emb, reviews=reviews, review_embeddings=remb,
            pad_multiple=16, doc_terms_cap=64,
        )

    def test_full_probe_engine_parity(self, monkeypatch):
        from review_recommender_tpu.engine.search import SearchEngine

        bundle = self._bundle()
        monkeypatch.setattr(config, "IVF_NPROBE", 10_000)
        monkeypatch.setattr(config, "IVF_BLOCK_ROWS", 16)
        exact = SearchEngine(bundle, emb_dtype="float32", gate_mode="host",
                             dense_pool="exact")
        ivf = SearchEngine(bundle, emb_dtype="float32", gate_mode="host",
                           dense_pool="ivf")
        rng = np.random.default_rng(5)
        for query in ("yellow cat socks", "usb cable long"):
            qvec = rng.standard_normal(32).astype(np.float32)
            qvec /= np.linalg.norm(qvec)
            cfg = dict(k=10, rerank_k=0, w_dense=0.6, w_bm25=0.2,
                       w_rerank=0.0, w_prior=0.2, w_best=0.0, prior_C=20.0,
                       min_reviews=1, gate_penalty=0.3)
            df_e, _, _ = exact.run_search(query, qvec=qvec, use_snips=False,
                                          **cfg)
            df_i, _, _ = ivf.run_search(query, qvec=qvec, use_snips=False,
                                        **cfg)
            assert df_e["sku"].tolist() == df_i["sku"].tolist()
            np.testing.assert_allclose(
                df_i["_final"].to_numpy(), df_e["_final"].to_numpy(),
                rtol=1e-5, atol=1e-6,
            )

    def test_low_probe_still_serves(self, monkeypatch):
        from review_recommender_tpu.engine.search import SearchEngine

        monkeypatch.setattr(config, "IVF_NPROBE", 2)
        monkeypatch.setattr(config, "IVF_BLOCK_ROWS", 16)
        eng = SearchEngine(self._bundle(), emb_dtype="float32",
                           gate_mode="host", dense_pool="ivf")
        qvec = np.random.default_rng(6).standard_normal(32)
        qvec = (qvec / np.linalg.norm(qvec)).astype(np.float32)
        df, _, _ = eng.run_search(
            "socks", qvec=qvec, use_snips=False, k=5, rerank_k=0,
            w_dense=1.0, w_bm25=0.0, w_rerank=0.0, w_prior=0.0, w_best=0.0,
            prior_C=20.0, min_reviews=1, gate_penalty=0.0,
        )
        # a tiny probe budget may scan fewer than k valid rows — the
        # result just shrinks (same contract as k > N in the reference)
        assert 1 <= len(df) <= 5
        assert (np.diff(df["_final"].to_numpy()) <= 1e-9).all()

    def test_int8_ivf_rejected(self):
        from review_recommender_tpu.engine.search import SearchEngine

        with pytest.raises(ValueError, match="ivf"):
            SearchEngine(self._bundle(), emb_dtype="int8",
                         gate_mode="host", dense_pool="ivf")


class TestSelfCheck:
    def test_measure_pool_recall_geometry_dependence(self):
        from review_recommender_tpu.ops.ivf import measure_pool_recall

        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        iso = rng.standard_normal((512, 32)).astype(np.float32)
        iso /= np.linalg.norm(iso, axis=1, keepdims=True)
        clu, _ = clustered_emb(n=512, dim=32, k=8, noise=0.15, seed=1)
        valid = jnp.ones(512, bool)
        out = {}
        for name, emb in (("iso", iso), ("clu", clu)):
            ivf = build_ivf(emb, np.ones(512, bool), n_centroids=8,
                            block_rows=64)
            a = ivf_device_arrays(ivf, emb, jnp.float32)
            dev = (a["ivf_centroids"], a["ivf_blocks"],
                   a["ivf_block_valid"], a["ivf_block_rows"],
                   a["ivf_block_centroid"])
            out[name] = measure_pool_recall(
                jnp.asarray(emb), valid, dev, pool=20, nprobe=2,
                n_queries=16)
        # clustered geometry recalls (queries ARE corpus rows, so the
        # probed cluster holds the neighbors); isotropic must be worse
        assert out["clu"] > 0.9, out
        assert out["iso"] < out["clu"], out

    def test_engine_selfcheck_warns_on_low_recall(self, monkeypatch,
                                                  caplog):
        import logging

        from review_recommender_tpu.engine.search import SearchEngine

        monkeypatch.setattr(config, "IVF_NPROBE", 1)
        monkeypatch.setattr(config, "IVF_BLOCK_ROWS", 8)
        bundle = TestEngine()._bundle()
        with caplog.at_level(logging.WARNING,
                             logger="review_recommender_tpu.engine.search"):
            eng = SearchEngine(bundle, emb_dtype="float32",
                               gate_mode="host", dense_pool="ivf")
        assert hasattr(eng, "ivf_pool_recall")
        if eng.ivf_pool_recall < config.IVF_SELFCHECK_MIN:
            assert any("self-check" in r.message for r in caplog.records)

    def test_engine_selfcheck_disabled(self, monkeypatch):
        from review_recommender_tpu.engine.search import SearchEngine

        monkeypatch.setattr(config, "IVF_SELFCHECK_QUERIES", 0)
        monkeypatch.setattr(config, "IVF_NPROBE", 4)
        eng = SearchEngine(TestEngine()._bundle(), emb_dtype="float32",
                           gate_mode="host", dense_pool="ivf")
        assert not hasattr(eng, "ivf_pool_recall")


class TestSharded:
    """Per-shard IVF on the 8-virtual-device mesh (parallel/sharded.py).

    IVF is an approximate pool, so the usual 'sharding never changes
    scores' contract applies in its full-probe limit: probing every
    block makes each shard's pool exact, and the merged pool equals the
    single-chip exact engine's.
    """

    def _bundle(self):
        from tests.test_engine_parity import make_corpus
        from review_recommender_tpu.index.build import (
            build_bundle_from_products,
        )

        products, emb, reviews, remb = make_corpus(n=96, dim=64, seed=4)
        return build_bundle_from_products(
            products, emb, reviews=reviews, review_embeddings=remb,
            pad_multiple=16, doc_terms_cap=64,
        )

    def test_mesh_full_probe_matches_single_exact(self, monkeypatch):
        import jax

        from review_recommender_tpu.engine.search import SearchEngine
        from review_recommender_tpu.parallel.sharded import (
            ShardedSearchEngine,
        )

        assert len(jax.devices()) == 8
        monkeypatch.setattr(config, "IVF_NPROBE", 10_000)
        monkeypatch.setattr(config, "IVF_BLOCK_ROWS", 8)
        bundle = self._bundle()
        mesh_ivf = ShardedSearchEngine(bundle, n_shards=8,
                                       emb_dtype="float32",
                                       dense_pool="ivf")
        single = SearchEngine(bundle, emb_dtype="float32",
                              gate_mode="device", dense_pool="exact")
        rng = np.random.default_rng(9)
        for query in ("yellow cat socks", "steel knife"):
            qvec = rng.standard_normal(64).astype(np.float32)
            qvec /= np.linalg.norm(qvec)
            cfg = dict(k=10, rerank_k=0, w_dense=0.5, w_bm25=0.3,
                       w_rerank=0.0, w_prior=0.2, w_best=0.0,
                       prior_C=20.0, min_reviews=1, gate_penalty=0.3)
            df_s, _, _ = single.run_search(query, qvec=qvec,
                                           use_snips=False, **cfg)
            df_m, _, _ = mesh_ivf.run_search(query, qvec=qvec,
                                             use_snips=False, **cfg)
            assert df_s["sku"].tolist() == df_m["sku"].tolist()
            np.testing.assert_allclose(
                df_m["_final"].to_numpy(), df_s["_final"].to_numpy(),
                rtol=1e-5, atol=1e-6,
            )

    def test_mesh_low_probe_serves_sorted(self, monkeypatch):
        import jax

        from review_recommender_tpu.parallel.sharded import (
            ShardedSearchEngine,
        )

        assert len(jax.devices()) == 8
        monkeypatch.setattr(config, "IVF_NPROBE", 8)  # 1 block per shard
        monkeypatch.setattr(config, "IVF_BLOCK_ROWS", 8)
        eng = ShardedSearchEngine(self._bundle(), n_shards=8,
                                  emb_dtype="float32", dense_pool="ivf")
        qvec = np.random.default_rng(10).standard_normal(64)
        qvec = (qvec / np.linalg.norm(qvec)).astype(np.float32)
        df, _, _ = eng.run_search(
            "socks", qvec=qvec, use_snips=False, k=5, rerank_k=0,
            w_dense=1.0, w_bm25=0.0, w_rerank=0.0, w_prior=0.0,
            w_best=0.0, prior_C=20.0, min_reviews=1, gate_penalty=0.0,
        )
        assert 1 <= len(df) <= 5
        assert (np.diff(df["_final"].to_numpy()) <= 1e-9).all()


def test_resolve_pool_mode_passthrough():
    assert config.resolve_pool_mode("ivf", 10) == "ivf"
    # auto never picks ivf
    assert config.resolve_pool_mode("auto", 10**9) == "striped"
