"""Sharded-engine tests on the 8-virtual-device CPU mesh (conftest.py sets
xla_force_host_platform_device_count=8 — the v5e-8 stand-in).

Contract: sharding must not change results. Every test compares the
ShardedSearchEngine against the single-chip SearchEngine / numpy oracle on
the same bundle.
"""
import jax
import numpy as np
import pytest

from review_recommender_tpu.engine.search import SearchEngine
from review_recommender_tpu.index.build import build_bundle_from_products
from review_recommender_tpu.ops.fusion import FusionWeights
from review_recommender_tpu.parallel.sharded import ShardedSearchEngine
from tests import oracle
from tests.test_engine_parity import make_corpus


@pytest.fixture(scope="module")
def corpus():
    return make_corpus(n=96, dim=64, seed=4)


@pytest.fixture(scope="module")
def bundle(corpus):
    products, emb, reviews, remb = corpus
    return build_bundle_from_products(
        products, emb, reviews=reviews, review_embeddings=remb,
        pad_multiple=16, doc_terms_cap=64,
    )


@pytest.fixture(scope="module")
def single(bundle):
    return SearchEngine(bundle, emb_dtype="float32", gate_mode="device")


@pytest.fixture(scope="module")
def sharded(bundle):
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return ShardedSearchEngine(bundle, n_shards=8, emb_dtype="float32")


def _qvec(seed, dim=64):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


class TestDenseSharded:
    def test_matches_oracle(self, sharded, corpus):
        products, emb, *_ = corpus
        V = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        q = _qvec(11)
        idx, scores = sharded.dense_topk(q, k=10)
        ref_idx, ref_scores = oracle.cosine_topk_np(q, V, 10)
        np.testing.assert_allclose(
            np.asarray(scores), ref_scores, rtol=1e-5, atol=1e-6
        )
        assert set(np.asarray(idx).tolist()) == set(ref_idx.tolist())


class TestBM25Sharded:
    def test_matches_single_chip_full_scores(self, sharded, bundle, corpus):
        products, *_ = corpus
        from review_recommender_tpu.utils.text import tokenize_document

        texts = [p["agg_text"] for p in products]
        bm25 = oracle.BM25OkapiOracle([tokenize_document(t) for t in texts])
        query = "wireless bluetooth headphones noise cancelling"
        from review_recommender_tpu.utils.text import tokenize_query

        ref = bm25.get_scores(tokenize_query(query))
        k = 15
        idx, scores = sharded.bm25_topk(query, k=k)
        order = np.argsort(-ref, kind="stable")[:k]
        np.testing.assert_allclose(
            np.sort(np.asarray(scores))[::-1], np.sort(ref[order])[::-1],
            rtol=1e-4, atol=1e-5,
        )


class TestBM25PackedSharded:
    def test_packed_mesh_matches_oracle(self, bundle, corpus):
        """Force the packed-transposed kernel (interpret mode) through the
        mesh bm25_topk and check against the rank_bm25 oracle + the XLA
        block's output."""
        products, *_ = corpus
        from review_recommender_tpu.utils.text import (
            tokenize_document,
            tokenize_query,
        )

        eng = ShardedSearchEngine(bundle, n_shards=8, emb_dtype="float32")
        eng._pallas_interpret = True  # CPU mesh: interpret-mode kernel
        assert eng._pallas_ok()
        query = "wireless bluetooth headphones noise cancelling"
        k = 15
        idx, scores = eng.bm25_topk(query, k=k)
        assert eng._bm25_packed_cache is not None  # packed path taken

        texts = [p["agg_text"] for p in products]
        bm25 = oracle.BM25OkapiOracle([tokenize_document(t) for t in texts])
        ref = bm25.get_scores(tokenize_query(query))
        order = np.argsort(-ref, kind="stable")[:k]
        np.testing.assert_allclose(
            np.sort(np.asarray(scores))[::-1], np.sort(ref[order])[::-1],
            rtol=1e-4, atol=1e-5,
        )
        assert int(np.asarray(idx).max()) < bundle.products.n_padded

        # and bit-parity of the kept scores vs the XLA scan block
        plain = ShardedSearchEngine(bundle, n_shards=8, emb_dtype="float32")
        idx2, scores2 = plain.bm25_topk(query, k=k)
        np.testing.assert_array_equal(
            np.sort(np.asarray(scores)), np.sort(np.asarray(scores2))
        )


class TestFusedSharded:
    @pytest.mark.parametrize("query,seed", [
        ("yellow cat socks", 21),
        ("wireless bluetooth headphones noise cancelling", 22),
        ("stainless steel kitchen knife", 23),
    ])
    def test_matches_single_chip(self, single, sharded, query, seed):
        q = _qvec(seed)
        w = FusionWeights.make(
            w_dense=0.5, w_bm25=0.3, w_rerank=0.0, w_prior=0.2, w_best=0.0,
            prior_c=20.0, min_reviews=5, gate_penalty=0.3,
        )
        rows_s, scores_s, _bd = single._fused(
            single.arrays, single.rev_arrays,
            jax.numpy.asarray(q), *_feat(single, query), w,
            jax.numpy.bool_(False), pool=64, k=10,
        )
        rows_m, scores_m = sharded.query_fused(q, query, w, pool=64, k=10)
        np.testing.assert_allclose(
            np.asarray(scores_m), np.asarray(scores_s), rtol=2e-4, atol=2e-5
        )
        # identical candidates modulo near-tie swaps
        ss, sm = np.asarray(scores_s), np.asarray(scores_m)
        for i, (a, b) in enumerate(zip(np.asarray(rows_s), np.asarray(rows_m))):
            if a != b:
                assert abs(ss[i] - sm[i]) < 1e-4

    def test_batched_matches_single_query_sharded(self, sharded):
        rng = np.random.default_rng(41)
        queries = ["yellow cat socks", "kitchen knife"]
        qvecs = rng.standard_normal((2, 64)).astype(np.float32)
        qvecs /= np.linalg.norm(qvecs, axis=1, keepdims=True)
        w = FusionWeights.make(w_dense=0.6, w_bm25=0.3, w_prior=0.1,
                               min_reviews=5, gate_penalty=0.5)
        rb, sb = sharded.query_fused_batched(qvecs, queries, w, pool=32, k=8)
        rb, sb = np.asarray(rb), np.asarray(sb)
        assert rb.shape == (2, 8)
        for i, q in enumerate(queries):
            r1, s1 = sharded.query_fused(qvecs[i], q, w, pool=32, k=8)
            np.testing.assert_allclose(sb[i], np.asarray(s1), rtol=1e-5,
                                       atol=1e-6)

    def test_run_search_dataframe_matches_single_chip(self, single, sharded):
        q = _qvec(61)
        kwargs = dict(w_dense=0.5, w_bm25=0.3, w_prior=0.2, min_reviews=5,
                      gate_penalty=0.3)
        # pool matches the single-chip default automatically now (max(k,
        # rerank_k, 150), clipped to the corpus) — min-max statistics are
        # pool-dependent
        df_m, _snips_m, dbg_m = sharded.run_search(
            "yellow cat socks", qvec=q, k=8, rerank_k=0, w_rerank=0.0,
            w_best=0.0, prior_C=20.0, **kwargs)
        assert dbg_m["n_shards"] == sharded.n_shards
        df_s, _snips, _dbg = single.run_search(
            "yellow cat socks", qvec=q, k=8, rerank_k=0, w_rerank=0.0,
            w_best=0.0, prior_C=20.0, **kwargs,
        )
        for col in ("sku", "_dense", "_bm25", "_prior", "_trust", "_gate",
                    "_final", "n_reviews", "avg_stars", "agg_text"):
            assert col in df_m.columns
        np.testing.assert_allclose(
            df_m["_final"].to_numpy(), df_s["_final"].to_numpy(),
            rtol=2e-4, atol=2e-5,
        )
        # near-tie swaps only
        for i, (a, b) in enumerate(zip(df_m["sku"], df_s["sku"])):
            if a != b:
                assert abs(df_m["_final"][i] - df_s["_final"][i]) < 1e-4

    def test_snippet_signal(self, single, sharded):
        q = _qvec(31)
        w = FusionWeights.make(
            w_dense=1.0, w_bm25=0.0, w_rerank=0.0, w_prior=0.0, w_best=0.3,
            prior_c=20.0, min_reviews=1, gate_penalty=1.0,
        )
        rows_s, scores_s, _bd = single._fused(
            single.arrays, single.rev_arrays,
            jax.numpy.asarray(q), *_feat(single, "yellow socks"), w,
            jax.numpy.bool_(True), pool=32, k=8,
        )
        rows_m, scores_m = sharded.query_fused(
            q, "yellow socks", w, pool=32, k=8, use_snips=True
        )
        np.testing.assert_allclose(
            np.asarray(scores_m), np.asarray(scores_s), rtol=2e-4, atol=2e-5
        )


def _feat(engine, query):
    import jax.numpy as jnp

    qf = engine.featurizer.featurize(query)
    return (
        jnp.asarray(qf.q_terms), jnp.asarray(qf.q_idf),
        jnp.asarray(qf.group_phrase_mask), jnp.asarray(qf.group_term_ids),
        jnp.asarray(qf.group_valid),
    )


class TestShardedE2E:
    """On-mesh e2e: encode + sharded retrieve + PAIR-SHARDED cross-encoder
    rerank in one SPMD program, vs the single-chip e2e on the same towers."""

    @pytest.fixture(scope="class")
    def setup(self):
        import jax.numpy as jnp

        from review_recommender_tpu.index.build import attach_rerank_tokens
        from review_recommender_tpu.models.bert import BertConfig
        from review_recommender_tpu.models.encoder import BiEncoder, CrossEncoder
        from review_recommender_tpu.models.tokenizer import HashTokenizer

        tok = HashTokenizer(vocab_size=512)
        be = BiEncoder.random_init(BertConfig.tiny(vocab_size=512),
                                   tokenizer=tok, seed=0, dtype=jnp.float32)
        ce = CrossEncoder.random_init(BertConfig.tiny(vocab_size=512),
                                      tokenizer=tok, seed=1, dtype=jnp.float32)
        products, _emb, _r, _re = make_corpus(n=32, dim=64, seed=17)
        for p in products:
            p["agg_text"] = p["agg_text"][:120]
        emb = be.encode([p["agg_text"] for p in products])
        bundle = build_bundle_from_products(products, emb, pad_multiple=8,
                                            doc_terms_cap=64)
        attach_rerank_tokens(bundle.products, tok, max_tokens=40)

        single = SearchEngine(bundle, emb_dtype="float32", gate_mode="device")
        single.attach_models(be, ce)
        sharded_e = ShardedSearchEngine(bundle, n_shards=8,
                                        emb_dtype="float32")
        sharded_e.attach_models(be, ce)
        return single, sharded_e

    @pytest.mark.parametrize("query", [
        "yellow cat socks", "wireless bluetooth headphones",
    ])
    def test_e2e_matches_single_chip(self, setup, query):
        single, sharded_e = setup
        w = FusionWeights.make(w_dense=0.5, w_bm25=0.2, w_rerank=0.3,
                               w_prior=0.1, w_best=0.0, prior_c=20.0,
                               min_reviews=5, gate_penalty=0.5)
        pool = single.products.n_padded
        rr_k = 10
        rows_s, scores_s = single.query_e2e(query, w, pool=pool, k=8,
                                            rr_k=rr_k)
        rows_m, scores_m = sharded_e.query_e2e(query, w, pool=pool, k=8,
                                               rr_k=rr_k)
        np.testing.assert_allclose(
            np.asarray(scores_m), np.asarray(scores_s), rtol=5e-4, atol=5e-5)
        ss, sm = np.asarray(scores_s), np.asarray(scores_m)
        for i, (a, b) in enumerate(zip(np.asarray(rows_s),
                                       np.asarray(rows_m))):
            if a != b:
                assert abs(ss[i] - sm[i]) < 1e-3

    def test_e2e_requires_attach(self, bundle):
        eng = ShardedSearchEngine(bundle, n_shards=8, emb_dtype="float32")
        w = FusionWeights.make()
        with pytest.raises(RuntimeError, match="attach_models"):
            eng.query_e2e("x", w, pool=16, k=4)


class TestShardedInt8:
    def test_int8_matches_f32_ranking(self, bundle):
        e8 = ShardedSearchEngine(bundle, n_shards=8, emb_dtype="int8")
        ef = ShardedSearchEngine(bundle, n_shards=8, emb_dtype="float32")
        q = _qvec(77)
        w = FusionWeights.make(w_dense=1.0, w_bm25=0.0, w_prior=0.0,
                               min_reviews=1, gate_penalty=1.0)
        r8, s8 = e8.query_fused(q, "wireless headphones", w, pool=16, k=8)
        rf, sf = ef.query_fused(q, "wireless headphones", w, pool=16, k=8)
        # int8 quantization noise: top results overlap strongly
        overlap = len(set(np.asarray(r8).tolist())
                      & set(np.asarray(rf).tolist()))
        assert overlap >= 6
        np.testing.assert_allclose(np.asarray(s8), np.asarray(sf),
                                   rtol=0.05, atol=0.02)


class TestBatchBucketing:
    def test_odd_batch_sizes_share_programs(self, sharded):
        rng = np.random.default_rng(5)
        w = FusionWeights.make(w_dense=1.0, w_bm25=0.0, w_prior=0.0,
                               min_reviews=1, gate_penalty=1.0)
        n_before = len(sharded._compiled)
        for b in (5, 6, 7):  # all pad to bucket 8
            qvecs = rng.standard_normal((b, 64)).astype(np.float32)
            qvecs /= np.linalg.norm(qvecs, axis=1, keepdims=True)
            rb, sb = sharded.query_fused_batched(
                qvecs, ["yellow socks"] * b, w, pool=16, k=4)
            assert np.asarray(rb).shape == (b, 4)
        keys = [key for key in sharded._compiled if key[0] == "fused_batch"]
        new_batch_keys = len(sharded._compiled) - n_before
        assert new_batch_keys == 1, keys  # ONE bucket-8 program served all


class TestShardedStripedScan:
    """Striped mode on the mesh uses the fused score+pool scan with
    per-shard local stripes; with stripes >= local rows it is exact, so
    sharding must not change results vs the exact sharded engine."""

    def test_builds_sliced_arrays(self, bundle):
        eng = ShardedSearchEngine(bundle, n_shards=8, emb_dtype="float32",
                                  dense_pool="striped")
        assert "emb_s" in eng.arrays and "valid_s" in eng.arrays
        s_l, total_g, d = eng.arrays["emb_s"].shape
        assert total_g % 8 == 0 and d == 64
        assert s_l * total_g >= eng._local_rows * 8

    def test_dense_topk_pad_stripe_cannot_alias_next_shard(self, bundle,
                                                           corpus):
        """Regression: striped_topk can surface a -inf pad-stripe lane
        whose local index lands in [local_n, padded); _local_topk must
        clamp it BEFORE the shard offset is added, or the global id aliases
        the next shard's rows (and overflows n_padded on the last shard).
        Forced geometry: local_n=12, stripes=5 -> padded=15, stripe 4 all
        pad; kl=12 > 5 finite stripes guarantees -inf lanes are selected."""
        eng = ShardedSearchEngine(bundle, n_shards=8, emb_dtype="float32",
                                  dense_pool="striped")
        eng._shard_stripes = 5
        eng._compiled.pop(("dense", 96), None)
        q = _qvec(29)
        idx, scores = eng.dense_topk(q, k=96)
        idx, scores = np.asarray(idx), np.asarray(scores)
        n_padded = eng.products.n_padded
        assert idx.max() < n_padded
        # every -inf lane's id must stay inside its OWNING shard's row
        # range: ids congruent to local row < local_n per shard by
        # construction, so no finite-scored doc may appear twice either
        finite = np.isfinite(scores)
        assert len(set(idx[finite].tolist())) == int(finite.sum())
        # exact scores on the finite lanes still match the oracle
        products, emb, *_ = corpus
        V = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        sims = V @ q
        for i, s in zip(idx[finite], scores[finite]):
            if i < len(products):
                np.testing.assert_allclose(s, sims[i], rtol=1e-5, atol=1e-5)

    def test_matches_exact_sharded(self, bundle, sharded):
        striped = ShardedSearchEngine(bundle, n_shards=8,
                                      emb_dtype="float32",
                                      dense_pool="striped")
        w = FusionWeights.make(w_dense=0.5, w_bm25=0.3, w_rerank=0.0,
                               w_prior=0.2, w_best=0.0, prior_c=20.0,
                               min_reviews=8, gate_penalty=0.7)
        for seed, q in ((3, "wireless headphone"), (7, "yellow sock"),
                        (13, "kitchen knife steel")):
            qv = _qvec(seed)
            r1, s1 = sharded.query_fused(qv, q, w, pool=32, k=8)
            r2, s2 = striped.query_fused(qv, q, w, pool=32, k=8)
            np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
            np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                       rtol=1e-5, atol=1e-6)

    def test_matches_single_chip_striped(self, bundle):
        # both engines' stripes cover every row at this size -> both exact
        single_striped = SearchEngine(bundle, emb_dtype="float32",
                                      gate_mode="device",
                                      dense_pool="striped")
        mesh_striped = ShardedSearchEngine(bundle, n_shards=8,
                                           emb_dtype="float32",
                                           dense_pool="striped")
        w = FusionWeights.make()
        qv = _qvec(21)
        r1, s1 = single_striped.query_fused(qv, "running shoe", w,
                                            pool=24, k=6)
        r2, s2 = mesh_striped.query_fused(qv, "running shoe", w,
                                          pool=24, k=6)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-5, atol=1e-6)

    def test_int8_striped_matches_int8_exact(self, bundle):
        exact8 = ShardedSearchEngine(bundle, n_shards=8, emb_dtype="int8")
        striped8 = ShardedSearchEngine(bundle, n_shards=8, emb_dtype="int8",
                                       dense_pool="striped")
        assert "emb_qs" in striped8.arrays
        w = FusionWeights.make()
        qv = _qvec(31)
        r1, s1 = exact8.query_fused(qv, "cotton sock", w, pool=24, k=6)
        r2, s2 = striped8.query_fused(qv, "cotton sock", w, pool=24, k=6)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-5, atol=1e-6)

    def test_batched_striped(self, bundle):
        striped = ShardedSearchEngine(bundle, n_shards=8,
                                      emb_dtype="float32",
                                      dense_pool="striped")
        w = FusionWeights.make()
        qvs = np.stack([_qvec(s) for s in range(4)])
        rb, sb = striped.query_fused_batched(
            qvs, ["yellow sock"] * 4, w, pool=16, k=5)
        rb, sb = np.asarray(rb), np.asarray(sb)
        assert rb.shape == (4, 5)
        assert np.isfinite(sb[:, 0]).all()


class TestShardedRerankCoalesce:
    """query_rerank_batched_pw (RerankCoalesceMixin) on the mesh equals the
    single-chip engine: SPMD stage A, one shared cross-encoder pass, the
    engine-shared stage B."""

    def test_matches_single_chip(self, bundle):
        from tests.test_microbatch import _FakePairCE

        ce = _FakePairCE()
        single = SearchEngine(bundle, emb_dtype="float32",
                              gate_mode="device", cross_encoder=ce)
        sharded = ShardedSearchEngine(bundle, n_shards=8,
                                      emb_dtype="float32", cross_encoder=ce)
        qvecs = np.stack([_qvec(s) for s in (1, 2, 3, 4)])
        queries = ["yellow cat socks", "wireless headphones",
                   "kitchen knife", "blue running shoes"]
        weights = [(0.4, 0.2, 0.25, 0.15, 0.0, 20.0, 5.0, 0.5)] * 4
        rerank_ks = [6, 0, 8, 3]  # incl. a rerank_k=0 padding-style rider
        args = (qvecs, queries, weights, rerank_ks)
        r_s, s_s, b_s = (np.asarray(x) for x in
                         single.query_rerank_batched_pw(*args, pool=24, k=8))
        r_m, s_m, b_m = (np.asarray(x) for x in
                         sharded.query_rerank_batched_pw(*args, pool=24, k=8))
        np.testing.assert_array_equal(r_s, r_m)
        np.testing.assert_allclose(s_s, s_m, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(b_s, b_m, rtol=2e-4, atol=2e-5)
        # the rerank column contributed for the rerank riders only
        rr = b_m[..., 2]
        assert np.any(rr[0] != 0) and np.any(rr[2] != 0)
        assert np.all(rr[1] == 0)

    def test_snippet_signal_parity(self, bundle):
        from tests.test_microbatch import _FakePairCE

        ce = _FakePairCE()
        single = SearchEngine(bundle, emb_dtype="float32",
                              gate_mode="device", cross_encoder=ce)
        sharded = ShardedSearchEngine(bundle, n_shards=8,
                                      emb_dtype="float32", cross_encoder=ce)
        qvecs = np.stack([_qvec(s) for s in (7, 8)])
        queries = ["yellow cat socks", "usb cable"]
        weights = [(0.4, 0.2, 0.2, 0.1, 0.1, 20.0, 5.0, 0.5)] * 2
        args = (qvecs, queries, weights, [5, 5])
        r_s, s_s, b_s = (np.asarray(x) for x in single.query_rerank_batched_pw(
            *args, pool=24, k=8, use_snips=True))
        r_m, s_m, b_m = (np.asarray(x) for x in sharded.query_rerank_batched_pw(
            *args, pool=24, k=8, use_snips=True))
        np.testing.assert_array_equal(r_s, r_m)
        np.testing.assert_allclose(s_s, s_m, rtol=2e-4, atol=2e-5)
        assert np.any(b_m[..., 4] != 0)  # best-review column live
