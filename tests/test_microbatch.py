"""Cross-request micro-batching (serve/api.py:MicroBatcher).

Contract: concurrent /search requests coalesce into batched device programs
(bucketed sizes, per-query fusion weights) and every client gets exactly the
result it would have gotten from its own run_search — the VERDICT r1 item 4
"concurrent serving = the batched number" requirement, with a 64-client
closed loop.
"""
import threading

import numpy as np
import pytest

from review_recommender_tpu.config import config
from review_recommender_tpu.engine.search import SearchEngine
from review_recommender_tpu.index.build import build_bundle_from_products
from review_recommender_tpu.serve.api import MicroBatcher, SearchService
from tests.test_engine_parity import make_corpus

DIM = 32


@pytest.fixture(scope="module")
def engine():
    products, emb, reviews, remb = make_corpus(n=48, dim=DIM, seed=3)
    bundle = build_bundle_from_products(
        products, emb, reviews=reviews, review_embeddings=remb,
        pad_multiple=16, doc_terms_cap=64,
    )
    return SearchEngine(bundle, emb_dtype="float32", gate_mode="device")


def _qvec(seed):
    v = np.random.default_rng(seed).standard_normal(DIM).astype(np.float32)
    return v / np.linalg.norm(v)


DEFAULT_W = (0.5, 0.3, 0.0, 0.2, 0.0, 20.0, 5.0, 0.5)


class TestMicroBatcher:
    def test_64_client_closed_loop_matches_run_search(self, engine):
        batcher = MicroBatcher(engine, window_ms=20.0, max_batch=16)
        queries = ["yellow cat socks", "wireless headphones", "kitchen knife",
                   "running shoes", "usb cable charger", "leather wallet"]
        n_clients, rounds = 64, 2
        results = {}
        errors = []

        def client(ci):
            try:
                for r in range(rounds):
                    q = queries[(ci + r) % len(queries)]
                    qv = _qvec(ci % 8)
                    out = batcher.search(q, qv, DEFAULT_W, k=10, pool=32,
                                         use_snips=False)
                    results[(ci, r)] = (q, qv, out)
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n_clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        batcher.close()
        assert not errors, errors
        assert len(results) == n_clients * rounds
        # coalescing actually happened: far fewer programs than requests
        assert batcher.coalesced == n_clients * rounds
        assert batcher.batches < n_clients * rounds / 2

        # every client got exactly its own run_search answer
        from review_recommender_tpu.ops.fusion import FusionWeights

        checked = 0
        for (ci, r), (q, qv, out) in results.items():
            if checked >= 12:  # spot-check a dozen (run_search is slower)
                break
            w = FusionWeights.make(*DEFAULT_W)
            rows, scores = engine.query_fused(qv, q, w, pool=32, k=10)
            rows, scores = np.asarray(rows), np.asarray(scores)
            got_skus = [x["sku"] for x in out["results"]]
            want_skus = [engine.products.skus[int(i)]
                         for i, s in zip(rows, scores) if np.isfinite(s)]
            assert got_skus == want_skus, (q, ci, r)
            got_finals = [x["_final"] for x in out["results"]]
            np.testing.assert_allclose(
                got_finals, scores[np.isfinite(scores)], rtol=1e-4, atol=1e-5)
            checked += 1

    def test_warmup_buckets_compiles_every_bucket(self, engine):
        """warmup_buckets must execute one batched program per bucket size
        up to max_batch (so no live burst pays first-compile), and leave the
        batcher fully usable."""
        batcher = MicroBatcher(engine, window_ms=5.0, max_batch=8)
        seen = []
        orig = engine.query_fused_batched_pw

        def spy(qvecs, texts, weights, pool, k, **kw):
            seen.append(np.asarray(qvecs).shape[0])
            return orig(qvecs, texts, weights, pool, k, **kw)

        engine.query_fused_batched_pw = spy
        try:
            batcher.warmup_buckets(k=10, pool=32, dim=DIM)
            assert seen == [b for b in MicroBatcher.BUCKETS if b <= 8]
            out = batcher.search("yellow cat socks", _qvec(0), DEFAULT_W,
                                 k=10, pool=32, use_snips=False)
            assert len(out["results"]) > 0
        finally:
            engine.query_fused_batched_pw = orig
            batcher.close()

    def test_batcher_over_striped_engine(self):
        """`rrt serve --dense-pool striped` routes every coalesced batch
        through the fused scan pool; results must match the exact engine's
        when the corpus is smaller than the stripe count."""
        products, emb, reviews, remb = make_corpus(n=48, dim=DIM, seed=3)
        bundle = build_bundle_from_products(
            products, emb, reviews=reviews, review_embeddings=remb,
            pad_multiple=16, doc_terms_cap=64,
        )
        striped = SearchEngine(bundle, emb_dtype="float32",
                               gate_mode="device", dense_pool="striped")
        exact = SearchEngine(bundle, emb_dtype="float32",
                             gate_mode="device")
        batcher = MicroBatcher(striped, window_ms=5.0, max_batch=8)
        try:
            batcher.warmup_buckets(k=10, pool=32, dim=DIM)
            out = batcher.search("yellow cat socks", _qvec(1), DEFAULT_W,
                                 k=10, pool=32, use_snips=False)
            from review_recommender_tpu.ops.fusion import FusionWeights

            w = FusionWeights.make(*DEFAULT_W)
            rows, scores = exact.query_fused(_qvec(1), "yellow cat socks",
                                             w, pool=32, k=10)
            rows, scores = np.asarray(rows), np.asarray(scores)
            want = [exact.products.skus[int(i)]
                    for i, s in zip(rows, scores) if np.isfinite(s)]
            assert [r["sku"] for r in out["results"]] == want
        finally:
            batcher.close()

    def test_mixed_weights_in_one_batch(self, engine):
        batcher = MicroBatcher(engine, window_ms=50.0, max_batch=8)
        weight_sets = [
            (1.0, 0.0, 0.0, 0.0, 0.0, 20.0, 1.0, 1.0),
            (0.0, 1.0, 0.0, 0.0, 0.0, 20.0, 1.0, 1.0),
            (0.5, 0.3, 0.0, 0.2, 0.0, 20.0, 5.0, 0.3),
        ]
        outs = {}

        def client(i):
            outs[i] = batcher.search("yellow cat socks", _qvec(1),
                                     weight_sets[i], k=5, pool=32,
                                     use_snips=False)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        batcher.close()
        assert len(outs) == 3
        # they rode one coalesced batch but got DIFFERENT rankings/scores
        assert outs[0]["debug"]["coalesced"] == 3
        from review_recommender_tpu.ops.fusion import FusionWeights

        for i, ws in enumerate(weight_sets):
            w = FusionWeights.make(*ws)
            rows, scores = engine.query_fused(_qvec(1), "yellow cat socks",
                                              w, pool=32, k=5)
            rows, scores = np.asarray(rows), np.asarray(scores)
            want = [engine.products.skus[int(r)]
                    for r, s in zip(rows, scores) if np.isfinite(s)]
            assert [x["sku"] for x in outs[i]["results"]] == want

    def test_transient_device_failure_retries_once(self, engine):
        """One flaky device call must not fail the coalesced riders: the
        batcher retries once (observed tunnel failure mode)."""
        batcher = MicroBatcher(engine, window_ms=5.0, max_batch=4)
        orig = engine.query_fused_batched_pw
        calls = {"n": 0}

        def flaky(*a, **kw):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("FAILED_PRECONDITION: TPU backend error")
            return orig(*a, **kw)

        engine.query_fused_batched_pw = flaky
        try:
            out = batcher.search("yellow cat socks", _qvec(2), DEFAULT_W,
                                 k=10, pool=32, use_snips=False)
            assert len(out["results"]) > 0
            assert calls["n"] == 2
        finally:
            engine.query_fused_batched_pw = orig
            batcher.close()

    def test_close_flushes_pending(self, engine):
        """close() during the collection window flushes waiting requests
        instead of stranding them until the window deadline."""
        batcher = MicroBatcher(engine, window_ms=60_000.0, max_batch=64)
        out = {}

        def client():
            out["r"] = batcher.search("yellow socks", _qvec(0), DEFAULT_W,
                                      5, 16, False, timeout=50)

        t = threading.Thread(target=client)
        t.start()
        import time

        time.sleep(0.2)
        batcher.close()
        t.join(timeout=30)
        assert not t.is_alive()
        assert out["r"]["results"] is not None


class TestServiceRouting:
    def test_search_routes_through_batcher(self, engine, monkeypatch):
        monkeypatch.setattr(config, "ENABLE_MICROBATCH", True, raising=False)
        svc = SearchService(engine)
        assert svc.batcher is not None
        out = svc.search({"query": "yellow socks",
                          "qvec": _qvec(2).tolist(), "rerank_k": 0})
        assert out["debug"]["coalesced"] >= 1
        assert out["results"]
        assert {"_dense", "_bm25", "_final"} <= set(out["results"][0])
        svc.close()

    def test_exact_max_scan_bypasses_batcher(self, engine, monkeypatch):
        monkeypatch.setattr(config, "ENABLE_MICROBATCH", True, raising=False)
        svc = SearchService(engine)
        out = svc.search({"query": "yellow socks",
                          "qvec": _qvec(2).tolist(), "rerank_k": 0,
                          "use_snips": True, "max_scan": 100})
        # run_search path: debug has the run_search shape, no 'coalesced'
        assert "coalesced" not in out["debug"]
        assert "stage_ms" in out["debug"]
        svc.close()


def _fake_ce(query, texts):
    """Deterministic (query, text) scoring hook. zlib.crc32, NOT hash():
    Python's string hash is salted per process (PYTHONHASHSEED), which
    made rerank-column assertions flake run-to-run when a process's salt
    happened to tie all top-k scores (a tied column min-maxes to zero)."""
    import zlib

    return np.asarray(
        [((zlib.crc32((query + "\x00" + t[:50]).encode()) % 1000) / 1000.0)
         for t in texts],
        np.float32,
    )


class _FakePairCE:
    """Fake with BOTH the generic hook and the coalescing score_pairs
    surface (models/encoder.py:CrossEncoder shape)."""

    def __call__(self, query, texts):
        return _fake_ce(query, texts)

    def score_pairs(self, queries, docs):
        return np.asarray(
            [_fake_ce(q, [d])[0] for q, d in zip(queries, docs)], np.float32
        )


RERANK_W = (0.4, 0.2, 0.25, 0.15, 0.0, 20.0, 5.0, 0.5)


@pytest.fixture(scope="module", params=["pair_ce", "hook_ce"])
def ce_engine(request):
    products, emb, reviews, remb = make_corpus(n=48, dim=DIM, seed=3)
    bundle = build_bundle_from_products(
        products, emb, reviews=reviews, review_embeddings=remb,
        pad_multiple=16, doc_terms_cap=64,
    )
    ce = _FakePairCE() if request.param == "pair_ce" else _fake_ce
    return SearchEngine(bundle, emb_dtype="float32", gate_mode="device",
                        cross_encoder=ce)


class TestRerankCoalescing:
    """Concurrent rerank-enabled /search riders share ONE coalesced
    cross-encoder pass (engine.query_rerank_batched_pw) and each gets
    exactly its own run_search answer."""

    def test_concurrent_rerank_matches_run_search(self, ce_engine):
        engine = ce_engine
        batcher = MicroBatcher(engine, window_ms=50.0, max_batch=8)
        queries = ["yellow cat socks", "wireless headphones",
                   "kitchen knife", "running shoes"]
        outs = {}

        # run_search derives pool = max(k, rerank_k, DEFAULT_POOL_SIZE)
        # capped at n_padded; riders must use the same pool for parity
        pool = min(max(10, 8, config.DEFAULT_POOL_SIZE),
                   engine.products.n_padded)

        def client(i):
            outs[i] = batcher.search(
                queries[i], _qvec(i), RERANK_W, k=10, pool=pool,
                use_snips=False, rerank_k=8,
            )

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(queries))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        batcher.close()
        assert len(outs) == len(queries)
        # they rode together (one batched program pair)
        assert outs[0]["debug"]["coalesced"] == len(queries)
        assert batcher.batches == 1

        for i, q in enumerate(queries):
            df, _, _ = engine.run_search(
                q, qvec=_qvec(i), k=10, rerank_k=8,
                w_dense=RERANK_W[0], w_bm25=RERANK_W[1],
                w_rerank=RERANK_W[2], w_prior=RERANK_W[3],
                w_best=RERANK_W[4], prior_C=RERANK_W[5],
                min_reviews=RERANK_W[6], gate_penalty=RERANK_W[7],
            )
            got = [(r["sku"], r["_final"]) for r in outs[i]["results"]]
            want = list(zip(df["sku"], df["_final"]))
            assert [s for s, _ in got] == [s for s, _ in want], q
            np.testing.assert_allclose(
                [v for _, v in got], [v for _, v in want],
                rtol=1e-4, atol=1e-5,
            )
            # rerank signal actually contributed
            assert any(r["_rerank"] != 0.0 for r in outs[i]["results"]), q

    def test_mixed_rerank_and_plain_riders(self, ce_engine):
        """Rerank and non-rerank riders in one window group into separate
        programs but both coalesce and both match run_search."""
        engine = ce_engine
        batcher = MicroBatcher(engine, window_ms=60.0, max_batch=8)
        outs = {}

        pool = min(max(5, 6, config.DEFAULT_POOL_SIZE),
                   engine.products.n_padded)

        def rerank_client(i):
            outs[("r", i)] = batcher.search(
                "yellow cat socks", _qvec(i), RERANK_W, k=5, pool=pool,
                use_snips=False, rerank_k=6,
            )

        def plain_client(i):
            outs[("p", i)] = batcher.search(
                "wireless headphones", _qvec(i), DEFAULT_W, k=5, pool=pool,
                use_snips=False, rerank_k=0,
            )

        threads = [threading.Thread(target=rerank_client, args=(i,))
                   for i in range(2)]
        threads += [threading.Thread(target=plain_client, args=(i,))
                    for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        batcher.close()
        assert len(outs) == 4
        for i in range(2):
            df, _, _ = engine.run_search(
                "yellow cat socks", qvec=_qvec(i), k=5, rerank_k=6,
                w_dense=RERANK_W[0], w_bm25=RERANK_W[1],
                w_rerank=RERANK_W[2], w_prior=RERANK_W[3],
                w_best=RERANK_W[4], prior_C=RERANK_W[5],
                min_reviews=RERANK_W[6], gate_penalty=RERANK_W[7],
            )
            assert [r["sku"] for r in outs[("r", i)]["results"]] == \
                list(df["sku"]), i
            df2, _, _ = engine.run_search(
                "wireless headphones", qvec=_qvec(i), k=5, rerank_k=0,
                w_dense=DEFAULT_W[0], w_bm25=DEFAULT_W[1],
                w_rerank=DEFAULT_W[2], w_prior=DEFAULT_W[3],
                w_best=DEFAULT_W[4], prior_C=DEFAULT_W[5],
                min_reviews=DEFAULT_W[6], gate_penalty=DEFAULT_W[7],
            )
            assert [r["sku"] for r in outs[("p", i)]["results"]] == \
                list(df2["sku"]), i

    def test_service_routes_rerank_through_batcher(self, ce_engine):
        """SearchService._batchable now admits live-rerank payloads; the
        coalesced result must equal the non-batched run_search path."""
        svc = SearchService(ce_engine)
        try:
            payload = {"query": "kitchen knife", "k": 5, "rerank_k": 6,
                       "w_rerank": 0.25, "qvec": _qvec(7).tolist()}
            assert svc._batchable(payload)
            assert svc._rerank_k_live(payload) == 6
            out = svc.search(dict(payload))
            df, _, _ = ce_engine.run_search(
                "kitchen knife", qvec=_qvec(7), k=5, rerank_k=6,
                w_rerank=0.25,
            )
            assert [r["sku"] for r in out["results"]] == list(df["sku"])
            np.testing.assert_allclose(
                [r["_final"] for r in out["results"]], list(df["_final"]),
                rtol=1e-4, atol=1e-5,
            )
        finally:
            svc.close()

    def test_warmup_covers_rerank_programs(self, ce_engine):
        """warmup_buckets with a cross-encoder present compiles the
        coalesced-rerank programs too (rerank_ks=0: no CE calls)."""
        batcher = MicroBatcher(ce_engine, window_ms=5.0, max_batch=4)
        seen = []
        orig = ce_engine.query_rerank_batched_pw

        def spy(qvecs, texts, weights, rerank_ks, pool, k, **kw):
            seen.append((np.asarray(qvecs).shape[0], tuple(rerank_ks)))
            return orig(qvecs, texts, weights, rerank_ks, pool, k, **kw)

        ce_engine.query_rerank_batched_pw = spy
        try:
            batcher.warmup_buckets(k=10, pool=32, dim=DIM)
            assert [b for b, _ in seen] == \
                [b for b in MicroBatcher.BUCKETS if b <= 4]
            assert all(all(r == 0 for r in rks) for _, rks in seen)
        finally:
            ce_engine.query_rerank_batched_pw = orig
            batcher.close()


class TestRerankCoalesceFuzz:
    """Randomized knob fuzzing of the coalesced-rerank path: every rider in
    a random batch (random weights, mixed rerank_ks) must match its own
    run_search answer. Fixed (pool, k) so the two programs compile once."""

    @pytest.mark.integration
    def test_random_riders_match_run_search(self, ce_engine):
        engine = ce_engine
        # run_search derives pool = max(k, rerank_k, DEFAULT_POOL_SIZE)
        # clipped to n_padded; riders must use the same pool for parity
        # (min-max fusion statistics are pool-dependent)
        pool = min(max(10, 16, config.DEFAULT_POOL_SIZE),
                   engine.products.n_padded)
        for trial in range(6):
            rng = np.random.default_rng(9000 + trial)
            B = 4
            queries = [" ".join(rng.choice(
                ["yellow", "socks", "wireless", "headphones", "kitchen",
                 "knife", "running", "shoes", "usb", "cable"],
                size=int(rng.integers(1, 4)))) for _ in range(B)]
            qvecs = rng.standard_normal((B, DIM)).astype(np.float32)
            qvecs /= np.linalg.norm(qvecs, axis=1, keepdims=True)
            weights = [tuple(map(float, (
                rng.uniform(0, 1), rng.uniform(0, 1), rng.uniform(0, 1),
                rng.uniform(0, 1), 0.0, rng.choice([1.0, 20.0, 200.0]),
                rng.choice([1, 5, 25]), rng.choice([0.0, 0.3, 0.9, 1.0]),
            ))) for _ in range(B)]
            rerank_ks = [int(rng.choice([0, 4, 9, 16])) for _ in range(B)]
            rows, scores, bd = engine.query_rerank_batched_pw(
                qvecs, queries, weights, rerank_ks, pool, 10)
            rows, scores = np.asarray(rows), np.asarray(scores)
            for i in range(B):
                w = weights[i]
                df, _, _ = engine.run_search(
                    queries[i], qvec=qvecs[i], k=10, rerank_k=rerank_ks[i],
                    w_dense=w[0], w_bm25=w[1], w_rerank=w[2], w_prior=w[3],
                    w_best=w[4], prior_C=w[5], min_reviews=w[6],
                    gate_penalty=w[7],
                )
                want = np.asarray(df["_final"], np.float32)
                got = scores[i][: len(want)]
                np.testing.assert_allclose(
                    got, want, rtol=2e-4, atol=2e-5,
                    err_msg=f"trial={trial} rider={i} q={queries[i]!r} "
                            f"w={w} rk={rerank_ks[i]}")
                for r, (sku, gf, wf) in enumerate(zip(
                        df["sku"], got, want)):
                    if engine.products.skus[int(rows[i][r])] != sku:
                        assert abs(gf - wf) < 1e-4  # near-tie rank swap
