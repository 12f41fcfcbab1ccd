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
