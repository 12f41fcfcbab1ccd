"""HTTP serving over the corpus-sharded mesh engine (VERDICT r2 item 2).

Boots the SAME stdlib HTTP server (serve/api.py — SearchService +
MicroBatcher included) over a ShardedSearchEngine on the 8-virtual-device
CPU mesh, and a twin server over the single-chip engine on the same bundle,
then asserts the mesh server's responses equal the single-chip server's:
same result SKUs, same scores, same snippets. This is the production
multi-chip serving path (`rrt serve --shards N`).
"""
import json
import threading
import urllib.request

import numpy as np
import pytest

from review_recommender_tpu.engine.search import SearchEngine
from review_recommender_tpu.index.build import build_bundle_from_products
from review_recommender_tpu.parallel.sharded import ShardedSearchEngine
from tests.test_engine_parity import make_corpus


def _enc(text):
    import zlib

    rng = np.random.default_rng(zlib.crc32(text.encode()))  # stable per text
    v = rng.standard_normal(32).astype(np.float32)
    return v / np.linalg.norm(v)


@pytest.fixture(scope="module")
def bundle():
    products, emb, reviews, remb = make_corpus(n=24, dim=32, seed=9)
    return build_bundle_from_products(
        products, emb, reviews=reviews, review_embeddings=remb,
        pad_multiple=8, doc_terms_cap=32,
    )


def _boot(engine):
    from review_recommender_tpu.serve.api import serve

    srv = serve(engine, host="127.0.0.1", port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


@pytest.fixture(scope="module")
def mesh_server(bundle):
    engine = ShardedSearchEngine(bundle, n_shards=8, emb_dtype="float32",
                                 query_encoder=_enc)
    srv, url = _boot(engine)
    yield url, srv
    srv.shutdown()


@pytest.fixture(scope="module")
def single_server(bundle):
    engine = SearchEngine(bundle, emb_dtype="float32", gate_mode="device",
                          query_encoder=_enc)
    srv, url = _boot(engine)
    yield url, srv
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        # generous: a cold mesh-program compile under full-suite load on
        # this single-core box can hold a request for minutes
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _strip_timing(body):
    """Drop wall-clock fields and engine-shape debug keys; keep everything
    the client actually consumes (results incl. every signal, snippets)."""
    return {
        "results": [
            {k: (round(v, 4) if isinstance(v, float) else v)
             for k, v in row.items()}
            for row in body["results"]
        ],
        "snippets": body["snippets"],
    }


class TestMeshServing:
    def test_ready_and_microbatcher_active(self, mesh_server):
        url, srv = mesh_server
        code, body = _get(url + "/readyz")
        assert code == 200 and body["ready"]
        # the micro-batcher must be live over the mesh engine
        assert srv.service.batcher is not None
        code, info = _get(url + "/debug/info")
        assert info["microbatch"] is not None

    def test_search_matches_single_chip_server(self, mesh_server,
                                               single_server):
        mesh_url, _ = mesh_server
        single_url, _ = single_server
        for payload in (
            {"query": "wireless headphones", "k": 5, "rerank_k": 0},
            {"query": "yellow socks", "k": 8, "rerank_k": 0,
             "w_dense": 0.7, "w_bm25": 0.2, "prior_C": 30.0,
             "gate_penalty": 0.4},
            {"query": "usb cable", "k": 5, "rerank_k": 0,
             "use_snips": True},
        ):
            cs, bs = _post(single_url + "/search", payload)
            cm, bm = _post(mesh_url + "/search", payload)
            assert cs == cm == 200
            assert _strip_timing(bs) == _strip_timing(bm), payload

    def test_search_batch_endpoint(self, mesh_server, single_server):
        payload = {"queries": ["wireless headphones", "yellow socks"],
                   "k": 5}
        cs, bs = _post(single_server[0] + "/search_batch", payload)
        cm, bm = _post(mesh_server[0] + "/search_batch", payload)
        assert cs == cm == 200
        assert len(bs["results"]) == len(bm["results"])
        for rs, rm in zip(bs["results"], bm["results"]):
            assert [r["sku"] for r in rs] == [r["sku"] for r in rm]
            np.testing.assert_allclose(
                [r["_final"] for r in rs], [r["_final"] for r in rm],
                rtol=2e-4, atol=2e-5,
            )

    def test_concurrent_coalesced_requests(self, mesh_server, single_server):
        """A concurrent burst rides the micro-batcher over the mesh and
        every rider gets its single-chip answer."""
        mesh_url, msrv = mesh_server
        single_url, _ = single_server
        queries = [f"query number {i} socks" for i in range(12)]
        expected = {}
        for q in queries:
            _, b = _post(single_url + "/search",
                         {"query": q, "k": 5, "rerank_k": 0})
            expected[q] = _strip_timing(b)

        results, errors = {}, []

        def worker(q):
            try:
                code, b = _post(mesh_url + "/search",
                                {"query": q, "k": 5, "rerank_k": 0})
                assert code == 200
                results[q] = _strip_timing(b)
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(q,))
                   for q in queries]
        for t in threads:
            t.start()
        # generous: under full-suite load this single-core box can spend
        # minutes compiling the batched programs for a fresh bucket shape
        for t in threads:
            t.join(timeout=600)
        assert not any(t.is_alive() for t in threads), "request timed out"
        assert not errors
        before = msrv.service.batcher.coalesced
        assert before >= len(queries)
        for q in queries:
            assert results[q] == expected[q], q

    def test_concurrent_rerank_riders_coalesce_on_mesh(self, bundle):
        """Live-rerank /search riders coalesce over the mesh engine
        (query_rerank_batched_pw via RerankCoalesceMixin) and each equals
        the single-chip server's answer — the cross-encoder pass is shared
        across riders AND the pool is corpus-sharded."""
        from tests.test_microbatch import _FakePairCE

        mesh_eng = ShardedSearchEngine(
            bundle, n_shards=8, emb_dtype="float32", query_encoder=_enc,
            cross_encoder=_FakePairCE(),
        )
        single_eng = SearchEngine(
            bundle, emb_dtype="float32", gate_mode="device",
            query_encoder=_enc, cross_encoder=_FakePairCE(),
        )
        msrv, mesh_url = _boot(mesh_eng)
        ssrv, single_url = _boot(single_eng)
        try:
            queries = [f"rerank burst {i} socks" for i in range(6)]
            payloads = {
                q: {"query": q, "k": 5, "rerank_k": 6, "w_rerank": 0.25}
                for q in queries
            }
            expected = {}
            for q in queries:
                code, b = _post(single_url + "/search", payloads[q])
                assert code == 200
                expected[q] = _strip_timing(b)

            results, errors = {}, []

            def worker(q):
                try:
                    code, b = _post(mesh_url + "/search", payloads[q])
                    assert code == 200
                    results[q] = _strip_timing(b)
                except Exception as e:  # pragma: no cover
                    errors.append(e)

            threads = [threading.Thread(target=worker, args=(q,))
                       for q in queries]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=600)
            assert not any(t.is_alive() for t in threads), "request timed out"
            assert not errors
            assert msrv.service.batcher.coalesced >= len(queries)
            for q in queries:
                assert results[q] == expected[q], q
            # the rerank signal actually contributed on the mesh. Union
            # over queries, not per query: a query whose reranked top-
            # rerank_k candidates all miss the final top-k (or tie, min-
            # maxing to zero) legitimately shows a zero column — the
            # reference's engine has the same property.
            assert any(r["_rerank"] != 0.0
                       for q in queries for r in results[q]["results"])
        finally:
            msrv.shutdown()
            ssrv.shutdown()

    def test_eval_endpoint_over_mesh(self, mesh_server):
        code, body = _post(mesh_server[0] + "/eval", {
            "queries": [
                {"id": "q1", "query": "wireless headphones",
                 "relevant_skus": ["SKU0001"]},
            ],
            "k": 10, "rerank_k": 0,
        })
        assert code == 200
        assert "ndcg@10" in body["aggregate"] or body["aggregate"]
