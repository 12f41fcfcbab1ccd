"""Native C++ HTTP front end over the corpus-sharded mesh engine.

test_serve_mesh.py proves the stdlib server answers identically over
ShardedSearchEngine; test_native_server.py proves the native front end
answers identically over the single-chip engine. This closes the square:
`rrt serve --shards N --native` (native epoll loop + 8-virtual-device mesh)
must answer exactly like the stdlib single-chip server — both route through
serve/api.py:route_request / run_coalesced_batch, and sharding never changes
scores (merge-then-fuse invariant).

Lives in its own module: the C++ side allows one RUNNING instance per
process, so this must boot after test_native_server.py's module-scoped
server is torn down.
"""
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from review_recommender_tpu.engine.search import SearchEngine
from review_recommender_tpu.index.build import build_bundle_from_products
from review_recommender_tpu.parallel.sharded import ShardedSearchEngine
from tests.test_engine_parity import make_corpus

pytestmark = pytest.mark.skipif(
    not __import__(
        "review_recommender_tpu.native", fromlist=["native_server_available"]
    ).native_server_available(),
    reason="librrt_native.so absent or predates server.cc",
)


def _enc(text):
    import zlib

    rng = np.random.default_rng(zlib.crc32(text.encode()))
    v = rng.standard_normal(32).astype(np.float32)
    return v / np.linalg.norm(v)


def _post(port, path, payload, timeout=600):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _strip_timing(body):
    """Round floats and drop wall-clock / engine-shape fields (same
    comparison as test_serve_mesh: cross-ENGINE float drift is ~1e-7, so
    exact equality only holds rounded)."""
    return {
        "results": [
            {k: (round(v, 4) if isinstance(v, float) else v)
             for k, v in row.items()}
            for row in body["results"]
        ],
        "snippets": body["snippets"],
    }


@pytest.fixture(scope="module")
def bundle():
    products, emb, reviews, remb = make_corpus(n=24, dim=32, seed=9)
    return build_bundle_from_products(
        products, emb, reviews=reviews, review_embeddings=remb,
        pad_multiple=8, doc_terms_cap=32,
    )


@pytest.fixture(scope="module")
def mesh_native(bundle):
    from review_recommender_tpu.serve.native_server import serve_native

    engine = ShardedSearchEngine(bundle, n_shards=8, emb_dtype="float32",
                                 query_encoder=_enc)
    srv = serve_native(engine, host="127.0.0.1", port=0, warmup=True)
    yield srv
    srv.close()


@pytest.fixture(scope="module")
def single_std(bundle):
    from review_recommender_tpu.serve.api import serve

    engine = SearchEngine(bundle, emb_dtype="float32", gate_mode="device",
                          query_encoder=_enc)
    srv = serve(engine, host="127.0.0.1", port=0, warmup=True)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1]
    srv.shutdown()
    srv.service.close()


class TestNativeOverMesh:
    def test_ready(self, mesh_native):
        req = urllib.request.Request(
            f"http://127.0.0.1:{mesh_native.port}/readyz")
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 200 and json.loads(r.read())["ready"]

    def test_search_matches_single_chip_stdlib(self, mesh_native,
                                               single_std):
        for payload in (
            {"query": "wireless headphones", "k": 5, "rerank_k": 0},
            {"query": "yellow socks", "k": 8, "rerank_k": 0,
             "w_dense": 0.7, "w_bm25": 0.2, "prior_C": 30.0,
             "gate_penalty": 0.4},
            {"query": "usb cable", "k": 5, "rerank_k": 0,
             "use_snips": True},
        ):
            cs, bs = _post(single_std, "/search", payload)
            cn, bn = _post(mesh_native.port, "/search", payload)
            assert cs == cn == 200, payload
            assert _strip_timing(bs) == _strip_timing(bn), payload

    def test_concurrent_burst_coalesces_on_mesh(self, mesh_native):
        n = 8
        # the name promises coalescing, so prove it via the server's device
        # batch counters: a burst must ride fewer device batches than it
        # has riders (some window carried >1 request). Thread-start skew on
        # a 1-core box can legitimately scatter one burst into singleton
        # windows, so allow a few attempts before calling it a failure.
        for attempt in range(3):
            before = mesh_native.stats()
            results = [None] * n

            def worker(i):
                results[i] = _post(mesh_native.port, "/search",
                                   {"query": f"mesh socks q{i}", "k": 3})

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(n)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=600)
            assert not any(t.is_alive() for t in threads), "request timed out"
            assert all(r[0] == 200 for r in results)
            finals = [r[1]["results"][0]["_final"] for r in results]
            assert all(np.isfinite(finals))
            after = mesh_native.stats()
            riders = after["device_coalesced"] - before["device_coalesced"]
            batches = after["device_batches"] - before["device_batches"]
            assert riders == n, (before, after)
            if batches < riders:
                return
        raise AssertionError(
            f"3 bursts of {n} riders each ran as one device batch per "
            "rider — the native window never coalesced concurrent requests")
