"""Native C++ HTTP front end (native/server.cc + serve/native_server.py):
live-socket end-to-end, error paths, concurrent coalescing, and
response-equality against the stdlib server (both route through
serve/api.py:route_request / run_coalesced_batch, so answers must match).
"""
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from review_recommender_tpu.engine.search import SearchEngine
from review_recommender_tpu.index.build import build_bundle_from_products
from tests.test_engine_parity import make_corpus

pytestmark = pytest.mark.skipif(
    not __import__(
        "review_recommender_tpu.native", fromlist=["native_server_available"]
    ).native_server_available(),
    reason="librrt_native.so absent or predates server.cc",
)


def _request(port, method, path, body=None, timeout=30):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body, method=method
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, resp.read(), resp.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type")


def _encoder(dim):
    def enc(text):
        import zlib

        rng = np.random.default_rng(zlib.crc32(text.encode()))
        v = rng.standard_normal(dim).astype(np.float32)
        return v / np.linalg.norm(v)

    return enc


@pytest.fixture(scope="module")
def engine():
    products, emb, reviews, remb = make_corpus(n=24, dim=32, seed=9)
    bundle = build_bundle_from_products(
        products, emb, reviews=reviews, review_embeddings=remb,
        pad_multiple=8, doc_terms_cap=32,
    )
    return SearchEngine(bundle, emb_dtype="float32", gate_mode="device",
                        query_encoder=_encoder(32))


@pytest.fixture(scope="module")
def native_srv(engine):
    from review_recommender_tpu.serve.native_server import serve_native

    srv = serve_native(engine, host="127.0.0.1", port=0, warmup=True)
    yield srv
    srv.close()


class TestNativeServer:
    def test_healthz_readyz(self, native_srv):
        code, body, ctype = _request(native_srv.port, "GET", "/healthz")
        assert code == 200 and json.loads(body) == {"status": "ok"}
        assert ctype == "application/json"
        code, body, _ = _request(native_srv.port, "GET", "/readyz")
        assert code == 200 and json.loads(body) == {"ready": True}

    def test_search_roundtrip(self, native_srv):
        payload = json.dumps({"query": "yellow socks", "k": 3}).encode()
        code, body, _ = _request(native_srv.port, "POST", "/search", payload)
        assert code == 200
        out = json.loads(body)
        assert len(out["results"]) == 3
        finals = [r["_final"] for r in out["results"]]
        assert finals == sorted(finals, reverse=True)
        assert out["debug"]["coalesced"] >= 1

    def test_error_paths(self, native_srv):
        p = native_srv.port
        assert _request(p, "POST", "/search", b"garbage")[0] == 400
        assert _request(p, "POST", "/search", b"{}")[0] == 400
        assert _request(p, "POST", "/search", b"[1, 2]")[0] == 400
        assert _request(p, "GET", "/nope")[0] == 404
        assert _request(p, "POST", "/nope", b"{}")[0] == 404

    def test_ui_page_content_type(self, native_srv):
        code, body, ctype = _request(native_srv.port, "GET", "/")
        assert code == 200
        assert ctype.startswith("text/html")
        assert b"<html" in body.lower()

    def test_debug_info_has_native_stats(self, native_srv):
        code, body, _ = _request(native_srv.port, "GET", "/debug/info")
        assert code == 200
        info = json.loads(body)
        ns = info["native_server"]
        assert ns["requests"] >= 1
        assert ns["max_batch"] >= 1

    def test_concurrent_burst_coalesces(self, native_srv):
        n = 12
        results = [None] * n

        def worker(i):
            body = json.dumps({"query": f"socks q{i}", "k": 3}).encode()
            results[i] = _request(native_srv.port, "POST", "/search", body)

        before = native_srv.batch_stats.coalesced
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(r[0] == 200 for r in results)
        outs = [json.loads(r[1]) for r in results]
        # at least one window held >1 rider (12 clients, 2 ms window)
        assert max(o["debug"]["coalesced"] for o in outs) > 1
        assert native_srv.batch_stats.coalesced - before == n

    def test_disconnect_mid_window_keeps_server_alive(self, native_srv):
        """Clients that vanish before their window dispatches must not take
        the server down (regression: dispatch_batch re-entered a live
        parse_loop frame and could resume on a freed Conn; the dispatch is
        now deferred to the event-loop top level). Riders fill windows to
        max_batch with pipelined sends, some sockets close immediately —
        the server must answer normally afterwards."""
        import socket

        body = json.dumps({"query": "red socks", "k": 2}).encode()
        raw = (b"POST /search HTTP/1.1\r\nHost: x\r\n"
               b"Content-Type: application/json\r\n"
               b"Content-Length: " + str(len(body)).encode()
               + b"\r\n\r\n" + body)
        # a waiting conn holds ONE pending slot, so reaching the inline
        # full-window dispatch (the old crash path) needs max_batch
        # simultaneous connections
        n_conns = native_srv.max_batch
        for _round in range(3):
            socks = []
            for i in range(n_conns):
                sk = socket.create_connection(
                    ("127.0.0.1", native_srv.port), timeout=10)
                sk.sendall(raw * 2)  # one pending + one pipelined follow-up
                socks.append(sk)
            # half the clients vanish before (or while) their window runs
            for sk in socks[::2]:
                sk.close()
            # the rest read one response then drop the connection mid-stream
            for sk in socks[1::2]:
                try:
                    sk.settimeout(60)
                    buf = b""
                    while b"\r\n\r\n" not in buf:
                        chunk = sk.recv(4096)
                        if not chunk:
                            break
                        buf += chunk
                finally:
                    sk.close()
        # server must still be fully functional
        code, resp_body, _ = _request(native_srv.port, "POST", "/search",
                                      body)
        assert code == 200
        assert json.loads(resp_body)["results"]
        code, _b, _ = _request(native_srv.port, "GET", "/healthz")
        assert code == 200

    def test_search_batch_and_eval_via_fallback(self, native_srv):
        dim = native_srv.service.engine.products.dim
        qvecs = np.eye(2, dim).tolist()
        payload = json.dumps({"queries": ["a", "b"], "qvecs": qvecs,
                              "k": 2}).encode()
        code, body, _ = _request(native_srv.port, "POST", "/search_batch",
                                 payload)
        assert code == 200
        out = json.loads(body)
        assert len(out["results"]) == 2
        payload = json.dumps({
            "queries": [{"query": "socks", "relevant_skus": []}], "k": 3,
        }).encode()
        code, body, _ = _request(native_srv.port, "POST", "/eval", payload)
        assert code == 200
        assert "aggregate" in json.loads(body)

    def test_keep_alive_two_requests_one_connection(self, native_srv):
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", native_srv.port,
                                          timeout=30)
        for q in ("red shoes", "blue hat"):
            conn.request("POST", "/search",
                         json.dumps({"query": q, "k": 2}),
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            assert resp.status == 200
            json.loads(resp.read())
        conn.close()


class TestNativeMatchesStdlib:
    def test_same_payload_same_results(self, engine, native_srv):
        """The two servers share route_request + run_coalesced_batch —
        a /search answer must be identical up to timing fields. (Reuses
        the module's native server: the C++ side allows one instance per
        process.)"""
        from review_recommender_tpu.serve.api import serve

        std = serve(engine, host="127.0.0.1", port=0, warmup=True)
        std_port = std.server_address[1]
        t = threading.Thread(target=std.serve_forever, daemon=True)
        t.start()
        try:
            payload = json.dumps(
                {"query": "wireless headphones", "k": 4, "w_dense": 0.7,
                 "prior_C": 15.0}
            ).encode()
            _, b_std, _ = _request(std_port, "POST", "/search", payload)
            _, b_nat, _ = _request(native_srv.port, "POST", "/search",
                                   payload)
            out_std, out_nat = json.loads(b_std), json.loads(b_nat)
            for o in (out_std, out_nat):
                o.pop("took_ms")
                o["debug"].pop("batch_ms")
                o["debug"].pop("coalesced")
            assert out_std == out_nat
        finally:
            std.shutdown()
            std.service.close()
