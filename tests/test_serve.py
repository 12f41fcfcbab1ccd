"""Serving tests: HTTP API end-to-end on a live socket, audit gate, CLI."""
import json
import threading
import urllib.request

import numpy as np
import pytest

from review_recommender_tpu.engine.search import SearchEngine
from review_recommender_tpu.index.build import build_bundle_from_products
from review_recommender_tpu.index.io import save_bundle
from tests.test_engine_parity import make_corpus


@pytest.fixture(scope="module")
def bundle():
    products, emb, reviews, remb = make_corpus(n=24, dim=32, seed=9)
    return build_bundle_from_products(
        products, emb, reviews=reviews, review_embeddings=remb,
        pad_multiple=8, doc_terms_cap=32,
    )


@pytest.fixture(scope="module")
def engine(bundle):
    def enc(text):
        import zlib

        rng = np.random.default_rng(zlib.crc32(text.encode()))
        v = rng.standard_normal(32).astype(np.float32)
        return v / np.linalg.norm(v)

    return SearchEngine(bundle, emb_dtype="float32", gate_mode="device",
                        query_encoder=enc)


@pytest.fixture(scope="module")
def server(engine):
    from review_recommender_tpu.serve.api import serve

    srv = serve(engine, host="127.0.0.1", port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
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
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


class TestHTTP:
    def test_healthz(self, server):
        code, body = _get(server + "/healthz")
        assert code == 200 and body["status"] == "ok"

    def test_readyz_after_warmup(self, server):
        code, body = _get(server + "/readyz")
        assert code == 200 and body["ready"]

    def test_search_endpoint(self, server):
        code, body = _post(server + "/search", {
            "query": "wireless headphones", "k": 5, "rerank_k": 0,
        })
        assert code == 200
        assert len(body["results"]) == 5
        row = body["results"][0]
        for col in ("sku", "_final", "_dense", "_bm25"):
            assert col in row
        assert body["took_ms"] > 0
        assert body["debug"]["tokens"] == ["wireless", "headphones"]

    def test_search_missing_query_400(self, server):
        code, body = _post(server + "/search", {})
        assert code == 400 and "error" in body

    def test_unknown_route_404(self, server):
        code, _ = _post(server + "/nope", {})
        assert code == 404

    def test_debug_info(self, server):
        code, body = _get(server + "/debug/info")
        assert code == 200
        assert body["n_docs"] == 24
        assert body["stats"]["requests"] >= 1
        assert "latency" in body

    def test_metrics_prometheus(self, server):
        # after at least one /search the exposition must carry counters,
        # latency quantiles and index gauges in Prometheus text format
        import urllib.request

        _post(server + "/search", {"query": "blue mouse", "k": 3,
                                   "rerank_k": 0})
        with urllib.request.urlopen(server + "/metrics", timeout=30) as r:
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        assert "# TYPE rrt_requests_total counter" in text
        n_req = int([l for l in text.splitlines()
                     if l.startswith("rrt_requests_total")][0].split()[1])
        assert n_req >= 1
        assert 'rrt_request_latency_seconds{quantile="0.5"}' in text
        assert "rrt_index_docs 24" in text
        assert "rrt_ready 1" in text

    def test_debug_trace(self, server, tmp_path):
        # a client-supplied log_dir must be IGNORED (arbitrary-path write
        # hardening): the trace always lands under LOG_FILE's parent
        code, body = _post(server + "/debug/trace", {
            "query": "wireless headphones", "n": 2,
            "log_dir": str(tmp_path / "evil"),
        })
        assert code == 200
        assert body["n"] == 2
        assert body["ms_per_query"] > 0
        assert str(tmp_path / "evil") not in body["log_dir"]
        from pathlib import Path

        from review_recommender_tpu.config import config

        assert Path(body["log_dir"]).is_relative_to(
            Path(config.LOG_FILE).parent
        )

    def test_ui_page(self, server):
        import urllib.request

        with urllib.request.urlopen(server + "/", timeout=10) as r:
            html = r.read().decode()
        assert r.status == 200
        assert "Review Search Copilot" in html
        for knob in ("w_dense", "w_bm25", "gate_penalty", "rerank_k"):
            assert knob in html

    def test_eval_endpoint(self, server):
        code, body = _post(server + "/eval", {
            "queries": [
                {"id": "q1", "query": "wireless headphones",
                 "relevant_skus": ["SKU0001"]},
                {"id": "q2", "query": "yellow socks",
                 "relevant_skus": ["SKU0002", "SKU0003"]},
            ],
            "k": 10, "rerank_k": 0,
        })
        assert code == 200
        agg = body["aggregate"]
        assert agg["n_queries"] == 2
        assert 0.0 <= agg["mrr"] <= 1.0
        assert len(body["per_query"]) == 2

    def test_eval_missing_queries_400(self, server):
        code, body = _post(server + "/eval", {})
        assert code == 400 and "error" in body

    def test_search_batch(self, server):
        code, body = _post(server + "/search_batch", {
            "queries": ["wireless headphones", "yellow socks",
                        "kitchen knife"],
            "k": 5,
        })
        assert code == 200
        assert body["batch"] == 3
        assert len(body["results"]) == 3
        for per_q in body["results"]:
            assert len(per_q) == 5
            assert all("sku" in r and "_final" in r for r in per_q)
            finals = [r["_final"] for r in per_q]
            assert finals == sorted(finals, reverse=True)

    def test_search_batch_missing_queries_400(self, server):
        code, body = _post(server + "/search_batch", {})
        assert code == 400 and "error" in body


class TestBytesFormatter:
    def test_byte_identical_to_dict_path(self, engine):
        """format_search_result_bytes must equal
        json.dumps(format_search_result(...)) byte-for-byte on the same
        program outputs — the native front end puts its bytes directly on
        the wire, so any drift is a silent server-equality break."""
        from review_recommender_tpu.serve.api import (
            SearchService,
            format_search_result,
            format_search_result_bytes,
            run_coalesced_batch,
        )

        service = SearchService(engine)
        try:
            payloads = [
                {"query": "yellow socks", "k": 4},
                {"query": "wireless headphones", "k": 3, "w_dense": 0.7,
                 "prior_C": 15.0, "use_snips": True},
                {"query": "zzz qqq nothing", "k": 2},
            ]
            pendings = [service.parse_search_payload(p) for p in payloads]
            captured = []

            def capturing(eng, req, rows, scores, bd, n, took):
                captured.append((req, rows, scores, bd, n, took))
                return format_search_result(eng, req, rows, scores, bd, n,
                                            took)

            run_coalesced_batch(engine, pendings, formatter=capturing)
            assert len(captured) == len(payloads)
            for req, rows, scores, bd, n, took in captured:
                want = json.dumps(format_search_result(
                    engine, req, rows, scores, bd, n, took)).encode()
                got = format_search_result_bytes(
                    engine, req, rows, scores, bd, n, took)
                assert got == want
                # second call exercises the warm _row_fragment cache
                assert format_search_result_bytes(
                    engine, req, rows, scores, bd, n, took) == want
        finally:
            service.close()


class TestAudit:
    def test_good_bundle_passes(self, bundle, tmp_path):
        from review_recommender_tpu.serve.audit import audit_index_dir

        save_bundle(bundle, tmp_path / "idx")
        report = audit_index_dir(tmp_path / "idx")
        assert report["ok"], report
        names = {c["check"] for c in report["checks"]}
        assert {"required_files", "checksums", "bundle_loads",
                "sku_uniqueness", "embeddings_normalized"} <= names

    def test_missing_file_fails(self, bundle, tmp_path):
        from review_recommender_tpu.serve.audit import audit_index_dir

        save_bundle(bundle, tmp_path / "idx")
        (tmp_path / "idx" / "vocab.txt").unlink()
        report = audit_index_dir(tmp_path / "idx")
        assert not report["ok"]

    def test_corrupted_checksum_fails(self, bundle, tmp_path):
        from review_recommender_tpu.serve.audit import audit_index_dir

        save_bundle(bundle, tmp_path / "idx")
        with open(tmp_path / "idx" / "vocab.txt", "a") as f:
            f.write("tampered\n")
        report = audit_index_dir(tmp_path / "idx")
        assert not report["ok"]
        bad = [c for c in report["checks"] if c["check"] == "checksums"][0]
        assert not bad["passed"]


class TestCLI:
    def test_audit_subcommand(self, bundle, tmp_path, capsys):
        from review_recommender_tpu.serve.cli import main

        save_bundle(bundle, tmp_path / "idx")
        rc = main(["audit", "--index-dir", str(tmp_path / "idx")])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["ok"]

    def test_health_subcommand_down(self):
        from review_recommender_tpu.serve.cli import main

        rc = main(["health", "--url", "http://127.0.0.1:1",
                   "--timeout", "0.5"])
        assert rc == 1

    def test_eval_subcommand(self, bundle, tmp_path, capsys):
        """rrt eval: judged JSONL -> per-method IR table + saved results.
        Self-retrieval queries (each query = a doc's own text, judged
        relevant to itself) must score near-perfect nDCG."""
        from review_recommender_tpu.serve.cli import main

        save_bundle(bundle, tmp_path / "idx")
        qf = tmp_path / "queries.jsonl"
        with open(qf, "w") as f:
            for i in (1, 5, 9):
                f.write(json.dumps({
                    "query": bundle.products.agg_texts[i][:60],
                    "relevant_skus": [bundle.products.skus[i]],
                }) + "\n")
        out_dir = tmp_path / "evals"
        rc = main(["eval", "--index-dir", str(tmp_path / "idx"),
                   "--queries", str(qf), "--method", "BM25 Only",
                   "--out", str(out_dir), "--no-warmup"])
        assert rc == 0
        table = capsys.readouterr().out
        assert "BM25 Only" in table and "NDCG@10" in table
        saved = json.loads((out_dir / "benchmark_results.json").read_text())
        assert saved["BM25 Only"]["aggregate"]["ndcg@10"] > 0.6

    def test_eval_subcommand_bad_method(self, bundle, tmp_path):
        from review_recommender_tpu.serve.cli import main

        save_bundle(bundle, tmp_path / "idx")
        qf = tmp_path / "q.jsonl"
        qf.write_text(json.dumps({"query": "x", "relevant_skus": ["y"]})
                      + "\n")
        rc = main(["eval", "--index-dir", str(tmp_path / "idx"),
                   "--queries", str(qf), "--method", "nope"])
        assert rc == 1
