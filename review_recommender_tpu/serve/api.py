"""HTTP serving: a dependency-free JSON API over the jitted engine.

Replaces the reference's Streamlit app + nginx health plumbing
(/root/reference/app/app_product_search.py:372-490, nginx.conf:29-33) with a
thread-per-request stdlib HTTP server fronting ONE SearchEngine instance.
The engine's jitted programs are compiled once at startup (warmup), so the
first user query is fast — unlike the reference, which lazy-loads models on
first search.

Endpoints:
  GET  /                  built-in web UI (serve/ui.py — the reference's
                          Streamlit tabs rebuilt as one static page)
  GET  /healthz           liveness: {"status": "ok"}  (Docker HEALTHCHECK)
  GET  /readyz            readiness: index + encoder loaded, warmup done
  GET  /debug/info        corpus stats, rolling latency percentiles
  POST /search            {"query": "...", "k": 10, ...engine knobs...}
                          -> {"results": [...], "snippets": {...},
                              "debug": {...}, "took_ms": float}
  POST /eval              {"queries": [{"query", "relevant_skus"}...],
                           ...engine knobs...} -> IR metrics (the
                          reference's BYO-dev-set Metrics tab, app:434-474)
  POST /search_batch      {"queries": [...], "k": 10, shared fusion knobs}
                          -> high-throughput path: ONE batched device
                          program for the whole request (results carry sku
                          + final score; use /search for signal breakdowns)

Search parameters accept exactly the run_search surface
(app/app_product_search.py:245-248 parity).
"""
from __future__ import annotations

import json
import logging
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from review_recommender_tpu.config import config

logger = logging.getLogger(__name__)

SEARCH_KNOBS = (
    "k", "rerank_k", "w_dense", "w_bm25", "w_rerank", "w_prior", "w_best",
    "prior_C", "use_snips", "max_scan", "min_reviews", "gate_penalty",
)


class SearchService:
    """Engine wrapper with warmup + request stats (thread-safe: JAX dispatch
    holds the GIL only briefly; one engine serves all handler threads)."""

    def __init__(self, engine):
        from review_recommender_tpu.utils.profiling import LatencyStats

        self.engine = engine
        self.ready = False
        self.stats = {"requests": 0, "errors": 0, "total_ms": 0.0}
        self.latency = LatencyStats()
        self._lock = threading.Lock()

    WARMUP_KS = (5, 10, 20)  # common top-k values; each k is its own program

    def warmup(self, qvec_dim: Optional[int] = None) -> None:
        """Compile the query programs for the common k values so no user
        request pays a first-compile (each distinct k is a distinct XLA
        program shape)."""
        dim = qvec_dim or self.engine.products.dim
        qvec = np.zeros(dim, np.float32)
        qvec[0] = 1.0
        ks = sorted(set(self.WARMUP_KS) | {int(self.engine_default_k())})
        for k in ks:
            self.engine.run_search("warmup query", qvec=qvec, k=k, rerank_k=0)
        self.ready = True

    def engine_default_k(self) -> int:
        return config.DEFAULT_K

    def search(self, payload: dict) -> dict:
        query = payload.get("query", "")
        if not query:
            raise ValueError("missing 'query'")
        kwargs = {k: payload[k] for k in SEARCH_KNOBS if k in payload}
        if "qvec" in payload:
            kwargs["qvec"] = np.asarray(payload["qvec"], dtype=np.float32)
        t0 = time.perf_counter()
        df, snips, debug = self.engine.run_search(query, **kwargs)
        took_s = time.perf_counter() - t0
        took = took_s * 1e3
        self.latency.record(took_s)
        with self._lock:
            self.stats["requests"] += 1
            self.stats["total_ms"] += took
        return {
            "results": df.to_dict(orient="records"),
            "snippets": snips,
            "debug": debug,
            "took_ms": round(took, 3),
        }

    def search_batch(self, payload: dict) -> dict:
        """Batched retrieval: one vmapped device program for all queries."""
        from review_recommender_tpu.config import config
        from review_recommender_tpu.ops.fusion import FusionWeights

        queries = payload.get("queries") or []
        if not queries:
            raise ValueError("missing 'queries'")
        c = config
        g = lambda name, dflt: payload.get(name, dflt)
        k = int(g("k", c.DEFAULT_K))
        pool = int(g("pool", max(k, c.DEFAULT_POOL_SIZE)))
        w = FusionWeights.make(
            g("w_dense", c.DEFAULT_W_DENSE), g("w_bm25", c.DEFAULT_W_BM25),
            0.0,  # rerank is a per-query host hook; not on the batch path
            g("w_prior", c.DEFAULT_W_PRIOR), g("w_best", c.DEFAULT_W_BEST),
            g("prior_C", c.DEFAULT_PRIOR_C),
            g("min_reviews", c.DEFAULT_MIN_REVIEWS),
            g("gate_penalty", c.DEFAULT_GATE_PENALTY),
        )
        if "qvecs" in payload:
            qvecs = np.asarray(payload["qvecs"], dtype=np.float32)
        else:
            enc = self.engine.query_encoder
            if enc is None:
                raise ValueError("no query encoder; pass 'qvecs'")
            if hasattr(enc, "encode"):
                qvecs = np.asarray(enc.encode(queries), dtype=np.float32)
            else:
                qvecs = np.stack([np.asarray(enc(q), np.float32)
                                  for q in queries])
        t0 = time.perf_counter()
        rows, scores = self.engine.query_fused_batched(
            qvecs, queries, w, pool, k,
            use_snips=bool(g("use_snips", False)),
        )
        rows, scores = np.asarray(rows), np.asarray(scores)
        took = (time.perf_counter() - t0) * 1e3
        skus = self.engine.products.skus
        results = []
        for b in range(len(queries)):
            results.append([
                {"sku": skus[int(r)], "_final": float(s)}
                for r, s in zip(rows[b], scores[b])
                if np.isfinite(s)
            ])
        with self._lock:
            self.stats["requests"] += len(queries)
            self.stats["total_ms"] += took
        return {"results": results, "took_ms": round(took, 3),
                "batch": len(queries)}

    def evaluate(self, payload: dict) -> dict:
        """BYO dev-set eval: run the engine over judged queries."""
        from review_recommender_tpu.evals.metrics import IRMetrics

        queries = payload.get("queries") or []
        if not queries:
            raise ValueError("missing 'queries'")
        kwargs = {k: payload[k] for k in SEARCH_KNOBS if k in payload}
        metrics = IRMetrics()
        for q in queries:
            if "query" not in q:
                raise ValueError("each entry needs a 'query'")
            df, _s, _d = self.engine.run_search(q["query"], **kwargs)
            metrics.evaluate_query(
                q.get("id", q["query"]), df["sku"].tolist(),
                set(q.get("relevant_skus", [])),
            )
        return {
            "aggregate": metrics.aggregate_metrics(),
            "per_query": metrics.rows,
        }

    def info(self) -> dict:
        p = self.engine.products
        return {
            "n_docs": p.n_docs,
            "n_padded": p.n_padded,
            "dim": p.dim,
            "vocab_size": len(p.vocab),
            "has_reviews": self.engine.reviews is not None,
            "gate_mode": self.engine.gate_mode,
            "emb_dtype": str(self.engine.dtype.__name__ if hasattr(self.engine.dtype, "__name__") else self.engine.dtype),
            "ready": self.ready,
            "stats": dict(self.stats),
            "latency": self.latency.summary(),
        }


def make_handler(service: SearchService):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _send(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib API)
            if self.path in ("/", "/index.html"):
                from review_recommender_tpu.serve.ui import page

                body = page(metrics_tab=config.ENABLE_METRICS_TAB).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/healthz":
                self._send(200, {"status": "ok"})
            elif self.path == "/readyz":
                code = 200 if service.ready else 503
                self._send(code, {"ready": service.ready})
            elif self.path == "/debug/info":
                self._send(200, service.info())
            else:
                self._send(404, {"error": "not found"})

        ROUTES = {"/search": "search", "/eval": "evaluate",
                  "/search_batch": "search_batch"}

        def do_POST(self):  # noqa: N802
            handler_name = self.ROUTES.get(self.path)
            if handler_name is None:
                self._send(404, {"error": "not found"})
                return
            if self.path == "/eval" and not config.ENABLE_METRICS_TAB:
                self._send(404, {"error": "metrics endpoint disabled "
                                          "(ENABLE_METRICS_TAB=false)"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                self._send(200, getattr(service, handler_name)(payload))
            except ValueError as e:
                service.stats["errors"] += 1
                self._send(400, {"error": str(e)})
            except Exception as e:  # pragma: no cover - defensive
                logger.exception("search failed")
                service.stats["errors"] += 1
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):
            logger.debug("http: " + fmt, *args)

    return Handler


def serve(engine, host: Optional[str] = None, port: Optional[int] = None,
          warmup: bool = True, warmup_async: bool = False) -> ThreadingHTTPServer:
    """Start the HTTP server (returns it; call .serve_forever()).

    The socket binds BEFORE warmup so /healthz answers during the first
    compile; /readyz flips to 200 when warmup completes. warmup_async=True
    runs warmup in a daemon thread (production startup); synchronous warmup
    is the default so callers that immediately serve traffic get compiled
    programs.
    """
    service = SearchService(engine)
    srv = ThreadingHTTPServer(
        (host or config.APP_HOST, port or config.APP_PORT),
        make_handler(service),
    )
    srv.service = service  # for tests/introspection
    if warmup:
        if warmup_async:
            threading.Thread(target=service.warmup, daemon=True).start()
        else:
            service.warmup()
    return srv
