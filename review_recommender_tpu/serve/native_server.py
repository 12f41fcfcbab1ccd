"""Python side of the native HTTP front end (native/server.cc).

The C++ event loop owns every socket: accept, HTTP/1.1 parse, keep-alive,
micro-batch window assembly, response writes. Python is entered exactly
twice per unit of work:

  - once per /search WINDOW (the batch callback): json-decode each rider,
    run them through the same coalesced device path as the Python
    micro-batcher (serve/api.py:run_coalesced_batch), json-encode each
    response;
  - once per non-/search request (the fallback callback), which routes
    through serve/api.py:route_request — so /readyz, /debug/*, /eval,
    /search_batch and the web UI answer byte-identically to the stdlib
    server.

GET /healthz never reaches Python at all (answered in C++), so liveness
stays responsive while the GIL is busy compiling or dispatching.

Measured motivation: at 64 concurrent closed-loop clients on this
single-core host the stdlib ThreadingHTTPServer path serves ~480 q/s while
the device sustains >5000 q/s batched — ~90% of serving wall time was
Python HTTP/threading overhead, which this front end removes.

Use `rrt serve --native` (or SERVE_NATIVE=true) to enable; the stdlib
server remains the default and the automatic fallback when the shared
library is absent.
"""
from __future__ import annotations

import atexit
import ctypes
import json
import logging
import threading
from typing import Optional

from review_recommender_tpu.config import config
from review_recommender_tpu.native import (
    RRT_BATCH_CB,
    RRT_FALLBACK_CB,
    _lib,
    native_server_available,
)
from review_recommender_tpu.serve.api import (
    SearchService,
    format_search_result_bytes,
    route_request,
    run_coalesced_batch,
)

logger = logging.getLogger(__name__)


class NativeSearchServer:
    """Owns the native event loop's lifetime and its two Python callbacks.

    Only ONE native server can run per process (the C++ side holds a
    single global instance); start() raises if another is live.
    """

    def __init__(self, engine_or_service, host: Optional[str] = None,
                 port: Optional[int] = None,
                 window_ms: Optional[float] = None,
                 max_batch: Optional[int] = None):
        if not native_server_available():
            raise RuntimeError(
                "librrt_native.so is missing or predates server.cc — "
                "run `make -C review_recommender_tpu/native`"
            )
        self.service = (
            engine_or_service
            if isinstance(engine_or_service, SearchService)
            else SearchService(engine_or_service)
        )
        # the native loop does its own windowing; the Python micro-batcher
        # would only add a second (redundant) rendezvous for requests that
        # arrive via the fallback path, and run_coalesced_batch is called
        # directly here — so close it if the service made one
        if self.service.batcher is not None:
            self.service.batcher.close()
            self.service.batcher = None
        self.host = host or config.APP_HOST
        self.port = config.APP_PORT if port is None else port
        self.window_ms = (config.MICROBATCH_WINDOW_MS
                          if window_ms is None else window_ms)
        # clamp like MicroBatcher: a window larger than the biggest
        # compiled bucket would make run_coalesced_batch's bucket lookup
        # fail for every rider in every full window
        from review_recommender_tpu.serve.api import BATCH_BUCKETS

        self.max_batch = min(max_batch or config.MICROBATCH_MAX,
                             BATCH_BUCKETS[-1])
        # device-program counters (the C++ side counts HTTP-level units)
        import types

        self.batch_stats = types.SimpleNamespace(batches=0, coalesced=0)
        self.service.native_stats = self.stats  # /debug/info hook
        self._lib = _lib()
        # keep callback objects referenced for the server's lifetime —
        # a GC'd CFUNCTYPE leaves the C++ side with a dangling pointer
        self._batch_cb = RRT_BATCH_CB(self._on_batch)
        self._fallback_cb = RRT_FALLBACK_CB(self._on_fallback)
        self._started = False
        # serializes run_coalesced_batch/service calls against any other
        # thread using the engine (warmup runs on the caller's thread)
        self._dispatch_lock = threading.Lock()

    # ------------------------------------------------------------ lifecycle
    def start(self) -> int:
        """Bind + start the event loop thread; returns the bound port."""
        import socket

        # the C++ side parses the host with inet_addr (dotted quad only);
        # resolve names like "localhost" here so APP_HOST values that work
        # on the stdlib server work natively too
        try:
            host_ip = socket.gethostbyname(self.host)
        except OSError:
            host_ip = self.host  # let bind() report the real error
        port = self._lib.rrt_server_start(
            host_ip.encode(), int(self.port), float(self.window_ms),
            int(self.max_batch), self._batch_cb, self._fallback_cb,
        )
        if port < 0:
            raise OSError(
                f"native server failed to bind {self.host}:{self.port} "
                "(port in use, or another native server is running in "
                "this process)"
            )
        self.port = int(port)
        self._started = True
        atexit.register(self.close)  # never leave the loop calling into a
        # tearing-down interpreter
        logger.info("native server on http://%s:%d", self.host, self.port)
        return self.port

    def close(self) -> None:
        if self._started:
            self._lib.rrt_server_stop()
            self._started = False
            try:
                atexit.unregister(self.close)
            except Exception:  # pragma: no cover
                pass
        self.service.close()

    def warmup(self) -> None:
        # also compiles the coalesced bucket programs the C++ windowing
        # dispatches (there is no Python micro-batcher in this mode)
        self.service.warmup(coalesce_max_batch=self.max_batch)

    def stats(self) -> dict:
        out = (ctypes.c_int64 * 4)()
        self._lib.rrt_server_stats(out)
        return {"requests": int(out[0]), "windows": int(out[1]),
                "coalesced": int(out[2]), "fallbacks": int(out[3]),
                "device_batches": self.batch_stats.batches,
                "device_coalesced": self.batch_stats.coalesced,
                "window_ms": self.window_ms, "max_batch": self.max_batch}

    # ------------------------------------------------------------ callbacks
    def _reply(self, i: int, status: int, obj, ctype=b"application/json"):
        body = obj if isinstance(obj, bytes) else json.dumps(obj).encode()
        self._lib.rrt_server_reply(i, status, ctype, body, len(body))

    def _on_batch(self, bodies, lens, n):
        """One window of raw POST /search bodies -> one coalesced device
        dispatch. Riders the coalesced path can't serve (no micro-batch
        eligibility: max_scan, host gate, bad payload) fall back to
        service.search individually — same split the Python server makes.
        """
        try:
            with self._dispatch_lock:
                self._run_window(bodies, lens, int(n))
        except Exception as e:  # pragma: no cover - defensive: a raise
            # across the ctypes boundary would be swallowed with garbage
            logger.exception("native batch callback failed")
            for i in range(int(n)):
                self._reply(i, 500,
                            {"error": f"{type(e).__name__}: {e}"})

    def _run_window(self, bodies, lens, n):
        import time

        service = self.service
        pendings = []  # (index, _Pending)
        for i in range(n):
            try:
                raw = ctypes.string_at(bodies[i], lens[i])
                payload = json.loads(raw or b"{}")
                if not isinstance(payload, dict):
                    raise ValueError("payload must be a JSON object")
                if not payload.get("query"):
                    raise ValueError("missing 'query'")
                if service.coalesce_eligible(payload):
                    pendings.append((i, service.parse_search_payload(payload)))
                else:
                    self._reply(i, 200, service.search(payload))
            except ValueError as e:
                service.stats["errors"] += 1
                self._reply(i, 400, {"error": str(e)})
            except Exception as e:
                logger.exception("native /search failed")
                service.stats["errors"] += 1
                self._reply(i, 500, {"error": f"{type(e).__name__}: {e}"})
        if not pendings:
            return
        # pre-serialized results: the rider bodies come back as response
        # BYTES (format_search_result_bytes), so the window callback never
        # re-escapes multi-KB agg_texts through json.dumps per rider. The
        # embedded took_ms is the device-batch time (vs the dict path's
        # whole-window time — a sub-ms difference; both are timing fields
        # excluded from the server-equality contract).
        # time ONLY the coalesced dispatch: ineligible riders above ran
        # full service.search inline (which records its own latency), and
        # folding a slow fallback rider's seconds into every coalesced
        # rider's sample would corrupt the /metrics quantiles
        t0 = time.perf_counter()
        run_coalesced_batch(service.engine, [p for _, p in pendings],
                            stats=self.batch_stats,
                            formatter=format_search_result_bytes)
        took_s = time.perf_counter() - t0
        took_ms = round(took_s * 1e3, 3)
        for i, p in pendings:
            if p.error is not None:
                service.stats["errors"] += 1
                self._reply(i, 500,
                            {"error": f"{type(p.error).__name__}: {p.error}"})
                continue
            service.latency.record(took_s)
            with service._lock:
                service.stats["requests"] += 1
                service.stats["total_ms"] += took_ms
            self._reply(i, 200, p.result)

    def _on_fallback(self, method, path, body, body_len):
        try:
            with self._dispatch_lock:
                status, payload, ctype = route_request(
                    self.service, method.decode(), path.decode(),
                    ctypes.string_at(body, body_len) if body_len else b"",
                )
            self._reply(0, status, payload, ctype.encode())
        except Exception as e:  # pragma: no cover - defensive
            logger.exception("native fallback callback failed")
            self._reply(0, 500, {"error": f"{type(e).__name__}: {e}"})


def serve_native(engine, host: Optional[str] = None,
                 port: Optional[int] = None, warmup: bool = True,
                 warmup_async: bool = False) -> NativeSearchServer:
    """serve/api.py:serve's native twin: bind first (healthz answers from
    C++ during compiles), then warm up; /readyz flips when done."""
    srv = NativeSearchServer(engine, host=host, port=port)
    srv.start()
    if warmup:
        if warmup_async:
            threading.Thread(target=srv.warmup, daemon=True).start()
        else:
            srv.warmup()
    return srv
