"""HTTP serving app on the stdlib (FastAPI-free) with the reference's
endpoint contract (``app/main.py:28-204``):

* ``GET  /``               — service banner
* ``GET  /health``         — health/readiness
* ``GET  /model/info``     — model metadata
* ``POST /recommend``      — ``{user_id, k}`` -> ranked items
* ``POST /recommend/batch``— ``{user_ids, k}`` (documented+tested but
  never shipped by the reference; shipped here)
* ``POST /score``          — ``{user_id, item_ids}`` -> scores

Status-code contract parity: 503 when the model is not loaded
(``app/main.py:156-157``), 404 for unknown user/item on /score
(ValueError -> 404, ``app/main.py:167-171``), 422 for invalid payloads
(pydantic-equivalent validation), 500 otherwise.

The server is a ``ThreadingHTTPServer``; JAX calls inside handlers are
single-flight through the service's jitted functions (XLA executables
are thread-safe; Python-side batching via /recommend/batch is the
throughput path). An optional FastAPI adapter is provided for
environments that have it (``make_fastapi_app``).
"""

from __future__ import annotations

import json
import logging
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional, Tuple

from recsys_tpu.serve.service import RecommendationService

logger = logging.getLogger(__name__)

MAX_K = 100

# Request hardening, shared by BOTH transports (threaded here, asyncio
# in serve/aio.py): a client that lies about Content-Length (or
# trickles bytes) must not pin a connection open forever, and a huge
# declared body must not be buffered. The JSON bodies of this API are
# all < 100 KB (MAX_BATCH_USERS ids).
MAX_BODY_BYTES = 1 << 20
MAX_HEADER_LINES = 64
READ_TIMEOUT_S = 30.0
MAX_SCORE_ITEMS = 100
MAX_BATCH_USERS = 1024


class ValidationError(Exception):
    pass


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise ValidationError(msg)


class Telemetry:
    """Request counters + latency histograms, exposed in Prometheus
    text format at ``GET /metrics`` (beyond the reference, which stops
    at /health + /model/info — SURVEY §5.5)."""

    BUCKETS_S = (0.001, 0.0025, 0.005, 0.01, 0.025, 0.05, 0.1, 0.25,
                 0.5, 1.0, float("inf"))
    # label cardinality is bounded to the known endpoint set (anything
    # else aggregates under "other"): client-controlled paths must not
    # grow the counter map without bound or inject quotes/newlines into
    # the exposition text
    KNOWN_PATHS = frozenset({
        "/", "/health", "/model/info", "/metrics", "/recommend",
        "/recommend/batch", "/score", "/admin/reload",
    })

    def __init__(self):
        self._lock = threading.Lock()
        # (path, code) -> count
        self._requests: Dict[Tuple[str, int], int] = {}
        # path -> [bucket counts], sum
        self._hist: Dict[str, list] = {}
        self._hist_sum: Dict[str, float] = {}

    def observe(self, path: str, code: int, seconds: float) -> None:
        path = path.split("?", 1)[0]
        if path not in self.KNOWN_PATHS:
            path = "other"
        with self._lock:
            key = (path, code)
            self._requests[key] = self._requests.get(key, 0) + 1
            h = self._hist.setdefault(path, [0] * len(self.BUCKETS_S))
            for i, le in enumerate(self.BUCKETS_S):
                if seconds <= le:
                    h[i] += 1
                    break
            self._hist_sum[path] = self._hist_sum.get(path, 0.0) + seconds

    def render(self, batcher=None) -> str:
        lines = [
            "# TYPE recsys_requests_total counter",
        ]
        with self._lock:
            for (path, code), n in sorted(self._requests.items()):
                lines.append(
                    f'recsys_requests_total{{path="{path}",code="{code}"}} {n}'
                )
            lines.append("# TYPE recsys_request_latency_seconds histogram")
            for path, h in sorted(self._hist.items()):
                cum = 0
                for i, le in enumerate(self.BUCKETS_S):
                    cum += h[i]
                    le_s = "+Inf" if le == float("inf") else f"{le:g}"
                    lines.append(
                        "recsys_request_latency_seconds_bucket"
                        f'{{path="{path}",le="{le_s}"}} {cum}'
                    )
                lines.append(
                    f'recsys_request_latency_seconds_count{{path="{path}"}} {cum}'
                )
                lines.append(
                    "recsys_request_latency_seconds_sum"
                    f'{{path="{path}"}} {self._hist_sum[path]:.6f}'
                )
        if batcher is not None:
            st = batcher.stats()
            lines += [
                "# TYPE recsys_microbatch_batches_total counter",
                f"recsys_microbatch_batches_total {st['n_batches']}",
                "# TYPE recsys_microbatch_requests_total counter",
                f"recsys_microbatch_requests_total {st['n_requests']}",
                "# TYPE recsys_microbatch_max_batch gauge",
                f"recsys_microbatch_max_batch {st['max_batch_seen']}",
            ]
        return "\n".join(lines) + "\n"


class Api:
    """Transport-independent endpoint implementations.

    ``batcher``: optional started :class:`~recsys_tpu.serve.batcher.
    MicroBatcher`; when set, ``/recommend`` routes through it so
    concurrent requests share one batched scoring call."""

    def __init__(self, service: Optional[RecommendationService],
                 batcher=None, service_factory=None):
        self.service = service
        self.batcher = batcher
        self.telemetry = Telemetry()
        # hot reload (POST /admin/reload): ``service_factory() -> loaded
        # service`` builds a FRESH service from the (possibly retrained)
        # bundle; the swap is atomic from the request threads' view.
        # Off unless a factory is supplied (scripts/serve.py
        # --allow_reload); the endpoint is unauthenticated — expose it
        # only on trusted networks.
        self.service_factory = service_factory
        self._reload_lock = threading.Lock()
        self.reload_count = 0
        # single-flight compute: the host service is GIL-bound NumPy at
        # sub-millisecond per call, so letting N handler threads score
        # concurrently just convoys the GIL (measured on this 2-core
        # host: 16 concurrent handlers drive unbatched /recommend from
        # ~1,700 QPS (1 client) down to ~50 QPS, p95 > 1 s). Serializing
        # the compute parks waiting handlers in the kernel instead;
        # requests still parse/respond concurrently. The micro-batcher
        # supersedes this lock when configured (it has its own single
        # dispatcher).
        self._compute_lock = threading.Lock()

    def admin_reload(self) -> Tuple[int, Dict]:
        if self.service_factory is None:
            return 404, {"detail": "not found"}
        with self._reload_lock:  # one reload at a time
            old_version = (self.service.get_model_info().get("bundle_mtime")
                           if self.service and self.service.is_ready()
                           else None)
            try:
                new_service = self.service_factory()
            except Exception as e:
                logger.exception("hot reload failed; old bundle stays live")
                return 500, {"detail": f"reload failed: {e}"}
            new_batcher = None
            if self.batcher is not None:
                from recsys_tpu.serve.batcher import MicroBatcher

                new_batcher = MicroBatcher(
                    new_service,
                    max_batch=self.batcher.max_batch,
                    max_wait_ms=self.batcher.max_wait_s * 1000.0,
                    timeout_s=self.batcher.timeout_s,
                ).start()
            old_batcher = self.batcher
            # attribute stores are atomic: in-flight requests finish on
            # the old service/batcher objects they already read
            self.service = new_service
            self.batcher = new_batcher
            self.reload_count += 1
            if old_batcher is not None:
                old_batcher.stop()  # drains; stragglers get an error
            info = new_service.get_model_info()
            return 200, {
                "reloaded": True,
                "reload_count": self.reload_count,
                "previous_bundle_mtime": old_version,
                "model_info": info,
            }

    # each handler returns (status_code, payload_dict)
    def root(self) -> Tuple[int, Dict]:
        return 200, {
            "service": "recsys_tpu recommendation API",
            "version": "1.0.0",
            "endpoints": [
                "/health", "/model/info", "/metrics", "/recommend",
                "/recommend/batch", "/score",
            ],
        }

    def health(self) -> Tuple[int, Dict]:
        ready = bool(self.service and self.service.is_ready())
        return 200, {
            "status": "healthy" if ready else "degraded",
            "model_loaded": ready,
            "model_version": self.service.model_version if ready else None,
        }

    def model_info(self) -> Tuple[int, Dict]:
        if not (self.service and self.service.is_ready()):
            return 503, {"detail": "Model not loaded"}
        return 200, self.service.get_model_info()

    def recommend(self, body: Dict) -> Tuple[int, Dict]:
        if not (self.service and self.service.is_ready()):
            return 503, {"detail": "Model not loaded"}
        _require(isinstance(body.get("user_id"), int), "user_id must be int")
        k = body.get("k", 10)
        _require(isinstance(k, int) and 1 <= k <= MAX_K,
                 f"k must be int in [1, {MAX_K}]")
        if self.batcher is not None:
            recs = self.batcher.recommend(body["user_id"], k)
        else:
            with self._compute_lock:
                recs = self.service.recommend(body["user_id"], k)
        return 200, {
            "user_id": body["user_id"],
            "recommendations": recs,
            "count": len(recs),
            "model_version": self.service.model_version,
        }

    def recommend_batch(self, body: Dict) -> Tuple[int, Dict]:
        if not (self.service and self.service.is_ready()):
            return 503, {"detail": "Model not loaded"}
        users = body.get("user_ids")
        _require(
            isinstance(users, list) and 1 <= len(users) <= MAX_BATCH_USERS
            and all(isinstance(u, int) for u in users),
            f"user_ids must be a list of 1..{MAX_BATCH_USERS} ints",
        )
        k = body.get("k", 10)
        _require(isinstance(k, int) and 1 <= k <= MAX_K,
                 f"k must be int in [1, {MAX_K}]")
        with self._compute_lock:
            results = self.service.recommend_batch(users, k)
        return 200, {
            "results": results,
            "count": len(results),
            "model_version": self.service.model_version,
        }

    def score(self, body: Dict) -> Tuple[int, Dict]:
        if not (self.service and self.service.is_ready()):
            return 503, {"detail": "Model not loaded"}
        _require(isinstance(body.get("user_id"), int), "user_id must be int")
        items = body.get("item_ids")
        _require(
            isinstance(items, list) and 1 <= len(items) <= MAX_SCORE_ITEMS
            and all(isinstance(i, int) for i in items),
            f"item_ids must be a list of 1..{MAX_SCORE_ITEMS} ints",
        )
        try:
            with self._compute_lock:
                scores = self.service.score(body["user_id"], items)
        except ValueError as e:  # unknown user/item -> 404 (app/main.py:167-171)
            return 404, {"detail": str(e)}
        return 200, {
            "user_id": body["user_id"],
            "scores": scores,
            "model_version": self.service.model_version,
        }

    def dispatch(self, method: str, path: str, body: Optional[Dict]) -> Tuple[int, Dict]:
        try:
            if method == "GET":
                if path == "/":
                    return self.root()
                if path == "/health":
                    return self.health()
                if path == "/model/info":
                    return self.model_info()
            elif method == "POST":
                if path == "/admin/reload":  # body-less admin action
                    return self.admin_reload()
                if body is None:
                    return 422, {"detail": "invalid or missing JSON body"}
                if path == "/recommend":
                    return self.recommend(body)
                if path == "/recommend/batch":
                    return self.recommend_batch(body)
                if path == "/score":
                    return self.score(body)
            return 404, {"detail": "not found"}
        except ValidationError as e:
            return 422, {"detail": str(e)}
        except Exception as e:  # 500 contract (app/main.py:169-171)
            logger.exception("internal error on %s %s", method, path)
            return 500, {"detail": f"internal error: {e}"}


def make_http_server(
    service: Optional[RecommendationService],
    host: str = "0.0.0.0",
    port: int = 8000,
    reuse_port: bool = False,
    batcher=None,
    service_factory=None,
) -> ThreadingHTTPServer:
    api = Api(service, batcher=batcher, service_factory=service_factory)

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # keep-alive (we always send Content-Length)
        disable_nagle_algorithm = True  # small JSON responses: latency > batching
        # socket-level read timeout (socketserver applies it in
        # setup()): a client that trickles bytes or never sends its
        # declared body gets its connection dropped instead of pinning
        # a handler thread forever — same bar as the asyncio frontend's
        # wait_for windows (serve/aio.py). http.server itself caps
        # header count (100) and line length (64 KiB).
        timeout = READ_TIMEOUT_S

        def _respond(self, code: int, payload: Dict) -> None:
            data = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.send_header("Access-Control-Allow-Origin", "*")  # CORS parity
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/metrics":
                data = api.telemetry.render(batcher=api.batcher).encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(data)))
                self.send_header("Access-Control-Allow-Origin", "*")
                self.end_headers()
                self.wfile.write(data)
                return
            t0 = time.perf_counter()
            code, payload = api.dispatch("GET", self.path, None)
            api.telemetry.observe(self.path, code,
                                  time.perf_counter() - t0)
            self._respond(code, payload)

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                length = -1
            if length < 0:
                self._respond(422, {"detail": "malformed Content-Length"})
                self.close_connection = True
                return
            if length > MAX_BODY_BYTES:
                # oversized declared body: reject WITHOUT buffering it
                # (shared cap with the asyncio frontend)
                self._respond(413, {"detail": "body too large"})
                self.close_connection = True
                return
            try:
                raw = self.rfile.read(length) if length else b""
            except (TimeoutError, OSError):
                self.close_connection = True
                return
            if len(raw) < length:
                # client closed mid-body (or lied about the length and
                # the read timed out at the socket layer)
                self.close_connection = True
                return
            try:
                body = json.loads(raw) if raw else None
            except json.JSONDecodeError:
                body = None
            t0 = time.perf_counter()
            code, payload = api.dispatch("POST", self.path, body)
            api.telemetry.observe(self.path, code,
                                  time.perf_counter() - t0)
            self._respond(code, payload)

        def log_message(self, fmt, *args):  # route to logging, not stderr
            logger.debug("%s - %s", self.address_string(), fmt % args)

    class Server(ThreadingHTTPServer):
        # socketserver's default listen backlog is 5 — a burst of
        # concurrent keep-alive clients connecting at once overflows it
        # and gets connection resets
        request_queue_size = 128

        def server_bind(self):
            if reuse_port:
                import socket as _socket

                self.socket.setsockopt(
                    _socket.SOL_SOCKET, _socket.SO_REUSEPORT, 1
                )
            super().server_bind()

    return Server((host, port), Handler)


def _serve_one(model_dir: str, host: str, port: int, reuse_port: bool,
               stub: bool = False, rerank_candidates: int = 0,
               microbatch: int = 0, microbatch_wait_ms: float = 0.0,
               backend: str = "auto", int8_catalog: bool = False,
               allow_reload: bool = False, server: str = "threaded",
               rerank_ctr_weight: float = 0.25,
               rerank_rating_weight: float = 0.0) -> None:
    service: Optional[RecommendationService] = None

    def make_service():
        return RecommendationService(
            model_dir, backend=backend,
            rerank_candidates=rerank_candidates,
            rerank_ctr_weight=rerank_ctr_weight,
            rerank_rating_weight=rerank_rating_weight,
            int8_catalog=int8_catalog,
        ).load()

    if stub:
        from recsys_tpu.serve.service import StubRecommendationService

        service = StubRecommendationService()
    else:
        try:
            service = make_service()
        except Exception:
            logger.exception(
                "model load failed; serving in degraded mode (503s)"
            )
    service_factory = make_service if (allow_reload and not stub) else None
    if server == "asyncio":
        from recsys_tpu.serve.aio import AioHttpServer

        srv = AioHttpServer(
            service, host, port, reuse_port=reuse_port,
            max_batch=microbatch or 256,
            max_wait_ms=microbatch_wait_ms,
            service_factory=service_factory,
        )
        logger.info("serving (asyncio) on %s:%d (model_dir=%s)",
                    host, port, model_dir)
        srv.serve_forever()
        return
    batcher = None
    if microbatch > 0 and service is not None:
        from recsys_tpu.serve.batcher import MicroBatcher

        batcher = MicroBatcher(service, max_batch=microbatch,
                               max_wait_ms=microbatch_wait_ms).start()
    http_server = make_http_server(service, host, port,
                                   reuse_port=reuse_port, batcher=batcher,
                                   service_factory=service_factory)
    logger.info("serving on %s:%d (model_dir=%s, microbatch=%d)",
                host, port, model_dir, microbatch)
    http_server.serve_forever()


def serve_forever(
    model_dir: str,
    host: str = "0.0.0.0",
    port: int = 8000,
    workers: int = 1,
    stub: bool = False,
    rerank_candidates: int = 0,
    microbatch: int = 0,
    microbatch_wait_ms: float = 0.0,
    backend: str = "auto",
    int8_catalog: bool = False,
    allow_reload: bool = False,
    server: str = "threaded",
    rerank_ctr_weight: float = 0.25,
    rerank_rating_weight: float = 0.0,
) -> None:
    """Load the inference bundle and serve (uvicorn-replacement entry).
    Startup-failure contract parity (``app/main.py:105-119``): if the
    model fails to load, the server still starts and answers 503s.

    ``workers > 1`` forks that many processes, each with its own
    model copy and an ``SO_REUSEPORT`` listener on the same port — the
    kernel load-balances connections, sidestepping the GIL. Use with
    the host-side (``native``/NumPy) scoring backend; processes must
    not share one accelerator. Each worker loads AFTER the fork so no
    JAX/device state crosses the fork boundary."""
    if workers <= 1:
        _serve_one(model_dir, host, port, reuse_port=False, stub=stub,
                   rerank_candidates=rerank_candidates,
                   microbatch=microbatch,
                   microbatch_wait_ms=microbatch_wait_ms, backend=backend,
                   int8_catalog=int8_catalog, allow_reload=allow_reload,
                   server=server, rerank_ctr_weight=rerank_ctr_weight,
                   rerank_rating_weight=rerank_rating_weight)
        return
    import os as _os
    import signal as _signal

    pids = []
    for _ in range(workers):
        pid = _os.fork()
        if pid == 0:
            _serve_one(model_dir, host, port, reuse_port=True, stub=stub,
                       rerank_candidates=rerank_candidates,
                       microbatch=microbatch,
                       microbatch_wait_ms=microbatch_wait_ms,
                       backend=backend, int8_catalog=int8_catalog,
                       allow_reload=allow_reload, server=server,
                       rerank_ctr_weight=rerank_ctr_weight,
                       rerank_rating_weight=rerank_rating_weight)
            _os._exit(0)
        pids.append(pid)
    logger.info("forked %d serving workers on %s:%d", workers, host, port)

    def _reap(signum, frame):
        for p in pids:
            try:
                _os.kill(p, _signal.SIGTERM)
            except ProcessLookupError:
                pass
        raise SystemExit(0)

    _signal.signal(_signal.SIGTERM, _reap)
    _signal.signal(_signal.SIGINT, _reap)
    for p in pids:
        _os.waitpid(p, 0)


def make_fastapi_app(service: RecommendationService):
    """Optional FastAPI adapter (same contract) for environments that
    have fastapi installed; the core server above has no dependencies."""
    try:
        from fastapi import FastAPI, Request
        from fastapi.responses import JSONResponse
    except ImportError as e:  # pragma: no cover
        raise ImportError("fastapi is not installed in this environment") from e

    api = Api(service)
    app = FastAPI(title="recsys_tpu recommendation API")

    @app.get("/")
    async def root():
        return api.root()[1]

    @app.get("/health")
    async def health():
        return api.health()[1]

    @app.get("/model/info")
    async def model_info():
        code, payload = api.model_info()
        return JSONResponse(payload, status_code=code)

    @app.post("/recommend")
    async def recommend(request: Request):
        code, payload = api.dispatch("POST", "/recommend", await request.json())
        return JSONResponse(payload, status_code=code)

    @app.post("/recommend/batch")
    async def recommend_batch(request: Request):
        code, payload = api.dispatch("POST", "/recommend/batch", await request.json())
        return JSONResponse(payload, status_code=code)

    @app.post("/score")
    async def score(request: Request):
        code, payload = api.dispatch("POST", "/score", await request.json())
        return JSONResponse(payload, status_code=code)

    return app
