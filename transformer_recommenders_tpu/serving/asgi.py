"""Minimal JSON-over-HTTP ASGI framework + in-process test client.

The reference serves through BentoML (``xfmr_rec/service.py``) and
smoke-tests by converting the service to ASGI and driving it with
starlette's TestClient in-process (``xfmr_rec/deploy.py:23-36``).  Neither
BentoML nor starlette exists in this environment, so this module provides
the minimal equivalent with zero dependencies:

- :class:`JSONApp`: an ASGI application mapping ``POST /<name>`` to async
  handlers taking/returning JSON;
- :class:`TestClient`: drives any ASGI app in-process (own event loop),
  starlette-TestClient style;
- :func:`serve`: a tiny threaded HTTP server for real serving without
  uvicorn (stdlib ``http.server`` bridging into the ASGI app).
"""

from __future__ import annotations

import asyncio
import contextlib
import contextvars
import json
import os
import socket
import time
from typing import Any, Awaitable, Callable

Handler = Callable[[dict], Awaitable[Any]]


class NotFound(Exception):
    """404 error for missing resources (parity: bentoml.exceptions.NotFound)."""


# -- request-level tracing (ROADMAP serving item, round 3) --------------------
#
# Each dispatched request gets a Trace in a contextvar; service code wraps
# its stages in ``trace_span`` (a no-op when no request is active, so the
# same code paths run un-traced in scripts/tests).  Spans surface two ways:
# per-request on the standard ``Server-Timing`` response header
# (``span;dur=<ms>``), and aggregated at /metrics as
# ``xrt_span_seconds_total{span=...}``.


class Trace:
    __slots__ = ("spans", "metrics", "header_spans")

    def __init__(self) -> None:
        self.spans: list[tuple[str, float]] = []
        # count-valued annotations (e.g. batch_size) — rendered on the
        # header like spans (Server-Timing allows arbitrary metrics) but
        # aggregated separately so they never pollute the seconds counter
        self.metrics: list[tuple[str, float]] = []
        # header-only spans: shown per-request but NEVER aggregated into
        # /metrics — for quantities shared across requests (a micro-batch's
        # full encoder forward) that would overcount the aggregate if every
        # waiter added them
        self.header_spans: list[tuple[str, float]] = []

    def add(self, name: str, seconds: float) -> None:
        self.spans.append((name, seconds))

    def add_metric(self, name: str, value: float) -> None:
        self.metrics.append((name, value))

    def add_header_only(self, name: str, seconds: float) -> None:
        self.header_spans.append((name, seconds))

    def header(self) -> str:
        parts = [f"{n};dur={s * 1e3:.2f}" for n, s in self.spans]
        parts += [f"{n};dur={s * 1e3:.2f}" for n, s in self.header_spans]
        parts += [f"{n};dur={v:.2f}" for n, v in self.metrics]
        return ", ".join(parts)


CURRENT_TRACE: contextvars.ContextVar[Trace | None] = contextvars.ContextVar(
    "xrt_trace", default=None
)


@contextlib.contextmanager
def trace_span(name: str):
    """Record wall time of the enclosed block (awaits included) on the
    active request trace; free when no trace is active."""
    tr = CURRENT_TRACE.get()
    if tr is None:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        tr.add(name, time.perf_counter() - t0)


class JSONApp:
    def __init__(self) -> None:
        self.routes: dict[str, Handler] = {}
        # request counters surfaced at /metrics (Prometheus text format;
        # parity: BentoML exposes Prometheus metrics by default,
        # SURVEY.md §5.5)
        self.request_counts: dict[tuple[str, int], int] = {}
        self.request_seconds: dict[str, float] = {}
        # aggregated per-span totals from request-level tracing; non-time
        # span metrics (e.g. batch_size counts) aggregate separately so the
        # seconds counter stays dimensionally honest
        self.span_seconds: dict[str, float] = {}
        self.span_metrics: dict[str, float] = {}
        # serve() runs requests on ThreadingTCPServer threads — the
        # read-modify-write counter updates need a lock or concurrent
        # requests lose increments
        import threading

        self._counter_lock = threading.Lock()

    def route(self, name: str) -> Callable[[Handler], Handler]:
        def register(fn: Handler) -> Handler:
            self.routes[name.strip("/")] = fn
            return fn

        return register

    async def __call__(self, scope: dict, receive, send) -> None:
        if scope["type"] != "http":
            msg = f"unsupported scope type: {scope['type']}"
            raise RuntimeError(msg)
        path = scope["path"].strip("/")

        body = b""
        while True:
            event = await receive()
            body += event.get("body", b"")
            if not event.get("more_body"):
                break

        status, payload, timing = await self._dispatch(path, body)
        data = json.dumps(payload).encode()
        headers = [
            (b"content-type", b"application/json"),
            (b"content-length", str(len(data)).encode()),
        ]
        if timing:
            headers.append((b"server-timing", timing.encode()))
        await send(
            {
                "type": "http.response.start",
                "status": status,
                "headers": headers,
            }
        )
        await send({"type": "http.response.body", "body": data})

    async def _dispatch(self, path: str, body: bytes) -> tuple[int, Any, str]:
        t0 = time.perf_counter()
        trace = Trace()
        token = CURRENT_TRACE.set(trace)
        try:
            status, payload = await self._dispatch_inner(path, body)
        finally:
            CURRENT_TRACE.reset(token)
        # counters key on REGISTERED routes only: arbitrary client paths
        # all bucket under "unknown" (an unbounded label set would grow
        # memory forever on a 0.0.0.0-bound server and lets clients inject
        # exposition-format metacharacters)
        label = path if (path in self.routes or path == "metrics") else "unknown"
        with self._counter_lock:
            for name, secs in trace.spans:
                self.span_seconds[name] = self.span_seconds.get(name, 0.0) + secs
            for name, val in trace.metrics:
                self.span_metrics[name] = self.span_metrics.get(name, 0.0) + val
            self.request_counts[(label, status)] = (
                self.request_counts.get((label, status), 0) + 1
            )
            self.request_seconds[label] = self.request_seconds.get(
                label, 0.0
            ) + (time.perf_counter() - t0)
        return status, payload, trace.header()

    @staticmethod
    def _escape_label(value: str) -> str:
        """Prometheus text-format label escaping: backslash, quote, newline."""
        return value.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")

    def metrics_text(self) -> str:
        """Prometheus text exposition of the request counters."""
        # snapshot under the lock: concurrent request threads mutate these
        # dicts, and iterating live dicts can raise "dictionary changed size
        # during iteration" on a first-seen label
        with self._counter_lock:
            request_counts = dict(self.request_counts)
            request_seconds = dict(self.request_seconds)
            span_seconds = dict(self.span_seconds)
            span_metrics = dict(self.span_metrics)
        lines = [
            "# TYPE xrt_requests_total counter",
        ]
        for (path, status), n in sorted(request_counts.items()):
            route = self._escape_label(path)
            lines.append(
                f'xrt_requests_total{{route="{route}",status="{status}"}} {n}'
            )
        lines.append("# TYPE xrt_request_seconds_total counter")
        for path, secs in sorted(request_seconds.items()):
            route = self._escape_label(path)
            lines.append(f'xrt_request_seconds_total{{route="{route}"}} {secs:.6f}')
        lines.append("# TYPE xrt_span_seconds_total counter")
        for name, secs in sorted(span_seconds.items()):
            span = self._escape_label(name)
            lines.append(f'xrt_span_seconds_total{{span="{span}"}} {secs:.6f}')
        lines.append("# TYPE xrt_span_metric_total counter")
        for name, val in sorted(span_metrics.items()):
            span = self._escape_label(name)
            lines.append(f'xrt_span_metric_total{{metric="{span}"}} {val:.6f}')
        return "\n".join(lines) + "\n"

    async def _dispatch_inner(self, path: str, body: bytes) -> tuple[int, Any]:
        if path == "metrics":
            return 200, self.metrics_text()
        handler = self.routes.get(path)
        if handler is None:
            return 404, {"error": f"no such route: /{path}"}
        try:
            payload = json.loads(body) if body else {}
        except json.JSONDecodeError as exc:
            return 400, {"error": f"invalid JSON body: {exc}"}
        if not isinstance(payload, dict):
            return 400, {"error": "request body must be a JSON object"}
        try:
            result = await handler(payload)
        except NotFound as exc:
            return 404, {"error": str(exc)}
        except KeyError as exc:
            return 400, {"error": f"missing required field: {exc}"}
        except (TypeError, ValueError) as exc:
            return 400, {"error": str(exc)}
        return 200, result


class Response:
    def __init__(self, status_code: int, payload: Any,
                 headers: dict[str, str] | None = None) -> None:
        self.status_code = status_code
        self._payload = payload
        self.headers = headers or {}

    def json(self) -> Any:
        return self._payload

    @property
    def ok(self) -> bool:
        return 200 <= self.status_code < 300


class TestClient:
    """In-process ASGI driver (parity: starlette TestClient usage in
    ``xfmr_rec/deploy.py:23-36``)."""

    def __init__(self, app: JSONApp) -> None:
        self.app = app

    def post(self, path: str, json_body: Any = None) -> Response:
        return asyncio.run(self._request("POST", path, json_body))

    async def _request(self, method: str, path: str, json_body: Any) -> Response:
        body = json.dumps(json_body or {}).encode()
        scope = {"type": "http", "method": method, "path": path}
        received = False

        async def receive():
            nonlocal received
            if received:
                return {"type": "http.disconnect"}
            received = True
            return {"type": "http.request", "body": body, "more_body": False}

        messages: list[dict] = []

        async def send(message):
            messages.append(message)

        await self.app(scope, receive, send)
        start = next(m for m in messages if m["type"] == "http.response.start")
        data = b"".join(
            m.get("body", b"") for m in messages if m["type"] == "http.response.body"
        )
        headers = {k.decode(): v.decode() for k, v in start.get("headers", [])}
        return Response(
            start["status"], json.loads(data) if data else None, headers
        )


def serve(
    app: JSONApp,
    host: str = "0.0.0.0",
    port: int = 3000,
    *,
    workers: int = 1,
    reuse_port: bool = False,
) -> None:
    """Blocking HTTP server bridging into the ASGI app (ONE process).

    Multi-worker serving goes through :func:`serve_workers` — passing
    ``workers > 1`` here raises.  Two reasons, both measured:

    - TPU SAFETY: a TPU chip can be opened by exactly ONE process; the app
      has already initialized JAX, so any worker fan-out from this process
      would share the device — undefined behavior.
    - FORK SAFETY: even on a CPU backend, ``os.fork()`` after JAX
      initialization deadlocks the child on inherited thread state (the
      round-2 fork design hung on its first forked request —
      scripts/bench_serving_workers.py history).  Workers must be SPAWNED
      fresh and load the artifact themselves, which needs the artifact
      path, not a live app object.

    ``reuse_port`` sets SO_REUSEPORT before bind so several independently
    spawned server processes can share the port (kernel load-balancing);
    :func:`serve_workers` and the worker entrypoint use it.
    """
    import http.server
    import socket
    import socketserver

    if workers > 1:
        import jax

        backend = jax.default_backend()
        if backend != "cpu":
            msg = (
                f"workers={workers} needs worker processes, but the JAX "
                f"backend is {backend!r} and an accelerator cannot be shared "
                "across processes. Run with workers=1 (device-owning "
                "process), or serve CPU workers via serve_workers()."
            )
            raise RuntimeError(msg)
        msg = (
            f"serve(workers={workers}) cannot fork an already-initialized "
            "app: JAX's threads deadlock in forked children. Use "
            "serve_workers(artifact_dir, ...) which spawns fresh worker "
            "processes that each load the artifact."
        )
        raise RuntimeError(msg)

    class Bridge(http.server.BaseHTTPRequestHandler):
        def _respond(self) -> None:
            length = int(self.headers.get("content-length", 0))
            body = self.rfile.read(length)
            status, payload, timing = asyncio.run(
                app._dispatch(self.path.strip("/"), body)
            )
            if isinstance(payload, str) and self.path.strip("/") == "metrics":
                data = payload.encode()
                ctype = b"text/plain; version=0.0.4"
            else:
                data = json.dumps(payload).encode()
                ctype = b"application/json"
            self.send_response(status)
            self.send_header("content-type", ctype.decode())
            self.send_header("content-length", str(len(data)))
            if timing:
                self.send_header("server-timing", timing)
            # which SO_REUSEPORT worker served this request — lets load
            # tests attribute per-worker queueing (round-3 verdict #4)
            self.send_header("x-worker-pid", str(os.getpid()))
            self.end_headers()
            self.wfile.write(data)

        def do_POST(self) -> None:  # noqa: N802
            self._respond()

        def do_GET(self) -> None:  # noqa: N802
            self._respond()

        def log_message(self, *args) -> None:  # quiet
            pass

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True

        def server_bind(self) -> None:
            if reuse_port and hasattr(socket, "SO_REUSEPORT"):
                self.socket.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEPORT, 1)
            super().server_bind()

    with Server((host, port), Bridge) as server:
        server.serve_forever()


def serve_workers(
    artifact_dir: str,
    host: str = "0.0.0.0",
    port: int = 3000,
    *,
    workers: int = 2,
    pin_cpus: bool = False,
) -> None:
    """Multi-worker serving: SPAWN ``workers`` fresh processes, each loading
    the Service artifact on the CPU JAX backend and binding the same port
    with SO_REUSEPORT (kernel load-balancing) — the stdlib equivalent of the
    reference's BentoML ``workers="cpu_count"``
    (``xfmr_rec/service.py:206``).

    Spawning (not forking) is load-bearing: forked children inherit JAX's
    thread state and deadlock (see :func:`serve`); each spawned worker
    initializes its own CPU backend, so no accelerator is ever shared.
    Blocks until interrupted; workers are terminated on exit.

    ``pin_cpus`` assigns each worker a disjoint core set
    (``sched_setaffinity`` in the worker): XLA's CPU client sizes its
    intra-op thread pool to the VISIBLE core count, so N unpinned workers
    oversubscribe the host N-fold and the encode tail blows up under load
    (measured round 4: 4 unpinned workers on 4 cores -> encode_batch p95
    61 -> 434 ms; SERVING_WORKERS.json).
    """
    import signal
    import subprocess
    import sys

    if not hasattr(socket, "SO_REUSEPORT"):  # pragma: no cover - non-Linux
        msg = "serve_workers needs SO_REUSEPORT (Linux)"
        raise RuntimeError(msg)

    def _worker_env(i: int) -> dict[str, str]:
        env = {**os.environ, "JAX_PLATFORMS": "cpu"}
        if pin_cpus:
            ncpu = os.cpu_count() or 1
            per = max(1, ncpu // workers)
            cores = [(i * per + j) % ncpu for j in range(per)]
            env["XRT_WORKER_CPUS"] = ",".join(str(c) for c in cores)
        return env

    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-m",
                "transformer_recommenders_tpu.serving.worker",
                str(artifact_dir),
                host,
                str(port),
            ],
            env=_worker_env(i),
        )
        for i in range(workers)
    ]
    import time as _time

    try:
        # monitor the pool: a worker dying with a nonzero code (artifact
        # unreadable, OOM, port error) must surface as an error, not a
        # silently degraded — or with 0 workers, silently DOWN — pool
        while True:
            codes = [p.poll() for p in procs]
            bad = [c for c in codes if c not in (None, 0, -signal.SIGTERM)]
            if bad:
                msg = f"serving worker exited with code {bad[0]}"
                raise RuntimeError(msg)
            if all(c is not None for c in codes):
                return  # every worker exited cleanly
            _time.sleep(0.5)
    finally:
        for p in procs:
            if p.poll() is None:
                p.send_signal(signal.SIGTERM)
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:  # pragma: no cover
                p.kill()
