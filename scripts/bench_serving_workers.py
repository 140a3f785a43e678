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


def _server_main(artifact: str, port: int, workers: int) -> None:
    from transformer_recommenders_tpu.serving.asgi import serve_workers

    serve_workers(artifact, host="127.0.0.1", port=port, workers=workers)


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


def _load(port: int, item_ids, user_ids, clients: int, requests: int):
    """Concurrent client load; returns (qps, p50_ms, p95_ms, errors)."""
    latencies: list[float] = []
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
            try:
                conn.request("POST", route, json.dumps(payload))
                resp = conn.getresponse()
                resp.read()
                ok = resp.status == 200
            except (OSError, http.client.HTTPException):
                ok = False
                conn.close()
                conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
            dt = time.perf_counter() - t0
            with lock:
                if ok:
                    latencies.append(dt)
                else:
                    errors[0] += 1

    t0 = time.time()
    threads = [threading.Thread(target=client, args=(w,)) for w in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    latencies.sort()
    n = len(latencies)
    return {
        "requests_ok": n,
        "errors": errors[0],
        "qps": round(n / wall, 1),
        "p50_ms": round(latencies[n // 2] * 1000, 2) if n else None,
        "p95_ms": round(latencies[int(n * 0.95)] * 1000, 2) if n else None,
    }


def _run_one(artifact: str, workers: int, clients: int, requests: int,
             item_ids, user_ids):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [sys.executable, __file__, "--server", artifact, str(port), str(workers)],
        start_new_session=True,  # own pgid: we kill exactly this tree
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
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
        _server_main(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
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
        for w in (1, n_workers):
            results[f"workers={w}"] = _run_one(
                str(artifact), w, args.clients, args.requests, item_ids, user_ids
            )
            print(f"workers={w}: {results[f'workers={w}']}", flush=True)
        speedup = (
            results[f"workers={n_workers}"]["qps"] / results["workers=1"]["qps"]
        )
        out = {
            "backend": "cpu",
            "clients": args.clients,
            "n_workers": n_workers,
            "speedup": round(speedup, 2),
            **results,
        }
        print(json.dumps(out, indent=2))
        pathlib.Path("SERVING_WORKERS.json").write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
