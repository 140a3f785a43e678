"""End-to-end HTTP serving benchmark: concurrent clients against the real
socket server (micro-batched encoder + on-device retrieval).

Usage: python scripts/bench_serving.py [--clients 16] [--requests 200]
"""

import argparse
import http.client
import json
import pathlib
import socket
import sys
import tempfile
import threading
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--clients", type=int, default=16)
    parser.add_argument("--requests", type=int, default=200)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from transformer_recommenders_tpu.serving import deploy as deploy_mod
    from transformer_recommenders_tpu.serving.asgi import serve
    from transformer_recommenders_tpu.serving.service import Service

    with tempfile.TemporaryDirectory() as tmp:
        trainer = deploy_mod._fast_dev_trainer(tmp)
        trainer.save(pathlib.Path(tmp) / "artifact")
        service = Service(pathlib.Path(tmp) / "artifact")

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        threading.Thread(
            target=serve,
            args=(service.to_asgi(),),
            kwargs={"host": "127.0.0.1", "port": port},
            daemon=True,
        ).start()
        time.sleep(1.0)

        item_ids = service.item_index.index.store.records["item_id"].tolist()
        user_ids = service.user_index.index.store.records["user_id"].tolist()

        # warm every route/compiled shape
        # warm each exclusion-width bucket the user catalog produces
        warm = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        for uid in user_ids[:12]:
            warm.request("POST", "/recommend_with_user_id", json.dumps({"user_id": uid}))
            warm.getresponse().read()
        warm.request(
            "POST", "/recommend_with_item_id", json.dumps({"item_id": item_ids[0]})
        )
        warm.getresponse().read()

        latencies: list[float] = []
        errors = [0]
        lock = threading.Lock()

        def client(worker: int) -> None:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
            for i in range(args.requests // args.clients):
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
                    conn = http.client.HTTPConnection(
                        "127.0.0.1", port, timeout=120
                    )
                dt = time.perf_counter() - t0
                with lock:
                    if ok:
                        latencies.append(dt)
                    else:
                        errors[0] += 1

        t0 = time.time()
        threads = [
            threading.Thread(target=client, args=(w,)) for w in range(args.clients)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t0

        latencies.sort()
        n = len(latencies)
        result = {
            "clients": args.clients,
            "requests_ok": n,
            "errors": errors[0],
            "qps": round(n / wall, 1),
            "p50_ms": round(latencies[n // 2] * 1000, 2) if n else None,
            "p95_ms": round(latencies[int(n * 0.95)] * 1000, 2) if n else None,
        }
        print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
