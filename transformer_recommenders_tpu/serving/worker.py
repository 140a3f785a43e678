"""Single serving-worker entrypoint (spawned by ``asgi.serve_workers``).

Each worker is a FRESH process: it forces the CPU JAX backend (the axon/TPU
plugin re-asserts its platform from the environment, so the env var alone is
not enough), loads the Service artifact itself, and binds the shared port
with SO_REUSEPORT.  Parity: one BentoML worker of the reference's
``workers="cpu_count"`` pool (``xfmr_rec/service.py:206``).

Usage: python -m transformer_recommenders_tpu.serving.worker \\
           <artifact_dir> <host> <port>
"""

from __future__ import annotations

import pathlib
import sys


def main() -> None:
    artifact, host, port = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os

    cpus = os.environ.get("XRT_WORKER_CPUS")
    if cpus:
        # BEFORE jax import: XLA sizes its intra-op pool from the visible
        # core count, so the affinity must be set first (asgi.serve_workers
        # pin_cpus — prevents N workers x N-thread pools oversubscription)
        os.sched_setaffinity(0, {int(c) for c in cpus.split(",")})
    import jax

    jax.config.update("jax_platforms", "cpu")
    from transformer_recommenders_tpu.serving.asgi import serve
    from transformer_recommenders_tpu.serving.service import Service

    service = Service(pathlib.Path(artifact))
    serve(service.to_asgi(), host=host, port=port, reuse_port=True)


if __name__ == "__main__":
    main()
