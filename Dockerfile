# Container image for transformer_recommenders_tpu.
# Parity: reference Dockerfile (uv-based debian-slim, non-root, healthcheck)
# adapted to the JAX/TPU stack: the TPU runtime libraries come from the host
# (gke tpu device plugin / libtpu); CPU wheels are installed for local smoke.
FROM python:3.12-slim AS base

ENV PYTHONUNBUFFERED=1 \
    PYTHONFAULTHANDLER=1 \
    PIP_NO_CACHE_DIR=1

RUN useradd --create-home --shell /bin/bash app
WORKDIR /home/app/xrt

COPY pyproject.toml ./
COPY transformer_recommenders_tpu ./transformer_recommenders_tpu
COPY __graft_entry__.py bench.py config.yaml ./

RUN pip install --no-cache-dir "jax[cpu]" && \
    pip install --no-cache-dir ".[data]"

USER app
EXPOSE 3000

# smoke-serve the fast-dev artifact; real deployments mount a trained
# artifact dir and pass --ckpt_path / --artifact_dir
HEALTHCHECK --interval=30s --timeout=10s --start-period=120s \
    CMD python -c "import http.client; c = http.client.HTTPConnection('localhost', 3000, timeout=5); c.request('POST', '/model_name', '{}'); exit(0 if c.getresponse().status == 200 else 1)"

ENTRYPOINT ["xrt-deploy"]
CMD ["--serve", "--port", "3000"]
