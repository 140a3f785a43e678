"""Device-mesh runtime.

The reference has NO distributed code (SURVEY.md §2.3: Lightning
``strategy: auto`` is never exercised).  This module is the TPU-native
equivalent: ``jax.distributed`` initialization per host and a 2-D
``Mesh((data, model))``:

- ``data`` axis: DP over the batch; gradient psum rides DCN between hosts;
- ``model`` axis: row-sharded item/user embedding tables and column-sharded
  retrieval (the recsys analogue of TP/EP); its collectives ride ICI.

PP / CP / ring-attention / Ulysses are deliberate non-goals at seq_len
<= 128 and depth <= 6 (SURVEY.md §2.3, BASELINE.json).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from transformer_recommenders_tpu.configs import MeshConfig
from transformer_recommenders_tpu.params import DATA_AXIS, MODEL_AXIS


def maybe_initialize_distributed() -> None:
    """Multi-host bring-up: call ``jax.distributed.initialize`` when the
    standard coordinator env var is present (no-op on a single host).

    Decided from the environment ALONE — ``jax.process_count()`` /
    ``jax.devices()`` would themselves initialize the local-only backend,
    after which distributed init is too late.  Must therefore run at
    process start (the CLI entrypoints call it first), before any other
    JAX API touches the backend.
    """
    if not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return
    try:
        jax.distributed.initialize()
    except RuntimeError as exc:
        # tolerate ONLY idempotent re-entry; a coordinator-unreachable /
        # misconfigured init must fail loudly — swallowing it leaves every
        # host training on a silently local-only backend
        if "already" in str(exc).lower():
            return
        raise


def create_mesh(
    config: MeshConfig | None = None, devices: list | None = None
) -> Mesh:
    """Build the 2-D ``(data, model)`` mesh.

    ``data_axis_size=-1`` uses every device not consumed by the model axis.
    Device order follows ``jax.devices()`` so the model axis maps to
    adjacent devices (ICI neighbors on real slices).
    """
    config = config or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    model = max(config.model_axis_size, 1)
    if len(devices) % model != 0:
        msg = f"{len(devices)} devices not divisible by model_axis_size={model}"
        raise ValueError(msg)
    data = config.data_axis_size
    if data < 0:
        data = len(devices) // model
    if data * model > len(devices):
        msg = f"mesh {data}x{model} exceeds {len(devices)} devices"
        raise ValueError(msg)
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def table_sharding(mesh: Mesh) -> NamedSharding:
    """Row-shard an (N, D) embedding table over the model axis."""
    return NamedSharding(mesh, P(MODEL_AXIS, None))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, batch-dim sharded."""
    sharding = batch_sharding(mesh)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}
