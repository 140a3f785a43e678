"""Row-sharded embedding-table lookup (the recsys TP/EP analogue).

The item/user tables are the only tensors that grow with catalog size
(ML-25M: 60k+ items x 384 -> fine; production catalogs: 10^7+ rows), so
they shard by ROW over the ``model`` mesh axis (north star in
BASELINE.json).  A naive ``jnp.take`` on a row-sharded array would make
GSPMD all-gather the whole table; instead each shard gathers the rows it
owns and a single ``psum`` over the model axis combines the (much smaller)
(B, S, D) result — the collective rides ICI.

``shard_map`` keeps the collective explicit and the memory bound:
per-chip traffic is O(B*S*D), independent of table size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from transformer_recommenders_tpu.params import MODEL_AXIS

try:  # jax >= 0.5 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def pad_rows_for_mesh(table: np.ndarray | jax.Array, num_shards: int) -> jax.Array:
    """Zero-pad the row count to a multiple of the model-axis size."""
    n = table.shape[0]
    pad = (-n) % num_shards
    if pad:
        table = jnp.concatenate(
            [jnp.asarray(table), jnp.zeros((pad, table.shape[1]), table.dtype)]
        )
    return jnp.asarray(table)


def place_table(table: np.ndarray | jax.Array, mesh: Mesh) -> jax.Array:
    """Pad + device_put a table row-sharded over the model axis."""
    table = pad_rows_for_mesh(table, mesh.shape[MODEL_AXIS])
    return jax.device_put(table, NamedSharding(mesh, P(MODEL_AXIS, None)))


def _local_lookup(table_shard: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather rows this shard owns; zeros elsewhere; psum combines."""
    rows = table_shard.shape[0]
    shard_id = jax.lax.axis_index(MODEL_AXIS)
    local_idx = idx - shard_id * rows
    in_range = (local_idx >= 0) & (local_idx < rows)
    safe = jnp.clip(local_idx, 0, rows - 1)
    vals = jnp.take(table_shard, safe, axis=0)
    vals = jnp.where(in_range[..., None], vals, 0)
    return jax.lax.psum(vals, MODEL_AXIS)


def sharded_table_lookup(
    table: jax.Array,
    idx: jax.Array,
    mesh: Mesh,
    *,
    idx_spec: P = P(),
) -> jax.Array:
    """Lookup ``table[idx]`` with the table row-sharded over the model axis.

    Args:
        table: (N, D); N must be divisible by the model-axis size
            (use :func:`pad_rows_for_mesh` / :func:`place_table`).
        idx: integer array of any shape (replicated or sharded per
            ``idx_spec``); out-of-range indices return zeros (matching the
            zero padding row semantics).
        mesh: the (data, model) mesh.
        idx_spec: PartitionSpec of ``idx`` (e.g. ``P("data")`` for a
            batch-sharded index tensor).

    Returns:
        (*idx.shape, D) embeddings, sharded like ``idx`` (+ dense feature dim).
    """
    out_spec = P(*idx_spec, None)
    return shard_map(
        _local_lookup,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), idx_spec),
        out_specs=out_spec,
        check_vma=False,
    )(table, idx)
