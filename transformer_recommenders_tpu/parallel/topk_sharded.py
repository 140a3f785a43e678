"""Column-sharded MIPS retrieval: per-shard top-k + all-gather merge.

Replaces the reference's single-host ANN (``xfmr_rec/index.py:184-255``)
at scale: the item-embedding matrix is row-sharded (items) over the model
axis; every chip scores its slice of the catalog with one MXU matmul,
takes a LOCAL top-k, and only the (m, U, k) candidate lists — not the
(U, N) score matrix — cross ICI in an all-gather before a final merge.

Per-chip HBM traffic: O(N/m * D) reads + O(U*k) communication, the
speed-of-light shape for exact retrieval.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from transformer_recommenders_tpu.ops.topk import score_items
from transformer_recommenders_tpu.params import MODEL_AXIS

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

# plain python float, NOT jnp.float32(...): a module-level jnp scalar
# dispatches convert_element_type at IMPORT time, initializing the XLA
# backend before jax.distributed.initialize can run (and hanging any
# import when the accelerator is unreachable)
_NEG_INF = float("-inf")


def _local_topk(
    queries: jax.Array,
    item_shard: jax.Array,
    exclude_idx: jax.Array,
    *,
    k: int,
    metric: str,
    num_items: int,
    items_prenormalized: bool = False,
) -> tuple[jax.Array, jax.Array]:
    rows = item_shard.shape[0]
    shard_id = jax.lax.axis_index(MODEL_AXIS)
    lo = shard_id * rows

    scores = score_items(
        queries, item_shard, metric=metric,
        items_prenormalized=items_prenormalized,
    )  # (U, rows)
    # mask mesh-padding rows (global row >= num_items)
    col_global = lo + jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1)
    scores = jnp.where(col_global < num_items, scores, _NEG_INF)

    # exclusion with GLOBAL 1-based idx: local column = idx - 1 - lo
    cols = exclude_idx - 1 - lo
    cols = jnp.where((exclude_idx > 0) & (cols >= 0) & (cols < rows), cols, rows)
    r = jnp.arange(scores.shape[0])[:, None]
    scores = scores.at[r, cols].set(_NEG_INF, mode="drop")

    k_local = min(k, rows)
    s, c = jax.lax.top_k(scores, k_local)
    if k_local < k:  # pad so every shard contributes k candidates
        pad = k - k_local
        s = jnp.concatenate([s, jnp.full((s.shape[0], pad), _NEG_INF)], axis=1)
        c = jnp.concatenate([c, jnp.zeros((c.shape[0], pad), c.dtype)], axis=1)
    global_idx = (c + lo + 1).astype(jnp.int32)  # 1-based item idx

    # merge: gather every shard's candidates, re-top-k
    s_all = jax.lax.all_gather(s, MODEL_AXIS)  # (m, U, k)
    i_all = jax.lax.all_gather(global_idx, MODEL_AXIS)
    u = s.shape[0]
    s_cat = jnp.moveaxis(s_all, 0, 1).reshape(u, -1)
    i_cat = jnp.moveaxis(i_all, 0, 1).reshape(u, -1)
    top_s, pos = jax.lax.top_k(s_cat, k)
    top_i = jnp.take_along_axis(i_cat, pos, axis=1)
    return top_s, top_i


def sharded_topk(
    queries: jax.Array,
    item_embeddings: jax.Array,
    k: int,
    mesh: Mesh,
    *,
    exclude_idx: jax.Array | None = None,
    metric: str = "cosine",
    query_spec: P = P(),
    num_items: int | None = None,
    items_prenormalized: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over a row-sharded catalog.

    Args:
        queries: (U, D), replicated or sharded per ``query_spec``.
        item_embeddings: (N, D) WITHOUT the padding row, row-sharded over
            the model axis (N divisible by its size; zero-padded rows score
            0 under "dot" and are harmless for cosine only when real scores
            can exceed 0 — callers should mask or pad with -inf-safe rows).
        k: cutoff.
        mesh: (data, model) mesh.
        exclude_idx: (U, H) 1-based global item idx to exclude (0 = pad).

    Returns:
        (scores (U, k) f32, item_idx (U, k) int32 1-based), sharded like
        the queries.
    """
    if exclude_idx is None:
        exclude_idx = jnp.zeros((queries.shape[0], 1), jnp.int32)
    fn = functools.partial(
        _local_topk, k=k, metric=metric,
        num_items=num_items or item_embeddings.shape[0],
        items_prenormalized=items_prenormalized,
    )
    out_spec = P(*query_spec, None)
    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(query_spec, P(MODEL_AXIS, None), P(*query_spec, None)),
        out_specs=(out_spec, out_spec),
        check_vma=False,
    )(queries, item_embeddings, exclude_idx)
