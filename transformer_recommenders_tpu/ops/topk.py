"""On-device MIPS retrieval: scoring + exclusion + top-k.

Replaces the reference's host-side ANN (LanceDB IVF_HNSW_PQ,
``xfmr_rec/index.py:184-255``) with exact brute-force maximum-inner-product
search on device: one (U, D) x (D, N) MXU matmul, exclusion masking via
out-of-range scatter, and ``jax.lax.top_k``.  Exact search beats ANN on TPU
for catalogs up to ~10^7 items (SURVEY.md §2.2) and removes the reference's
per-user host round-trip (``xfmr_rec/trainer.py:266-316``).

The sharded variant (column-sharded catalog + per-shard top-k + all-gather
merge) lives in ``parallel/topk_sharded.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# plain python float, NOT jnp.float32(...): a module-level jnp scalar
# dispatches convert_element_type at IMPORT time, initializing the XLA
# backend before jax.distributed.initialize can run (and hanging any
# import when the accelerator is unreachable)
_NEG_INF = float("-inf")


def normalize_rows(x) -> jax.Array:
    """L2-normalize catalog rows ONCE at index-build time: per-query
    re-normalization of an N x D catalog costs ~2 full passes of HBM
    traffic (0.25 ms at 62k x 384) that dominated single-query latency."""
    x = jnp.asarray(x, jnp.float32)
    return x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), min=1e-12)


def score_items(
    queries: jax.Array,
    item_embeddings: jax.Array,
    *,
    metric: str = "cosine",
    items_prenormalized: bool = False,
) -> jax.Array:
    """Scores of every catalog item for each query.

    Args:
        queries: (U, D) float.
        item_embeddings: (N, D) float — catalog WITHOUT the padding row.
        metric: "cosine" (reference LanceIndex default,
            ``xfmr_rec/index.py:35-47``; score = cosine similarity, matching
            the reference's 1 - cosine_distance) or "dot".
        items_prenormalized: the catalog rows are already unit-norm
            (``normalize_rows`` at index build) — skip the per-call
            normalization sweep.

    Returns:
        (U, N) float32 scores.
    """
    q = queries.astype(jnp.float32)
    t = item_embeddings.astype(jnp.float32)
    if metric == "cosine":
        q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), min=1e-12)
        if not items_prenormalized:
            t = normalize_rows(t)
    return jnp.dot(q, t.T, preferred_element_type=jnp.float32)


def mask_excluded(scores: jax.Array, exclude_idx: jax.Array) -> jax.Array:
    """Set scores of excluded items to -inf.

    Args:
        scores: (U, N) — column j scores item with item-idx j+1.
        exclude_idx: (U, H) int32 item indices (1-based; 0 = padding).
            Padding entries are routed to an out-of-range column and
            dropped by the scatter, so item 0 is never accidentally masked.
    """
    n = scores.shape[-1]
    cols = jnp.where(exclude_idx > 0, exclude_idx - 1, n)
    rows = jnp.arange(scores.shape[0])[:, None]
    return scores.at[rows, cols].set(_NEG_INF, mode="drop")


_TWO_STAGE_BLOCKS = 16


def use_two_stage(num_queries: int, num_items: int, k: int) -> bool:
    """The STATIC-shape routing gate for the blocked top-k.

    Measured crossover (round 4, value-gated windows, 62k x 384 catalog,
    k=100 on the real chip): batch 1 is the only winner — 0.780 ms blocked
    vs 0.908 ms direct (~14%); batch 2 already LOSES (1.22 vs 0.95 ms) and
    the gap widens with batch because the blocked form adds nb*k candidate
    work per row and only pays when a single row underfills the chip.  So
    the gate is exactly ``num_queries == 1``; batches 2..inf (including the
    2-31 mid-batches) must route to direct ``lax.top_k``.  The size floor
    keeps the merge stage (nb*k candidates) meaningfully smaller than the
    row itself — below it the split is pure overhead.
    """
    return num_queries == 1 and num_items >= _TWO_STAGE_BLOCKS * k * 4


def _two_stage_topk(scores: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact blocked top-k: per-block top-k then a merge top-k.

    At batch 1 ``lax.top_k`` over the full 62k-column row is the latency
    (~0.85 of 0.91 ms); 16 parallel 3.9k-column top-ks + a 1600-column
    merge measure 0.780 vs 0.908 ms (round 4, value-gated windows).  The
    result is EXACT: every global top-k element is a top-k element of its
    block (k candidates kept per block).  Loses at every batch >= 2
    (batch 2: 1.22 vs 0.95 ms — the blocked form adds work per row and
    only helps when a single row underfills the chip), so the caller
    gates on the STATIC batch size.
    """
    u, n = scores.shape
    nb = _TWO_STAGE_BLOCKS
    pad = (-n) % nb
    sp = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=_NEG_INF)
    blk = sp.reshape(u, nb, sp.shape[1] // nb)
    sc1, ix1 = jax.lax.top_k(blk, k)  # (u, nb, k)
    base = (jnp.arange(nb) * (sp.shape[1] // nb))[None, :, None]
    cand_ix = (ix1 + base).reshape(u, nb * k)
    top_scores, ix2 = jax.lax.top_k(sc1.reshape(u, nb * k), k)
    return top_scores, jnp.take_along_axis(cand_ix, ix2, axis=1)


def topk_items(
    queries: jax.Array,
    item_embeddings: jax.Array,
    k: int,
    *,
    exclude_idx: jax.Array | None = None,
    metric: str = "cosine",
    items_prenormalized: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k retrieval with exclusion.

    Returns (scores (U, k) f32, item_idx (U, k) int32 1-based).
    Parity: ``LanceIndex.search`` semantics (``xfmr_rec/index.py:214-255``)
    — prefilter excluded ids, return k best by cosine score.
    """
    scores = score_items(
        queries, item_embeddings, metric=metric,
        items_prenormalized=items_prenormalized,
    )
    if exclude_idx is not None:
        scores = mask_excluded(scores, exclude_idx)
    if use_two_stage(scores.shape[0], scores.shape[-1], k):
        # single-query serving latency: the blocked form wins ~14% there
        # and ONLY there (static-shape gate — see use_two_stage)
        top_scores, top_cols = _two_stage_topk(scores, k)
    else:
        top_scores, top_cols = jax.lax.top_k(scores, k)
    return top_scores, (top_cols + 1).astype(jnp.int32)
