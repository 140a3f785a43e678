"""Vectorized retrieval metrics (on-device, fixed shapes).

Parity: ``xfmr_rec/metrics.py`` — seven torchmetrics retrieval functionals
evaluated per user over a synthesized ranked list.  The reference protocol
(metrics.py:62-78) for ONE user is:

1. pad the ranked rec list to ``top_k`` with ``""`` (never relevant),
2. append targets missing from the recs at the END of the list,
3. score the list with ``linspace(1, 0)`` (strictly decreasing -> ranking is
   simply list order, no ties),
4. binary relevance = membership in the target set,
5. run each torchmetrics functional with ``top_k``.

Because the synthesized scores are strictly decreasing and appended targets
sit at ranks > top_k, every metric is an exact function of just
``rel``: the (top_k,) binary relevance of the rec list, and ``n_targets``:
the number of DISTINCT target ids.  This module computes those functions in
closed form for a whole batch of users at once — replacing the reference's
per-user host loop (``xfmr_rec/trainer.py:293-305``) with one device pass.

Users with zero targets return no metrics in the reference (metrics.py:62);
callers here aggregate with the ``valid`` mask (= n_targets > 0).

torchmetrics fidelity notes (golden tests in tests/test_metrics.py):
- ``retrieval_average_precision`` follows torchmetrics' formulation:
  mean over the j-th hit within top_k of ``j / position_j`` (1-based).
- ``retrieval_auroc`` is computed over the top_k-truncated list; degenerate
  lists (no positives OR all positives) give 0.0, exactly like
  torchmetrics' missing-class bail-out.  NOTE an intended protocol
  property: the reference APPENDS every missed target to the END of the
  scored list (metrics.py:70-78), i.e. unrecalled positives get the
  lowest scores — so whenever recall@k is low, AUROC sits well BELOW the
  0.5 "chance" intuition.  Values like 0.1-0.2 alongside a decent hit
  rate are the faithful reference semantics, not an inverted metric
  (golden-tested against the torchmetrics transcription).
- ``retrieval_normalized_dcg`` uses binary gains; ideal DCG over
  ``min(top_k, n_targets)`` ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def retrieval_metrics(
    rel: jax.Array, n_targets: jax.Array, top_k: int
) -> dict[str, jax.Array]:
    """Per-user retrieval metrics.

    Args:
        rel: ``(U, K)`` binary relevance of each user's ranked top-K recs
            (K >= top_k; only the first ``top_k`` columns are used).
        n_targets: ``(U,)`` number of distinct target ids per user.
        top_k: evaluation cutoff.

    Returns:
        dict of ``(U,)`` float32 arrays keyed by torchmetrics names, plus
        ``"valid"``: bool mask of users with at least one target.
    """
    rel = rel[:, :top_k].astype(jnp.float32)
    n_targets = n_targets.astype(jnp.float32)
    u, k = rel.shape
    positions = jnp.arange(1, k + 1, dtype=jnp.float32)[None, :]  # (1, K)

    hits = jnp.sum(rel, axis=1)  # (U,)
    any_hit = hits > 0

    # precision@k / recall@k / hit-rate@k
    precision = hits / k
    recall = hits / jnp.clip(n_targets, min=1.0)
    hit_rate = any_hit.astype(jnp.float32)

    # MRR@k: reciprocal rank of the first hit inside top_k
    first_pos = jnp.argmax(rel, axis=1) + 1  # argmax of 0/1 = first hit
    mrr = jnp.where(any_hit, 1.0 / first_pos, 0.0)

    # NDCG@k with binary gains
    discounts = 1.0 / jnp.log2(positions + 1.0)
    dcg = jnp.sum(rel * discounts, axis=1)
    ideal_len = jnp.minimum(n_targets, float(k))  # (U,)
    ideal_mask = positions <= ideal_len[:, None]
    idcg = jnp.sum(ideal_mask * discounts, axis=1)
    ndcg = jnp.where(idcg > 0, dcg / jnp.clip(idcg, min=1e-12), 0.0)

    # AP@k (torchmetrics form): mean over hits of (hit_ordinal / position)
    cum_hits = jnp.cumsum(rel, axis=1)
    ap_terms = jnp.where(rel > 0, cum_hits / positions, 0.0)
    ap = jnp.where(any_hit, jnp.sum(ap_terms, axis=1) / jnp.clip(hits, min=1.0), 0.0)

    # AUROC over the top_k-truncated list: fraction of (pos, neg) pairs
    # correctly ordered.  Scores strictly decrease with position, so a pair
    # is correct iff the positive precedes the negative.  DEGENERATE lists
    # return 0.0 — torchmetrics retrieval_auroc bails with 0.0 whenever
    # either class is absent after truncation (`(0 not in target) or
    # (1 not in target)`), INCLUDING the all-positives case (cross-checked
    # by tests/test_metrics_torchmetrics_golden.py).
    negs_after = jnp.sum(
        rel * jnp.cumsum(1.0 - rel[:, ::-1], axis=1)[:, ::-1], axis=1
    )  # for each positive, count negatives at later positions
    n_neg = k - hits
    pairs = hits * n_neg
    auroc = jnp.where(pairs > 0, negs_after / jnp.clip(pairs, min=1.0), 0.0)

    return {
        "retrieval_normalized_dcg": ndcg,
        "retrieval_average_precision": ap,
        "retrieval_auroc": auroc,
        "retrieval_precision": precision,
        "retrieval_recall": recall,
        "retrieval_hit_rate": hit_rate,
        "retrieval_reciprocal_rank": mrr,
        "valid": n_targets > 0,
    }


def aggregate_metrics(metrics: dict[str, jax.Array]) -> dict[str, jax.Array]:
    """Mean over users with non-empty target sets — matching Lightning's
    epoch aggregation of the reference's per-user logs
    (``xfmr_rec/trainer.py:293-305``; empty-target users are skipped,
    ``xfmr_rec/metrics.py:62-63``)."""
    valid = metrics["valid"].astype(jnp.float32)
    denom = jnp.clip(jnp.sum(valid), min=1.0)
    return {
        name: jnp.sum(values * valid) / denom
        for name, values in metrics.items()
        if name != "valid"
    }


def compute_retrieval_metrics(
    rec_ids: list[str], target_ids: set[str] | list[str], top_k: int
) -> dict[str, float]:
    """Single-user host-side API matching the reference signature
    (``xfmr_rec/metrics.py:17-79``).  Returns ``{}`` for empty inputs."""
    if len(target_ids) == 0:
        return {}
    targets = set(target_ids)
    rec_ids_padded = list(rec_ids) + [""] * max(0, top_k - len(rec_ids))
    rel = jnp.asarray(
        [[item in targets for item in rec_ids_padded[:top_k]]], jnp.float32
    )
    n_targets = jnp.asarray([len(targets)], jnp.float32)
    out = retrieval_metrics(rel, n_targets, top_k)
    return {k: float(v[0]) for k, v in out.items() if k != "valid"}
