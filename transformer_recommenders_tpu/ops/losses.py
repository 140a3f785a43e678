"""In-batch contrastive loss library (fused, fixed-shape, jit-friendly).

Parity: ``xfmr_rec/losses.py`` — the ``EmbedLoss`` pipeline
(logits -> target -> false-negative masking -> hard-negative mining -> loss,
losses.py:128-155) and its 7 concrete losses plus ``LogitsStatistics``.

TPU-first re-design:

- The reference materializes a per-row candidate tensor
  ``(R, 1 + R, D)`` via expand (``xfmr_rec/models.py:404-411``) and runs a
  batched bmm per loss.  Here the shared in-batch negative pool is kept as a
  single ``(R, D)`` matrix and scored with ONE ``(R, D) @ (D, R)`` MXU
  matmul; the positive column is a rowwise dot.  Logits are computed once
  and reused by every loss head (the reference recomputes per loss,
  ``xfmr_rec/trainer.py:255-263``).

- Variable-size validity (the reference boolean-filters rows/columns) is
  carried as fixed-shape masks: ``row_valid`` (positions whose sampled
  positive is real) and ``neg_valid`` (positions contributing to the shared
  negative pool).  With these masks every loss below is numerically
  IDENTICAL to the reference on the filtered subarrays (golden tests in
  ``tests/test_losses.py`` verify against a literal torch re-implementation).

- All losses are SUMS over valid rows, not means (reference losses.py note
  at :546-554 — "All losses are sums over the batch").

The generic two-arg API (``query (B, D)`` x ``candidates (B, C, D)`` with
``target_position`` "first"/"diagonal"; losses.py:26,240-253) is provided by
:func:`loss_from_candidates`; the training hot path uses the fused
pos/neg-pool form :func:`compute_losses`.
"""

from __future__ import annotations

from typing import Callable, Literal

import jax
import jax.numpy as jnp

from transformer_recommenders_tpu.configs import LossConfig

# plain python float, NOT jnp.float32(...): a module-level jnp scalar
# dispatches convert_element_type at IMPORT time, initializing the XLA
# backend before jax.distributed.initialize can run (and hanging any
# import when the accelerator is unreachable)
_NEG_INF = float("-inf")


def _l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    # torch cosine_similarity clamps each norm at eps=1e-8
    norm = jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), min=1e-8)
    return x / norm


def weighted_mean(
    values: jax.Array, weights: jax.Array, axis: int | None = None
) -> jax.Array:
    """Weighted mean with the reference's epsilon semantics
    (``xfmr_rec/losses.py:90-111``)."""
    weights = weights.astype(values.dtype)
    denom = jnp.sum(weights, axis=axis, keepdims=True) + 1e-9
    return jnp.sum(values * weights / denom, axis=axis)


# ---------------------------------------------------------------------------
# logits + masking pipeline
# ---------------------------------------------------------------------------


def compute_pair_logits(
    query: jax.Array,
    pos_embed: jax.Array,
    neg_pool: jax.Array,
    *,
    similarity: Literal["dot", "cosine"],
) -> tuple[jax.Array, jax.Array]:
    """Positive logits (R,) and shared-pool negative logits (R, N).

    ``similarity="dot"`` parity: ``xfmr_rec/losses.py:179-195``;
    ``"cosine"`` parity: ``losses.py:197-209``.  One MXU matmul for the
    negative block; f32 accumulation.
    """
    if similarity == "cosine":
        query = _l2_normalize(query)
        pos_embed = _l2_normalize(pos_embed)
        neg_pool = _l2_normalize(neg_pool)
    pos_logits = jnp.sum(query * pos_embed, axis=-1).astype(jnp.float32)
    neg_logits = jnp.dot(
        query, neg_pool.T, preferred_element_type=jnp.float32
    )
    return pos_logits, neg_logits


def negative_mask(
    cfg: LossConfig,
    pos_logits: jax.Array,
    neg_logits: jax.Array,
    neg_valid: jax.Array,
) -> jax.Array:
    """Valid-negative mask with false-negative filtering and optional
    hard-negative mining.

    Parity: ``xfmr_rec/losses.py:263-330``.  With
    ``mask_false_negatives=True`` any candidate whose logit >= the positive
    logit is removed (this also removes the positive itself in the
    reference's concatenated layout — here the positive column is separate
    and never part of the pool).  Hard-negative mining keeps only the top-k
    negatives by logit.
    """
    neg_valid = neg_valid.astype(jnp.bool_)[None, :] & jnp.ones(
        (neg_logits.shape[0], 1), jnp.bool_
    )
    if cfg.mask_false_negatives:
        mask = neg_valid & (neg_logits < pos_logits[:, None])
    else:
        mask = neg_valid

    k = cfg.num_hard_negatives
    if 0 < k < neg_logits.shape[1]:
        masked = jnp.where(mask, neg_logits, _NEG_INF)
        _, top_idx = jax.lax.top_k(masked, k)  # (R, k)
        rows = jnp.arange(neg_logits.shape[0])[:, None]
        keep = jnp.zeros_like(mask).at[rows, top_idx].set(True)
        mask = mask & keep
    return mask


# ---------------------------------------------------------------------------
# loss heads — each maps (cfg, pos_logits, neg_logits, neg_mask, row_valid)
# to a scalar summed over valid rows
# ---------------------------------------------------------------------------


def _alignment(cfg: LossConfig, pos, neg, mask, row_valid) -> jax.Array:
    # sum(1 - pos_logit) over valid rows; reference losses.py:338-353
    del cfg, neg, mask
    return jnp.sum((1.0 - pos) * row_valid)


def _contrastive(cfg: LossConfig, pos, neg, mask, row_valid) -> jax.Array:
    # sum over rows of weighted-mean ReLU(logit - 1 + margin) over negatives;
    # reference losses.py:355-372 (the positive column carries weight 0 there)
    del pos
    hinge = jax.nn.relu(neg - 1.0 + cfg.margin)
    return jnp.sum(weighted_mean(hinge, mask, axis=1) * row_valid)


def alignment_loss(cfg, pos, neg, mask, row_valid) -> jax.Array:
    """AlignmentLoss (cosine).  Reference losses.py:408-426."""
    return _alignment(cfg, pos, neg, mask, row_valid)


def alignment_contrastive_loss(cfg, pos, neg, mask, row_valid) -> jax.Array:
    """AlignmentContrastiveLoss (cosine).  Reference losses.py:429-447."""
    return _alignment(cfg, pos, neg, mask, row_valid) + _contrastive(
        cfg, pos, neg, mask, row_valid
    )


def contrastive_loss(cfg, pos, neg, mask, row_valid) -> jax.Array:
    """ContrastiveLoss (cosine margin, ~CCL).  Reference losses.py:450-469."""
    return _contrastive(cfg, pos, neg, mask, row_valid)


def infonce_loss(cfg, pos, neg, mask, row_valid) -> jax.Array:
    """InfoNCELoss (~in-batch sampled softmax).  Reference losses.py:472-488.

    Cross-entropy over [positive, masked negatives] * scale, summed.
    """
    neg_scaled = jnp.where(mask, neg, _NEG_INF) * cfg.scale
    pos_scaled = pos * cfg.scale
    # logsumexp over the (1 + N) candidate axis
    m = jnp.maximum(pos_scaled, jnp.max(neg_scaled, axis=1))
    lse = m + jnp.log(
        jnp.exp(pos_scaled - m) + jnp.sum(jnp.exp(neg_scaled - m[:, None]), axis=1)
    )
    ce = lse - pos_scaled
    return jnp.sum(ce * row_valid)


def nce_loss(cfg, pos, neg, mask, row_valid) -> jax.Array:
    """NCELoss (binary NCE).  Reference losses.py:491-511.

    BCE-with-logits: positive labeled 1 (softplus(-x)), negatives labeled 0
    (softplus(x)); per-row positive loss + weighted-mean negative loss.
    """
    del cfg
    pos_bce = jax.nn.softplus(-pos)
    neg_bce = jax.nn.softplus(neg)
    return jnp.sum((pos_bce + weighted_mean(neg_bce, mask, axis=1)) * row_valid)


def pairwise_hinge_loss(cfg, pos, neg, mask, row_valid) -> jax.Array:
    """PairwiseHingeLoss.  Reference losses.py:514-527."""
    scores = neg - pos[:, None] * (1.0 - cfg.margin)
    return jnp.sum(weighted_mean(jax.nn.relu(scores), mask, axis=1) * row_valid)


def pairwise_logistic_loss(cfg, pos, neg, mask, row_valid) -> jax.Array:
    """PairwiseLogisticLoss (~BPR at margin=0).  Reference losses.py:530-543."""
    scores = neg - pos[:, None] * (1.0 - cfg.margin)
    return jnp.sum(weighted_mean(jax.nn.softplus(scores), mask, axis=1) * row_valid)


LossFn = Callable[[LossConfig, jax.Array, jax.Array, jax.Array, jax.Array], jax.Array]

# name -> (fn, similarity); registry parity: reference losses.py:546-564
LOSS_FNS: dict[str, tuple[LossFn, str]] = {
    "AlignmentLoss": (alignment_loss, "cosine"),
    "AlignmentContrastiveLoss": (alignment_contrastive_loss, "cosine"),
    "ContrastiveLoss": (contrastive_loss, "cosine"),
    "InfoNCELoss": (infonce_loss, "dot"),
    "NCELoss": (nce_loss, "dot"),
    "PairwiseHingeLoss": (pairwise_hinge_loss, "dot"),
    "PairwiseLogisticLoss": (pairwise_logistic_loss, "dot"),
}


def compute_losses(
    cfg: LossConfig,
    query: jax.Array,
    pos_embed: jax.Array,
    neg_pool: jax.Array,
    row_valid: jax.Array,
    neg_valid: jax.Array,
    *,
    loss_names: tuple[str, ...] | None = None,
) -> dict[str, jax.Array]:
    """Evaluate every loss head on shared logits (computed once per
    similarity).  Parity: ``xfmr_rec/trainer.py:255-263`` evaluates all 7
    losses per step for logging.
    """
    names = loss_names if loss_names is not None else tuple(LOSS_FNS)
    row_valid = row_valid.astype(jnp.float32)

    cached: dict[str, tuple[jax.Array, jax.Array, jax.Array]] = {}
    out: dict[str, jax.Array] = {}
    for name in names:
        fn, sim = LOSS_FNS[name]
        if sim not in cached:
            pos, neg = compute_pair_logits(query, pos_embed, neg_pool, similarity=sim)
            cached[sim] = (pos, neg, negative_mask(cfg, pos, neg, neg_valid))
        pos, neg, mask = cached[sim]
        out[name] = fn(cfg, pos, neg, mask, row_valid)
    return out


def logits_statistics_moments(
    cfg: LossConfig,
    query: jax.Array,
    pos_embed: jax.Array,
    neg_pool: jax.Array,
    row_valid: jax.Array,
    neg_valid: jax.Array,
) -> dict[str, jax.Array]:
    """Raw reduction moments behind :func:`logits_statistics`.

    Split out so the sharded train step can reduce the moments across the
    data axis (psum for sums/counts, pmin/pmax for extrema) and apply
    :func:`finish_logits_statistics` to get GLOBAL statistics identical to
    a single-chip run (the reference logs these every step,
    ``xfmr_rec/trainer.py:250-253``).

    ``*_sum``/``*_sse``/``*_meansq``/``*_n``/``density_num`` are additive
    across batch shards; ``*_min``/``*_max`` reduce with min/max.
    """
    pos, neg = compute_pair_logits(query, pos_embed, neg_pool, similarity="dot")
    mask = negative_mask(cfg, pos, neg, neg_valid)
    rowv = row_valid.astype(jnp.float32)
    mask = mask & row_valid.astype(jnp.bool_)[:, None]
    maskf = mask.astype(jnp.float32)

    # density denominator: the reference's ``C - 1`` (losses.py:386-389)
    # where C = 1 + pool and the pool holds every attention-valid position
    # (models.py:404-411) — i.e. exactly sum(neg_valid) here.  Equality with
    # the literal reference computation is proven by
    # tests/test_losses.py::test_logits_statistics_match_reference_oracle.
    n_valid_neg = jnp.sum(neg_valid.astype(jnp.float32))
    num_negatives = n_valid_neg
    if cfg.num_hard_negatives > 0:
        num_negatives = jnp.minimum(num_negatives, cfg.num_hard_negatives)
    per_row_density = jnp.sum(maskf, axis=1) / (num_negatives + 1e-9)

    def _moments(prefix, x, w):
        """Additive moments with a cancellation-safe variance: the local
        sum of squared DEVIATIONS around the local mean (two-pass — exact
        on one shard) plus ``sum^2/n``; the cross-shard combiner in
        :func:`finish_logits_statistics` is Chan et al.'s parallel
        variance.  A one-pass ``sumsq - n*mean^2`` loses most significant
        digits in f32 once ``|mean| >> std`` (e.g. InfoNCE at scale 20).
        """
        n = jnp.sum(w)
        total = jnp.sum(x * w)
        mean = total / jnp.clip(n, min=1.0)
        sse = jnp.sum(jnp.square(x - mean) * w)
        return {
            f"{prefix}_sum": total,
            f"{prefix}_sse": sse,
            f"{prefix}_meansq": jnp.square(total) / jnp.clip(n, min=1.0),
            f"{prefix}_n": n,
        }

    return {
        "density_num": jnp.sum(per_row_density * rowv),
        **_moments("pos", pos, rowv),  # pos_n == valid-row count
        "pos_min": jnp.min(jnp.where(rowv > 0, pos, jnp.inf)),
        "pos_max": jnp.max(jnp.where(rowv > 0, pos, -jnp.inf)),
        **_moments("neg", neg, maskf),
        "neg_min": jnp.min(jnp.where(mask, neg, jnp.inf)),
        "neg_max": jnp.max(jnp.where(mask, neg, -jnp.inf)),
    }


def finish_logits_statistics(m: dict[str, jax.Array]) -> dict[str, jax.Array]:
    """Moments -> the reference's statistics dict (unbiased std, torch
    default).  See :func:`logits_statistics_moments`."""

    def _stats(prefix: str) -> dict[str, jax.Array]:
        n = m[f"{prefix}_n"]
        safe_n = jnp.clip(n, min=1.0)
        mean = m[f"{prefix}_sum"] / safe_n
        # parallel variance (Chan et al.): on one shard sse is the exact
        # two-pass SSE and meansq - sum^2/n cancels to 0; across shards the
        # correction carries only the (small) between-shard mean spread
        sse = m[f"{prefix}_sse"] + m[f"{prefix}_meansq"] - jnp.square(
            m[f"{prefix}_sum"]
        ) / safe_n
        var = jnp.clip(sse, min=0.0) / jnp.clip(n - 1.0, min=1.0)
        return {
            f"logits/{prefix}/mean": mean,
            f"logits/{prefix}/std": jnp.sqrt(var),
            f"logits/{prefix}/min": m[f"{prefix}_min"],
            f"logits/{prefix}/max": m[f"{prefix}_max"],
        }

    stats = {
        "logits/neg/density": m["density_num"] / jnp.clip(m["pos_n"], min=1.0)
    }
    stats |= _stats("pos")
    stats |= _stats("neg")
    return stats


def logits_statistics(
    cfg: LossConfig,
    query: jax.Array,
    pos_embed: jax.Array,
    neg_pool: jax.Array,
    row_valid: jax.Array,
    neg_valid: jax.Array,
) -> dict[str, jax.Array]:
    """Monitoring statistics over positive/negative logits.

    Parity: ``xfmr_rec/losses.py:375-405`` (LogitsStatistics): negative
    density plus mean/std/min/max of positive and negative logits.  Std is
    unbiased (torch default).  Restricted to valid rows/columns exactly as
    the reference's filtered tensors are.
    """
    return finish_logits_statistics(
        logits_statistics_moments(cfg, query, pos_embed, neg_pool, row_valid, neg_valid)
    )


# ---------------------------------------------------------------------------
# generic candidate-matrix API (reference's EmbedLoss.forward surface)
# ---------------------------------------------------------------------------


def loss_from_candidates(
    cfg: LossConfig,
    name: str,
    query_embed: jax.Array,
    candidate_embed: jax.Array,
    target: jax.Array | None = None,
) -> jax.Array:
    """Loss over an explicit ``(B, C, D)`` candidate tensor with
    ``target_position`` semantics — the reference's public ``EmbedLoss``
    call signature (``xfmr_rec/losses.py:128-155,211-261``).

    Used by tests and by any caller with per-row candidate sets; the
    training hot path uses :func:`compute_losses` instead.
    """
    fn, sim = LOSS_FNS[name]
    b, c, _ = candidate_embed.shape
    if target is None:
        if cfg.target_position == "first":
            target = jnp.zeros((b,), jnp.int32)
        elif cfg.target_position == "diagonal":
            target = jnp.arange(b, dtype=jnp.int32)
        else:
            msg = "either `target` or `cfg.target_position` must be provided"
            raise ValueError(msg)

    q = _l2_normalize(query_embed) if sim == "cosine" else query_embed
    cand = _l2_normalize(candidate_embed) if sim == "cosine" else candidate_embed
    logits = jnp.einsum("bd,bcd->bc", q, cand, preferred_element_type=jnp.float32)

    pos_logits = jnp.take_along_axis(logits, target[:, None], axis=1)[:, 0]
    onehot = jax.nn.one_hot(target, c, dtype=jnp.bool_)
    if cfg.mask_false_negatives:
        mask = logits < pos_logits[:, None]
    else:
        mask = ~onehot
    k = cfg.num_hard_negatives
    if 0 < k < c:
        masked = jnp.where(mask, logits, _NEG_INF)
        _, top_idx = jax.lax.top_k(masked, k)
        rows = jnp.arange(b)[:, None]
        mask = mask & jnp.zeros_like(mask).at[rows, top_idx].set(True)

    row_valid = jnp.ones((b,), jnp.float32)
    return fn(cfg, pos_logits, logits, mask, row_valid)
