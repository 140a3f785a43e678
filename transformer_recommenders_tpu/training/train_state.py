"""Train state + jitted train step.

Replaces the Lightning training machinery (``xfmr_rec/trainer.py:118-341``)
with a jit-compiled functional step:

- AdamW over all trainable params (parity: ``xfmr_rec/trainer.py:327-332``;
  torch AdamW decays every param by default, as does optax.adamw);
- the backprop objective is the SUM-reduced selected loss
  (``loss/{train_loss}``, reference trainer.py:288-291);
- every loss head + batch statistics are computed in the same forward for
  logging (reference trainer.py:213-264) at negligible cost because logits
  are shared;
- the frozen item table is a step argument, NOT part of the state — it is
  never updated nor checkpointed (reference trainer.py:352-362).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from transformer_recommenders_tpu.configs import TrainConfig
from transformer_recommenders_tpu.models.recommender import compute_embeds
from transformer_recommenders_tpu.ops import losses as loss_lib


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def _fused_loss_enabled(config: TrainConfig) -> bool:
    """Fused Pallas loss only off-CPU (interpret mode would be slow) and
    only for configurations the kernel implements: hard-negative mining
    (num_hard_negatives > 0) needs the XLA pipeline."""
    if not getattr(config, "use_fused_loss", False):
        return False
    if getattr(config, "num_hard_negatives", 0) > 0:
        return False
    try:
        return jax.default_backend() != "cpu"
    except RuntimeError:  # pragma: no cover - backend init failure
        return False




def table_pool_rows(config: TrainConfig, batch: dict) -> int:
    """Rows of the gathered negative pool a batch would produce, i.e. what
    the (R, Rn) matmul's Rn actually is after ``compute_query_embeds``
    truncates the stored history to ``max_seq_length``.  Using the raw
    ``history_item_idx.size`` over-counts when the stored history dim
    exceeds the model's window (ADVICE round 2)."""
    b, h = batch["history_item_idx"].shape
    return b * min(h, config.max_seq_length)


def _table_loss_enabled(config: TrainConfig, n_table_rows: int, pool_rows: int) -> bool:
    """Table-scored InfoNCE (``ops/fused_table_infonce.py``) pays off when
    the catalog is not much larger than the shared pool: the (R, N) matmul
    replaces the (R, Rn) one AND the 2R pos/neg gathers + scatter-bwd
    disappear.  VMEM bound: the kernel keeps the whole query-space table
    (bf16) + an (N, D) f32 grad accumulator resident."""
    if not _fused_loss_enabled(config):
        return False
    if config.train_loss != "InfoNCELoss":
        return False
    if not getattr(config, "use_table_scored_loss", True):
        return False
    d = config.hidden_size
    # bwd residency: bf16 table (2) + f32 dense d(table) out block (4)
    # + (tile_rows, N) f32 score tile; 16 MB/core VMEM, leave headroom
    vmem_bytes = n_table_rows * d * 6 + 128 * n_table_rows * 4
    return n_table_rows <= 2 * pool_rows and vmem_bytes <= 13_000_000


def _table_objective(config: TrainConfig, qe, counts=None):
    """Objective on :func:`compute_query_embeds` output via the
    table-scored kernel.  ``counts`` overrides the local histogram (the
    sharded trainer passes the psum-reduced global pool counts)."""
    from transformer_recommenders_tpu.ops.fused_table_infonce import (
        fused_table_infonce_loss,
    )

    return fused_table_infonce_loss(
        qe["query"], qe["table"], qe["pos_idx"], qe["neg_idx"],
        qe["row_valid"], qe["neg_valid"],
        scale=config.scale,
        mask_false_negatives=config.mask_false_negatives,
        counts=counts,
    )


def _fused_objective(config: TrainConfig, embeds, neg_pool=None, neg_valid=None):
    """Fused Pallas objective for the configured train loss, or None when no
    kernel covers it (hard-negative mining, NCE/alignment heads, CPU)."""
    if not _fused_loss_enabled(config):
        return None
    pool = neg_pool if neg_pool is not None else embeds["neg_pool"]
    nvalid = neg_valid if neg_valid is not None else embeds["neg_valid"]
    name = config.train_loss
    if name == "InfoNCELoss":
        from transformer_recommenders_tpu.ops.fused_infonce import (
            fused_infonce_loss,
        )

        return fused_infonce_loss(
            embeds["query"], embeds["pos_embed"], pool,
            embeds["row_valid"], nvalid,
            scale=config.scale,
            mask_false_negatives=config.mask_false_negatives,
        )
    from transformer_recommenders_tpu.ops.fused_pairwise import (
        HEADS,
        fused_pairwise_loss,
    )

    def norm(x):
        return x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), min=1e-8)

    rv = embeds["row_valid"].astype(jnp.float32)
    cosine = name in ("ContrastiveLoss", "AlignmentLoss", "AlignmentContrastiveLoss")
    q, p, n = embeds["query"], embeds["pos_embed"], pool
    if cosine:
        q, p, n = norm(q), norm(p), norm(n)
    pos_logit = jnp.sum(
        q.astype(jnp.float32) * p.astype(jnp.float32), axis=-1
    )

    if name == "AlignmentLoss":  # no pool reduction at all (losses.py:408-426)
        return jnp.sum((1.0 - pos_logit) * rv)

    pool_head = {"AlignmentContrastiveLoss": "ContrastiveLoss"}.get(name, name)
    if pool_head not in HEADS:
        return None
    pool_term = fused_pairwise_loss(
        q, p, n, embeds["row_valid"], nvalid,
        head=pool_head,
        margin=config.margin,
        mask_false_negatives=config.mask_false_negatives,
    )
    if name == "AlignmentContrastiveLoss":  # losses.py:429-447
        return jnp.sum((1.0 - pos_logit) * rv) + pool_term
    if name == "NCELoss":  # + per-row positive BCE term (losses.py:491-511)
        return jnp.sum(jax.nn.softplus(-pos_logit) * rv) + pool_term
    return pool_term


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    """AdamW (parity: ``xfmr_rec/trainer.py:327-332``) with the Lightning
    trainer knobs the reference exposes but defaults off
    (``config.yaml:29-30``): global-norm clipping and grad accumulation."""
    clip = getattr(config, "gradient_clip_val", None)
    adamw = optax.adamw(config.learning_rate, weight_decay=config.weight_decay)
    opt = optax.chain(optax.clip_by_global_norm(clip), adamw) if clip else adamw
    accumulate = getattr(config, "accumulate_grad_batches", 1)
    if accumulate > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accumulate)
    return opt


class FlatAdamWState(NamedTuple):
    """Optimizer state over ONE flat f32 buffer (first/second moments)."""

    count: jax.Array
    mu: jax.Array
    nu: jax.Array


def flat_adamw_enabled(config: TrainConfig) -> bool:
    """The fused flat path covers everything but gradient accumulation
    (optax.MultiSteps keeps per-leaf accumulators)."""
    return getattr(config, "accumulate_grad_batches", 1) <= 1


def make_flat_adamw(config: TrainConfig):
    """Fused AdamW over a single flat parameter vector.

    Bit-identical math to ``optax.adamw`` (same bias correction, eps
    placement, decoupled weight decay, and ``clip_by_global_norm``
    semantics) but executed as ONE elementwise fusion over one contiguous
    buffer instead of ~4 ops x ~66 leaves.  Measured on v5e
    (scripts/ablate_step.py): the per-leaf optax update costs 1.03 ms/step
    for an 847k-param model whose byte-bound is 0.03 ms — per-fusion fixed
    overhead, not bandwidth; the flat form removes it.

    Returns ``(init, apply)``:
      ``init(params) -> FlatAdamWState``
      ``apply(grads, opt_state, params) -> (new_params, new_opt_state,
      grad_global_norm)`` (the norm is pre-clip, matching the
      ``optax.global_norm(grads)`` the step previously logged).
    """
    from jax.flatten_util import ravel_pytree

    update = make_flat_update(config)

    def init(params) -> FlatAdamWState:
        flat, _ = ravel_pytree(params)
        zeros = jnp.zeros_like(flat)
        return FlatAdamWState(jnp.zeros((), jnp.int32), zeros, zeros)

    def apply(grads, opt_state: FlatAdamWState, params):
        g, _ = ravel_pytree(grads)
        p, unravel = ravel_pytree(params)
        new_p, opt_state, gnorm = update(p, g, opt_state)
        return unravel(new_p), opt_state, gnorm

    return init, apply


def make_flat_update(config: TrainConfig):
    """``(p_flat, g_flat, opt_state) -> (new_p_flat, new_opt_state, gnorm)``
    — the flat-to-flat AdamW core shared by :func:`make_flat_adamw` and the
    scanned driver's flat-carry loop (which never ravels per step)."""
    lr = config.learning_rate
    wd = config.weight_decay
    clip = getattr(config, "gradient_clip_val", None)
    b1, b2, eps = 0.9, 0.999, 1e-8

    def update(p, g, opt_state: FlatAdamWState):
        gnorm = jnp.sqrt(jnp.sum(g * g))
        if clip:
            g = g * jnp.where(gnorm < clip, 1.0, clip / gnorm)
        count = opt_state.count + 1
        mu = b1 * opt_state.mu + (1.0 - b1) * g
        nu = b2 * opt_state.nu + (1.0 - b2) * (g * g)
        cf = count.astype(mu.dtype)
        mu_hat = mu / (1.0 - b1**cf)
        nu_hat = nu / (1.0 - b2**cf)
        new_p = p - lr * (mu_hat / (jnp.sqrt(nu_hat) + eps) + wd * p)
        return new_p, FlatAdamWState(count, mu, nu), gnorm

    return update


def init_train_state(config: TrainConfig, params: Any) -> TrainState:
    if flat_adamw_enabled(config):
        opt_init, _ = make_flat_adamw(config)
        opt_state = opt_init(params)
    else:
        opt_state = make_optimizer(config).init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))


def make_update_fn(config: TrainConfig):
    """``update(grads, opt_state, params) -> (params, opt_state, grad_norm)``
    — the fused flat AdamW when enabled, else the optax chain."""
    if flat_adamw_enabled(config):
        _, apply = make_flat_adamw(config)
        return apply
    opt = make_optimizer(config)

    def apply(grads, opt_state, params):
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, optax.global_norm(grads)

    return apply


def make_train_step(config: TrainConfig, *, full_logs: bool = True):
    """Build the jitted train step.

    Signature: ``step(state, item_table, batch, rng) -> (state, logs)`` where
    ``batch`` holds int32 (B, S) arrays ``history_item_idx`` /
    ``pos_item_idx`` / ``neg_item_idx``.

    ``full_logs=False`` builds the hot-path variant: only the training
    objective (fused kernel when enabled) — none of the 7-loss/statistics
    logging computation.  The trainer uses it on non-logging steps.
    """
    update_fn = make_update_fn(config)
    loss_names = tuple(loss_lib.LOSS_FNS)
    model_cfg = config  # TrainConfig subclasses ModelConfig
    loss_cfg = config  # ... and LossConfig
    use_fused = _fused_loss_enabled(config)

    def loss_fn(params, item_table, batch, rng):
        if not full_logs and _table_loss_enabled(
            config, item_table.shape[0], table_pool_rows(config, batch)
        ):
            from transformer_recommenders_tpu.models.recommender import (
                compute_query_embeds,
            )

            qe = compute_query_embeds(
                params,
                model_cfg,
                item_table,
                batch["history_item_idx"],
                batch["pos_item_idx"],
                batch["neg_item_idx"],
                dropout_rng=rng,
            )
            objective = _table_objective(config, qe)
            return objective, {f"loss/{config.train_loss}": objective}
        embeds = compute_embeds(
            params,
            model_cfg,
            item_table,
            batch["history_item_idx"],
            batch["pos_item_idx"],
            batch["neg_item_idx"],
            dropout_rng=rng,
        )
        if not full_logs:
            objective = _fused_objective(config, embeds)
            if objective is None:
                objective = loss_lib.compute_losses(
                    loss_cfg,
                    embeds["query"],
                    embeds["pos_embed"],
                    embeds["neg_pool"],
                    embeds["row_valid"],
                    embeds["neg_valid"],
                    loss_names=(config.train_loss,),
                )[config.train_loss]
            return objective, {f"loss/{config.train_loss}": objective}
        all_losses = loss_lib.compute_losses(
            loss_cfg,
            embeds["query"],
            embeds["pos_embed"],
            embeds["neg_pool"],
            embeds["row_valid"],
            embeds["neg_valid"],
            loss_names=loss_names,
        )
        stats = loss_lib.logits_statistics(
            loss_cfg,
            embeds["query"],
            embeds["pos_embed"],
            embeds["neg_pool"],
            embeds["row_valid"],
            embeds["neg_valid"],
        )
        # batch statistics (parity: xfmr_rec/trainer.py:236-249)
        attn = embeds["attention_mask"]
        numel = attn.size
        attn_nz = jnp.sum(attn.astype(jnp.float32))
        pos_nz = jnp.sum(embeds["positive_mask"].astype(jnp.float32))
        logs = {f"loss/{k}": v for k, v in all_losses.items()}
        logs |= {
            f"loss/{k}Mean": v / (pos_nz + 1e-9) for k, v in all_losses.items()
        }
        logs |= stats
        logs |= {
            "batch/size": jnp.float32(attn.shape[0]),
            "batch/seq_len": jnp.float32(attn.shape[1]),
            "batch/numel": jnp.float32(numel),
            "batch/attention_non_zero": attn_nz,
            "batch/attention_density": attn_nz / (numel + 1e-9),
            "batch/positive_non_zero": pos_nz,
            "batch/positive_density": pos_nz / (attn_nz + 1e-9),
        }
        objective = _fused_objective(config, embeds)
        if objective is None:
            objective = all_losses[config.train_loss]
        return objective, logs

    @jax.jit
    def train_step(state: TrainState, item_table, batch, rng):
        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, item_table, batch, rng
        )
        params, opt_state, gnorm = update_fn(grads, state.opt_state, state.params)
        logs["grad/global_norm"] = gnorm
        return TrainState(params, opt_state, state.step + 1), logs

    return train_step
