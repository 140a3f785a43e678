"""Distributed train step over the (data, model) mesh.

Design (SURVEY.md §2.3 / BASELINE.json north star):

- encoder params are REPLICATED (they are tiny: <= 6 layers, d <= 384);
  the batch shards over ``data``; gradients reduce with one psum that XLA
  places on ICI/DCN;
- the frozen item table row-shards over ``model``; history/positive/
  negative lookups use the psum-combined sharded gather
  (``parallel/embedding.py``);
- **distributed-invariant loss**: the reference's in-batch losses share the
  negative pool across the WHOLE batch (``xfmr_rec/models.py:404-411``).
  Naive DP would shrink the pool to the per-chip batch and silently change
  the objective.  Here each chip all-gathers the (R_local, D) negative pool
  over the data axis and scores its local rows against the GLOBAL pool, so
  an N-chip step computes bit-for-bit the same loss as 1 chip (verified in
  tests/test_parallel.py).

Everything is one ``shard_map`` inside one ``jax.jit``; autodiff flows
through the collectives (psum transposes to broadcast, all_gather to
reduce-scatter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from transformer_recommenders_tpu.configs import TrainConfig
from transformer_recommenders_tpu.models.recommender import compute_embeds
from transformer_recommenders_tpu.ops import losses as loss_lib
from transformer_recommenders_tpu.params import DATA_AXIS, MODEL_AXIS
from transformer_recommenders_tpu.training.train_state import (
    TrainState,
    make_update_fn,
)

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def _sharded_lookup_local(table_shard: jax.Array, idx: jax.Array) -> jax.Array:
    """Model-axis collective gather; runs INSIDE the data/model shard_map."""
    rows = table_shard.shape[0]
    shard_id = jax.lax.axis_index(MODEL_AXIS)
    local_idx = idx - shard_id * rows
    in_range = (local_idx >= 0) & (local_idx < rows)
    safe = jnp.clip(local_idx, 0, rows - 1)
    vals = jnp.take(table_shard, safe, axis=0)
    vals = jnp.where(in_range[..., None], vals, 0)
    return jax.lax.psum(vals, MODEL_AXIS)


def make_sharded_loss(config: TrainConfig, mesh: Mesh, *, full_logs: bool = True):
    """``loss(params, table, batch, rng) -> (objective, logs)`` over the
    mesh — the differentiable core of :func:`make_sharded_train_step`, also
    used directly by the scanned multi-step dispatcher
    (``training/scan_steps.py``: lax.scan over K sharded steps in one jit).

    ``full_logs=False`` is the hot-path variant (objective only, like the
    single-device fast step); ``full_logs=True`` additionally reduces every
    loss head, batch statistics AND the logits statistics across the data
    axis, so sharded logs carry the same keys as a single-chip run
    (reference logs all of these every step, ``xfmr_rec/trainer.py:236-264``).
    """
    train_loss = config.train_loss

    def local_loss(params, table_shard, batch, rng):
        """Per-device loss: local rows vs the globally gathered pool."""
        dp_rank = jax.lax.axis_index(DATA_AXIS)
        rng = jax.random.fold_in(rng, dp_rank)

        # pre-project the LOCAL table shard when a projection exists (same
        # optimization as the single-device path: gather in hidden space);
        # the global pad row lives on shard 0 and is re-zeroed there
        projected = "input_proj" in params
        if projected:
            from transformer_recommenders_tpu.models.transformer import _dense

            table_shard = _dense(
                table_shard, params["input_proj"], jnp.dtype(config.compute_dtype)
            )
            shard_id = jax.lax.axis_index(MODEL_AXIS)
            first_row = jnp.where(shard_id == 0, 0.0, 1.0)
            table_shard = table_shard.at[0].multiply(first_row)

        if not full_logs:
            from transformer_recommenders_tpu.training.train_state import (
                _table_loss_enabled,
                _table_objective,
                table_pool_rows,
            )

            n_model = mesh.shape[MODEL_AXIS]
            n_data = mesh.shape[DATA_AXIS]
            n_global = table_shard.shape[0] * n_model
            pool_global = table_pool_rows(config, batch) * n_data
            if _table_loss_enabled(config, n_global, pool_global):
                # table-scored fast path: all-gather the (already projected)
                # query-space table over the model axis — N*D bf16, tiny on
                # ICI — then psum ONE (N,) count vector over the data axis
                # instead of all-gathering the (Rn, D) negative pool.  The
                # kernel's dense d(table) reduce-scatters back to the local
                # shard (shard_map transposes the all_gather), flowing into
                # input_proj grads through the shard-local projection.
                from transformer_recommenders_tpu.models.recommender import (
                    compute_query_embeds,
                )
                from transformer_recommenders_tpu.ops.fused_table_infonce import (
                    neg_pool_counts,
                )

                full_table = jax.lax.all_gather(
                    table_shard, MODEL_AXIS, tiled=True
                )
                qe = compute_query_embeds(
                    params,
                    config,
                    full_table,
                    batch["history_item_idx"],
                    batch["pos_item_idx"],
                    batch["neg_item_idx"],
                    dropout_rng=rng,
                    table_projected=projected,
                )
                local_counts = neg_pool_counts(
                    qe["neg_idx"], qe["neg_valid"], n_global
                )
                counts = jax.lax.psum(local_counts, DATA_AXIS)
                objective = jax.lax.psum(
                    _table_objective(config, qe, counts=counts), DATA_AXIS
                )
                pos_nz = jax.lax.psum(
                    jnp.sum(qe["positive_mask"].astype(jnp.float32)), DATA_AXIS
                )
                return objective, {
                    f"loss/{train_loss}": objective,
                    "batch/positive_non_zero": pos_nz,
                }

        lookup = lambda idx: _sharded_lookup_local(table_shard, idx)  # noqa: E731
        embeds = compute_embeds(
            params,
            config,
            None,
            batch["history_item_idx"],
            batch["pos_item_idx"],
            batch["neg_item_idx"],
            dropout_rng=rng,
            table_lookup=lookup,
            lookup_projected=projected,
        )
        # global shared negative pool (parity with single-chip semantics)
        neg_pool = jax.lax.all_gather(embeds["neg_pool"], DATA_AXIS, tiled=True)
        neg_valid = jax.lax.all_gather(embeds["neg_valid"], DATA_AXIS, tiled=True)

        from transformer_recommenders_tpu.training.train_state import (
            _fused_objective,
        )

        # fused Pallas objective when a kernel covers the configured loss
        # (identical value, no HBM logit matrix); XLA heads stay for logging
        fused = _fused_objective(config, embeds, neg_pool, neg_valid)

        if not full_logs:
            objective = fused
            if objective is None:
                objective = loss_lib.compute_losses(
                    config,
                    embeds["query"],
                    embeds["pos_embed"],
                    neg_pool,
                    embeds["row_valid"],
                    neg_valid,
                    loss_names=(train_loss,),
                )[train_loss]
            objective = jax.lax.psum(objective, DATA_AXIS)
            pos_nz = jax.lax.psum(
                jnp.sum(embeds["positive_mask"].astype(jnp.float32)), DATA_AXIS
            )
            return objective, {
                f"loss/{train_loss}": objective,
                "batch/positive_non_zero": pos_nz,
            }

        losses = loss_lib.compute_losses(
            config,
            embeds["query"],
            embeds["pos_embed"],
            neg_pool,
            embeds["row_valid"],
            neg_valid,
        )
        if fused is not None:
            losses[train_loss] = fused
        # global sums -> replicated logs
        losses = {k: jax.lax.psum(v, DATA_AXIS) for k, v in losses.items()}
        pos_nz = jax.lax.psum(
            jnp.sum(embeds["positive_mask"].astype(jnp.float32)), DATA_AXIS
        )
        attn_nz = jax.lax.psum(
            jnp.sum(embeds["attention_mask"].astype(jnp.float32)), DATA_AXIS
        )
        # logits statistics: reduce raw moments across the batch shards,
        # then finish — identical values to a single-chip step
        moments = loss_lib.logits_statistics_moments(
            config,
            embeds["query"],
            embeds["pos_embed"],
            neg_pool,
            embeds["row_valid"],
            neg_valid,
        )
        reduced = {}
        for key, value in moments.items():
            # extrema reduce via all_gather+min/max (scalars, so the gather
            # is tiny; lax.pmin/pmax lack a shard_map lowering here)
            if key.endswith("_min"):
                reduced[key] = jnp.min(jax.lax.all_gather(value, DATA_AXIS))
            elif key.endswith("_max"):
                reduced[key] = jnp.max(jax.lax.all_gather(value, DATA_AXIS))
            else:
                reduced[key] = jax.lax.psum(value, DATA_AXIS)
        stats = loss_lib.finish_logits_statistics(reduced)

        attn = embeds["attention_mask"]
        global_batch = jnp.float32(attn.shape[0]) * mesh.shape[DATA_AXIS]
        numel = jnp.float32(attn.size) * mesh.shape[DATA_AXIS]
        logs = {f"loss/{k}": v for k, v in losses.items()}
        logs |= {f"loss/{k}Mean": v / (pos_nz + 1e-9) for k, v in losses.items()}
        logs |= stats
        logs |= {
            "batch/size": global_batch,
            "batch/seq_len": jnp.float32(attn.shape[1]),
            "batch/numel": numel,
            "batch/attention_non_zero": attn_nz,
            "batch/attention_density": attn_nz / (numel + 1e-9),
            "batch/positive_non_zero": pos_nz,
            "batch/positive_density": pos_nz / (attn_nz + 1e-9),
        }
        return losses[train_loss], logs

    def sharded_loss(params, table, batch, rng):
        return shard_map(
            local_loss,
            mesh=mesh,
            in_specs=(
                P(),  # params replicated
                P(MODEL_AXIS, None),  # table row-sharded
                P(DATA_AXIS),  # batch dict: leading dim sharded
                P(),  # rng replicated
            ),
            out_specs=(P(), P()),  # loss + logs replicated
            check_vma=False,
        )(params, table, batch, rng)

    return sharded_loss


def make_sharded_train_step(config: TrainConfig, mesh: Mesh, *, full_logs: bool = True):
    """Build ``step(state, table, batch, rng) -> (state, logs)`` jitted over
    the mesh.  ``table`` must be row-sharded with padded rows
    (``parallel.embedding.place_table``); ``batch`` batch-dim sharded.
    See :func:`make_sharded_loss` for the ``full_logs`` semantics.
    """
    update_fn = make_update_fn(config)
    sharded_loss = make_sharded_loss(config, mesh, full_logs=full_logs)

    @jax.jit
    def train_step(state: TrainState, table, batch, rng):
        (_, logs), grads = jax.value_and_grad(sharded_loss, has_aux=True)(
            state.params, table, batch, rng
        )
        params, opt_state, gnorm = update_fn(grads, state.opt_state, state.params)
        logs["grad/global_norm"] = gnorm
        return TrainState(params, opt_state, state.step + 1), logs

    return train_step


def place_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Replicate the train state across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)
