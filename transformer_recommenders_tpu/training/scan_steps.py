"""Multi-step training dispatch: ``lax.scan`` over K steps inside one jit.

The reference dispatches one optimizer step per Python iteration (Lightning
loop).  On TPU, per-dispatch host latency (worse over a tunneled chip) can
rival the step itself at small model sizes, so the framework offers a
scanned driver: K pre-staged batches -> ONE device program running K
train steps -> K logs.  No Python in the hot loop; XLA pipelines the whole
window.

Used by the trainer when ``steps_per_dispatch > 1`` and by bench.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from transformer_recommenders_tpu.configs import TrainConfig
from transformer_recommenders_tpu.models.recommender import compute_embeds
from transformer_recommenders_tpu.ops import losses as loss_lib
from transformer_recommenders_tpu.training.train_state import (
    TrainState,
    make_update_fn,
)


def make_scanned_train_steps(
    config: TrainConfig, *, with_logs: bool = True, mesh=None
):
    """Build ``steps(state, table, batches, rng) -> (state, logs)`` where
    ``batches`` holds arrays with a leading steps dimension ``(K, B, S)``.

    Logs are per-step arrays of shape (K,) (selected loss + positives
    count); the full per-loss log dict of the single-step path is traded
    for dispatch efficiency — the trainer logs the window means.

    With ``mesh``, each scanned step runs the sharded loss (global negative
    pool over the data axis, row-sharded table lookups) — identical
    objective to the single-chip scan; ``batches`` must be sharded
    ``P(None, 'data')`` and ``table`` row-sharded.
    """
    update_fn = make_update_fn(config)
    train_loss = config.train_loss
    from transformer_recommenders_tpu.training.train_state import _fused_objective

    if mesh is not None:
        from transformer_recommenders_tpu.parallel.train import make_sharded_loss

        sharded = make_sharded_loss(config, mesh, full_logs=False)

        def loss_fn(params, table, batch, rng):
            loss, logs = sharded(params, table, batch, rng)
            return loss, logs["batch/positive_non_zero"]

    else:

        from transformer_recommenders_tpu.training.train_state import (
            _table_loss_enabled,
            _table_objective,
            table_pool_rows,
        )

        def loss_fn(params, table, batch, rng):
            if _table_loss_enabled(
                config, table.shape[0], table_pool_rows(config, batch)
            ):
                from transformer_recommenders_tpu.models.recommender import (
                    compute_query_embeds,
                )

                qe = compute_query_embeds(
                    params,
                    config,
                    table,
                    batch["history_item_idx"],
                    batch["pos_item_idx"],
                    batch["neg_item_idx"],
                    dropout_rng=rng,
                )
                loss = _table_objective(config, qe)
                pos_nz = jnp.sum(qe["positive_mask"].astype(jnp.float32))
                return loss, pos_nz
            embeds = compute_embeds(
                params,
                config,
                table,
                batch["history_item_idx"],
                batch["pos_item_idx"],
                batch["neg_item_idx"],
                dropout_rng=rng,
            )
            loss = _fused_objective(config, embeds)
            if loss is None:
                loss = loss_lib.compute_losses(
                    config,
                    embeds["query"],
                    embeds["pos_embed"],
                    embeds["neg_pool"],
                    embeds["row_valid"],
                    embeds["neg_valid"],
                    loss_names=(train_loss,),
                )[train_loss]
            pos_nz = jnp.sum(embeds["positive_mask"].astype(jnp.float32))
            return loss, pos_nz

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    from transformer_recommenders_tpu.training.train_state import (
        flat_adamw_enabled,
        make_flat_update,
    )

    if flat_adamw_enabled(config):
        # flat-carry scan: the carry holds ONE flat f32 parameter vector
        # (plus the already-flat AdamW moments) instead of a ~66-leaf
        # pytree.  Differentiating through unravel() makes the gradient
        # arrive flat, so the optimizer update is one elementwise fusion
        # over contiguous buffers and the scan writes 1 carry buffer per
        # step instead of 66 (measured v5e: the per-leaf carry packing +
        # ravel/unravel cost ~0.6 ms of the 3.1 ms step)
        from jax.flatten_util import ravel_pytree

        flat_update = make_flat_update(config)

        @jax.jit
        def steps(state: TrainState, table, batches, rng):
            flat0, unravel = ravel_pytree(state.params)

            def body(carry, batch):
                flat_p, opt_state, step = carry
                step_rng = jax.random.fold_in(rng, step)
                (loss, pos_nz), g = jax.value_and_grad(
                    lambda fp: loss_fn(unravel(fp), table, batch, step_rng),
                    has_aux=True,
                )(flat_p)
                new_p, opt_state, _ = flat_update(flat_p, g, opt_state)
                logs = (loss, pos_nz) if with_logs else (loss,)
                return (new_p, opt_state, step + 1), logs

            (flat_p, opt_state, step), logs = jax.lax.scan(
                body, (flat0, state.opt_state, state.step), batches
            )
            state = TrainState(unravel(flat_p), opt_state, step)
            if with_logs:
                return state, {
                    f"loss/{train_loss}": logs[0],
                    "batch/positive_non_zero": logs[1],
                }
            return state, {f"loss/{train_loss}": logs[0]}

        return steps

    @jax.jit
    def steps(state: TrainState, table, batches, rng):
        def body(state, batch):
            step_rng = jax.random.fold_in(rng, state.step)
            (loss, pos_nz), grads = grad_fn(state.params, table, batch, step_rng)
            params, opt_state, _ = update_fn(grads, state.opt_state, state.params)
            new_state = TrainState(params, opt_state, state.step + 1)
            logs = (loss, pos_nz) if with_logs else (loss,)
            return new_state, logs

        state, logs = jax.lax.scan(body, state, batches)
        if with_logs:
            return state, {f"loss/{train_loss}": logs[0], "batch/positive_non_zero": logs[1]}
        return state, {f"loss/{train_loss}": logs[0]}

    return steps


def stack_batches(batches: list[dict]) -> dict:
    """Stack K host batches into (K, B, S) arrays for one scanned dispatch."""
    import numpy as np

    return {
        key: np.stack([b[key] for b in batches]) for key in batches[0]
    }
