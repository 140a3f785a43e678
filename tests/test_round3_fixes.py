"""Tests for the round-3 ADVICE fixes (ADVICE.md round 2).

1. opt-state layout conversion on restore (flat fused AdamW <-> per-leaf
   optax) — ``training/checkpoint.py:_convert_opt_leaves``;
2. loud warning on a non-finite monitor metric — ``training/trainer.py``;
3. int32 ListArray offset overflow guard — ``data/movielens.py``;
4. ``table_pool_rows`` clamps the stored history dim to ``max_seq_length``
   — ``training/train_state.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from transformer_recommenders_tpu.configs import SeqDataModuleConfig, TrainConfig
from transformer_recommenders_tpu.data.module import SeqDataModule
from transformer_recommenders_tpu.data.movielens import _check_list_offsets_fit_int32
from transformer_recommenders_tpu.models.transformer import init_transformer_params
from transformer_recommenders_tpu.training import checkpoint as ckpt_lib
from transformer_recommenders_tpu.training.train_state import (
    FlatAdamWState,
    TrainState,
    init_train_state,
    make_optimizer,
    table_pool_rows,
)
from transformer_recommenders_tpu.training.trainer import Trainer


def _tiny_config(**over) -> TrainConfig:
    base = dict(
        hidden_size=16,
        num_hidden_layers=1,
        num_attention_heads=2,
        intermediate_size=16,
        max_seq_length=4,
        compute_dtype="float32",
        train_loss="InfoNCELoss",
    )
    base.update(over)
    return TrainConfig(**base)


def _params(config):
    return init_transformer_params(jax.random.key(0), config)


class TestOptStateLayoutConversion:
    def test_perleaf_checkpoint_restores_into_flat_template(self, tmp_path):
        """A round-1-era checkpoint (per-leaf optax.adamw moments) must
        restore into today's flat-AdamW template with identical moments."""
        config = _tiny_config()
        params = _params(config)
        opt = optax.adamw(config.learning_rate, weight_decay=config.weight_decay)
        # non-trivial moments: one real optax update
        opt_state = opt.init(params)
        grads = jax.tree.map(lambda p: jnp.full_like(p, 0.01), params)
        _, opt_state = opt.update(grads, opt_state, params)
        old_state = TrainState(
            params=params, opt_state=opt_state, step=jnp.ones((), jnp.int32)
        )
        ckpt_lib.save_checkpoint(tmp_path / "c", old_state, epoch=1)

        template = init_train_state(config, params)
        assert isinstance(template.opt_state, FlatAdamWState)
        restored, meta = ckpt_lib.load_checkpoint(tmp_path / "c", template)
        assert isinstance(restored.opt_state, FlatAdamWState)
        from jax.flatten_util import ravel_pytree

        # optax.adamw == chain(scale_by_adam, add_decayed_weights, scale):
        # the adam moments live in the first element of the chain state
        mu_ref, _ = ravel_pytree(opt_state[0].mu)
        nu_ref, _ = ravel_pytree(opt_state[0].nu)
        np.testing.assert_allclose(restored.opt_state.mu, mu_ref)
        np.testing.assert_allclose(restored.opt_state.nu, nu_ref)
        assert int(restored.opt_state.count) == 1
        assert int(restored.step) == 1

    def test_flat_checkpoint_restores_into_perleaf_template(self, tmp_path):
        config = _tiny_config()
        params = _params(config)
        flat_state = init_train_state(config, params)
        n = flat_state.opt_state.mu.shape[0]
        flat_state = flat_state._replace(
            opt_state=FlatAdamWState(
                count=jnp.ones((), jnp.int32),
                mu=jnp.arange(n, dtype=jnp.float32) / n,
                nu=jnp.arange(n, dtype=jnp.float32) ** 2 / n,
            )
        )
        ckpt_lib.save_checkpoint(tmp_path / "c", flat_state, epoch=0)

        opt = make_optimizer(config)
        template = TrainState(
            params=params, opt_state=opt.init(params), step=jnp.zeros((), jnp.int32)
        )
        restored, _ = ckpt_lib.load_checkpoint(tmp_path / "c", template)
        from jax.flatten_util import ravel_pytree

        mu, _ = ravel_pytree(restored.opt_state[0].mu)
        nu, _ = ravel_pytree(restored.opt_state[0].nu)
        np.testing.assert_allclose(mu, flat_state.opt_state.mu)
        np.testing.assert_allclose(nu, flat_state.opt_state.nu)

    def test_multisteps_mismatch_fails_with_named_layouts(self, tmp_path):
        """flat checkpoint -> accumulate_grad_batches=2 (MultiSteps) template:
        the accumulators cannot be recovered; error must name the layouts."""
        config = _tiny_config()
        params = _params(config)
        flat_state = init_train_state(config, params)
        ckpt_lib.save_checkpoint(tmp_path / "c", flat_state, epoch=0)

        acc_config = _tiny_config(accumulate_grad_batches=2)
        template = init_train_state(acc_config, params)
        with pytest.raises(ValueError, match="opt-state layout"):
            ckpt_lib.load_checkpoint(tmp_path / "c", template)

    def test_matching_layout_roundtrip_unchanged(self, tmp_path):
        config = _tiny_config()
        params = _params(config)
        state = init_train_state(config, params)
        ckpt_lib.save_checkpoint(tmp_path / "c", state, epoch=0)
        restored, _ = ckpt_lib.load_checkpoint(tmp_path / "c", state)
        for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nonfinite_monitor_warns(tmp_path):
    """A NaN monitor metric must emit a RuntimeWarning each epoch instead of
    silently burning early-stopping patience (ADVICE round 2)."""
    data_config = SeqDataModuleConfig(
        data_dir=str(tmp_path / "data"),
        dataset="synthetic",
        embedder="hash",
        embedding_dim=16,
        max_seq_length=4,
        batch_size=16,
        synthetic_num_users=30,
        synthetic_num_items=40,
        synthetic_num_events=1500,
    )
    config = _tiny_config(
        max_epochs=2,
        eval_batch_size=32,
        top_k=5,
        log_every_n_steps=1000,
        ckpt_dir=str(tmp_path / "ckpt"),
        early_stopping_patience=10,
    )
    t = Trainer(config, SeqDataModule(data_config), log_dir=str(tmp_path / "logs"))
    real_validate = t.validate

    def nan_validate(stage="val"):
        val = real_validate(stage=stage)
        return {k: float("nan") for k in val}

    t.validate = nan_validate
    with pytest.warns(RuntimeWarning, match="non-finite"):
        t.fit()


def test_serve_workers_refuses_fork_of_live_app():
    """Round-3 fix: even on a CPU backend, serve(workers>1) must refuse —
    forking after JAX init deadlocks the child (measured,
    scripts/bench_serving_workers.py); multi-worker goes through
    serve_workers (spawn)."""
    from transformer_recommenders_tpu.serving import asgi

    with pytest.raises(RuntimeError, match="serve_workers"):
        asgi.serve(asgi.JSONApp(), workers=4)


def test_list_offset_overflow_guard():
    _check_list_offsets_fit_int32(2**31 - 1)  # fine
    with pytest.raises(OverflowError, match="int32"):
        _check_list_offsets_fit_int32(2**31)


def test_table_pool_rows_clamps_history_dim():
    config = _tiny_config(max_seq_length=4)
    batch = {"history_item_idx": np.zeros((8, 16), np.int32)}
    assert table_pool_rows(config, batch) == 8 * 4  # not 8 * 16
    batch = {"history_item_idx": np.zeros((8, 3), np.int32)}
    assert table_pool_rows(config, batch) == 8 * 3


def test_serve_workers_surfaces_worker_crashes(tmp_path):
    """A worker pool whose processes die (e.g. unreadable artifact) must
    raise, not return cleanly with the deployment silently down
    (round-3 review finding)."""
    import pytest

    from transformer_recommenders_tpu.serving.asgi import serve_workers

    with pytest.raises(RuntimeError, match="worker exited"):
        serve_workers(str(tmp_path / "no-such-artifact"), port=3911, workers=2)
