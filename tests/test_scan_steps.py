"""Scanned multi-step dispatch == K single-step dispatches (same RNG plan)."""

import jax
import jax.numpy as jnp
import numpy as np

from transformer_recommenders_tpu.configs import TrainConfig
from transformer_recommenders_tpu.models.transformer import init_transformer_params
from transformer_recommenders_tpu.training.scan_steps import (
    make_scanned_train_steps,
    stack_batches,
)
from transformer_recommenders_tpu.training.train_state import (
    init_train_state,
    make_train_step,
)

RNG = np.random.default_rng(0)


def test_scanned_matches_single_steps():
    cfg = TrainConfig(
        hidden_size=16,
        num_hidden_layers=1,
        num_attention_heads=4,
        intermediate_size=16,
        max_seq_length=4,
        compute_dtype="float32",
        learning_rate=1e-3,
    )
    params = init_transformer_params(jax.random.key(0), cfg)
    n_items = 30
    table = RNG.normal(size=(n_items + 1, 16)).astype(np.float32)
    table[0] = 0
    table = jnp.asarray(table)

    k = 3
    batches = [
        {
            key: RNG.integers(1, n_items + 1, size=(4, 4)).astype(np.int32)
            for key in ["history_item_idx", "pos_item_idx", "neg_item_idx"]
        }
        for _ in range(k)
    ]

    root = jax.random.key(5)

    # K single steps (trainer._run_epoch key plan)
    single = make_train_step(cfg)
    s1 = init_train_state(cfg, params)
    for b in batches:
        key = jax.random.fold_in(root, int(s1.step))
        s1, logs1 = single(s1, table, b, key)

    # one scanned dispatch
    scan = make_scanned_train_steps(cfg)
    s2 = init_train_state(cfg, params)
    s2, logs2 = scan(s2, table, stack_batches(batches), root)

    assert int(s1.step) == int(s2.step) == k
    for a, b_ in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-5, atol=2e-6)
    # per-step losses logged by the scan match the final single-step log
    assert logs2["loss/InfoNCELoss"].shape == (k,)
    np.testing.assert_allclose(
        float(logs2["loss/InfoNCELoss"][-1]),
        float(logs1["loss/InfoNCELoss"]),
        rtol=1e-4,
    )
