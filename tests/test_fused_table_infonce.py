"""Table-scored fused InfoNCE kernel vs the pool-formulation XLA oracle.

The kernel must be EXACTLY the pool semantics (``xfmr_rec/losses.py:472-488``
over the shared pool of ``xfmr_rec/models.py:404-411``): for every case we
build the pool by GATHERING table rows (``p = table[pos_idx]``,
``n = table[neg_idx]``) and compare against the count-weighted catalog
scoring, values and gradients (d(table) must equal the scatter of the pool
gradients).  Interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_recommenders_tpu.configs import LossConfig
from transformer_recommenders_tpu.ops import losses as L
from transformer_recommenders_tpu.ops import fused_table_infonce as FT
from transformer_recommenders_tpu.ops.fused_table_infonce import (
    fused_table_infonce_loss,
    neg_pool_counts,
)

RNG = np.random.default_rng(7)


@pytest.fixture(autouse=True)
def exact_matmul(monkeypatch):
    monkeypatch.setattr(FT, "_MATMUL_DTYPE", jnp.float32)


def reference_pool_loss(cfg, q, table, pos_idx, neg_idx, row_valid, neg_valid):
    """Pool-formulation oracle with TIE-EXACT logits: pos and neg logits are
    both read from ONE ``q @ table^T`` score matrix, like the reference's
    single matmul over the concatenated ``[pos | negs]`` candidate tensor
    (``xfmr_rec/losses.py:195``).  Computing the pos logit elementwise
    instead (as ``L.compute_pair_logits`` does) breaks exact ties by 1 ulp,
    so duplicates of the positive in the pool randomly escape the
    false-negative mask — the kernel reproduces the reference's exact-tie
    masking."""
    x = jnp.dot(q, table.T, preferred_element_type=jnp.float32)
    pos_l = jnp.take_along_axis(x, pos_idx[:, None], axis=1)[:, 0]
    neg_l = x[:, neg_idx]
    mask = L.negative_mask(cfg, pos_l, neg_l, neg_valid)
    return L.infonce_loss(cfg, pos_l, neg_l, mask, row_valid.astype(jnp.float32))


def make_case(r=48, rn=48, n_items=20, d=32, dup_heavy=False):
    q = jnp.asarray(RNG.normal(size=(r, d)), jnp.float32)
    table = jnp.asarray(RNG.normal(size=(n_items, d)), jnp.float32)
    table = table.at[0].set(0.0)  # padding row
    pos_idx = jnp.asarray(RNG.integers(1, n_items, size=(r,)), jnp.int32)
    hi = 4 if dup_heavy else n_items  # heavy duplication exercises counts >= 2
    neg_idx = jnp.asarray(RNG.integers(1, hi, size=(rn,)), jnp.int32)
    row_valid = jnp.asarray(RNG.random(r) > 0.25)
    neg_valid = jnp.asarray(RNG.random(rn) > 0.25)
    # invalid rows carry pad positive, like compute_embeds produces
    pos_idx = jnp.where(row_valid, pos_idx, 0)
    return q, table, pos_idx, neg_idx, row_valid, neg_valid


@pytest.mark.parametrize(
    "cfg",
    [
        LossConfig(),
        LossConfig(mask_false_negatives=False),
        LossConfig(scale=5.0),
        LossConfig(mask_false_negatives=False, scale=0.5),
    ],
    ids=["default", "nofn", "scaled", "nofn_scaled"],
)
@pytest.mark.parametrize("dup_heavy", [False, True], ids=["spread", "dups"])
def test_table_kernel_matches_pool_oracle(cfg, dup_heavy):
    q, table, pos_idx, neg_idx, row_valid, neg_valid = make_case(
        dup_heavy=dup_heavy
    )
    expected = reference_pool_loss(
        cfg, q, table, pos_idx, neg_idx, row_valid, neg_valid
    )
    got = fused_table_infonce_loss(
        q, table, pos_idx, neg_idx, row_valid, neg_valid,
        scale=cfg.scale,
        mask_false_negatives=cfg.mask_false_negatives,
        tile_rows=16, interpret=True,
    )
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)


def test_counts_histogram():
    neg_idx = jnp.asarray([0, 1, 1, 3, 3, 3, 5], jnp.int32)
    neg_valid = jnp.asarray([1, 1, 1, 1, 0, 1, 1], jnp.float32)
    counts = neg_pool_counts(neg_idx, neg_valid, 8)
    np.testing.assert_array_equal(
        np.asarray(counts), [0, 2, 0, 2, 0, 1, 0, 0]
    )  # row 0 forced to 0 even though sampled


def test_ragged_padding_paths():
    # R=40 not a tile multiple, N=20 not a multiple of 128
    q, table, pos_idx, neg_idx, row_valid, neg_valid = make_case(r=40, rn=56)
    cfg = LossConfig()
    expected = reference_pool_loss(
        cfg, q, table, pos_idx, neg_idx, row_valid, neg_valid
    )
    got = fused_table_infonce_loss(
        q, table, pos_idx, neg_idx, row_valid, neg_valid,
        tile_rows=16, interpret=True,
    )
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)


@pytest.mark.parametrize("mask_fn", [True, False], ids=["fnmask", "nofnmask"])
def test_gradients_match_pool_formulation(mask_fn):
    """dQ and the DENSE d(table) must equal the pool formulation's gradients
    (whose d(table) is the scatter-add of dP/dN over pos/neg indices)."""
    q, table, pos_idx, neg_idx, row_valid, neg_valid = make_case(
        r=32, rn=32, n_items=12, d=16
    )
    cfg = LossConfig(mask_false_negatives=mask_fn, scale=2.0)

    def ref(q, table):
        return reference_pool_loss(
            cfg, q, table, pos_idx, neg_idx, row_valid, neg_valid
        )

    def fused(q, table):
        return fused_table_infonce_loss(
            q, table, pos_idx, neg_idx, row_valid, neg_valid,
            scale=2.0, mask_false_negatives=mask_fn,
            tile_rows=16, interpret=True,
        )

    g_ref = jax.grad(ref, argnums=(0, 1))(q, table)
    g_fused = jax.grad(fused, argnums=(0, 1))(q, table)
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5)


def _tiny_cfg():
    from transformer_recommenders_tpu.configs import TrainConfig

    return TrainConfig(
        hidden_size=16,
        num_hidden_layers=1,
        num_attention_heads=4,
        intermediate_size=16,
        max_seq_length=4,
        compute_dtype="float32",
        learning_rate=1e-3,
    )


def _tiny_inputs(n_items=30, b=4, s=4):
    from transformer_recommenders_tpu.models.transformer import (
        init_transformer_params,
    )

    cfg = _tiny_cfg()
    params = init_transformer_params(jax.random.key(0), cfg)
    table = RNG.normal(size=(n_items + 1, 16)).astype(np.float32)
    table[0] = 0
    # pos and neg index ranges are DISJOINT: exact duplicates of a row's
    # positive in the shared pool tie exactly in the kernel's one-matmul
    # layout (masked, like the reference) but by 1 ulp in the XLA path's
    # elementwise pos logits — keep the comparison tie-free
    half = n_items // 2
    batch = {
        "history_item_idx": RNG.integers(1, n_items + 1, size=(b, s)).astype(
            np.int32
        ),
        "pos_item_idx": RNG.integers(1, half + 1, size=(b, s)).astype(np.int32),
        "neg_item_idx": RNG.integers(half + 1, n_items + 1, size=(b, s)).astype(
            np.int32
        ),
    }
    return cfg, params, jnp.asarray(table), batch


def _patch_grad_passthrough(monkeypatch):
    """Make the 'updated params' BE the gradients: step-1 AdamW normalizes
    every element to +/-lr, amplifying last-ulp gradient differences into
    sign flips, so the equivalence check compares raw grads instead."""
    from transformer_recommenders_tpu.training import scan_steps as SS
    from transformer_recommenders_tpu.training import train_state as TS

    def passthrough(config):
        return lambda grads, opt_state, params: (grads, opt_state, 0.0)

    monkeypatch.setattr(TS, "make_update_fn", passthrough)
    monkeypatch.setattr(SS, "make_update_fn", passthrough)
    # the flat-carry scan takes the flat-update seam instead
    monkeypatch.setattr(
        TS,
        "make_flat_update",
        lambda config: lambda p, g, opt_state: (g, opt_state, 0.0),
    )


def _patch_table_path(monkeypatch):
    """Force the table-scored branch on CPU: enable the fused gate and run
    the kernel in interpret mode with exact f32 matmuls."""
    from transformer_recommenders_tpu.training import train_state as TS

    monkeypatch.setattr(TS, "_fused_loss_enabled", lambda c: True)
    monkeypatch.setattr(FT, "_MATMUL_DTYPE", jnp.float32)
    orig = FT.fused_table_infonce_loss

    def interp(*args, **kw):
        kw["interpret"] = True
        kw["tile_rows"] = 16
        return orig(*args, **kw)

    monkeypatch.setattr(FT, "fused_table_infonce_loss", interp)


def test_fast_train_step_table_branch_matches_xla(monkeypatch):
    """make_train_step(full_logs=False) must route InfoNCE through the
    table-scored kernel (small catalog) and produce the same loss and
    parameter update as the XLA pool objective."""
    from transformer_recommenders_tpu.training import train_state as TS

    cfg, params, table, batch = _tiny_inputs()
    rng = jax.random.key(3)
    _patch_grad_passthrough(monkeypatch)

    baseline = TS.make_train_step(cfg, full_logs=True)
    s0 = TS.init_train_state(cfg, params)
    s_ref, logs_ref = baseline(s0, table, batch, rng)

    _patch_table_path(monkeypatch)
    assert TS._table_loss_enabled(cfg, table.shape[0], batch["history_item_idx"].size)
    fast = TS.make_train_step(cfg, full_logs=False)
    s_tab, logs_tab = fast(s0, table, batch, rng)

    np.testing.assert_allclose(
        float(logs_tab["loss/InfoNCELoss"]),
        float(logs_ref["loss/InfoNCELoss"]),
        rtol=1e-5,
    )
    # state.params now carries the raw gradients (passthrough update)
    for a, b_ in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_tab.params)):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=5e-4, atol=5e-5
        )


def test_scanned_steps_table_branch_matches_pool(monkeypatch):
    """The scanned dispatcher takes the table branch and matches the
    unpatched XLA scan (losses and final params)."""
    from transformer_recommenders_tpu.training import scan_steps as SS
    from transformer_recommenders_tpu.training import train_state as TS

    cfg, params, table, batch = _tiny_inputs()
    batches = {k: np.stack([v, v]) for k, v in batch.items()}  # K=2
    root = jax.random.key(9)
    _patch_grad_passthrough(monkeypatch)

    scan_ref = SS.make_scanned_train_steps(cfg)
    s_ref, logs_ref = scan_ref(TS.init_train_state(cfg, params), table, batches, root)

    _patch_table_path(monkeypatch)
    scan_tab = SS.make_scanned_train_steps(cfg)
    s_tab, logs_tab = scan_tab(TS.init_train_state(cfg, params), table, batches, root)

    np.testing.assert_allclose(
        np.asarray(logs_tab["loss/InfoNCELoss"]),
        np.asarray(logs_ref["loss/InfoNCELoss"]),
        rtol=1e-4,
    )
    # state.params now carries step-2 gradients (passthrough update)
    for a, b_ in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_tab.params)):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=5e-4, atol=5e-5
        )


def test_precomputed_counts_override():
    """The sharded trainer passes psum-reduced counts; the kernel must use
    them verbatim (a doubled count == the item appearing on two shards)."""
    q, table, pos_idx, neg_idx, row_valid, neg_valid = make_case(
        r=32, rn=16, n_items=12, d=16
    )
    cfg = LossConfig()
    doubled = jnp.concatenate([neg_idx, neg_idx])
    doubled_valid = jnp.concatenate([neg_valid, neg_valid])
    expected = reference_pool_loss(
        cfg, q, table, pos_idx, doubled, row_valid, doubled_valid
    )
    counts = 2.0 * neg_pool_counts(neg_idx, neg_valid, table.shape[0])
    got = fused_table_infonce_loss(
        q, table, pos_idx, neg_idx, row_valid, neg_valid,
        counts=counts, tile_rows=16, interpret=True,
    )
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)
