"""Fused InfoNCE Pallas kernel vs the XLA reference implementation.

Runs in Pallas interpret mode on CPU (kernels compile for real on TPU);
checks values and gradients for all mask/scale/padding configurations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_recommenders_tpu.configs import LossConfig
from transformer_recommenders_tpu.ops import losses as L
from transformer_recommenders_tpu.ops import fused_infonce as FI
from transformer_recommenders_tpu.ops.fused_infonce import fused_infonce_loss

RNG = np.random.default_rng(0)


@pytest.fixture(autouse=True)
def exact_matmul(monkeypatch):
    """Pin the kernel's MXU input dtype to f32 so values match the f32 XLA
    oracle exactly; production default is bf16 (tested separately below)."""
    monkeypatch.setattr(FI, "_MATMUL_DTYPE", jnp.float32)


def reference_loss(cfg, q, p, n, row_valid, neg_valid):
    return L.compute_losses(
        cfg, q, p, n, row_valid, neg_valid, loss_names=("InfoNCELoss",)
    )["InfoNCELoss"]


def make_case(r=48, rn=48, d=32):
    q = jnp.asarray(RNG.normal(size=(r, d)), jnp.float32)
    p = jnp.asarray(RNG.normal(size=(r, d)), jnp.float32)
    n = jnp.asarray(RNG.normal(size=(rn, d)), jnp.float32)
    row_valid = jnp.asarray(RNG.random(r) > 0.25)
    neg_valid = jnp.asarray(RNG.random(rn) > 0.25)
    return q, p, n, row_valid, neg_valid


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
def test_fused_matches_reference(cfg):
    q, p, n, row_valid, neg_valid = make_case()
    expected = reference_loss(cfg, q, p, n, row_valid, neg_valid)
    got = fused_infonce_loss(
        q, p, n, row_valid, neg_valid,
        scale=cfg.scale,
        mask_false_negatives=cfg.mask_false_negatives,
        tile_rows=16, tile_cols=16, interpret=True,
    )
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)


def test_fused_with_ragged_padding():
    # R=40, Rn=56 not multiples of the tiles -> internal padding paths
    q, p, n, row_valid, neg_valid = make_case(r=40, rn=56)
    cfg = LossConfig()
    expected = reference_loss(cfg, q, p, n, row_valid, neg_valid)
    got = fused_infonce_loss(
        q, p, n, row_valid, neg_valid, tile_rows=16, tile_cols=16, interpret=True
    )
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)


@pytest.mark.parametrize("mask_fn", [True, False], ids=["fnmask", "nofnmask"])
def test_fused_gradients_match(mask_fn):
    q, p, n, row_valid, neg_valid = make_case(r=32, rn=32, d=16)
    cfg = LossConfig(mask_false_negatives=mask_fn, scale=2.0)

    def ref(q, p, n):
        return reference_loss(cfg, q, p, n, row_valid, neg_valid)

    def fused(q, p, n):
        return fused_infonce_loss(
            q, p, n, row_valid, neg_valid,
            scale=2.0, mask_false_negatives=mask_fn,
            tile_rows=16, tile_cols=16, interpret=True,
        )

    g_ref = jax.grad(ref, argnums=(0, 1, 2))(q, p, n)
    g_fused = jax.grad(fused, argnums=(0, 1, 2))(q, p, n)
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5)


def test_bf16_matmul_within_tolerance(monkeypatch):
    """Production bf16 MXU inputs stay within mixed-precision tolerance of
    the f32 oracle (the reference itself trains bf16-mixed)."""
    monkeypatch.setattr(FI, "_MATMUL_DTYPE", jnp.bfloat16)
    q, p, n, row_valid, neg_valid = make_case(r=32, rn=32, d=16)
    cfg = LossConfig()
    expected = float(reference_loss(cfg, q, p, n, row_valid, neg_valid))
    got = float(
        fused_infonce_loss(
            q, p, n, row_valid, neg_valid, tile_rows=16, tile_cols=128,
            interpret=True,
        )
    )
    assert abs(got - expected) / abs(expected) < 0.05


def test_fused_all_negatives_masked():
    # a row whose positive dominates every negative: CE -> log(1) = 0 term
    d = 16
    q = jnp.ones((16, d), jnp.float32)
    p = jnp.ones((16, d), jnp.float32) * 2  # pos logit = 32
    n = jnp.zeros((16, d), jnp.float32)  # neg logits = 0 < 32 -> kept
    row_valid = jnp.ones(16, bool)
    neg_valid = jnp.ones(16, bool)
    got = fused_infonce_loss(
        q, p, n, row_valid, neg_valid, tile_rows=16, tile_cols=16, interpret=True
    )
    cfg = LossConfig()
    expected = reference_loss(cfg, q, p, n, row_valid, neg_valid)
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)
