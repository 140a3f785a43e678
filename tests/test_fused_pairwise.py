"""Fused pairwise/CCL kernel vs the XLA loss heads (values + grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_recommenders_tpu.configs import LossConfig
from transformer_recommenders_tpu.ops import fused_infonce as FI
from transformer_recommenders_tpu.ops import losses as L
from transformer_recommenders_tpu.ops.fused_pairwise import fused_pairwise_loss

# heads whose FULL loss is the kernel's pool reduction (NCELoss adds a
# positive BCE term outside the kernel — tested via _fused_objective below)
POOL_HEADS = ("ContrastiveLoss", "PairwiseHingeLoss", "PairwiseLogisticLoss")

RNG = np.random.default_rng(0)


@pytest.fixture(autouse=True)
def exact_matmul(monkeypatch):
    monkeypatch.setattr(FI, "_MATMUL_DTYPE", jnp.float32)


def make_case(r=48, rn=48, d=32):
    q = jnp.asarray(RNG.normal(size=(r, d)), jnp.float32)
    p = jnp.asarray(RNG.normal(size=(r, d)), jnp.float32)
    n = jnp.asarray(RNG.normal(size=(rn, d)), jnp.float32)
    rv = jnp.asarray(RNG.random(r) > 0.25)
    nv = jnp.asarray(RNG.random(rn) > 0.25)
    return q, p, n, rv, nv


def reference(cfg, name, q, p, n, rv, nv):
    return L.compute_losses(cfg, q, p, n, rv, nv, loss_names=(name,))[name]


def _norm(x):
    return x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), min=1e-8)


@pytest.mark.parametrize("head", POOL_HEADS)
@pytest.mark.parametrize("margin", [0.0, 0.5], ids=["m0", "m05"])
@pytest.mark.parametrize("mask_fn", [True, False], ids=["fn", "nofn"])
def test_fused_pairwise_matches_reference(head, margin, mask_fn):
    q, p, n, rv, nv = make_case()
    cfg = LossConfig(margin=margin, mask_false_negatives=mask_fn)
    expected = reference(cfg, head, q, p, n, rv, nv)
    if head == "ContrastiveLoss":  # cosine head: normalize before the kernel
        q2, p2, n2 = _norm(q), _norm(p), _norm(n)
    else:
        q2, p2, n2 = q, p, n
    got = fused_pairwise_loss(
        q2, p2, n2, rv, nv,
        head=head, margin=margin, mask_false_negatives=mask_fn,
        tile_rows=16, tile_cols=128, interpret=True,
    )
    np.testing.assert_allclose(float(got), float(expected), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("head", POOL_HEADS)
def test_fused_pairwise_gradients(head):
    q, p, n, rv, nv = make_case(r=32, rn=32, d=16)
    cfg = LossConfig(margin=0.3)

    def ref(q, p, n):
        if head == "ContrastiveLoss":
            return reference(cfg, head, q, p, n, rv, nv)
        return reference(cfg, head, q, p, n, rv, nv)

    def fused(q, p, n):
        if head == "ContrastiveLoss":
            q, p, n = _norm(q), _norm(p), _norm(n)
        return fused_pairwise_loss(
            q, p, n, rv, nv, head=head, margin=0.3,
            tile_rows=16, tile_cols=128, interpret=True,
        )

    g_ref = jax.grad(ref, argnums=(0, 1, 2))(q, p, n)
    g_fused = jax.grad(fused, argnums=(0, 1, 2))(q, p, n)
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5
        )


@pytest.mark.parametrize(
    "name",
    ["NCELoss", "AlignmentLoss", "AlignmentContrastiveLoss",
     "ContrastiveLoss", "PairwiseHingeLoss", "PairwiseLogisticLoss"],
)
def test_fused_objective_helper_matches_reference(name, monkeypatch):
    """The _fused_objective composition (kernel pool term + XLA row terms)
    matches the XLA loss heads for every remaining loss."""
    import jax.numpy as jnp

    from transformer_recommenders_tpu.configs import TrainConfig
    from transformer_recommenders_tpu.training import train_state as TS

    q, p, n, rv, nv = make_case()
    cfg = TrainConfig(
        train_loss=name, margin=0.3, compute_dtype="float32",
        hidden_size=32, num_attention_heads=4,
    )
    expected = reference(LossConfig(margin=0.3), name, q, p, n, rv, nv)
    monkeypatch.setattr(TS, "_fused_loss_enabled", lambda c: True)
    embeds = {
        "query": q, "pos_embed": p, "neg_pool": n,
        "row_valid": rv, "neg_valid": nv,
    }
    # interpret-mode kernels on CPU: patch fused_pairwise_loss to interpret
    import transformer_recommenders_tpu.ops.fused_pairwise as FP

    orig = FP.fused_pairwise_loss

    def interp(*args, **kw):
        kw["interpret"] = True
        kw["tile_rows"], kw["tile_cols"] = 16, 128
        return orig(*args, **kw)

    monkeypatch.setattr(FP, "fused_pairwise_loss", interp)
    got = TS._fused_objective(cfg, embeds)
    assert got is not None
    np.testing.assert_allclose(float(got), float(expected), rtol=2e-5, atol=2e-5)


def test_default_tiles_cap_for_scale_pools():
    """Pools past 16k rows must drop to 2048-column tiles: the f32 (1, rn)
    row vectors the backward streams grow with the pool, and the 4096-tile
    dq/dp kernel measured 16.54 MB of scoped VMEM (548 KB past the 16 MB
    limit) at rn=32768 — the ML-25M config at B=256."""
    from transformer_recommenders_tpu.ops.fused_infonce import _default_tiles

    tr, tc = _default_tiles(256, 8192)   # config-4 bench shape (B=64)
    assert tc == 4096                    # fat tiles keep winning here
    tr, tc = _default_tiles(256, 32768)  # ML-25M fit shape (B=256)
    assert tc == 2048
    tr, tc = _default_tiles(256, 65536)
    assert tc == 2048
