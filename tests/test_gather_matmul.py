"""Pallas one-hot gather kernel vs jnp.take (values + table gradient)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_recommenders_tpu.ops.gather_matmul import gather_rows

RNG = np.random.default_rng(0)


@pytest.mark.parametrize(
    "n,d,r",
    [(100, 16, 40), (256, 128, 512), (130, 32, 17)],
    ids=["small", "aligned", "ragged"],
)
def test_gather_matches_take(n, d, r):
    table = jnp.asarray(RNG.normal(size=(n, d)), jnp.float32)
    idx = jnp.asarray(RNG.integers(0, n, size=r), jnp.int32)
    got = gather_rows(table, idx, 16, 128, True)
    expected = jnp.take(table.astype(jnp.bfloat16).astype(jnp.float32), idx, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-6)


def test_gather_out_of_range_zero():
    table = jnp.asarray(RNG.normal(size=(32, 8)), jnp.float32)
    idx = jnp.asarray([0, 31, 99, -5], jnp.int32)
    got = np.asarray(gather_rows(table, idx, 16, 128, True))
    assert not np.allclose(got[0], 0)
    np.testing.assert_array_equal(got[2], 0.0)
    np.testing.assert_array_equal(got[3], 0.0)


def test_bf16_out_is_lossless_and_grad_identical():
    """bf16 output carries exactly the same values (rows are already
    bf16-rounded) and the same dtable gradient (the backward rounds the
    cotangent to bf16 for the MXU in both modes)."""
    n, d, r = 100, 32, 56
    table = jnp.asarray(RNG.normal(size=(n, d)), jnp.float32)
    idx = jnp.asarray(RNG.integers(0, n, size=r), jnp.int32)
    f32 = gather_rows(table, idx, 16, 128, True)
    b16 = gather_rows(table, idx, 16, 128, True, jnp.bfloat16)
    assert b16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(f32), np.asarray(b16.astype(jnp.float32))
    )
    g32 = jax.grad(lambda t: (gather_rows(t, idx, 16, 128, True) ** 2).sum())(table)
    g16 = jax.grad(
        lambda t: (
            gather_rows(t, idx, 16, 128, True, jnp.bfloat16).astype(jnp.float32) ** 2
        ).sum()
    )(table)
    np.testing.assert_array_equal(np.asarray(g32), np.asarray(g16))


def test_fit_tile_minimizes_padding():
    """The flagship catalog (4224 rows, tile max 2048) must not pad to 6144
    (+45% MXU work) — 3x1408 covers it exactly."""
    from transformer_recommenders_tpu.ops.gather_matmul import _fit_tile

    assert _fit_tile(4224, 2048, 128) == 1408  # 3 exact tiles
    assert _fit_tile(8192, 2048, 16) == 2048  # 4 exact tiles
    assert _fit_tile(100, 2048, 128) == 128  # single padded tile
    assert _fit_tile(130, 128, 128) == 128  # 2 tiles, 126 pad rows
    for extent, tmax, q in [(4224, 2048, 128), (5000, 2048, 128), (17, 16, 16)]:
        t = _fit_tile(extent, tmax, q)
        assert t <= tmax and t % q == 0
        steps = -(-extent // t)
        assert steps * t - extent < t  # padding under one tile


def test_gather_gradient_scatter_add():
    n, d, r = 48, 16, 64
    table = jnp.asarray(RNG.normal(size=(n, d)), jnp.float32)
    idx = jnp.asarray(RNG.integers(0, n, size=r), jnp.int32)  # duplicates likely

    def loss_kernel(t):
        return jnp.sum(gather_rows(t, idx, 16, 128, True) ** 2)

    def loss_ref(t):
        tb = t.astype(jnp.bfloat16).astype(jnp.float32)
        return jnp.sum(jnp.take(tb, idx, axis=0) ** 2)

    g_kernel = jax.grad(loss_kernel)(table)
    g_ref = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(
        np.asarray(g_kernel), np.asarray(g_ref), rtol=2e-2, atol=1e-3
    )
    # rows never gathered get zero grad
    unused = sorted(set(range(n)) - set(np.asarray(idx).tolist()))
    if unused:
        np.testing.assert_array_equal(np.asarray(g_kernel)[unused], 0.0)
