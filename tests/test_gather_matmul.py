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
