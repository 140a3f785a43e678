"""Fused causal-attention kernel tests (interpret mode on CPU).

VERDICT round-1 item #4: ``use_pallas_attention`` must be a real kernel.
Equivalence target is the XLA ``_attention`` math in
``models/transformer.py`` (same -1e9 masking, f32 softmax).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_recommenders_tpu.ops.flash_attention import flash_attention

RNG = np.random.default_rng(0)


def xla_attention(q, k, v, key_mask, *, scale, causal, probs_dtype=jnp.float32):
    """The reference XLA math from models/transformer.py::_attention."""
    scores = jnp.einsum(
        "bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32
    ) * scale
    bias = jnp.where(key_mask[:, None, None, :], 0.0, -1e9)
    if causal:
        s = q.shape[2]
        tri = jnp.tril(jnp.ones((s, s), jnp.bool_))
        bias = bias + jnp.where(tri[None, None], 0.0, -1e9)
    probs = jax.nn.softmax(scores + bias, axis=-1)
    return jnp.einsum(
        "bhst,bhtd->bhsd", probs.astype(probs_dtype), v,
        preferred_element_type=jnp.float32,
    )


def _make(b=2, h=3, s=16, dh=8, n_pad=0):
    """(B, S, D) packed-head tensors + the (B, H, S, Dh) views for the
    XLA reference einsum."""
    q = RNG.normal(size=(b, s, h * dh)).astype(np.float32)
    k = RNG.normal(size=(b, s, h * dh)).astype(np.float32)
    v = RNG.normal(size=(b, s, h * dh)).astype(np.float32)
    mask = np.ones((b, s), bool)
    if n_pad:
        mask[:, -n_pad:] = False
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask)


def _heads(x, h):
    b, s, d = x.shape
    return x.reshape(b, s, h, d // h).transpose(0, 2, 1, 3)


def _unheads(x):
    b, h, s, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * dh)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("n_pad", [0, 5])
def test_forward_matches_xla(causal, n_pad):
    h = 3
    q, k, v, mask = _make(h=h, n_pad=n_pad)
    scale = 1.0 / np.sqrt(q.shape[-1] // h)
    out = flash_attention(
        q, k, v, mask, num_heads=h, scale=scale, causal=causal, interpret=True
    )
    ref = _unheads(xla_attention(
        _heads(q, h), _heads(k, h), _heads(v, h), mask, scale=scale, causal=causal
    ))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_forward_config4_shape():
    """BASELINE.json config #4: seq 128, d=256 -> 8 heads x 32."""
    h = 8
    q, k, v, mask = _make(b=2, h=h, s=128, dh=32, n_pad=17)
    scale = 1.0 / np.sqrt(32)
    out = flash_attention(
        q, k, v, mask, num_heads=h, scale=scale, causal=True, interpret=True
    )
    ref = _unheads(xla_attention(
        _heads(q, h), _heads(k, h), _heads(v, h), mask, scale=scale, causal=True
    ))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_grads_match_xla():
    h = 3
    q, k, v, mask = _make(h=h, n_pad=3)
    scale = 1.0 / np.sqrt(q.shape[-1] // h)
    w = jnp.asarray(RNG.normal(size=q.shape).astype(np.float32))

    def loss_pallas(q, k, v):
        out = flash_attention(
            q, k, v, mask, num_heads=h, scale=scale, causal=True, interpret=True
        )
        return jnp.sum(out * w)

    def loss_xla(q, k, v):
        out = _unheads(xla_attention(
            _heads(q, h), _heads(k, h), _heads(v, h), mask, scale=scale, causal=True
        ))
        return jnp.sum(out * w)

    g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_pallas, g_xla, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_dropout_rate_and_determinism():
    q, k, v, mask = _make(b=1, h=2, s=32, dh=8)
    scale = 1.0 / np.sqrt(8)
    fn = functools.partial(
        flash_attention, q, k, v, mask, num_heads=2, scale=scale, causal=False,
        interpret=True,
    )
    base = fn()
    d1 = fn(dropout_rate=0.4, dropout_seed=jnp.int32(7))
    d2 = fn(dropout_rate=0.4, dropout_seed=jnp.int32(7))
    d3 = fn(dropout_rate=0.4, dropout_seed=jnp.int32(8))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))  # same seed
    assert not np.allclose(np.asarray(d1), np.asarray(d3))  # different seed
    assert not np.allclose(np.asarray(d1), np.asarray(base))  # dropout acted
    # unbiasedness: E[dropped probs] = probs -> outputs agree in expectation
    many = np.mean(
        [np.asarray(fn(dropout_rate=0.4, dropout_seed=jnp.int32(s)))
         for s in range(40)],
        axis=0,
    )
    np.testing.assert_allclose(many, np.asarray(base), atol=0.25)


def test_dropout_grads_consistent_with_forward():
    """Finite differences: the custom VJP must regenerate the SAME dropout
    mask the forward used (fixed seed -> f is deterministic/differentiable)."""
    q, k, v, mask = _make(b=1, h=1, s=8, dh=8)
    scale = 1.0 / np.sqrt(8)
    w = jnp.asarray(RNG.normal(size=q.shape).astype(np.float32))
    seed = jnp.int32(13)

    def f(q_):
        out = flash_attention(
            q_, k, v, mask, num_heads=1, scale=scale, causal=True,
            dropout_rate=0.3, dropout_seed=seed, interpret=True,
        )
        return jnp.sum(out * w)

    g = jax.grad(f)(q)
    direction = jnp.asarray(RNG.normal(size=q.shape).astype(np.float32))
    eps = 1e-3
    fd = (f(q + eps * direction) - f(q - eps * direction)) / (2 * eps)
    analytic = jnp.sum(g * direction)
    np.testing.assert_allclose(float(fd), float(analytic), rtol=2e-2, atol=1e-3)


def test_encoder_uses_kernel_when_enabled(monkeypatch):
    """transformer_encode with use_pallas_attention (interpret) ==
    the XLA path bit-for-bit modulo float tolerance."""
    from transformer_recommenders_tpu.configs import ModelConfig
    from transformer_recommenders_tpu.models import transformer as T

    cfg = ModelConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=32, max_seq_length=16, compute_dtype="float32",
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    params = T.init_transformer_params(jax.random.key(0), cfg)
    x = jnp.asarray(RNG.normal(size=(3, 16, 32)).astype(np.float32))
    x = x.at[1, 10:].set(0.0)  # padded tail (mask derived from zeros)

    ref = T.transformer_encode(params, cfg, x)

    cfg_p = cfg.model_copy(update={"use_pallas_attention": True})
    monkeypatch.setattr(T, "_pallas_attention_mode", lambda c: "interpret")
    out = T.transformer_encode(params, cfg_p, x)

    np.testing.assert_allclose(
        np.asarray(out["sentence_embedding"]),
        np.asarray(ref["sentence_embedding"]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["token_embeddings"]),
        np.asarray(ref["token_embeddings"]),
        rtol=1e-5, atol=1e-5,
    )


def test_mode_gate():
    from transformer_recommenders_tpu.configs import ModelConfig
    from transformer_recommenders_tpu.models.transformer import (
        _pallas_attention_mode,
    )

    assert _pallas_attention_mode(ModelConfig(use_pallas_attention=False)) is None
    # CPU backend (tests force cpu) -> kernel disabled even when requested
    assert _pallas_attention_mode(ModelConfig(use_pallas_attention=True)) is None
