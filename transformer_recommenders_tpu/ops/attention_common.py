"""Shared attention-kernel building blocks for the megafusion layer
(``ops/fused_layer.py``): additive bias, the wide (head-masked) layout
helpers, and the counter-based dropout keep mask.

History: these started life in a standalone fused-attention kernel
(``use_pallas_attention``).  That kernel was measured and retired in
round 3 — it lost to the tuned XLA attention at every benched shape
(11.84/12.39 vs 7.90 ms at config #4; BASELINE.md round-2 attention
table), and its useful ideas now live INSIDE the megafusion layer
kernel: the lane-packed wide layout for s <= 64
(``fused_layer._attention_wide_packed``; the per-head tall layout for
64 < s <= 128 was retired in round 4 — it lost to XLA at every feasible
shape).  Replacing torch SDPA-in-BertLayer
(``xfmr_rec/models.py:306-345``) is the megafusion layer's job.

The WIDE layout: heads are stacked along the matmul ROW dimension, never
the contraction — per element ``qw = (H*S, D)`` rows ``(h, s) = q[s] *
channel-mask(h)`` so ALL heads' scores come from ONE ``(H*S, D) @ (D, S)``
matmul whose contraction stays D lanes deep.  Recombination is a per-head
masked sum (each channel belongs to exactly one head, so the sum is a
select — exact).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e9  # matches models/transformer.py masking


def _bias(mask_row, s: int, causal: bool) -> jax.Array:
    """(S, S) additive bias: key padding + causal, like the XLA path."""
    key_valid = mask_row[0, 0, :] > 0  # (S,)
    bias = jnp.where(key_valid[None, :], 0.0, _NEG_INF)
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        bias = bias + jnp.where(rows >= cols, 0.0, _NEG_INF)
    return bias


def _dropout_keep(seed_ref, stream: jax.Array, shape, rate: float) -> jax.Array:
    """Deterministic keep mask from a counter-based hash (murmur3 fmix32
    avalanche over element index x seed x stream).

    Counter-based rather than ``pltpu.prng_random_bits`` for two reasons:
    a backward pass regenerates the IDENTICAL mask from the same seed with
    no state to thread, and the bits are bit-identical between compiled
    Mosaic and the TPU interpreter (whose prng primitive is a stub), so
    CPU tests exercise the real dropout math.
    """
    from transformer_recommenders_tpu.ops.hash_dropout import (
        PREMIX_IDX,
        PREMIX_SEED,
        PREMIX_STREAM,
        fmix32,
        keep_threshold,
    )

    s0, s1 = shape
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 0) * s1
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    ).astype(jnp.uint32)
    h = idx * jnp.uint32(PREMIX_IDX)
    h = h + seed_ref[0].astype(jnp.uint32) * jnp.uint32(PREMIX_SEED)
    h = h + (stream.astype(jnp.uint32) + jnp.uint32(1)) * jnp.uint32(PREMIX_STREAM)
    return fmix32(h) >= keep_threshold(rate)


def _hmask(num_heads: int, s: int, d: int, dtype) -> jax.Array:
    """(H*S, D) 0/1 channel-ownership mask: row (h, s) keeps head h's
    channels.  Rows within a head block are identical."""
    hs = num_heads * s
    dh = d // num_heads
    row_head = jax.lax.broadcasted_iota(jnp.int32, (hs, d), 0) // s
    col_head = jax.lax.broadcasted_iota(jnp.int32, (hs, d), 1) // dh
    return (row_head == col_head).astype(dtype)


def _wide(x: jax.Array, num_heads: int) -> jax.Array:
    """Tile (S, N) -> (H*S, N): head h's block is a copy of x."""
    return jnp.concatenate([x] * num_heads, axis=0)


def _combine(x_wide: jax.Array, hmask: jax.Array, s: int, num_heads: int):
    """(H*S, D) -> (S, D): select each channel's owning head (exact — the
    channel mask makes the sum a select)."""
    acc = x_wide[:s, :] * hmask[:1, :]
    for h in range(1, num_heads):
        acc = acc + x_wide[h * s : (h + 1) * s, :] * hmask[h * s : h * s + 1, :]
    return acc
