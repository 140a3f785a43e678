"""The counter-based dropout hash shared by every dropout site.

One murmur3-fmix32 avalanche is used by the XLA path
(``models/transformer._dropout``), the fused-layer kernel
(``ops/fused_layer._keep``) and the attention kernel
(``ops/attention_common._dropout_keep``).  The fused/XLA dropout-stream
bit-identity guarantee (tests/test_fused_layer.py) depends on all sites
computing the SAME function of (element index, seed) — this module is the
single source of truth so an edit cannot silently split the streams.

Why a counter hash instead of ``jax.random.bernoulli``: the threefry bit
tensor is a separate custom-call whose output XLA materializes (and
relayouts) in HBM — traced at >1 ms/step on the (B, H, S, S) attention
probs at the flagship size — while this is pure elementwise VPU work that
fuses in XLA and runs in-register in Pallas; the backward regenerates the
identical mask with no state to thread; and the bits are identical between
compiled Mosaic and the TPU interpreter (whose prng primitive is a stub),
so CPU tests exercise the real dropout math.  The stream differs from
``jax.random`` (immaterial — the reference's torch stream never matched
either); statistical quality is pinned by tests/test_hash_dropout.py.
"""

from __future__ import annotations

import jax.numpy as jnp

# premix multipliers (golden-ratio / murmur constants); sites combine their
# counters as idx*PREMIX_IDX + seed*PREMIX_SEED (+ stream terms)
PREMIX_IDX = 0x9E3779B1
PREMIX_SEED = 0x85EBCA77
PREMIX_STREAM = 0xC2B2AE3D


def fmix32(h: jnp.ndarray) -> jnp.ndarray:
    """murmur3's 32-bit finalizer (full avalanche) on a uint32 tensor."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def keep_threshold(rate: float) -> jnp.ndarray:
    """uint32 threshold such that P[fmix32(...) >= threshold] = 1 - rate."""
    return jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
