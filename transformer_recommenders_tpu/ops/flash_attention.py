"""Fused causal-attention Pallas TPU kernel (the ``use_pallas_attention``
path of the encoder).

Replaces the reference's torch SDPA inside HF BERT
(``xfmr_rec/models.py:306-345`` via ATen, SURVEY.md §2.2 row 3) for the
shapes this framework targets (seq <= 128, BASELINE.json config #4): the
(S, S) per-head score matrices of one batch element fit VMEM, so one
program fuses QK^T -> bias -> softmax -> dropout -> PV across ALL heads
with the probability matrices never touching HBM.  XLA's unfused path
materializes (B, H, S, S) f32 scores + probs between its two matmuls, and
with attention dropout additionally generates + stores a (B, H, S, S)
random mask in HBM — measured 2.5x the no-dropout step cost at config #4.
Here dropout is a counter-based hash evaluated in-register.

Layout: the WIDE (head-masked) formulation — heads are stacked along the
matmul ROW dimension, never the contraction: per element the kernel builds
``qw = (H*S, D)`` rows ``(h, s) = q[s] * channel-mask(h)`` in VMEM and
computes ALL heads' scores with ONE ``(H*S, D) @ (D, S)`` matmul whose
contraction stays D=128 lanes deep (a per-head ``(S, Dh)`` slice layout
underfills the MXU at Dh=16-32 and measured 1.5x slower than XLA; the 5-D
head-split relayout of the classic layout costs ~0.7 ms/step at the
flagship size — BASELINE.md).  The head recombination is a per-head
masked sum (channel c belongs to exactly one head, so the sum is a
select — exact).  ``qw``/probs/ctx exist only in VMEM; the XLA paths
materialize all three in HBM every layer (~1.5 ms/step marginal at the
flagship shape, scripts/ablate_marginal.py).

Grid = (B/block,): batch-blocked with a static loop over elements.
(An earlier (B*H,)-grid variant spent more time on per-program overhead
than compute — 1024 tiny programs at config #4; see BASELINE.md.)

Backward recomputes probs from the saved q/k/v (flash-attention style:
cheap MXU FLOPs for HBM bandwidth) in a second kernel producing dq/dk/dv;
``dk``/``dv`` come out of single full-depth ``(S, H*S) @ (H*S, D)``
contractions.

The dropout keep-mask is regenerated bit-identically in the backward from
the same seed (verified by finite differences in
``tests/test_flash_attention.py``); its STREAM differs from
``jax.random.bernoulli`` (different PRNG), which is immaterial — dropout
only needs the right marginal rate.

Numerics with dropout off are identical to the XLA ``_attention`` in
``models/transformer.py`` (same -1e9 additive masking, f32 softmax, probs
cast to the compute dtype for the PV matmul); equivalence + grads are
tested in interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transformer_recommenders_tpu.ops.fused_infonce import _maybe_interpret

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
    the backward pass regenerates the IDENTICAL mask from the same seed
    with no state to thread, and the bits are bit-identical between
    compiled Mosaic and the TPU interpreter (whose prng primitive is a
    stub), so CPU tests exercise the real dropout math.
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


def _elem_probs(qw, k, bias_w, seed_ref, stream, *, scale, dropout_rate):
    """(probs, dropped, keep) for one element's wide (H*S, D) qw."""
    scores = jnp.dot(qw, k.T, preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores + bias_w, axis=-1)
    if dropout_rate > 0.0:
        keep = _dropout_keep(seed_ref, stream, scores.shape, dropout_rate)
        dropped = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
        return probs, dropped, keep
    return probs, probs, None


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, seed_ref, out_ref,
                *, num_heads: int, scale: float, causal: bool,
                dropout_rate: float):
    bt, s, d = q_ref.shape
    base = pl.program_id(0) * bt
    hmask = _hmask(num_heads, s, d, q_ref.dtype)
    for b in range(bt):
        bias = _bias(mask_ref[b : b + 1], s, causal)
        # non-causal bias is (1, S) and broadcasts against (H*S, S)
        bias_w = _wide(bias, num_heads) if bias.shape[0] == s else bias
        k, v = k_ref[b], v_ref[b]
        qw = _wide(q_ref[b], num_heads) * hmask  # (H*S, D)
        _, dropped, _ = _elem_probs(
            qw, k, bias_w, seed_ref, base + b, scale=scale,
            dropout_rate=dropout_rate,
        )
        ctx_w = jnp.dot(
            dropped.astype(v.dtype), v, preferred_element_type=jnp.float32
        )  # (H*S, D) — head h's rows only valid on its own channels
        out_ref[b] = _combine(ctx_w, hmask.astype(jnp.float32), s, num_heads
                              ).astype(out_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, seed_ref, g_ref,
                dq_ref, dk_ref, dv_ref,
                *, num_heads: int, scale: float, causal: bool,
                dropout_rate: float):
    bt, s, d = q_ref.shape
    base = pl.program_id(0) * bt
    hmask = _hmask(num_heads, s, d, q_ref.dtype)
    hmask_f = hmask.astype(jnp.float32)
    for b in range(bt):
        bias = _bias(mask_ref[b : b + 1], s, causal)
        # non-causal bias is (1, S) and broadcasts against (H*S, S)
        bias_w = _wide(bias, num_heads) if bias.shape[0] == s else bias
        k, v = k_ref[b], v_ref[b]
        qw = _wide(q_ref[b], num_heads) * hmask
        probs, dropped, keep = _elem_probs(
            qw, k, bias_w, seed_ref, base + b, scale=scale,
            dropout_rate=dropout_rate,
        )
        # d(ctx_w) = g expanded to wide rows, masked to the owning head
        gw = (_wide(g_ref[b], num_heads).astype(jnp.float32) * hmask_f).astype(
            v.dtype
        )
        # out = combine(D(P) @ V); gw's masking makes both reductions land
        # each channel on its owning head — full H*S-deep contractions
        dv_ref[b] = jnp.dot(
            dropped.T.astype(gw.dtype), gw, preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)
        d_dropped = jnp.dot(gw, v.T, preferred_element_type=jnp.float32)
        if keep is not None:
            d_probs = jnp.where(keep, d_dropped / (1.0 - dropout_rate), 0.0)
        else:
            d_probs = d_dropped
        # softmax backward: dS = P * (dP - rowsum(dP * P))
        d_scores = probs * (
            d_probs - jnp.sum(d_probs * probs, axis=-1, keepdims=True)
        )
        d_scores = (d_scores * scale).astype(q_ref.dtype)
        dq_w = jnp.dot(d_scores, k, preferred_element_type=jnp.float32)
        dq_ref[b] = _combine(dq_w, hmask_f, s, num_heads).astype(dq_ref.dtype)
        dk_ref[b] = jnp.dot(
            d_scores.T, qw, preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype)


def _specs(s: int, d: int, bt: int):
    qkv = pl.BlockSpec((bt, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    # mask rides as (B, 1, S) with (bt, 1, S) blocks: Mosaic requires the
    # last two block dims to be (8k, 128k) or equal to the array dims
    mask = pl.BlockSpec((bt, 1, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    return qkv, mask, seed


def _pick_block_batch(b: int, s: int, d: int, num_heads: int) -> int:
    """Batch elements per grid step: enough to amortize per-iteration grid
    overhead (dominant at small S — an unblocked (B*H,) variant measured
    2x slower than XLA from overhead alone), bounded by a 12 MB VMEM
    budget across the q/k/v/g/dq/dk/dv blocks plus the per-element wide
    transients (qw/gw bf16 + probs-family f32 + ctx f32) of the backward
    kernel."""
    budget = 12_000_000
    hs = num_heads * s
    wide = 2 * hs * d * 2 + 4 * hs * s * 4 + hs * d * 4
    per_elem = 7 * s * d * 4 + wide
    bt = max(1, budget // per_elem)
    bt = 1 << (bt.bit_length() - 1)
    while b % bt:
        bt //= 2
    return max(bt, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _flash_attention(q, k, v, key_mask, seed,
                     num_heads: int, scale: float, causal: bool,
                     dropout_rate: float, interpret: bool, block_batch: int):
    return _fwd_call(
        q, k, v, key_mask, seed, num_heads, scale, causal, dropout_rate,
        interpret, block_batch,
    )


def _fwd_call(q, k, v, key_mask, seed, num_heads, scale, causal, dropout_rate,
              interpret, block_batch):
    b, s, d = q.shape
    qkv_spec, mask_spec, seed_spec = _specs(s, d, block_batch)
    with _maybe_interpret(interpret):
        return pl.pallas_call(
            functools.partial(
                _fwd_kernel, num_heads=num_heads, scale=scale, causal=causal,
                dropout_rate=dropout_rate,
            ),
            grid=(b // block_batch,),
            in_specs=[qkv_spec, qkv_spec, qkv_spec, mask_spec, seed_spec],
            out_specs=qkv_spec,
            out_shape=jax.ShapeDtypeStruct((b, s, d), jnp.float32),
        )(q, k, v, key_mask, seed)


def _vjp_fwd(q, k, v, key_mask, seed, num_heads, scale, causal, dropout_rate,
             interpret, block_batch):
    out = _fwd_call(
        q, k, v, key_mask, seed, num_heads, scale, causal, dropout_rate,
        interpret, block_batch,
    )
    return out, (q, k, v, key_mask, seed)


def _vjp_bwd(num_heads, scale, causal, dropout_rate, interpret, block_batch,
             residuals, g):
    q, k, v, key_mask, seed = residuals
    b, s, d = q.shape
    qkv_spec, mask_spec, seed_spec = _specs(s, d, block_batch)
    with _maybe_interpret(interpret):
        dq, dk, dv = pl.pallas_call(
            functools.partial(
                _bwd_kernel, num_heads=num_heads, scale=scale, causal=causal,
                dropout_rate=dropout_rate,
            ),
            grid=(b // block_batch,),
            in_specs=[qkv_spec, qkv_spec, qkv_spec, mask_spec, seed_spec, qkv_spec],
            out_specs=[qkv_spec, qkv_spec, qkv_spec],
            out_shape=[
                jax.ShapeDtypeStruct((b, s, d), jnp.float32),
                jax.ShapeDtypeStruct((b, s, d), jnp.float32),
                jax.ShapeDtypeStruct((b, s, d), jnp.float32),
            ],
        )(q, k, v, key_mask, seed, g.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None, None


_flash_attention.defvjp(_vjp_fwd, _vjp_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array,
    *,
    num_heads: int,
    scale: float,
    causal: bool = True,
    dropout_rate: float = 0.0,
    dropout_seed: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused multi-head attention.

    Args:
        q, k, v: ``(B, S, D)`` arrays with heads packed in the last dim
            (``D = num_heads * Dh``, the natural qkv-projection layout —
            no head transpose needed).  Any float dtype; matmuls
            accumulate f32 like the XLA path.
        key_mask: ``(B, S)`` bool/int validity of key positions.
        num_heads: head count (``D`` must divide evenly).
        scale: score multiplier (``1/sqrt(Dh)``).
        causal: lower-triangular masking (reference ``is_decoder=True``).
        dropout_rate: attention-probability dropout, applied in-kernel.
        dropout_seed: int32 scalar; required when ``dropout_rate > 0``.

    Returns:
        ``(B, S, D)`` float32 context (pre output-projection).
    """
    b, s, d = q.shape
    if d % num_heads:
        msg = f"hidden {d} not divisible by num_heads {num_heads}"
        raise ValueError(msg)
    if dropout_rate > 0.0 and dropout_seed is None:
        msg = "dropout_rate > 0 requires dropout_seed"
        raise ValueError(msg)
    mask = key_mask.astype(jnp.int32).reshape(b, 1, s)
    seed = jnp.asarray(
        dropout_seed if dropout_seed is not None else 0, jnp.int32
    ).reshape(1)
    bt = _pick_block_batch(b, s, d, num_heads)
    return _flash_attention(
        q, k, v, mask, seed,
        num_heads, scale, causal, float(dropout_rate), interpret, bt,
    )
