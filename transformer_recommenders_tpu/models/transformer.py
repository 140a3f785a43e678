"""Pure-functional causal transformer encoder over item-embedding sequences.

TPU-first re-design of the reference model stack (HF ``BertModel`` wrapped in
a SentenceTransformer, ``xfmr_rec/models.py:51-173``):

- params are a plain pytree (dict) — trivially shardable with NamedSharding
  and friendly to ``jax.jit`` / ``pjit`` / ``shard_map``;
- fused QKV projection (one (D, 3D) matmul) keeps the MXU busy;
- matmuls run in ``compute_dtype`` (bfloat16 by default) with float32
  accumulation (``preferred_element_type``); layer-norm and softmax run in
  float32 for stability;
- no data-dependent Python control flow — everything traces once.

Semantics parity with the reference forward path (``xfmr_rec/models.py:306-345``
driving HF BERT with ``inputs_embeds``):
- learned absolute position embeddings added to inputs, then LayerNorm+dropout
  (BERT embedding layer; token-type embeddings are a constant with
  vocab_size=1 inputs so they fold into the bias and are omitted);
- post-LN encoder blocks (attention -> residual -> LN; GELU FFN -> residual
  -> LN), causal when ``is_decoder`` (reference models.py:44);
- padding positions masked out of attention keys;
- pooling modes mean/max/cls/lasttoken over the attention mask and optional
  L2 normalization (sentence-transformers Pooling/Normalize modules,
  reference models.py:143-148).
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp

from transformer_recommenders_tpu.configs import ModelConfig

Params = dict[str, Any]

_NEG_INF = -1e9  # finite big-negative: safe in bf16/f32 softmax


def _dense_init(rng: jax.Array, d_in: int, d_out: int, std: float) -> Params:
    return {
        "w": std * jax.random.normal(rng, (d_in, d_out), jnp.float32),
        "b": jnp.zeros((d_out,), jnp.float32),
    }


def _ln_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def _layer_init(rng: jax.Array, cfg: ModelConfig) -> Params:
    d, f = cfg.hidden_size, cfg.intermediate_size
    k = jax.random.split(rng, 4)
    std = cfg.initializer_range
    return {
        "qkv": _dense_init(k[0], d, 3 * d, std),
        "out": _dense_init(k[1], d, d, std),
        "ln1": _ln_init(d),
        "ffn_in": _dense_init(k[2], d, f, std),
        "ffn_out": _dense_init(k[3], f, d, std),
        "ln2": _ln_init(d),
    }


def init_transformer_params(rng: jax.Array, cfg: ModelConfig) -> Params:
    """Initialize the encoder parameter pytree (stored in float32).

    Layer parameters are STACKED along a leading (num_layers, ...) axis and
    the forward runs ``lax.scan`` over them: profiling showed an unrolled
    layer list costs ~400 per-leaf parameter copies per step (~1.4 ms at
    flagship size) from XLA's per-op memory-space shuffling; stacking
    collapses them and keeps the compiled graph O(1) in depth.
    """
    keys = jax.random.split(rng, cfg.num_hidden_layers + 2)
    per_layer = [_layer_init(keys[i + 2], cfg) for i in range(cfg.num_hidden_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)
    params: Params = {
        "pos_embed": cfg.initializer_range
        * jax.random.normal(keys[0], (cfg.max_seq_length, cfg.hidden_size), jnp.float32),
        "embed_ln": _ln_init(cfg.hidden_size),
        "layers": stacked,
    }
    if cfg.resolved_input_dim != cfg.hidden_size:
        params["input_proj"] = _dense_init(
            keys[1], cfg.resolved_input_dim, cfg.hidden_size, cfg.initializer_range
        )
    return params


def unstack_layer(params: Params, i: int) -> Params:
    """Per-layer view of the stacked layer pytree (tests/interop)."""
    return jax.tree.map(lambda x: x[i], params["layers"])


def _layer_norm(
    x: jax.Array,
    p: Params,
    eps: float,
    out_dtype: jnp.dtype | None = None,
    *,
    fast_variance: bool = False,
) -> jax.Array:
    """LN computed in f32 (stability); the output joins the activation
    stream in ``out_dtype`` so large activations never materialize in f32
    (HBM traffic dominates the step otherwise).

    ``fast_variance`` computes var = E[x^2] - E[x]^2 (flax's default form):
    the two lane reductions become independent — one fused sweep over x
    instead of a mean pass followed by a dependent centered pass.  Used at
    s > 64 (config #4), where a zeroed-statistics variant bounded the LN
    cost at 0.30 ms/step and no Pallas layer exists to be bit-identical
    to; s <= 64 keeps the two-pass form the fused kernel reproduces
    exactly.  The forms differ only in f32 summation order (~1e-7
    relative on O(1) activations; tested).  Cancellation bound: the fast
    form loses ~(mean/std)^2 * 2^-24 relative variance precision, so it
    is safe while |mean| / std < ~2^9 per row — every LN site here feeds
    on residual streams or init-scaled embeddings with |mean|/std = O(1);
    a hypothetical |mean|/std ~ 2000 input (e.g. unnormalized raw
    features) would need the two-pass form instead."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    if fast_variance:
        m2 = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    else:
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    out = out * p["scale"] + p["bias"]
    return out.astype(out_dtype) if out_dtype is not None else out


def _dense(x: jax.Array, p: Params, dtype: jnp.dtype) -> jax.Array:
    """Matmul in ``dtype`` with f32 accumulation; the RESULT is cast back to
    ``dtype`` so downstream activations stay narrow in HBM."""
    out = (
        jnp.dot(x.astype(dtype), p["w"].astype(dtype), preferred_element_type=jnp.float32)
        + p["b"]
    )
    return out.astype(dtype)


def _linear_iota(shape: tuple[int, ...]) -> jax.Array:
    """uint32 linear element index, built from broadcasted iotas (fusable
    elementwise; TPU rejects plain 1-D iota)."""
    idx = None
    stride = 1
    for dim in reversed(range(len(shape))):
        term = jax.lax.broadcasted_iota(jnp.uint32, shape, dim) * jnp.uint32(stride)
        idx = term if idx is None else idx + term
        stride *= shape[dim]
    return idx


def _dropout(x: jax.Array, rate: float, rng: jax.Array | None) -> jax.Array:
    """Inverted dropout from a counter-based hash (murmur3 fmix32 over the
    element index x the key's raw data words).

    vs ``jax.random.bernoulli``: the threefry bit tensor is a separate
    custom-call whose output XLA materializes (and relayouts) in HBM —
    traced at >1 ms/step on the (B, H, S, S) attention probs at the
    flagship size.  The hash is pure elementwise VPU work that fuses into
    the surrounding softmax/matmul fusions; the stream differs from
    jax.random (immaterial for dropout — the reference's torch stream
    never matched either).  Same construction as the in-kernel dropout of
    ``ops/attention_common._dropout_keep``.
    """
    if rng is None or rate <= 0.0:
        return x
    return _dropout_from_seed(x, rate, _dropout_seed(rng))


def _dropout_seed(rng: jax.Array) -> jax.Array:
    """The uint32 site seed ``_dropout`` derives from a PRNG key — split out
    so custom-VJP attention can carry it as a plain array residual."""
    from transformer_recommenders_tpu.ops.hash_dropout import PREMIX_IDX

    data = jax.random.key_data(rng).reshape(-1).astype(jnp.uint32)
    return data[-1] ^ (data[0] * jnp.uint32(PREMIX_IDX))


def _dropout_from_seed(x: jax.Array, rate: float, seed: jax.Array) -> jax.Array:
    from transformer_recommenders_tpu.ops.hash_dropout import (
        PREMIX_IDX,
        PREMIX_SEED,
        fmix32,
        keep_threshold,
    )

    h = fmix32(
        _linear_iota(x.shape) * jnp.uint32(PREMIX_IDX)
        + seed * jnp.uint32(PREMIX_SEED)
    )
    return jnp.where(h >= keep_threshold(rate), x / (1.0 - rate), 0.0)


def _attn_bias(key_mask: jax.Array, s: int, causal: bool) -> jax.Array:
    """Additive (B, 1, S, S)-broadcastable attention bias: key padding +
    optional causal mask — the exact construction of the stock path."""
    bias = jnp.where(key_mask[:, None, None, :], 0.0, _NEG_INF)
    if causal:
        tri = jnp.tril(jnp.ones((s, s), jnp.bool_))
        bias = bias + jnp.where(tri[None, None, :, :], 0.0, _NEG_INF)
    return bias


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _attn_core_bf16(q, k, v, key_mask, seed, rate, causal):
    """qk -> softmax -> bf16 -> hash-dropout -> pv with ONE bf16 residual
    and an all-bf16-operand backward.

    Two compounding wins over letting XLA differentiate the chain, both
    measured at config #4 (6L d=256 seq=128 B=64; BENCH_CONFIG4.json):

    1. Residual traffic (round 5, first cut): the stock chain saves the
       (B, H, S, S) probs TWICE — f32 softmax residual + the bf16 pv
       operand (xplane: 23 ms/step of async copy/slice windows streaming
       f32[64,8,128,128] buffers, scripts/trace_config4.py).  This VJP
       keeps exactly one bf16 probs buffer: backward rebuilds the dropped
       probs by recomputing the counter-based hash mask (pure elementwise
       from iota — nothing stored), reuses dropout's linearity for its own
       VJP, and reconstructs the softmax gradient dx = y*(g - sum(g*y))
       from the bf16-rounded y (an O(2^-8) relative perturbation of an
       O(1) quantity).

    2. Backward operand precision (round 5, second cut): with the VJP
       boundary at the softmax, the dscores cotangent crossed it as a
       33.5 MB f32 buffer and FOUR of the five backward matmuls (dq, dk,
       dv, dp) ran with one f32 operand — a mixed-precision form the MXU
       executes at a fraction of bf16 throughput.  Owning the qk product
       lets the backward cast dscores and the incoming ctx cotangent to
       bf16 BEFORE the matmuls: every backward contraction is pure bf16
       (f32 accumulation), and the (B, H, S, S) cotangent buffer halves.
       The rounding this adds (2^-8 relative on ds and g) is the same
       rounding every forward activation already carries.

    Forward numerics are IDENTICAL to the unfused bf16 chain (same
    einsum, scale, bias, f32 softmax); f32 compute keeps the stock path
    so gradient checks and HF parity run exact."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    scores = (
        jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32)
        * scale
        + _attn_bias(key_mask, q.shape[1], causal)
    )
    y = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
    p = _dropout_from_seed(y, rate, seed) if rate > 0.0 else y
    return jnp.einsum("bhst,bthd->bshd", p, v, preferred_element_type=jnp.float32)


def _attn_core_bf16_fwd(q, k, v, key_mask, seed, rate, causal):
    scale = 1.0 / math.sqrt(q.shape[-1])
    scores = (
        jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32)
        * scale
        + _attn_bias(key_mask, q.shape[1], causal)
    )
    y = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
    p = _dropout_from_seed(y, rate, seed) if rate > 0.0 else y
    ctx = jnp.einsum("bhst,bthd->bshd", p, v, preferred_element_type=jnp.float32)
    return ctx, (q, k, v, y, seed)


def _attn_core_bf16_bwd(rate, causal, res, g):
    q, k, v, y16, seed = res
    scale = 1.0 / math.sqrt(q.shape[-1])
    g16 = g.astype(jnp.bfloat16)
    p = _dropout_from_seed(y16, rate, seed) if rate > 0.0 else y16
    dv = jnp.einsum(
        "bhst,bshd->bthd", p, g16, preferred_element_type=jnp.float32
    ).astype(v.dtype)
    dp = jnp.einsum("bshd,bthd->bhst", g16, v, preferred_element_type=jnp.float32)
    # dropout is x * mask/keep — linear, so its VJP is the same map
    dy = _dropout_from_seed(dp, rate, seed) if rate > 0.0 else dp
    y = y16.astype(jnp.float32)
    ds = (y * (dy - jnp.sum(dy * y, axis=-1, keepdims=True)) * scale).astype(
        jnp.bfloat16
    )
    dq = jnp.einsum(
        "bhst,bthd->bshd", ds, k, preferred_element_type=jnp.float32
    ).astype(q.dtype)
    dk = jnp.einsum(
        "bhst,bshd->bthd", ds, q, preferred_element_type=jnp.float32
    ).astype(k.dtype)
    return dq, dk, dv, None, None


_attn_core_bf16.defvjp(_attn_core_bf16_fwd, _attn_core_bf16_bwd)


def _fused_layer_mode(cfg: ModelConfig, s: int) -> str | None:
    """None -> XLA layer stack; "compiled"/"interpret" -> the full-layer
    megafusion kernel (``ops/fused_layer.py``).  Shape gate: Mosaic wants
    128-multiple minor dims and 8-multiple sublanes."""
    if not getattr(cfg, "use_fused_layer", False):
        return None
    # intermediate_size needs no check: the kernel zero-pads the FFN width
    # to the 128-lane boundary (exact — ops/fused_layer.py)
    if cfg.hidden_size % 128 or s % 8:
        return None
    # s <= 64 runs the wide layout, lane-packed g elements per probs tile
    # (measured WINS: 3.10 -> 2.30 ms/step flagship round 2, 2.27 -> 1.89
    # with lane packing round 3; partial packs for 128 % s != 0 win 36%
    # vs XLA at s=48, round 4).  s > 64 runs the XLA stack: the per-head
    # TALL kernel layout was measured losing at config #4 (6.90 vs
    # 6.51 ms/step, round 3) and RETIRED in round 4 (the dh=128 shape
    # where it could win cannot hold f32 params+grads in VMEM — see
    # ops/fused_layer.py).
    if s > 64:
        return None
    try:
        return "compiled" if jax.default_backend() != "cpu" else None
    except RuntimeError:  # pragma: no cover - backend init failure
        return None


def _dropout_site_seeds(keys: jax.Array) -> jax.Array:
    """Per-site hash seeds from a (3,)-key array — the SAME derivation as
    ``_dropout`` (data[-1] ^ data[0]*C), so the fused-layer kernel's streams
    are bit-identical to this module's XLA dropout."""
    kd = jax.random.key_data(keys).reshape(3, -1).astype(jnp.uint32)
    return kd[:, -1] ^ (kd[:, 0] * jnp.uint32(0x9E3779B1))


def _attention(
    x: jax.Array,
    p: Params,
    cfg: ModelConfig,
    key_mask: jax.Array,
    rng: jax.Array | None,
) -> jax.Array:
    b, s, d = x.shape
    h = cfg.num_attention_heads
    dh = d // h
    dtype = jnp.dtype(cfg.compute_dtype)

    qkv = _dense(x, p["qkv"], dtype)  # (B, S, 3D) f32 accum
    # slice along the LAST dim at 128-aligned offsets (columns are [q|k|v],
    # each D wide).  The earlier reshape to (B, S, 3, H, Dh) made XLA
    # relayout through a 16-lane-tiled 5-D tensor — traced at >1.4 ms/step
    # of async copies at the flagship size (see BASELINE.md round 2).
    q, k, v = qkv[..., :d], qkv[..., d : 2 * d], qkv[..., 2 * d :]
    scale = 1.0 / math.sqrt(dh)

    # Fused Pallas attention lives INSIDE the megafusion layer kernel
    # (ops/fused_layer.py: lane-packed wide layout, s <= 64; longer
    # sequences run THIS path).  A standalone use_pallas_attention kernel
    # (round 2) and a per-head tall in-kernel layout (round 3) were both
    # retired: each lost to this XLA path at every feasible benched shape
    # (BASELINE.md attention table; BENCH_CONFIG4.json).
    bias = jnp.where(key_mask[:, None, None, :], 0.0, _NEG_INF)  # mask padded keys
    if cfg.is_decoder:
        causal = jnp.tril(jnp.ones((s, s), jnp.bool_))
        bias = bias + jnp.where(causal[None, None, :, :], 0.0, _NEG_INF)

    impl = cfg.attention_impl
    if impl == "auto":
        # masked trades H*S^2*d redundant MACs for zero head-split
        # relayouts: wins at seq 32 (3.99 -> 3.66 ms flagship step), loses
        # at seq 128 (10.45 vs 8.92 ms config-#4 encoder) — see configs.py
        impl = "masked" if s <= 64 else "split"
    if impl == "masked":
        # head-masked full-width contraction (see configs.py): per-head
        # scores over ALL d channels with head h's channels selected by a
        # (H, D) 0/1 mask.  Exact: channel c belongs to exactly one head.
        # Every operand keeps D=lane-width minor — no head-split relayout.
        hmask = (
            jax.lax.broadcasted_iota(jnp.int32, (h, d), 1) // dh
            == jax.lax.broadcasted_iota(jnp.int32, (h, d), 0)
        ).astype(dtype)
        qh = q[:, None, :, :] * hmask[None, :, None, :]  # (B, H, S, D)
        scores = (
            jnp.einsum("bhsc,btc->bhst", qh, k, preferred_element_type=jnp.float32)
            * scale
        )
        probs = jax.nn.softmax(scores + bias, axis=-1)
        probs = _dropout(probs, cfg.attention_dropout, rng)
        ctx_full = jnp.einsum(
            "bhst,btc->bhsc", probs.astype(dtype), v, preferred_element_type=jnp.float32
        ).astype(dtype)
        # recombine heads: select each channel's owning head (exact)
        ctx = jnp.einsum("bhsc,hc->bsc", ctx_full, hmask)
        return _dense(ctx, p["out"], dtype)

    q = q.reshape(b, s, h, dh)
    k = k.reshape(b, s, h, dh)
    v = v.reshape(b, s, h, dh)

    if jnp.dtype(dtype) == jnp.bfloat16:
        live = rng is not None and cfg.attention_dropout > 0.0
        seed = _dropout_seed(rng) if live else jnp.uint32(0)
        rate = cfg.attention_dropout if live else 0.0
        # qk + bias + softmax + dropout + pv under ONE custom VJP: one bf16
        # probs residual, all-bf16-operand backward (see _attn_core_bf16)
        ctx = _attn_core_bf16(q, k, v, key_mask, seed, rate, cfg.is_decoder)
    else:
        # scores in f32: (B, H, S, S)
        scores = jnp.einsum(
            "bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32
        )
        probs = jax.nn.softmax(scores * scale + bias, axis=-1)
        probs = _dropout(probs, cfg.attention_dropout, rng)
        ctx = jnp.einsum(
            "bhst,bthd->bshd", probs.astype(dtype), v,
            preferred_element_type=jnp.float32,
        )
    ctx = ctx.reshape(b, s, d)
    return _dense(ctx, p["out"], dtype)


def _ffn(x: jax.Array, p: Params, cfg: ModelConfig) -> jax.Array:
    dtype = jnp.dtype(cfg.compute_dtype)
    hidden = jax.nn.gelu(_dense(x, p["ffn_in"], dtype), approximate=False)
    return _dense(hidden, p["ffn_out"], dtype)


def pool_tokens(
    token_embeddings: jax.Array, attention_mask: jax.Array, mode: str
) -> jax.Array:
    """Sequence pooling.  Parity: sentence-transformers ``Pooling`` module as
    configured by the reference (``xfmr_rec/models.py:143-145``)."""
    mask_f = attention_mask.astype(jnp.float32)[..., None]
    if mode == "mean":
        total = jnp.sum(token_embeddings * mask_f, axis=-2)
        count = jnp.clip(jnp.sum(mask_f, axis=-2), min=1e-9)
        return total / count
    if mode == "max":
        masked = jnp.where(attention_mask[..., None], token_embeddings, _NEG_INF)
        return jnp.max(masked, axis=-2)
    if mode == "cls":
        return token_embeddings[..., 0, :]
    if mode == "lasttoken":
        last = jnp.maximum(jnp.sum(attention_mask, axis=-1) - 1, 0)
        return jnp.take_along_axis(
            token_embeddings, last[..., None, None], axis=-2
        ).squeeze(-2)
    msg = f"unknown pooling_mode: {mode}"
    raise ValueError(msg)


def transformer_encode(
    params: Params,
    cfg: ModelConfig,
    input_embeds: jax.Array,
    attention_mask: jax.Array | None = None,
    *,
    dropout_rng: jax.Array | None = None,
    inputs_projected: bool = False,
) -> dict[str, jax.Array]:
    """Encode a batch of embedding sequences.

    Args:
        params: pytree from :func:`init_transformer_params`.
        cfg: model config.
        input_embeds: ``(batch, seq, input_dim)`` float array.  Sequences
            longer than ``cfg.max_seq_length`` must be pre-truncated by the
            caller (the recommender model truncates to the LAST window,
            parity with ``xfmr_rec/models.py:334-337``).
        attention_mask: optional ``(batch, seq)`` bool.  When ``None`` it is
            derived as "any nonzero component" exactly like the reference
            (``xfmr_rec/models.py:343``).
        dropout_rng: when provided, dropout is active (training mode).

    Returns:
        dict with ``token_embeddings`` ``(B, S, D)`` float32,
        ``sentence_embedding`` ``(B, D)`` float32, ``attention_mask``
        ``(B, S)`` bool.
    """
    if attention_mask is None:
        attention_mask = jnp.any(input_embeds != 0, axis=-1)
    attention_mask = attention_mask.astype(jnp.bool_)

    s = input_embeds.shape[-2]
    if s > cfg.max_seq_length:
        msg = f"sequence length {s} exceeds max_seq_length {cfg.max_seq_length}"
        raise ValueError(msg)
    dtype = jnp.dtype(cfg.compute_dtype)

    n_layers = cfg.num_hidden_layers
    if dropout_rng is not None:
        rngs = list(jax.random.split(dropout_rng, 2))
    else:
        rngs = [None, None]

    x = input_embeds
    if "input_proj" in params and not inputs_projected:
        x = _dense(x, params["input_proj"], dtype)
    x = x.astype(dtype) + params["pos_embed"][:s].astype(dtype)
    # s > 64: no fused layer exists (no bit-identity constraint) and the
    # LN statistics bound 0.30 ms/step at config #4 — use the one-sweep
    # fast-variance form there (see _layer_norm)
    fast_ln = s > 64
    x = _layer_norm(
        x, params["embed_ln"], cfg.layer_norm_eps, dtype, fast_variance=fast_ln
    )
    x = _dropout(x, cfg.hidden_dropout, rngs[0])

    use_dropout = dropout_rng is not None

    def layer_fn(x, layer, keys):
        r1, r2, r3 = (keys[0], keys[1], keys[2]) if use_dropout else (None,) * 3
        attn = _attention(x, layer, cfg, attention_mask, r1)
        attn = _dropout(attn, cfg.hidden_dropout, r2)
        x = _layer_norm(
            x + attn, layer["ln1"], cfg.layer_norm_eps, dtype,
            fast_variance=fast_ln,
        )
        ffn = _ffn(x, layer, cfg)
        ffn = _dropout(ffn, cfg.hidden_dropout, r3)
        return _layer_norm(
            x + ffn, layer["ln2"], cfg.layer_norm_eps, dtype,
            fast_variance=fast_ln,
        )

    if cfg.remat_layers:
        # recompute layer internals in the backward pass instead of saving
        # attention-prob / FFN-hidden residuals (useful for memory-bound
        # deep/long-seq configs; off by default — see configs.py)
        layer_fn = jax.checkpoint(layer_fn)

    if use_dropout:
        layer_keys = jax.random.split(rngs[1], 3 * n_layers).reshape(n_layers, 3)
    else:
        layer_keys = jnp.zeros((n_layers, 3), jnp.uint32)  # unused placeholder

    # stacked storage (few pytree leaves) + STATIC unroll: measured faster
    # than lax.scan over layers at shallow depth (scan's per-iteration
    # dynamic slices cost more than they save; XLA pipelines the unrolled
    # layers freely).  Deep models can flip to scan via remat_layers later.
    fused_mode = _fused_layer_mode(cfg, s)
    for i in range(n_layers):
        layer = jax.tree.map(lambda a, i=i: a[i], params["layers"])
        if fused_mode is not None:
            from transformer_recommenders_tpu.ops.fused_layer import (
                fused_layer,
            )

            seeds = _dropout_site_seeds(layer_keys[i]) if use_dropout else None
            x = fused_layer(
                x,
                layer,
                attention_mask,
                num_heads=cfg.num_attention_heads,
                causal=cfg.is_decoder,
                attn_dropout=cfg.attention_dropout if use_dropout else 0.0,
                hidden_dropout=cfg.hidden_dropout if use_dropout else 0.0,
                dropout_seeds=seeds,
                ffn_dim=cfg.intermediate_size,
                layer_norm_eps=cfg.layer_norm_eps,
                interpret=fused_mode == "interpret",
            )
        else:
            x = layer_fn(x, layer, layer_keys[i])

    token_embeddings = x.astype(jnp.float32)
    sentence_embedding = pool_tokens(token_embeddings, attention_mask, cfg.pooling_mode)
    if cfg.is_normalized:
        sentence_embedding = sentence_embedding / jnp.clip(
            jnp.linalg.norm(sentence_embedding, axis=-1, keepdims=True), min=1e-12
        )
    return {
        "token_embeddings": token_embeddings,
        "sentence_embedding": sentence_embedding,
        "attention_mask": attention_mask,
    }
