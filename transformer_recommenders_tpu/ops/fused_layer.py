"""Full-encoder-layer megafusion Pallas kernel.

One program computes an ENTIRE post-LN transformer layer for a block of
batch elements with every intermediate resident in VMEM:

    qkv dense -> attention (lane-packed wide layout, s <= 64 —
    ops/attention_common.py has the shared pieces)
    -> out dense -> dropout -> add&LN -> FFN (exact gelu) -> dropout
    -> add&LN

Sequences longer than 64 run the XLA layer stack (the per-head tall
layout was retired in round 4 — see the note above _layer_fwd_block).

The unfused XLA layer moves ~50 MB/layer of HBM traffic at the flagship
shape (B=256, S=32, D=128): every dense/LN/dropout/cast boundary
materializes a (B, S, D)-or-wider tensor, and the backward re-reads all of
them as residuals — measured 2.6 ms of the 3.1 ms train step for a layer
stack whose FLOP bound is ~0.2 ms (scripts/ablate_marginal.py, BASELINE.md
round 2).  Here a layer reads x (2 MB bf16) + params and writes y (2 MB);
the backward recomputes the layer from the saved INPUT (flash-attention
style) and emits dx plus accumulated parameter grads — no intermediate
ever reaches HBM.

Replaces the reference's per-layer torch BertLayer stack
(``xfmr_rec/models.py:306-345`` via HF/ATen, SURVEY.md §2.2 row 3).

Numerics match ``models/transformer.py`` exactly, INCLUDING dropout: the
same counter-hash (murmur3 fmix32 over the global linear element index,
``transformer._dropout``) is evaluated in-kernel with the same per-site
seeds, so the fused and XLA paths produce bit-identical streams in f32
(tested in interpret mode, dropout on and off).  Matmul/cast discipline is
also identical: matmuls in ``compute_dtype`` with f32 accumulation, LN in
f32, activations re-narrowed after every dense.

Parameter-grad accumulation uses constant-index output blocks: TPU grid
iterations run sequentially on a core, so ``@pl.when(i == 0)`` zeroing +
``+=`` is race-free (same pattern as ops/fused_table_infonce.py's dT).

Rejected variant (measured): fusing ALL L layers + the embedding prologue
into ONE program pair.  The monolithic backward blows the 16 MB VMEM
scoped allocation (25.3 MB at any useful batch block — Mosaic keeps the
unrolled per-layer recompute buffers live simultaneously), and the split
form (stack forward saving per-layer inputs to HBM + per-layer backward
kernels) measured 2.45 ms/step vs this per-layer design's 2.30 — the
extra (L, B, S, D) input round-trips cost more than the saved program
dispatches.  Also rejected: batched ``dot_general`` over the block's
batch dim inside the kernel (0.51 ms vs ~0.1 ms for the unrolled
per-element dots at (16, 256, 128) x (16, 32, 128) — Mosaic's batched-dot
lowering is slower than its unrolled 2-D dots).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transformer_recommenders_tpu.ops.attention_common import (
    _bias,
    _combine,
    _hmask,
    _wide,
)
from transformer_recommenders_tpu.ops.fused_infonce import _maybe_interpret

_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)


# ---------------------------------------------------------------------------
# shared pieces (identical math to models/transformer.py)
# ---------------------------------------------------------------------------


def _keep(seed, idx, rate: float):
    """Keep mask of ``transformer._dropout`` (same premix + avalanche via
    the shared ``ops.hash_dropout`` — the bit-identity guarantee between
    the fused and XLA streams depends on it).  ``seed`` arrives as int32
    (SMEM); same-width int->uint conversion is modular, i.e. a
    bit-reinterpret."""
    from transformer_recommenders_tpu.ops.hash_dropout import (
        PREMIX_IDX,
        PREMIX_SEED,
        fmix32,
        keep_threshold,
    )

    h = fmix32(
        idx * jnp.uint32(PREMIX_IDX)
        + seed.astype(jnp.uint32) * jnp.uint32(PREMIX_SEED)
    )
    return h >= keep_threshold(rate)


def _hidden_idx(base_row, rows: int, cols: int):
    """uint32 linear index into the global (B*S, D) activation layout."""
    r = jax.lax.broadcasted_iota(jnp.uint32, (rows, cols), 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, (rows, cols), 1)
    return (base_row.astype(jnp.uint32) + r) * jnp.uint32(cols) + c


def _probs_idx(elem, num_heads: int, s: int):
    """uint32 linear index into the global (B, H, S, S) probs layout for
    one element's wide (H*S, S) score matrix (row r = h*S + s_q)."""
    r = jax.lax.broadcasted_iota(jnp.uint32, (num_heads * s, s), 0)
    t = jax.lax.broadcasted_iota(jnp.uint32, (num_heads * s, s), 1)
    return (
        elem.astype(jnp.uint32) * jnp.uint32(num_heads * s * s)
        + r * jnp.uint32(s)
        + t
    )


def _ln_fwd(h32, scale, bias, eps: float):
    """f32 layer norm; returns (normalized*scale+bias, n, rstd) where n is
    the pre-affine normalized value (needed by the VJP)."""
    mean = jnp.mean(h32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    n = (h32 - mean) * rstd
    return n * scale + bias, n, rstd


def _ln_bwd(dy32, n, rstd, scale):
    """VJP of f32 LN w.r.t. its input h.  dh = rstd * (g - mean(g)
    - n * mean(g * n)) with g = dy * scale; means over the feature dim."""
    g = dy32 * scale
    d = g.shape[-1]
    gm = jnp.sum(g, axis=-1, keepdims=True) / d
    gnm = jnp.sum(g * n, axis=-1, keepdims=True) / d
    return rstd * (g - gm - n * gnm)


def _erf(x):
    """f32 erf as the Eigen/XLA rational minimax polynomial
    (``generic_fast_erf_float`` — what XLA itself lowers ``erf`` to for
    f32).  Mosaic has no erf primitive; this matches ``jax.lax.erf`` to
    <5e-7 abs over the full range (validated in tests)."""
    x = jnp.clip(x, -3.832506856900711, 3.832506856900711)
    x2 = x * x
    a = jnp.float32(-2.72614225801306e-10)
    for c in (2.77068142495902e-08, -2.10102402082508e-06,
              -5.69250639462346e-05, -7.34990630326855e-04,
              -2.95459980854025e-03, -1.60960333262415e-02):
        a = a * x2 + jnp.float32(c)
    a = a * x
    b = jnp.float32(-1.45660718464996e-05)
    for c in (-2.13374055278905e-04, -1.68282697438203e-03,
              -7.37332916720468e-03, -1.42647390514189e-02):
        b = b * x2 + jnp.float32(c)
    return a / b


def _erf_as(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|abs err| <= 2.5e-5): one
    exp + one reciprocal + a 3-term Horner instead of the ~27-op Eigen
    minimax polynomial of :func:`_erf`.

    Used ONLY in the BACKWARD's forward-recompute under a bf16 compute
    dtype (``_APPROX_RECOMPUTE_ERF``): the forward keeps the exact Eigen
    polynomial, so model OUTPUTS stay bit-identical to the XLA path; the
    gradient shift is O(1e-5) relative — far below bf16 training noise.
    Measured round 4 (scripts/bench_layer_variants.py): the recompute's
    erf polynomial is 22 us of the 91 us marginal backward at the
    flagship shape."""
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + jnp.float32(0.47047) * ax)
    poly = t * (
        jnp.float32(0.3480242)
        + t * (jnp.float32(-0.0958798) + t * jnp.float32(0.7478556))
    )
    mag = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.where(x < 0.0, -mag, mag)


# flip to False to force the exact Eigen erf in the backward recompute
# (f32 compute dtypes always use the exact polynomial)
_APPROX_RECOMPUTE_ERF = True


def _gelu(u, erf_u=None):
    if erf_u is None:
        erf_u = _erf(u * _INV_SQRT2)
    return 0.5 * u * (1.0 + erf_u)


def _gelu_grad(u, erf_u=None):
    """gelu'(u) = Phi(u) + u*phi(u).  ``erf_u`` lets the backward reuse the
    forward-recompute's erf evaluation — the ~18-instruction rational
    polynomial over the (rows, F) hidden tile is the single largest VPU
    term in the kernel (the per-program cost is VPU-issue-bound)."""
    if erf_u is None:
        erf_u = _erf(u * _INV_SQRT2)
    phi = jnp.exp(-0.5 * u * u) * _INV_SQRT2PI
    return 0.5 * (1.0 + erf_u) + u * phi


def _matmul(x, w, b, dtype):
    """transformer._dense: matmul in ``dtype``, f32 accumulation, f32 bias,
    result narrowed back to ``dtype``."""
    out = (
        jnp.dot(x.astype(dtype), w.astype(dtype), preferred_element_type=jnp.float32)
        + b
    )
    return out.astype(dtype)


def _attention_wide(q, k, v, bias, hmask, elem, seed, *, num_heads, s, scale,
                    rate, dtype):
    """One element's attention in the wide layout; returns (ctx f32 (S, D),
    probs, dropped, qw) for reuse by the backward."""
    qw = _wide(q, num_heads) * hmask  # (H*S, D)
    scores = jnp.dot(qw, k.T, preferred_element_type=jnp.float32) * scale
    bias_w = _wide(bias, num_heads) if bias.shape[0] == s else bias
    probs = jax.nn.softmax(scores + bias_w, axis=-1)
    if rate > 0.0:
        keep = _keep(seed, _probs_idx(elem, num_heads, s), rate)
        dropped = jnp.where(keep, probs / (1.0 - rate), 0.0)
    else:
        keep = None
        dropped = probs
    # XLA path: probs cast to compute dtype for the PV matmul, ctx_full
    # narrowed, then recombined
    ctx_w = jnp.dot(
        dropped.astype(dtype), v, preferred_element_type=jnp.float32
    ).astype(dtype)
    ctx = _combine(ctx_w.astype(jnp.float32), hmask.astype(jnp.float32), s,
                   num_heads)
    return ctx.astype(dtype), probs, dropped, keep, qw


def _packed_probs_idx(elem_base, g: int, num_heads: int, s: int):
    """uint32 linear index into the global (B, H, S, S) probs layout for a
    PACKED (H*S, g*S) score tile holding g consecutive elements side by
    side in the lane dim (element j occupies lanes jS:(j+1)S).  Row r is
    the wide row h*S + s_q; lane l addresses element ``elem_base + l//S``
    at key position ``l % S`` — the identical stream `_probs_idx` hashes,
    so packed dropout is bit-identical to the unpacked wide path."""
    hs = num_heads * s
    r = jax.lax.broadcasted_iota(jnp.uint32, (hs, g * s), 0)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (hs, g * s), 1)
    j = lane // jnp.uint32(s)
    t = lane % jnp.uint32(s)
    return (
        (elem_base.astype(jnp.uint32) + j) * jnp.uint32(num_heads * s * s)
        + r * jnp.uint32(s)
        + t
    )


def _attention_wide_packed(qkv, biases, hmask, elem_base, seed, *, num_heads,
                           s, d, g, scale, rate, dtype, want_residuals):
    """g elements' wide attention in ONE packed score tile (ROADMAP
    round-3 design: probs-tile lane packing).

    At S=32 the per-element (H*S, S) f32 probs tile fills only S of the
    128 VPU lanes; every probs-space elementwise op (bias add, exp,
    dropout hash, scaling) wastes 3/4 of each vreg.  Packing g = 128//S
    elements side by side via a BLOCK-DIAGONAL contraction makes all of
    that work run g elements per vreg:

        Qp (H*S, g*D): element j's masked-wide q in column block j
        Kp (g*S, g*D): block-diagonal, element j's k at rows jS:, cols jD:
        dot_general(Qp, Kp, contract last dims) -> (H*S, g*S) scores with
        NO cross terms — Kp row jS+t is zero outside column block j, and
        the extra zero products accumulate exactly, so packed scores are
        BIT-IDENTICAL to the unpacked jnp.dot(qw, k.T).

    Softmax is segmented: an exact per-segment max (g masked lane-reduces
    — handles fully-masked rows identically to the unpacked path, where
    the constant -1e9 bias cancels) and a segment sum via one MXU matmul
    with a block-diagonal ones matrix.  PV uses the same block-diagonal
    Vp, and per-element context columns are lane-aligned slices.
    """
    hs = num_heads * s
    zeros_sd = jnp.zeros((s, d), dtype)
    qws, k_slabs, v_slabs, bias_cols = [], [], [], []
    for j in range(g):
        rs = slice(j * s, (j + 1) * s)
        q = qkv[rs, :d]
        k = qkv[rs, d : 2 * d]
        v = qkv[rs, 2 * d :]
        qws.append(_wide(q, num_heads) * hmask)
        k_slabs.append(jnp.concatenate(
            [k if jj == j else zeros_sd for jj in range(g)], axis=1))
        v_slabs.append(jnp.concatenate(
            [v if jj == j else zeros_sd for jj in range(g)], axis=1))
        # non-causal _bias is a (1, S) key-padding row — keep it broadcast;
        # causal bias is (S, S) and needs the wide (H*S, S) tiling
        bias_cols.append(
            _wide(biases[j], num_heads)
            if biases[j].shape[0] == s
            else biases[j]
        )
    qp = jnp.concatenate(qws, axis=1)          # (H*S, g*D)
    kp = jnp.concatenate(k_slabs, axis=0)      # (g*S, g*D) block-diag
    vp = jnp.concatenate(v_slabs, axis=0)      # (g*S, g*D) block-diag
    biasp = jnp.concatenate(bias_cols, axis=1)  # (H*S, g*S)

    scores = jax.lax.dot_general(
        qp, kp, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    x = scores + biasp                          # (H*S, g*S) f32
    seg = jax.lax.broadcasted_iota(jnp.int32, (hs, g * s), 1) // s
    mtile = jnp.zeros_like(x)
    neg = jnp.float32(-3.4e38)
    for j in range(g):
        in_j = seg == j
        mj = jnp.max(jnp.where(in_j, x, neg), axis=-1, keepdims=True)
        mtile = jnp.where(in_j, mj, mtile)
    e = jnp.exp(x - mtile)
    # segment sum broadcast back to every lane in one matmul: ones where
    # row and column fall in the same S-lane segment
    blockones = (
        jax.lax.broadcasted_iota(jnp.int32, (g * s, g * s), 0) // s
        == jax.lax.broadcasted_iota(jnp.int32, (g * s, g * s), 1) // s
    ).astype(jnp.float32)
    denom = jax.lax.dot_general(
        e, blockones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    probs = e / denom
    if rate > 0.0:
        keep = _keep(seed, _packed_probs_idx(elem_base, g, num_heads, s), rate)
        dropped = jnp.where(keep, probs / (1.0 - rate), 0.0)
    else:
        dropped = probs
    ctxp = jnp.dot(
        dropped.astype(dtype), vp, preferred_element_type=jnp.float32
    ).astype(dtype)                             # (H*S, g*D)
    hmask_f = hmask.astype(jnp.float32)
    ctx = jnp.concatenate(
        [
            _combine(
                ctxp[:, j * d : (j + 1) * d].astype(jnp.float32), hmask_f,
                s, num_heads,
            )
            for j in range(g)
        ],
        axis=0,
    ).astype(dtype)                             # (g*S, D)
    if not want_residuals:
        return ctx, None
    return ctx, (probs, dropped, qp, kp, vp)


def _attention_wide_packed_bwd(gctx, res, hmask_f, elem_base, seed, *,
                               num_heads, s, d, g, scale, rate, dtype):
    """VJP of :func:`_attention_wide_packed`; returns (g*S, 3D) f32 d(qkv).

    dv/dk contract over the shared row dim, producing (g*S, g*D) tiles
    whose off-diagonal blocks are discarded (extra MXU work the packed
    layout pays for its VPU density — the kernel is VPU-issue-bound, see
    BASELINE.md).  All probs-space elementwise work (dropout backward,
    the softmax VJP's segmented row sum) runs packed."""
    probs, dropped, qp, kp, vp = res
    hs = num_heads * s
    gws = [
        (_wide(gctx[j * s : (j + 1) * s], num_heads) * hmask_f).astype(dtype)
        for j in range(g)
    ]
    gwp = jnp.concatenate(gws, axis=1)          # (H*S, g*D)
    dv_full = jax.lax.dot_general(
        dropped.astype(dtype), gwp, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                            # (g*S, g*D), diag blocks
    d_dropped = jax.lax.dot_general(
        gwp, vp, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                            # (H*S, g*S)
    if rate > 0.0:
        # the keep mask is recoverable from the saved `dropped` tile:
        # dropped != 0 differs from the hash's keep only where probs == 0,
        # and those lanes are multiplied by probs in every d_scores term —
        # d_scores is BIT-IDENTICAL while the ~10-op fmix32 re-hash of the
        # (H*S, 128) tile disappears (profile-driven, round 3)
        d_probs = jnp.where(dropped != 0.0, d_dropped / (1.0 - rate), 0.0)
    else:
        d_probs = d_dropped
    blockones = (
        jax.lax.broadcasted_iota(jnp.int32, (g * s, g * s), 0) // s
        == jax.lax.broadcasted_iota(jnp.int32, (g * s, g * s), 1) // s
    ).astype(jnp.float32)
    seg_sum = jax.lax.dot_general(
        d_probs * probs, blockones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d_scores = (probs * (d_probs - seg_sum) * scale).astype(dtype)
    dqw_p = jnp.dot(d_scores, kp, preferred_element_type=jnp.float32)
    dk_full = jax.lax.dot_general(
        d_scores, qp, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                            # (g*S, g*D), diag blocks
    rows = []
    for j in range(g):
        cs = slice(j * d, (j + 1) * d)
        rs = slice(j * s, (j + 1) * s)
        dq = _combine(dqw_p[:, cs], hmask_f, s, num_heads)
        rows.append(
            jnp.concatenate([dq, dk_full[rs, cs], dv_full[rs, cs]], axis=1)
        )
    return jnp.concatenate(rows, axis=0)        # (g*S, 3D)


def _pack_group(s: int, bt: int) -> int:
    """Lane-pack group size: how many elements share one (H*S, g*S) probs
    tile.  g is the largest power of two with g*s <= 128, so it always
    divides the power-of-two block batch.  Full 128-lane fill when
    128 % s == 0; PARTIAL fill otherwise (round-3 verdict #6: e.g. S=48
    packs g=2 for 96/128 = 75% lane fill vs the unpacked path's 37.5% —
    the block-diagonal contraction and segmented softmax are exact at any
    g, nothing about them needs g*s == 128).  Shrink to bt when the block
    is smaller than the ideal group."""
    if s > 64:
        return 1
    g = 1
    while 2 * g * s <= 128:
        g *= 2
    return min(g, bt)


# The per-head TALL attention layout (64 < s <= 128) was RETIRED in
# round 4, following the round-2 flash kernel: the auto gate never
# selected it (config #4 measured 6.90 ms fused-tall vs 6.51 XLA,
# BENCH_CONFIG4.json round 3), and the shape where per-head slices would
# be MXU-perfect (dh = 128, e.g. d=512 H=4 seq=128) cannot compile AT ALL
# under this kernel's design — the f32 params + param-grads resident in
# VMEM across the grid are 25.2 MB at d=512 f=2048, past the 16 MB scoped
# limit (measured round 4, scripts/bench_layer_variants.py --shape
# tall512).  Long sequences belong to the XLA layer stack, whose fused
# attention keeps the MXU contraction 128-wide across heads.


def _layer_fwd_block(x, mask_blk, params, seeds, base_elem, *, num_heads, s,
                     d, causal, attn_rate, hidden_rate, eps, dtype,
                     want_residuals: bool):
    """The full layer for one (bt, S, D) block; everything stays in
    registers/VMEM.  Returns y plus (when want_residuals) the recomputed
    intermediates the backward needs."""
    bt = x.shape[0]
    rows = bt * s
    hmask = _hmask(num_heads, s, d, dtype)
    scale = 1.0 / math.sqrt(d // num_heads)

    xf = x.reshape(rows, d)
    qkv = _matmul(xf, params["qkv_w"], params["qkv_b"], dtype)  # (rows, 3D)
    g = _pack_group(s, bt)
    if g > 1:
        ctx_all, attn_res = [], []
        for grp in range(bt // g):
            rs = slice(grp * g * s, (grp + 1) * g * s)
            biases = [
                _bias(mask_blk[grp * g + j : grp * g + j + 1], s, causal)
                for j in range(g)
            ]
            ctx_g, res_g = _attention_wide_packed(
                qkv[rs], biases, hmask, base_elem + grp * g, seeds[0],
                num_heads=num_heads, s=s, d=d, g=g, scale=scale,
                rate=attn_rate, dtype=dtype, want_residuals=want_residuals,
            )
            ctx_all.append(ctx_g)
            if want_residuals:
                attn_res.append(res_g)
        ctx = jnp.concatenate(ctx_all, axis=0)
        return _layer_tail(
            xf, ctx, params, seeds, base_elem, rows=rows, s=s, d=d,
            hidden_rate=hidden_rate, eps=eps, dtype=dtype,
            want_residuals=want_residuals, attn_res=attn_res, qkv=qkv,
        )
    ctx_all = []
    attn_res = []
    for b in range(bt):
        rs = slice(b * s, (b + 1) * s)
        q = qkv[rs, :d]
        k = qkv[rs, d : 2 * d]
        v = qkv[rs, 2 * d :]
        bias = _bias(mask_blk[b : b + 1], s, causal)
        ctx, probs, dropped, keep, qw = _attention_wide(
            q, k, v, bias, hmask, base_elem + b, seeds[0],
            num_heads=num_heads, s=s, scale=scale, rate=attn_rate,
            dtype=dtype,
        )
        ctx_all.append(ctx)
        if want_residuals:
            attn_res.append((probs, dropped, qw, k, v, bias))
    ctx = jnp.concatenate(ctx_all, axis=0)  # (rows, D)
    return _layer_tail(
        xf, ctx, params, seeds, base_elem, rows=rows, s=s, d=d,
        hidden_rate=hidden_rate, eps=eps, dtype=dtype,
        want_residuals=want_residuals, attn_res=attn_res, qkv=qkv,
    )


def _layer_tail(xf, ctx, params, seeds, base_elem, *, rows, s, d,
                hidden_rate, eps, dtype, want_residuals, attn_res, qkv):
    """out dense -> dropout -> add&LN -> FFN -> dropout -> add&LN (shared
    by the per-element and lane-packed attention paths)."""
    a = _matmul(ctx, params["out_w"], params["out_b"], dtype)
    base_row = base_elem * s
    if hidden_rate > 0.0:
        keep2 = _keep(seeds[1], _hidden_idx(base_row, rows, d), hidden_rate)
        a = jnp.where(keep2, a / (1.0 - hidden_rate), 0.0).astype(dtype)
    else:
        keep2 = None

    h1 = (xf + a).astype(jnp.float32)
    x1f, n1, rstd1 = _ln_fwd(h1, params["ln1_s"], params["ln1_b"], eps)
    x1 = x1f.astype(dtype)

    u = _matmul(x1, params["ffn_in_w"], params["ffn_in_b"], dtype)
    u32 = u.astype(jnp.float32)
    if want_residuals and _APPROX_RECOMPUTE_ERF and dtype == jnp.bfloat16:
        # backward recompute only: the A&S rational replaces the Eigen
        # polynomial (see _erf_as) — forward numerics are untouched
        erf_u = _erf_as(u32 * _INV_SQRT2)
    else:
        erf_u = _erf(u32 * _INV_SQRT2)
    g = _gelu(u32, erf_u).astype(dtype)
    f = _matmul(g, params["ffn_out_w"], params["ffn_out_b"], dtype)
    if hidden_rate > 0.0:
        keep3 = _keep(seeds[2], _hidden_idx(base_row, rows, d), hidden_rate)
        f = jnp.where(keep3, f / (1.0 - hidden_rate), 0.0).astype(dtype)
    else:
        keep3 = None

    h2 = (x1 + f).astype(jnp.float32)
    yf, n2, rstd2 = _ln_fwd(h2, params["ln2_s"], params["ln2_b"], eps)
    y = yf.astype(dtype)
    if not want_residuals:
        return y, None
    return y, {
        "xf": xf, "qkv": qkv, "ctx": ctx, "keep2": keep2,
        "n1": n1, "rstd1": rstd1, "x1": x1, "u": u, "erf_u": erf_u,
        "g": g, "keep3": keep3,
        "n2": n2, "rstd2": rstd2, "attn": attn_res,
    }


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

_PARAM_NAMES = (
    "qkv_w", "qkv_b", "out_w", "out_b", "ffn_in_w", "ffn_in_b",
    "ffn_out_w", "ffn_out_b", "ln1_s", "ln1_b", "ln2_s", "ln2_b",
)


def _fwd_kernel(x_ref, mask_ref, seed_ref, *param_refs, out_ref,
                num_heads, s, d, causal, attn_rate, hidden_rate, eps, dtype):
    bt = x_ref.shape[0]
    params = {name: ref[:] for name, ref in zip(_PARAM_NAMES, param_refs)}
    seeds = [seed_ref[i] for i in range(3)]
    base_elem = pl.program_id(0) * bt
    y, _ = _layer_fwd_block(
        x_ref[:].reshape(bt, s, d), mask_ref, params, seeds, base_elem,
        num_heads=num_heads, s=s, d=d, causal=causal, attn_rate=attn_rate,
        hidden_rate=hidden_rate, eps=eps, dtype=dtype, want_residuals=False,
    )
    out_ref[:] = y.reshape(bt, s, d).astype(out_ref.dtype)


def _bwd_kernel(x_ref, mask_ref, seed_ref, g_ref, *refs,
                num_heads, s, d, causal, attn_rate, hidden_rate, eps, dtype):
    param_refs = refs[: len(_PARAM_NAMES)]
    dx_ref = refs[len(_PARAM_NAMES)]
    dparam_refs = refs[len(_PARAM_NAMES) + 1 :]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for ref in dparam_refs:
            ref[:] = jnp.zeros_like(ref)

    bt = x_ref.shape[0]
    rows = bt * s
    params = {name: ref[:] for name, ref in zip(_PARAM_NAMES, param_refs)}
    seeds = [seed_ref[i_] for i_ in range(3)]
    base_elem = i * bt
    _, res = _layer_fwd_block(
        x_ref[:].reshape(bt, s, d), mask_ref, params, seeds, base_elem,
        num_heads=num_heads, s=s, d=d, causal=causal, attn_rate=attn_rate,
        hidden_rate=hidden_rate, eps=eps, dtype=dtype, want_residuals=True,
    )
    dparams = dict.fromkeys(_PARAM_NAMES)

    dy = g_ref[:].reshape(rows, d).astype(jnp.float32)
    # LN2
    dparams["ln2_s"] = jnp.sum(dy * res["n2"], axis=0, keepdims=True)
    dparams["ln2_b"] = jnp.sum(dy, axis=0, keepdims=True)
    dh2 = _ln_bwd(dy, res["n2"], res["rstd2"], params["ln2_s"])
    dx1 = dh2
    df = dh2
    if res["keep3"] is not None:
        df = jnp.where(res["keep3"], df / (1.0 - hidden_rate), 0.0)
    dfm = df.astype(dtype)
    g_m = res["g"].astype(dtype)
    dparams["ffn_out_w"] = jnp.dot(
        g_m.T, dfm, preferred_element_type=jnp.float32
    )
    dparams["ffn_out_b"] = jnp.sum(df, axis=0, keepdims=True)
    dg = jnp.dot(
        dfm, params["ffn_out_w"].astype(dtype).T,
        preferred_element_type=jnp.float32,
    )
    du = dg * _gelu_grad(res["u"].astype(jnp.float32), res["erf_u"])
    dum = du.astype(dtype)
    x1m = res["x1"].astype(dtype)
    dparams["ffn_in_w"] = jnp.dot(x1m.T, dum, preferred_element_type=jnp.float32)
    dparams["ffn_in_b"] = jnp.sum(du, axis=0, keepdims=True)
    dx1 = dx1 + jnp.dot(
        dum, params["ffn_in_w"].astype(dtype).T,
        preferred_element_type=jnp.float32,
    )
    # LN1
    dparams["ln1_s"] = jnp.sum(dx1 * res["n1"], axis=0, keepdims=True)
    dparams["ln1_b"] = jnp.sum(dx1, axis=0, keepdims=True)
    dh1 = _ln_bwd(dx1, res["n1"], res["rstd1"], params["ln1_s"])
    dx0 = dh1
    da = dh1
    if res["keep2"] is not None:
        da = jnp.where(res["keep2"], da / (1.0 - hidden_rate), 0.0)
    dam = da.astype(dtype)
    ctxm = res["ctx"].astype(dtype)
    dparams["out_w"] = jnp.dot(ctxm.T, dam, preferred_element_type=jnp.float32)
    dparams["out_b"] = jnp.sum(da, axis=0, keepdims=True)
    dctx = jnp.dot(
        dam, params["out_w"].astype(dtype).T, preferred_element_type=jnp.float32
    )

    # attention backward per element
    scale = 1.0 / math.sqrt(d // num_heads)
    g = _pack_group(s, bt)
    if g > 1:  # lane-packed wide path (see _attention_wide_packed)
        hmask_f = _hmask(num_heads, s, d, dtype).astype(jnp.float32)
        dqkv = jnp.concatenate(
            [
                _attention_wide_packed_bwd(
                    dctx[grp * g * s : (grp + 1) * g * s], res["attn"][grp],
                    hmask_f, base_elem + grp * g, seeds[0],
                    num_heads=num_heads, s=s, d=d, g=g, scale=scale,
                    rate=attn_rate, dtype=dtype,
                )
                for grp in range(bt // g)
            ],
            axis=0,
        )
        dqm = dqkv.astype(dtype)
        xfm = res["xf"].astype(dtype)
        dparams["qkv_w"] = jnp.dot(
            xfm.T, dqm, preferred_element_type=jnp.float32
        )
        dparams["qkv_b"] = jnp.sum(dqkv, axis=0, keepdims=True)
        dx0 = dx0 + jnp.dot(
            dqm, params["qkv_w"].astype(dtype).T,
            preferred_element_type=jnp.float32,
        )
        dx_ref[:] = dx0.reshape(bt, s, d).astype(dx_ref.dtype)
        for name, ref in zip(_PARAM_NAMES, dparam_refs):
            ref[:] += dparams[name].astype(jnp.float32)
        return
    hmask = _hmask(num_heads, s, d, dtype)
    hmask_f = hmask.astype(jnp.float32)
    dqkv = []
    for b in range(bt):
        probs, dropped, qw, k, v, bias = res["attn"][b]
        gctx = dctx[b * s : (b + 1) * s]
        gw = (_wide(gctx, num_heads) * hmask_f).astype(dtype)
        dv = jnp.dot(dropped.T.astype(dtype), gw, preferred_element_type=jnp.float32)
        d_dropped = jnp.dot(gw, v.T, preferred_element_type=jnp.float32)
        if attn_rate > 0.0:
            # keep recovered from the saved dropped tile — bit-identical
            # d_scores, no fmix32 re-hash (see _attention_wide_packed_bwd)
            d_probs = jnp.where(
                dropped != 0.0, d_dropped / (1.0 - attn_rate), 0.0
            )
        else:
            d_probs = d_dropped
        d_scores = probs * (
            d_probs - jnp.sum(d_probs * probs, axis=-1, keepdims=True)
        )
        d_scores = (d_scores * scale).astype(dtype)
        dq_w = jnp.dot(d_scores, k, preferred_element_type=jnp.float32)
        dq = _combine(dq_w, hmask_f, s, num_heads)
        dk = jnp.dot(d_scores.T, qw, preferred_element_type=jnp.float32)
        dqkv.append(jnp.concatenate([dq, dk, dv], axis=1))  # (S, 3D)
    dqkv = jnp.concatenate(dqkv, axis=0)  # (rows, 3D)

    dqm = dqkv.astype(dtype)
    xfm = res["xf"].astype(dtype)
    dparams["qkv_w"] = jnp.dot(xfm.T, dqm, preferred_element_type=jnp.float32)
    dparams["qkv_b"] = jnp.sum(dqkv, axis=0, keepdims=True)
    dx0 = dx0 + jnp.dot(
        dqm, params["qkv_w"].astype(dtype).T, preferred_element_type=jnp.float32
    )

    dx_ref[:] = dx0.reshape(bt, s, d).astype(dx_ref.dtype)
    for name, ref in zip(_PARAM_NAMES, dparam_refs):
        ref[:] += dparams[name].astype(jnp.float32)


# ---------------------------------------------------------------------------
# pallas_call plumbing + custom VJP
# ---------------------------------------------------------------------------


def _flatten_params(layer_params) -> list[jax.Array]:
    """Layer pytree -> the kernel's flat (2-D) operand list."""
    p = layer_params
    return [
        p["qkv"]["w"], p["qkv"]["b"].reshape(1, -1),
        p["out"]["w"], p["out"]["b"].reshape(1, -1),
        p["ffn_in"]["w"], p["ffn_in"]["b"].reshape(1, -1),
        p["ffn_out"]["w"], p["ffn_out"]["b"].reshape(1, -1),
        p["ln1"]["scale"].reshape(1, -1), p["ln1"]["bias"].reshape(1, -1),
        p["ln2"]["scale"].reshape(1, -1), p["ln2"]["bias"].reshape(1, -1),
    ]


def _pick_block_batch(b: int, s: int, d: int, f: int, num_heads: int) -> int:
    """VMEM-bounded batch block: params + dparams (f32) are resident; the
    per-element attention transients and the (rows, F) FFN tensors scale
    with the block."""
    hs = num_heads * s
    static = 2 * 4 * (3 * d * d + d * d + 2 * d * f + 8 * d)  # params+grads f32
    if _pack_group(s, 1 << 30) > 1:
        # lane-packed wide path, per-element share of the per-group tiles:
        # qp/gwp (H*S, g*D) bf16, block-diag kp/vp (128, g*D) bf16, the
        # (H*S, 128) f32 probs family, dv/dk full (128, g*D) f32 outputs,
        # dqw_p (H*S, g*D) f32
        # measured on v5e: bt=16 at the flagship shape compiles and runs
        # 1.89 ms/step vs 1.96 at bt=8 — Mosaic's liveness overlaps the
        # f32 packed outputs, so they are counted at ~half their size
        attn = hs * d * 6 + 768 * d + 16 * hs * s
    else:  # wide path: (H*S, D) qw/gw bf16 + (H*S, S) probs-family f32
        attn = 2 * hs * d * 2 + 4 * hs * s * 4 + hs * d * 4
    per_elem = s * (3 * d + 2 * f + 8 * d) * 4 + attn
    # 14 MB: bt=16 at the flagship shape (measured 2.33 ms/step vs 2.34 at
    # bt=8, 2.67 at bt=4); bt=32 exceeds VMEM and fails to compile
    budget = 14_000_000 - static
    bt = max(1, budget // max(per_elem, 1))
    bt = 1 << (bt.bit_length() - 1)
    while b % bt:
        bt //= 2
    return max(bt, 1)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12)
)
def _fused_layer(x, mask, seeds, flat_params,
                 num_heads, s, d, f, causal, attn_rate, hidden_rate, eps,
                 interpret):
    return _fwd_call(
        x, mask, seeds, flat_params, num_heads, s, d, f, causal, attn_rate,
        hidden_rate, eps, interpret,
    )


def _specs(bt, s, d):
    x = pl.BlockSpec((bt, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((bt, 1, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole-array params
    return x, mask, seed, const


def _fwd_call(x, mask, seeds, flat_params, num_heads, s, d, f, causal,
              attn_rate, hidden_rate, eps, interpret):
    b = x.shape[0]
    bt = _pick_block_batch(b, s, d, f, num_heads)
    x_spec, mask_spec, seed_spec, const = _specs(bt, s, d)
    kern = functools.partial(
        _kernel_entry_fwd, num_heads=num_heads, s=s, d=d, causal=causal,
        attn_rate=attn_rate, hidden_rate=hidden_rate, eps=eps,
        dtype=x.dtype,
    )
    with _maybe_interpret(interpret):
        return pl.pallas_call(
            kern,
            grid=(b // bt,),
            in_specs=[x_spec, mask_spec, seed_spec]
            + [const] * len(flat_params),
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
        )(x, mask, seeds, *flat_params)


def _kernel_entry_fwd(x_ref, mask_ref, seed_ref, *rest, num_heads, s, d,
                      causal, attn_rate, hidden_rate, eps, dtype):
    *param_refs, out_ref = rest
    _fwd_kernel(
        x_ref, mask_ref, seed_ref, *param_refs, out_ref=out_ref,
        num_heads=num_heads, s=s, d=d, causal=causal, attn_rate=attn_rate,
        hidden_rate=hidden_rate, eps=eps, dtype=dtype,
    )


def _vjp_fwd(x, mask, seeds, flat_params, num_heads, s, d, f, causal,
             attn_rate, hidden_rate, eps, interpret):
    y = _fwd_call(
        x, mask, seeds, flat_params, num_heads, s, d, f, causal, attn_rate,
        hidden_rate, eps, interpret,
    )
    return y, (x, mask, seeds, flat_params)


def _vjp_bwd(num_heads, s, d, f, causal, attn_rate, hidden_rate, eps,
             interpret, residuals, g):
    x, mask, seeds, flat_params = residuals
    b = x.shape[0]
    bt = _pick_block_batch(b, s, d, f, num_heads)
    x_spec, mask_spec, seed_spec, const = _specs(bt, s, d)
    kern = functools.partial(
        _bwd_kernel, num_heads=num_heads, s=s, d=d, causal=causal,
        attn_rate=attn_rate, hidden_rate=hidden_rate, eps=eps, dtype=x.dtype,
    )
    dparam_shapes = [
        jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in flat_params
    ]
    # constant index map -> the grad block stays VMEM-resident across the
    # whole grid and accumulates in place (grid steps are sequential)
    dparam_specs = [
        pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for p in flat_params
    ]
    with _maybe_interpret(interpret):
        out = pl.pallas_call(
            kern,
            grid=(b // bt,),
            in_specs=[x_spec, mask_spec, seed_spec, x_spec]
            + [const] * len(flat_params),
            out_specs=[x_spec] + dparam_specs,
            out_shape=[jax.ShapeDtypeStruct((b, s, d), x.dtype)]
            + dparam_shapes,
        )(x, mask, seeds, g.astype(x.dtype), *flat_params)
    dx, *dflat = out
    return dx, None, None, tuple(
        dp.astype(p.dtype) for dp, p in zip(dflat, flat_params)
    )


_fused_layer.defvjp(_vjp_fwd, _vjp_bwd)


def fused_layer(
    x: jax.Array,
    layer_params,
    key_mask: jax.Array,
    *,
    num_heads: int,
    causal: bool,
    attn_dropout: float = 0.0,
    hidden_dropout: float = 0.0,
    dropout_seeds: jax.Array | None = None,
    ffn_dim: int,
    layer_norm_eps: float = 1e-12,
    interpret: bool = False,
) -> jax.Array:
    """One fused post-LN transformer layer (see module docstring).

    Args:
        x: (B, S, D) activations in the compute dtype.
        layer_params: one layer's pytree (``qkv``/``out``/``ffn_in``/
            ``ffn_out``/``ln1``/``ln2``), as produced by
            ``init_transformer_params`` and sliced per layer.
        key_mask: (B, S) key validity.
        dropout_seeds: (3,) uint32 site seeds (attention probs, post-attn
            hidden, post-FFN hidden) — the same derivation as
            ``transformer._dropout`` so streams match the XLA path exactly.

    Returns:
        (B, S, D) layer output in the compute dtype.
    """
    b, s, d = x.shape
    if s > 64:
        msg = (
            f"fused_layer supports s <= 64 (got s={s}): the per-head tall "
            "layout for long sequences was retired in round 4 — it lost to "
            "the XLA layer stack at every feasible shape (6.90 vs 6.51 ms "
            "at config #4) and d >= 512 cannot hold f32 params+grads in "
            "VMEM.  Long sequences run the XLA path (the gate in "
            "models/transformer._fused_layer_mode does this automatically)."
        )
        raise ValueError(msg)
    if dropout_seeds is None:
        dropout_seeds = jnp.zeros((3,), jnp.uint32)
        attn_dropout = 0.0
        hidden_dropout = 0.0
    f_pad = -(-ffn_dim // 128) * 128
    if f_pad != ffn_dim:
        # zero-pad the FFN width to the 128-lane boundary — EXACT: padded
        # hidden cols are 0*x + 0 bias, gelu(0) = 0, and the padded
        # ffn_out rows are 0, so outputs and all real-region grads are
        # bit-identical (padded-region grads are exactly 0 and jnp.pad's
        # VJP slices them away).  Lets the reference's ffn=48 config run
        # the fused kernel at 128/48 = 2.7x trivial extra MACs
        pad = f_pad - ffn_dim
        layer_params = dict(layer_params)
        layer_params["ffn_in"] = {
            "w": jnp.pad(layer_params["ffn_in"]["w"], ((0, 0), (0, pad))),
            "b": jnp.pad(layer_params["ffn_in"]["b"], (0, pad)),
        }
        layer_params["ffn_out"] = {
            "w": jnp.pad(layer_params["ffn_out"]["w"], ((0, pad), (0, 0))),
            "b": layer_params["ffn_out"]["b"],
        }
        ffn_dim = f_pad
    flat = _flatten_params(layer_params)
    mask = key_mask.astype(jnp.int32).reshape(b, 1, s)
    seeds_i32 = jax.lax.bitcast_convert_type(
        dropout_seeds.astype(jnp.uint32), jnp.int32
    )
    y = _fused_layer(
        x, mask, seeds_i32, tuple(flat),
        num_heads, s, d, ffn_dim, causal, float(attn_dropout),
        float(hidden_dropout), float(layer_norm_eps), interpret,
    )
    return y
