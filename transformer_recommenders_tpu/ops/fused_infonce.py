"""Fused in-batch InfoNCE (sampled-softmax) Pallas TPU kernel.

The training objective scores every query row against the SHARED negative
pool (``xfmr_rec/models.py:404-411`` semantics).  In XLA this materializes
an (R, Rn) float32 logit matrix in HBM (R = batch*seq: 8192 rows -> 256 MB)
that is written once and re-read by the loss reductions and again by the
backward pass — the step's dominant HBM traffic.

This kernel computes the per-row cross-entropy in flash-attention style:
tiles of the negative pool stream through VMEM, an online (max, sumexp)
accumulator per query row folds each tile in, and the logit matrix never
touches HBM.  The backward pass recomputes tile logits (two kernels: one
accumulating dQ/dP over pool tiles, one accumulating dNeg over row tiles)
— trading cheap MXU FLOPs for HBM bandwidth exactly like flash attention.

Semantics == ``ops.losses.infonce_loss`` with ``similarity="dot"``:
false-negative masking (neg logit >= pos logit dropped), ``scale``
temperature, invalid pool columns masked.  Equivalence is tested in
``tests/test_fused_infonce.py`` (interpret mode on CPU) including grads.

For cosine similarity, L2-normalize inputs first (one (R, D) pass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_BIG = -1e30  # large-finite; exp() underflows to 0 cleanly

# MXU input precision for the pool matmuls (one bf16 pass instead of the
# 3-6 passes an f32 matmul decomposes into).  The reference trains with
# precision="bf16-mixed" (xfmr_rec/trainer.py:450), so bf16 logits are
# reference-faithful; accumulation stays f32.  Tests may monkeypatch to
# float32 for exact oracle comparison.
_MATMUL_DTYPE = jnp.bfloat16


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _default_tiles(d: int, rn: int) -> tuple[int, int]:
    """VMEM-budgeted tiles.  Fewer/fatter column tiles win (measured on
    v5e: single column pass beat 4x2048 by 25%), bounded by the worst
    kernel's VMEM footprint — the dNeg backward holds the (tc, d) f32
    accumulator + (tr, tc) f32 logits + (tc, d) bf16 pool tile at once.

    The per-column model deliberately leaves ~1 MB of the 16 MB scoped
    limit for Pallas double buffering and XLA's surrounding stack; that
    headroom also has to cover the f32 (1, rn) row vectors the backward
    kernels stream (den/grad rows), which GROW with the pool.  At
    rn = 32768 (config #4 at B=256) the 4096-column tiles compiled at
    16.54 MB — 548 KB past the limit — so pools past 16k rows drop to
    2048-column tiles (compile-verified at the ML-25M B=256 shape)."""
    tr = 256
    budget = 15_000_000
    per_col = 4 * tr + 6 * d
    tc = budget // per_col
    tc = max(512, 1 << (tc.bit_length() - 1))  # pow2 floor
    # rn-proportional feasibility check calibrated against the ONE measured
    # failure: at rn=32768 with 4096-col tiles the dq/dp backward's scoped
    # stack was 16.54 MB vs the 16 MB limit.  per_col*tc models 10.49 MB of
    # that, so the unmodeled remainder is ~5 MB of fixed double-buffering/
    # scheduler overhead plus ~32 B per pool row (the f32 (1, rn) den/grad
    # vectors, x2 buffering).  Halve the tile until the calibrated total
    # fits; the config-4 bench shape (rn=8192 -> 15.75 MB) keeps its
    # measured-fastest 4096 tiles, rn >= 16384 drops to 2048
    # (compile-verified at the ML-25M B=256 shape, rn=32768).
    limit, fixed = 16_000_000, 5_000_000
    while tc > 512 and per_col * tc + fixed + 32 * rn > limit:
        tc //= 2
    return tr, min(tc, max(_round_up(rn, 128), 128))


# ---------------------------------------------------------------------------
# forward: per-row CE with online logsumexp
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref, p_ref, n_ref, nv_ref, ce_ref, m_scr, a_scr, pos_scr,
    *, scale: float, mask_fn: bool, num_col_tiles: int,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        pos = jnp.sum(
            q_ref[:].astype(jnp.float32) * p_ref[:].astype(jnp.float32), axis=1
        ) * scale  # (Tr,)
        pos_scr[:] = pos
        m_scr[:] = pos  # running max starts at the positive logit
        a_scr[:] = jnp.ones_like(pos)  # exp(pos - pos) = 1

    pos = pos_scr[:]
    logits = (
        jnp.dot(q_ref[:], n_ref[:].T, preferred_element_type=jnp.float32) * scale
    )  # (Tr, Tc)
    valid = nv_ref[:] > 0  # (1, Tc)
    if mask_fn:
        valid = valid & (logits < pos[:, None])
    logits = jnp.where(valid, logits, _NEG_BIG)

    m_prev, a_prev = m_scr[:], a_scr[:]
    m_tile = jnp.max(logits, axis=1)
    m_new = jnp.maximum(m_prev, m_tile)
    a_new = a_prev * jnp.exp(m_prev - m_new) + jnp.sum(
        jnp.exp(logits - m_new[:, None]), axis=1
    )
    m_scr[:] = m_new
    a_scr[:] = a_new

    @pl.when(j == num_col_tiles - 1)
    def _finish():
        lse = m_scr[:] + jnp.log(a_scr[:])
        ce_ref[0, :] = lse - pos_scr[:]


def _fwd(q, p, n, nv, *, scale, mask_fn, tr, tc):
    r, d = q.shape
    rn = n.shape[0]
    grid = (r // tr, rn // tc)
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, mask_fn=mask_fn, num_col_tiles=grid[1]
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, r), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tr,), jnp.float32),
            pltpu.VMEM((tr,), jnp.float32),
            pltpu.VMEM((tr,), jnp.float32),
        ],
    )(q, p, n, nv)


# ---------------------------------------------------------------------------
# backward
#   p_i   = exp(s*pos_i - lse_i)
#   q_ij  = exp(s*l_ij - lse_i) * valid_ij
#   dpos  = g_i * s * (p_i - 1)          -> dP_i = dpos * Q_i ; part of dQ
#   dl_ij = g_i * s * q_ij               -> dQ_i += sum_j dl_ij N_j
#                                           dN_j += sum_i dl_ij Q_i
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    q_ref, p_ref, n_ref, nv_ref, lse_ref, g_ref, dq_ref, dp_ref, acc_scr,
    *, scale: float, mask_fn: bool, num_col_tiles: int,
):
    j = pl.program_id(1)

    pos = jnp.sum(
        q_ref[:].astype(jnp.float32) * p_ref[:].astype(jnp.float32), axis=1
    ) * scale  # (Tr,)
    lse = lse_ref[0, :]
    g = g_ref[0, :]

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    logits = (
        jnp.dot(q_ref[:], n_ref[:].T, preferred_element_type=jnp.float32) * scale
    )
    valid = nv_ref[:] > 0
    if mask_fn:
        valid = valid & (logits < pos[:, None])
    qprob = jnp.where(valid, jnp.exp(logits - lse[:, None]), 0.0)  # (Tr, Tc)
    dl = (qprob * (g * scale)[:, None]).astype(n_ref.dtype)
    acc_scr[:, :] += jnp.dot(dl, n_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == num_col_tiles - 1)
    def _finish():
        pprob = jnp.exp(pos - lse)
        dpos = g * scale * (pprob - 1.0)  # (Tr,)
        dq_ref[:, :] = acc_scr[:, :] + dpos[:, None] * p_ref[:].astype(jnp.float32)
        dp_ref[:, :] = dpos[:, None] * q_ref[:].astype(jnp.float32)


def _bwd_dn_kernel(
    q_ref, p_ref, n_ref, nv_ref, lse_ref, g_ref, dn_ref, acc_scr,
    *, scale: float, mask_fn: bool, num_row_tiles: int,
):
    i = pl.program_id(1)  # row tiles innermost so dn block stays resident

    @pl.when(i == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    pos = jnp.sum(
        q_ref[:].astype(jnp.float32) * p_ref[:].astype(jnp.float32), axis=1
    ) * scale
    lse = lse_ref[0, :]
    g = g_ref[0, :]
    logits = (
        jnp.dot(q_ref[:], n_ref[:].T, preferred_element_type=jnp.float32) * scale
    )
    valid = nv_ref[:] > 0
    if mask_fn:
        valid = valid & (logits < pos[:, None])
    qprob = jnp.where(valid, jnp.exp(logits - lse[:, None]), 0.0)
    dl = (qprob * (g * scale)[:, None]).astype(q_ref.dtype)  # (Tr, Tc)
    acc_scr[:, :] += jnp.dot(dl.T, q_ref[:], preferred_element_type=jnp.float32)

    @pl.when(i == num_row_tiles - 1)
    def _finish():
        dn_ref[:, :] = acc_scr[:, :]


def _bwd(q, p, n, nv, lse, g, *, scale, mask_fn, tr, tc):
    r, d = q.shape
    rn = n.shape[0]
    grid_dq = (r // tr, rn // tc)
    dq, dp = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, mask_fn=mask_fn, num_col_tiles=grid_dq[1]
        ),
        grid=grid_dq,
        in_specs=[
            pl.BlockSpec((tr, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tr, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, d), jnp.float32),
            jax.ShapeDtypeStruct((r, d), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tr, d), jnp.float32)],
    )(q, p, n, nv, lse, g)

    grid_dn = (rn // tc, r // tr)
    dn = pl.pallas_call(
        functools.partial(
            _bwd_dn_kernel, scale=scale, mask_fn=mask_fn, num_row_tiles=grid_dn[1]
        ),
        grid=grid_dn,
        in_specs=[
            pl.BlockSpec((tr, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda j, i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tc, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rn, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tc, d), jnp.float32)],
    )(q, p, n, nv, lse, g)
    return dq, dp, dn


# ---------------------------------------------------------------------------
# public API with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8)
)
def fused_infonce_rowwise(
    q: jax.Array,
    p: jax.Array,
    n: jax.Array,
    neg_valid: jax.Array,
    scale: float = 1.0,
    mask_false_negatives: bool = True,
    tile_rows: int = 256,
    tile_cols: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Per-row InfoNCE cross-entropy against the shared pool.

    Args:
        q: (R, D) float32 queries (R divisible by ``tile_rows``; use
            :func:`pad_rows` otherwise).
        p: (R, D) positives.
        n: (Rn, D) shared negative pool (Rn divisible by ``tile_cols``).
        neg_valid: (1, Rn) float/bool validity of pool columns.
        scale: temperature multiplier.
        mask_false_negatives: drop pool entries with logit >= positive.

    Returns:
        (R,) float32 per-row CE; callers reduce with their row-validity
        weights (``sum(ce * row_valid)`` == reference InfoNCELoss).
    """
    ce, _ = _fwd_with_lse(
        q, p, n, neg_valid, scale, mask_false_negatives, tile_rows, tile_cols, interpret
    )
    return ce


def _fwd_with_lse(q, p, n, nv, scale, mask_fn, tr, tc, interpret):
    qm, pm, nm = (x.astype(_MATMUL_DTYPE) for x in (q, p, n))
    with _maybe_interpret(interpret):
        ce = _fwd(
            qm, pm, nm, nv.astype(jnp.float32),
            scale=scale, mask_fn=mask_fn, tr=tr, tc=tc,
        )[0]
    pos = (
        jnp.sum(qm.astype(jnp.float32) * pm.astype(jnp.float32), axis=1) * scale
    )
    lse = ce + pos
    return ce, lse


def _vjp_fwd(q, p, n, neg_valid, scale, mask_fn, tr, tc, interpret):
    ce, lse = _fwd_with_lse(q, p, n, neg_valid, scale, mask_fn, tr, tc, interpret)
    return ce, (q, p, n, neg_valid, lse)


def _vjp_bwd(scale, mask_fn, tr, tc, interpret, residuals, g):
    q, p, n, nv, lse = residuals
    qm, pm, nm = (x.astype(_MATMUL_DTYPE) for x in (q, p, n))
    with _maybe_interpret(interpret):
        dq, dp, dn = _bwd(
            qm, pm, nm,
            nv.astype(jnp.float32),
            lse.reshape(1, -1),
            g.astype(jnp.float32).reshape(1, -1),
            scale=scale,
            mask_fn=mask_fn,
            tr=tr,
            tc=tc,
        )
    return dq.astype(q.dtype), dp.astype(p.dtype), dn.astype(n.dtype), None


fused_infonce_rowwise.defvjp(_vjp_fwd, _vjp_bwd)


class _maybe_interpret:
    def __init__(self, on: bool) -> None:
        self.on = on
        self._cm = None

    def __enter__(self):
        if self.on:
            self._cm = pltpu.force_tpu_interpret_mode()
            self._cm.__enter__()

    def __exit__(self, *exc):
        if self._cm is not None:
            return self._cm.__exit__(*exc)
        return False


def fused_infonce_loss(
    q: jax.Array,
    p: jax.Array,
    n: jax.Array,
    row_valid: jax.Array,
    neg_valid: jax.Array,
    *,
    scale: float = 1.0,
    mask_false_negatives: bool = True,
    tile_rows: int | None = None,
    tile_cols: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Scalar InfoNCE sum over valid rows — drop-in for
    ``ops.losses.infonce_loss`` on the training hot path.

    Pads R/Rn up to tile multiples internally (padded rows/columns carry
    zero validity).
    """
    r, d = q.shape
    rn = n.shape[0]
    if tile_rows is None or tile_cols is None:
        tile_rows, tile_cols = _default_tiles(d, rn)
    # clamp tiles for small problems (single tile each way)
    tile_rows = min(tile_rows, _round_up(r, 16))
    tile_cols = min(tile_cols, _round_up(rn, 128))
    rp, rnp = _round_up(r, tile_rows), _round_up(rn, tile_cols)
    if rp != r:
        pad = rp - r
        q = jnp.pad(q, ((0, pad), (0, 0)))
        # padded positives get a harmless unit logit via zero vectors
        p = jnp.pad(p, ((0, pad), (0, 0)))
        row_valid = jnp.pad(row_valid.astype(jnp.float32), (0, pad))
    if rnp != rn:
        n = jnp.pad(n, ((0, rnp - rn), (0, 0)))
        neg_valid = jnp.pad(neg_valid.astype(jnp.float32), (0, rnp - rn))
    ce = fused_infonce_rowwise(
        q,
        p,
        n,
        neg_valid.reshape(1, -1),
        scale,
        mask_false_negatives,
        tile_rows,
        tile_cols,
        interpret,
    )
    return jnp.sum(ce * row_valid.astype(jnp.float32))
