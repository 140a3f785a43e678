"""Table-scored fused InfoNCE: score queries against the CATALOG, not the pool.

The in-batch objective scores every query row against a shared pool of
``Rn = batch*seq`` sampled negatives plus its own positive
(``xfmr_rec/models.py:404-411`` + ``losses.py:472-488`` semantics).  The
pool rows are just catalog rows, so when the catalog is SMALLER than the
pool (ML-1M: 3.7k items vs an 8k-row pool) the pool formulation does
redundant work twice over:

1. it gathers ``2*R`` pos/neg rows from the table (and scatter-adds their
   gradients back — the two most expensive Pallas calls in the round-1
   step trace), and
2. its ``(R, Rn)`` logit matmul re-scores duplicate items.

This kernel scores ``q @ table^T`` once — ``(R, N)`` with ``N < Rn`` — and
weights each item column by its NEGATIVE-POOL COUNT ``c_i = #{j : neg_idx_j
= i, valid}``.  Exactly equivalent: every pool entry of item ``i``
contributes the identical logit, so

    sum_j  m_rj * exp(s * q_r . n_j)  ==  sum_i  c_i * m_ri * exp(s * q_r . t_i)

including the false-negative mask (``logit >= pos`` masks all copies of an
item identically) and duplicate negatives (counts >= 2).  The positive
logit is selected IN-KERNEL from the same score tile (one-hot compare on
the column iota), so pos/neg rows are never gathered at all, and the
backward emits a DENSE ``d(table)`` from one MXU matmul — no scatter.

Multi-chip bonus (``parallel/train.py``): the distributed-invariant shared
pool needs only a ``psum`` of the (N,) count vector across data shards
instead of all-gathering ``(Rn, D)`` negative rows.

Gating: worth it when ``N <= ~2 * Rn`` (the matmul is ``N/Rn`` the FLOPs
and the 2R gathers + scatter disappear); larger catalogs (ML-25M) keep the
pool kernel (``ops/fused_infonce.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transformer_recommenders_tpu.ops.fused_infonce import _maybe_interpret

_NEG_BIG = -1e30

# one bf16 MXU pass (f32 accumulation) — same convention and rationale as
# ops/fused_infonce.py (_MATMUL_DTYPE there); reference trains bf16-mixed
_MATMUL_DTYPE = jnp.bfloat16


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def neg_pool_counts(
    neg_idx: jax.Array, neg_valid: jax.Array, num_rows: int
) -> jax.Array:
    """(N,) f32 histogram of the negative pool over table rows.

    Computed as a fused compare-reduce (no scatter: TPU scatter-add is
    latency-bound at ~0.13 us/element).  ``neg_valid`` weights each pool
    entry; row 0 (padding) always gets count 0.
    """
    cols = jnp.arange(num_rows, dtype=neg_idx.dtype)
    hits = jnp.where(
        neg_idx.reshape(-1)[:, None] == cols[None, :],
        neg_valid.reshape(-1).astype(jnp.float32)[:, None],
        0.0,
    )
    counts = jnp.sum(hits, axis=0)
    return counts.at[0].set(0.0)


# ---------------------------------------------------------------------------
# forward: per-row CE against the count-weighted catalog
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref, t_ref, pos_ref, cnt_ref, ce_ref, lse_ref, *, scale: float, mask_fn: bool
):
    x = (
        jnp.dot(q_ref[:], t_ref[:].T, preferred_element_type=jnp.float32) * scale
    )  # (Tr, N)
    tr, n = x.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (tr, n), 1)
    sel = col == pos_ref[0, :][:, None]
    pos = jnp.sum(jnp.where(sel, x, 0.0), axis=1)  # (Tr,)

    w = cnt_ref[0, :][None, :] * jnp.ones((tr, 1), jnp.float32)  # (Tr, N)
    if mask_fn:
        w = jnp.where(x < pos[:, None], w, 0.0)
    xm = jnp.where(w > 0, x, _NEG_BIG)
    m = jnp.maximum(pos, jnp.max(xm, axis=1))
    a = jnp.exp(pos - m) + jnp.sum(w * jnp.exp(xm - m[:, None]), axis=1)
    lse = m + jnp.log(a)
    ce_ref[0, :] = lse - pos
    lse_ref[0, :] = lse


def _fwd(q, t, pos_idx, counts, *, scale, mask_fn, tr):
    r, d = q.shape
    n = t.shape[0]
    grid = (r // tr,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, mask_fn=mask_fn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tr), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.float32),
        ],
    )(q, t, pos_idx, counts)


# ---------------------------------------------------------------------------
# backward
#   qprob_ri = c_i m_ri exp(x_ri - lse_r)      pprob_r = exp(pos_r - lse_r)
#   dl_ri    = g_r s (qprob_ri + sel_ri (pprob_r - 1))
#   dQ_i     = dl @ T                 dT += dl^T @ Q   (dense — no scatter)
# ---------------------------------------------------------------------------


def _bwd_kernel(
    q_ref, t_ref, pos_ref, cnt_ref, lse_ref, g_ref, dq_ref, dt_ref,
    *, scale: float, mask_fn: bool,
):
    # dt's block has a constant index map, so it stays VMEM-resident across
    # the whole row-tile grid: accumulate into it directly (no scratch).
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dt_ref[:] = jnp.zeros_like(dt_ref)

    x = (
        jnp.dot(q_ref[:], t_ref[:].T, preferred_element_type=jnp.float32) * scale
    )  # (Tr, N)
    tr, n = x.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (tr, n), 1)
    sel = col == pos_ref[0, :][:, None]
    pos = jnp.sum(jnp.where(sel, x, 0.0), axis=1)

    w = cnt_ref[0, :][None, :] * jnp.ones((tr, 1), jnp.float32)
    if mask_fn:
        w = jnp.where(x < pos[:, None], w, 0.0)
    lse = lse_ref[0, :]
    g = g_ref[0, :]
    # guard masked columns before exp: x can exceed lse by hundreds there
    # (exp -> inf, then w * inf = NaN); matches the fwd's xm guard
    xm = jnp.where(w > 0, x, _NEG_BIG)
    qprob = w * jnp.exp(xm - lse[:, None])
    pprob = jnp.exp(pos - lse)
    dl = (g * scale)[:, None] * (
        qprob + jnp.where(sel, (pprob - 1.0)[:, None], 0.0)
    )
    dlm = dl.astype(t_ref.dtype)
    dq_ref[:, :] = jnp.dot(dlm, t_ref[:], preferred_element_type=jnp.float32)
    dt_ref[:, :] += jnp.dot(dlm.T, q_ref[:], preferred_element_type=jnp.float32)


def _bwd(q, t, pos_idx, counts, lse, g, *, scale, mask_fn, tr):
    r, d = q.shape
    n = t.shape[0]
    grid = (r // tr,)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, mask_fn=mask_fn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tr, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, d), jnp.float32),
            jax.ShapeDtypeStruct((n, d), jnp.float32),
        ],
    )(q, t, pos_idx, counts, lse, g)


# ---------------------------------------------------------------------------
# public API with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def table_infonce_rowwise(
    q: jax.Array,
    table: jax.Array,
    pos_idx: jax.Array,
    counts: jax.Array,
    scale: float = 1.0,
    mask_false_negatives: bool = True,
    tile_rows: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Per-row InfoNCE CE against the count-weighted catalog.

    Args:
        q: (R, D) queries, R divisible by ``tile_rows``.
        table: (N, D) catalog in query space; row 0 = zero padding row;
            N a multiple of 128 (pad rows carry count 0).
        pos_idx: (1, R) int32 positive row per query (0 for invalid rows).
        counts: (1, N) f32 negative-pool multiplicity per catalog row.

    Returns:
        (R,) f32 per-row CE; reduce as ``sum(ce * row_valid)``.
    """
    ce, _ = _fwd_with_lse(
        q, table, pos_idx, counts, scale, mask_false_negatives, tile_rows, interpret
    )
    return ce


def _fwd_with_lse(q, table, pos_idx, counts, scale, mask_fn, tr, interpret):
    qm = q.astype(_MATMUL_DTYPE)
    tm = table.astype(_MATMUL_DTYPE)
    with _maybe_interpret(interpret):
        ce, lse = _fwd(
            qm, tm, pos_idx.astype(jnp.int32), counts.astype(jnp.float32),
            scale=scale, mask_fn=mask_fn, tr=tr,
        )
    return ce[0], lse[0]


def _vjp_fwd(q, table, pos_idx, counts, scale, mask_fn, tr, interpret):
    ce, lse = _fwd_with_lse(q, table, pos_idx, counts, scale, mask_fn, tr, interpret)
    return ce, (q, table, pos_idx, counts, lse)


def _vjp_bwd(scale, mask_fn, tr, interpret, residuals, g):
    q, table, pos_idx, counts, lse = residuals
    qm = q.astype(_MATMUL_DTYPE)
    tm = table.astype(_MATMUL_DTYPE)
    with _maybe_interpret(interpret):
        dq, dt = _bwd(
            qm, tm, pos_idx.astype(jnp.int32), counts.astype(jnp.float32),
            lse.reshape(1, -1), g.astype(jnp.float32).reshape(1, -1),
            scale=scale, mask_fn=mask_fn, tr=tr,
        )
    return dq.astype(q.dtype), dt.astype(table.dtype), None, None


table_infonce_rowwise.defvjp(_vjp_fwd, _vjp_bwd)


def fused_table_infonce_loss(
    q: jax.Array,
    table: jax.Array,
    pos_idx: jax.Array,
    neg_idx: jax.Array,
    row_valid: jax.Array,
    neg_valid: jax.Array,
    *,
    scale: float = 1.0,
    mask_false_negatives: bool = True,
    counts: jax.Array | None = None,
    tile_rows: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Scalar InfoNCE sum over valid rows — semantics identical to
    ``fused_infonce_loss(q, table[pos_idx], table[neg_idx], row_valid,
    neg_valid)`` but without ever gathering pos/neg rows.

    ``counts`` can be passed pre-reduced (the sharded trainer psums local
    histograms across the data axis to realize the distributed-invariant
    shared pool); otherwise computed from ``neg_idx``/``neg_valid``.
    """
    r, d = q.shape
    n = table.shape[0]
    if counts is None:
        counts = neg_pool_counts(neg_idx, neg_valid, n)
    if n > 2048:  # shrink the (tr, N) f32 score tile for big catalogs
        tile_rows = min(tile_rows, 128)
    tr = min(tile_rows, _round_up(r, 16))
    rp = _round_up(r, tr)
    np_ = _round_up(n, 128)
    if rp != r:
        pad = rp - r
        q = jnp.pad(q, ((0, pad), (0, 0)))
        pos_idx = jnp.pad(pos_idx.reshape(-1), (0, pad))
        row_valid = jnp.pad(row_valid.astype(jnp.float32), (0, pad))
    if np_ != n:
        table = jnp.pad(table, ((0, np_ - n), (0, 0)))
        counts = jnp.pad(counts.reshape(-1), (0, np_ - n))
    ce = table_infonce_rowwise(
        q,
        table,
        pos_idx.reshape(1, -1),
        counts.reshape(1, -1),
        scale,
        mask_false_negatives,
        tr,
        interpret,
    )
    return jnp.sum(ce * row_valid.astype(jnp.float32).reshape(-1))
