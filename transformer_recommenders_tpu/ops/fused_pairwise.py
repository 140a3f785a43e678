"""Fused pairwise/contrastive loss Pallas kernel (CCL / hinge / BPR heads).

Covers the three weighted-mean loss heads (``xfmr_rec/losses.py:355-372,
514-543``):

- ``ContrastiveLoss`` (~CCL):        f(l) = relu(l - 1 + margin)
- ``PairwiseHingeLoss``:             f(l) = relu(l - pos*(1 - margin))
- ``PairwiseLogisticLoss`` (~BPR):   f(l) = softplus(l - pos*(1 - margin))

each reduced per row as ``weighted_mean(f, mask)`` with the false-negative
mask (neg logit >= pos logit dropped) and summed over valid rows.  Like
``fused_infonce``, logit tiles stream through VMEM and the (R, Rn) matrix
never reaches HBM; the backward recomputes tiles (dQ/dP kernel + dNeg
kernel) with the per-row mask count saved as the only residual.

ContrastiveLoss expects COSINE logits: L2-normalize inputs first (the
normalization stays in XLA so its gradient chains automatically).

Semantics equivalence vs ``ops.losses`` is tested in
``tests/test_fused_pairwise.py`` (values + grads, interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# heads whose pool reduction the kernel implements directly; NCELoss adds a
# per-row positive BCE term composed OUTSIDE the kernel (cheap (R,) math),
# and Alignment(Contrastive)Loss compose alignment the same way — see
# training.train_state._fused_objective
HEADS = (
    "ContrastiveLoss",
    "PairwiseHingeLoss",
    "PairwiseLogisticLoss",
    "NCELoss",
)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _scores_and_fprime(head: str, logits, pos, margin):
    if head == "ContrastiveLoss":
        s = logits - 1.0 + margin
    elif head == "NCELoss":  # negatives labeled 0: BCE = softplus(logit)
        s = logits
    else:
        s = logits - (pos * (1.0 - margin))[:, None]
    if head in ("PairwiseLogisticLoss", "NCELoss"):
        return jax.nn.softplus(s), jax.nn.sigmoid(s)
    return jax.nn.relu(s), (s > 0).astype(jnp.float32)


def _pos_tile(q_ref, p_ref, scale_to_f32=True):
    return jnp.sum(
        q_ref[:].astype(jnp.float32) * p_ref[:].astype(jnp.float32), axis=1
    )


def _fwd_kernel(
    q_ref, p_ref, n_ref, nv_ref, out_ref, den_ref, num_scr, den_scr,
    *, head: str, margin: float, mask_fn: bool, num_col_tiles: int,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        num_scr[:] = jnp.zeros_like(num_scr)
        den_scr[:] = jnp.zeros_like(den_scr)

    pos = _pos_tile(q_ref, p_ref)
    logits = jnp.dot(q_ref[:], n_ref[:].T, preferred_element_type=jnp.float32)
    valid = nv_ref[:] > 0
    if mask_fn:
        valid = valid & (logits < pos[:, None])
    f, _ = _scores_and_fprime(head, logits, pos, margin)
    w = valid.astype(jnp.float32)
    num_scr[:] += jnp.sum(f * w, axis=1)
    den_scr[:] += jnp.sum(w, axis=1)

    @pl.when(j == num_col_tiles - 1)
    def _finish():
        out_ref[0, :] = num_scr[:] / (den_scr[:] + 1e-9)
        den_ref[0, :] = den_scr[:]


def _bwd_dq_kernel(
    q_ref, p_ref, n_ref, nv_ref, den_ref, g_ref, dq_ref, dp_ref,
    acc_scr, dpos_scr,
    *, head: str, margin: float, mask_fn: bool, num_col_tiles: int,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        dpos_scr[:] = jnp.zeros_like(dpos_scr)

    pos = _pos_tile(q_ref, p_ref)
    den = den_ref[0, :]
    g = g_ref[0, :]
    logits = jnp.dot(q_ref[:], n_ref[:].T, preferred_element_type=jnp.float32)
    valid = nv_ref[:] > 0
    if mask_fn:
        valid = valid & (logits < pos[:, None])
    _, fp = _scores_and_fprime(head, logits, pos, margin)
    w = valid.astype(jnp.float32) * (g / (den + 1e-9))[:, None]
    dl = (w * fp).astype(n_ref.dtype)  # (Tr, Tc)
    acc_scr[:, :] += jnp.dot(dl, n_ref[:], preferred_element_type=jnp.float32)
    if head not in ("ContrastiveLoss", "NCELoss"):
        dpos_scr[:] += jnp.sum(w * fp, axis=1) * (-(1.0 - margin))

    @pl.when(j == num_col_tiles - 1)
    def _finish():
        dq_ref[:, :] = acc_scr[:, :] + dpos_scr[:][:, None] * p_ref[:].astype(
            jnp.float32
        )
        dp_ref[:, :] = dpos_scr[:][:, None] * q_ref[:].astype(jnp.float32)


def _bwd_dn_kernel(
    q_ref, p_ref, n_ref, nv_ref, den_ref, g_ref, dn_ref, acc_scr,
    *, head: str, margin: float, mask_fn: bool, num_row_tiles: int,
):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    pos = _pos_tile(q_ref, p_ref)
    den = den_ref[0, :]
    g = g_ref[0, :]
    logits = jnp.dot(q_ref[:], n_ref[:].T, preferred_element_type=jnp.float32)
    valid = nv_ref[:] > 0
    if mask_fn:
        valid = valid & (logits < pos[:, None])
    _, fp = _scores_and_fprime(head, logits, pos, margin)
    w = valid.astype(jnp.float32) * (g / (den + 1e-9))[:, None]
    dl = (w * fp).astype(q_ref.dtype)
    acc_scr[:, :] += jnp.dot(dl.T, q_ref[:], preferred_element_type=jnp.float32)

    @pl.when(i == num_row_tiles - 1)
    def _finish():
        dn_ref[:, :] = acc_scr[:, :]


def _specs(tr, tc, d):
    return [
        pl.BlockSpec((tr, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tc, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def fused_pairwise_rowwise(
    q, p, n, neg_valid,
    head: str,
    margin: float = 0.5,
    mask_false_negatives: bool = True,
    tile_rows: int = 256,
    tile_cols: int = 4096,
    interpret: bool = False,
):
    """Per-row weighted-mean loss for ``head`` against the shared pool."""
    out, _ = _fwd(
        q, p, n, neg_valid, head, margin, mask_false_negatives,
        tile_rows, tile_cols, interpret,
    )
    return out


def _fwd(q, p, n, nv, head, margin, mask_fn, tr, tc, interpret):
    import transformer_recommenders_tpu.ops.fused_infonce as fi

    dtype = fi._MATMUL_DTYPE
    qm, pm, nm = (x.astype(dtype) for x in (q, p, n))
    r, d = q.shape
    rn = n.shape[0]
    grid = (r // tr, rn // tc)
    kernel = functools.partial(
        _fwd_kernel, head=head, margin=margin, mask_fn=mask_fn,
        num_col_tiles=grid[1],
    )
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_specs(tr, tc, d),
        out_specs=[
            pl.BlockSpec((1, tr), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tr,), jnp.float32),
            pltpu.VMEM((tr,), jnp.float32),
        ],
        interpret=interpret,
    )
    out, den = call(qm, pm, nm, nv.astype(jnp.float32))
    return out[0], den[0]


def _vjp_fwd(q, p, n, nv, head, margin, mask_fn, tr, tc, interpret):
    out, den = _fwd(q, p, n, nv, head, margin, mask_fn, tr, tc, interpret)
    return out, (q, p, n, nv, den)


def _vjp_bwd(head, margin, mask_fn, tr, tc, interpret, residuals, g):
    import transformer_recommenders_tpu.ops.fused_infonce as fi

    q, p, n, nv, den = residuals
    dtype = fi._MATMUL_DTYPE
    qm, pm, nm = (x.astype(dtype) for x in (q, p, n))
    r, d = q.shape
    rn = n.shape[0]
    nvf = nv.astype(jnp.float32)
    den2 = den.reshape(1, -1)
    g2 = g.astype(jnp.float32).reshape(1, -1)

    grid_dq = (r // tr, rn // tc)
    dq, dp = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, head=head, margin=margin, mask_fn=mask_fn,
            num_col_tiles=grid_dq[1],
        ),
        grid=grid_dq,
        in_specs=_specs(tr, tc, d)
        + [
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
        scratch_shapes=[
            pltpu.VMEM((tr, d), jnp.float32),
            pltpu.VMEM((tr,), jnp.float32),
        ],
        interpret=interpret,
    )(qm, pm, nm, nvf, den2, g2)

    grid_dn = (rn // tc, r // tr)
    dn = pl.pallas_call(
        functools.partial(
            _bwd_dn_kernel, head=head, margin=margin, mask_fn=mask_fn,
            num_row_tiles=grid_dn[1],
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
        out_specs=pl.BlockSpec(
            (tc, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rn, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tc, d), jnp.float32)],
        interpret=interpret,
    )(qm, pm, nm, nvf, den2, g2)
    return dq.astype(q.dtype), dp.astype(p.dtype), dn.astype(n.dtype), None


fused_pairwise_rowwise.defvjp(_vjp_fwd, _vjp_bwd)


def fused_pairwise_loss(
    q, p, n, row_valid, neg_valid,
    *,
    head: str,
    margin: float = 0.5,
    mask_false_negatives: bool = True,
    tile_rows: int | None = None,
    tile_cols: int | None = None,
    interpret: bool = False,
):
    """Scalar sum over valid rows — drop-in for the CCL/hinge/BPR heads of
    ``ops.losses`` on the training hot path.

    ``ContrastiveLoss`` is a cosine head: pass L2-NORMALIZED q/p/n.
    """
    if head not in HEADS:
        msg = f"unsupported head: {head}"
        raise ValueError(msg)
    from transformer_recommenders_tpu.ops.fused_infonce import _default_tiles

    r, d = q.shape
    rn = n.shape[0]
    if tile_rows is None or tile_cols is None:
        tile_rows, tile_cols = _default_tiles(d, rn)
    tile_rows = min(tile_rows, _round_up(r, 16))
    tile_cols = min(tile_cols, _round_up(rn, 128))
    rp, rnp = _round_up(r, tile_rows), _round_up(rn, tile_cols)
    if rp != r:
        pad = rp - r
        q = jnp.pad(q, ((0, pad), (0, 0)))
        p = jnp.pad(p, ((0, pad), (0, 0)))
        row_valid = jnp.pad(row_valid.astype(jnp.float32), (0, pad))
    if rnp != rn:
        n = jnp.pad(n, ((0, rnp - rn), (0, 0)))
        neg_valid = jnp.pad(neg_valid.astype(jnp.float32), (0, rnp - rn))
    rows = fused_pairwise_rowwise(
        q, p, n, neg_valid.reshape(1, -1),
        head, margin, mask_false_negatives, tile_rows, tile_cols, interpret,
    )
    return jnp.sum(rows * row_valid.astype(jnp.float32))
