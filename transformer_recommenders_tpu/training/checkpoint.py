"""Checkpoint/resume for the train state.

Parity: Lightning auto-``ModelCheckpoint`` monitoring
``val/retrieval_normalized_dcg`` (max) + resume via ``ckpt_path``
(``xfmr_rec/trainer.py:334-341``, SURVEY.md §5.4).  Like the reference,
the frozen item-embedding table is NOT checkpointed (reference pops it from
``state_dict``, trainer.py:352-362); it is regenerated from the items
dataset on load.

Format: flat npz of pytree leaves + a JSON sidecar with step/epoch/metric.
The leaf order is the deterministic ``jax.tree`` flatten order of a state
template built from the config, so restore needs no stored treedef.  A
sharded orbax backend can replace this for multi-host runs.
"""

from __future__ import annotations

import json
import pathlib
from typing import Any

import jax
import numpy as np

from transformer_recommenders_tpu.training.train_state import TrainState


def save_checkpoint(
    path: str | pathlib.Path,
    state: TrainState,
    *,
    epoch: int,
    metrics: dict[str, float] | None = None,
    backend: str = "npz",
) -> None:
    """``backend="npz"``: single-host flat leaves.  ``backend="orbax"``:
    orbax StandardCheckpointer — handles sharded device arrays natively,
    the right choice for multi-host meshes."""
    path = pathlib.Path(path)
    path.mkdir(parents=True, exist_ok=True)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save((path / "orbax").absolute(), dict(state._asdict()), force=True)
        ckptr.wait_until_finished()
    else:
        leaves = jax.tree.leaves(state)
        np.savez(
            path / "state.npz",
            **{f"leaf{i}": np.asarray(x) for i, x in enumerate(leaves)},
        )
    meta = {"epoch": epoch, "step": int(state.step), "metrics": metrics or {}}
    (path / "meta.json").write_text(json.dumps(meta, indent=2))


def load_checkpoint(
    path: str | pathlib.Path, template: TrainState
) -> tuple[TrainState, dict[str, Any]]:
    """Restore into the template's tree structure; backend auto-detected."""
    path = pathlib.Path(path)
    if (path / "orbax").exists():
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore((path / "orbax").absolute(), dict(template._asdict()))
        state = TrainState(**restored)
    else:
        treedef = jax.tree.structure(template)
        with np.load(path / "state.npz") as data:
            leaves = [
                jax.numpy.asarray(data[f"leaf{i}"]) for i in range(len(data.files))
            ]
        n_expect = treedef.num_leaves
        if len(leaves) != n_expect:
            # Opt-state layout changed between save and restore (flat fused
            # AdamW vs per-leaf optax — e.g. ``accumulate_grad_batches``
            # flipped across the resume, or an old pre-flat checkpoint).
            # Convert between the two moment layouts when possible; fail
            # loudly otherwise instead of a cryptic unflatten error
            # (ADVICE round 2).
            leaves = _convert_opt_leaves(leaves, template)
        state = jax.tree.unflatten(treedef, leaves)
    meta = json.loads((path / "meta.json").read_text())
    return state, meta


def _convert_opt_leaves(leaves: list, template: TrainState) -> list:
    """Re-layout a stored leaf list whose opt-state format (flat fused AdamW
    vs per-leaf ``optax.adamw``) differs from the template's.

    Stored order is always ``[*params_leaves, *opt_leaves, step]``.  The flat
    layout's opt leaves are ``[count, mu_flat, nu_flat]``; plain optax adamw's
    are ``[count, *mu_leaves, *nu_leaves]`` (mu/nu mirror the param tree;
    clip chains contribute only empty states).  Anything else — e.g.
    ``optax.MultiSteps`` accumulators — cannot be recovered from the other
    side and raises with the layouts named."""
    from jax.flatten_util import ravel_pytree

    from transformer_recommenders_tpu.training.train_state import FlatAdamWState

    p_leaves = jax.tree.leaves(template.params)
    n_p = len(p_leaves)
    stored_opt = leaves[n_p:-1]
    template_flat = isinstance(template.opt_state, FlatAdamWState)
    template_opt_n = len(jax.tree.leaves(template.opt_state))

    def fail(detail: str):
        msg = (
            "checkpoint opt-state layout does not match the current config's: "
            f"stored {len(stored_opt)} opt leaves, template expects "
            f"{template_opt_n} ({'flat fused AdamW' if template_flat else 'per-leaf optax'}). "
            f"{detail} Likely cause: accumulate_grad_batches changed across "
            "the resume, or the checkpoint predates the flat-AdamW default."
        )
        raise ValueError(msg)

    _, unravel = ravel_pytree(template.params)
    if template_flat and len(stored_opt) == 2 * n_p + 1:
        # per-leaf adamw -> flat: ravel the stored mu/nu trees
        count, mu_leaves, nu_leaves = (
            stored_opt[0], stored_opt[1 : 1 + n_p], stored_opt[1 + n_p :]
        )
        p_struct = jax.tree.structure(template.params)
        mu, _ = ravel_pytree(jax.tree.unflatten(p_struct, mu_leaves))
        nu, _ = ravel_pytree(jax.tree.unflatten(p_struct, nu_leaves))
        new_opt = [jax.numpy.asarray(count, jax.numpy.int32), mu, nu]
    elif not template_flat and len(stored_opt) == 3 and template_opt_n == 2 * n_p + 1:
        # flat -> per-leaf adamw: unravel the flat moments onto the param tree
        count, mu_flat, nu_flat = stored_opt
        new_opt = (
            [jax.numpy.asarray(count, jax.numpy.int32)]
            + jax.tree.leaves(unravel(mu_flat))
            + jax.tree.leaves(unravel(nu_flat))
        )
    else:
        fail("No conversion exists between these layouts.")
    return leaves[:n_p] + new_opt + leaves[-1:]


def latest_checkpoint(ckpt_dir: str | pathlib.Path) -> pathlib.Path | None:
    ckpt_dir = pathlib.Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    candidates = sorted(
        (
            p
            for p in ckpt_dir.iterdir()
            if (p / "state.npz").exists() or (p / "orbax").exists()
        ),
        key=lambda p: p.stat().st_mtime,
    )
    return candidates[-1] if candidates else None
