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
        state = jax.tree.unflatten(treedef, leaves)
    meta = json.loads((path / "meta.json").read_text())
    return state, meta


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
