"""Batched on-device retrieval evaluation.

Replaces the reference's per-user eval loop — encode one user, host ANN
query, python metrics (``xfmr_rec/trainer.py:266-316``, SURVEY.md §3.3,
"the reference's biggest eval inefficiency") — with whole-batch device
passes: encode B user windows, score the full catalog with one MXU matmul,
mask each user's history, top-k, compare against padded target sets, and
reduce the seven retrieval metrics, all inside one jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from transformer_recommenders_tpu.configs import TrainConfig
from transformer_recommenders_tpu.data.module import EvalArrays
from transformer_recommenders_tpu.models.recommender import (
    model_forward,
    retrieval_item_embeddings,
)
from transformer_recommenders_tpu.ops.metrics import retrieval_metrics
from transformer_recommenders_tpu.ops.topk import mask_excluded, score_items


@jax.jit
def _device_reduce(metrics: dict) -> jax.Array:
    """Reduce a per-user metric dict to ONE small vector on device:
    [sum(metric_i * valid) for sorted names..., sum(valid)].

    The per-batch ``jax.device_get(metrics)`` fetched ~8 (B,) arrays whose
    downloads the tunneled runtime serializes (~141 ms each, profiled
    round 4) — one (n+1,) buffer per batch removes all but one round-trip.
    """
    valid = metrics["valid"].astype(jnp.float32)
    names = sorted(k for k in metrics if k != "valid")
    return jnp.stack(
        [jnp.sum(metrics[k].astype(jnp.float32) * valid) for k in names]
        + [jnp.sum(valid)]
    )


def _finalize_deferred(names, vecs, stage: str) -> dict[str, float]:
    """One blocking download for a WHOLE eval pass: per-batch reduced
    vectors stay on device (async), are summed there, and fetched once.

    The per-batch fetch this replaces forced a full pipeline stall —
    dispatch, compute, tunnel round-trip — per eval batch (~35 serialized
    round-trips for the ML-25M eval shape); deferring lets every batch's
    dispatch stream and pays exactly one round-trip per pass."""
    if not vecs:
        return {}
    total = np.asarray(jax.device_get(jnp.sum(jnp.stack(vecs), axis=0)))
    denom = max(float(total[-1]), 1.0)
    return {
        f"{stage}/{name}": float(v) / denom for name, v in zip(names, total[:-1])
    }


def make_eval_step(config: TrainConfig):
    """Jitted per-batch eval: returns per-user metric arrays + rec ids.

    The projected + L2-normalized catalog is computed ONCE per evaluation
    (``prepare_items``) instead of per batch — params are fixed during an
    eval pass, and the per-batch projection + normalization sweep over the
    full catalog dominated eval time at ML-25M catalog sizes."""

    @jax.jit
    def prepare_items(params, item_table):
        from transformer_recommenders_tpu.ops.topk import normalize_rows

        return normalize_rows(
            retrieval_item_embeddings(params, config, item_table)
        )

    @functools.partial(jax.jit, static_argnames=("return_recs",))
    def eval_step(
        params,
        item_table,
        items,  # (N, D) pre-projected + pre-normalized catalog
        history_window,  # (B, S) int32
        history_full,  # (B, H) int32
        targets,  # (B, T) int32
        n_targets,  # (B,) int32
        *,
        return_recs: bool = False,
    ):
        out = model_forward(params, config, item_table, history_window)
        queries = out["sentence_embedding"]  # (B, D)
        scores = score_items(
            queries, items, metric="cosine", items_prenormalized=True
        )
        scores = mask_excluded(scores, history_full)
        top_scores, top_cols = jax.lax.top_k(scores, config.top_k)
        top_idx = (top_cols + 1).astype(jnp.int32)  # 1-based item idx

        # rel[b, k] = rec k is one of user b's (non-padding) targets
        rel = jnp.any(
            (top_idx[:, :, None] == targets[:, None, :]) & (targets[:, None, :] > 0),
            axis=-1,
        )
        metrics = retrieval_metrics(rel, n_targets, config.top_k)
        if return_recs:
            return metrics, top_idx, top_scores
        return metrics

    return prepare_items, eval_step


def make_sharded_eval_step(config: TrainConfig, mesh):
    """Multi-chip eval: encode with the row-sharded table (model-axis
    collective lookup) and retrieve with the column-sharded top-k +
    all-gather merge.  Identical metrics to the single-device step
    (tests/test_parallel.py::test_sharded_eval_matches)."""
    import functools as ft

    from transformer_recommenders_tpu.parallel.embedding import sharded_table_lookup
    from transformer_recommenders_tpu.parallel.topk_sharded import sharded_topk

    @ft.partial(jax.jit, static_argnames=("num_items", "return_recs"))
    def eval_step(
        params, table_sharded, items_sharded, history_window, history_full,
        targets, n_targets, *, num_items: int, return_recs: bool = False,
    ):
        lookup = lambda idx: sharded_table_lookup(  # noqa: E731
            table_sharded, idx, mesh
        )
        out = model_forward(
            params, config, None, history_window, table_lookup=lookup
        )
        queries = out["sentence_embedding"]
        if "input_proj" in params:
            # project the row-sharded catalog into the query space; GSPMD
            # keeps the row sharding (row-wise matmul, replicated weights)
            from transformer_recommenders_tpu.models.transformer import _dense

            items_sharded = _dense(
                items_sharded, params["input_proj"], jnp.dtype(config.compute_dtype)
            ).astype(jnp.float32)
        top_scores, top_idx = sharded_topk(
            queries,
            items_sharded,
            config.top_k,
            mesh,
            exclude_idx=jnp.asarray(history_full),
            metric="cosine",
            num_items=num_items,
        )
        rel = jnp.any(
            (top_idx[:, :, None] == targets[:, None, :]) & (targets[:, None, :] > 0),
            axis=-1,
        )
        metrics = retrieval_metrics(rel, n_targets, config.top_k)
        if return_recs:
            return metrics, top_idx, top_scores
        return metrics

    return eval_step


class ShardedEvaluator:
    """Evaluator over a (data, model) mesh with row-sharded tables."""

    def __init__(self, config: TrainConfig, mesh, num_items: int) -> None:
        self.config = config
        self.mesh = mesh
        self.num_items = num_items
        self._eval_step = make_sharded_eval_step(config, mesh)

    def run(
        self, params, tables, arrays: EvalArrays, *, stage: str = "val"
    ) -> dict[str, float]:
        table_sharded, items_sharded = tables
        b = self.config.eval_batch_size
        u = len(arrays)
        names, vecs = None, []
        for lo in range(0, u, b):
            hw, hf, tg, nt = arrays.batch(lo, min(lo + b, u), b)
            metrics = self._eval_step(
                params, table_sharded, items_sharded, hw, hf, tg, nt,
                num_items=self.num_items,
            )
            if names is None:
                names = sorted(k for k in metrics if k != "valid")
            vecs.append(_device_reduce(metrics))
        return _finalize_deferred(names, vecs, stage)

    def recommend_batch(
        self, params, tables, arrays: EvalArrays
    ) -> tuple[np.ndarray, np.ndarray]:
        """Sharded predict path (parity: ``xfmr_rec/trainer.py:307-316``):
        column-sharded top-k over the mesh, history excluded.  Same
        contract as ``Evaluator.recommend_batch``."""
        table_sharded, items_sharded = tables
        b = self.config.eval_batch_size
        u = len(arrays)
        all_idx, all_scores = [], []
        for lo in range(0, u, b):
            hw, hf, tg, nt = arrays.batch(lo, min(lo + b, u), b)
            _, top_idx, top_scores = self._eval_step(
                params, table_sharded, items_sharded, hw, hf, tg, nt,
                num_items=self.num_items, return_recs=True,
            )
            n_real = min(b, u - lo)
            all_idx.append(np.asarray(top_idx)[:n_real])
            all_scores.append(np.asarray(top_scores)[:n_real])
        return np.concatenate(all_idx), np.concatenate(all_scores)


class Evaluator:
    def __init__(self, config: TrainConfig) -> None:
        self.config = config
        self._prepare_items, self._eval_step = make_eval_step(config)

    def run(
        self,
        params,
        item_table,
        arrays: EvalArrays,
        *,
        stage: str = "val",
    ) -> dict[str, float]:
        """Evaluate a split; mean over users with >=1 target (parity:
        ``xfmr_rec/metrics.py:62-63`` skip + Lightning mean aggregation)."""
        b = self.config.eval_batch_size
        u = len(arrays)
        names, vecs = None, []
        items = self._prepare_items(params, item_table)  # once per eval
        for lo in range(0, u, b):
            hw, hf, tg, nt = arrays.batch(lo, min(lo + b, u), b)
            metrics = self._eval_step(params, item_table, items, hw, hf, tg, nt)
            if names is None:
                names = sorted(k for k in metrics if k != "valid")
            vecs.append(_device_reduce(metrics))
        return _finalize_deferred(names, vecs, stage)

    def recommend_batch(
        self, params, item_table, arrays: EvalArrays
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k recommendations for every user in ``arrays`` (predict path,
        parity: ``xfmr_rec/trainer.py:307-316`` — history excluded).

        Returns (item_idx (U, k) int32 1-based, scores (U, k) f32).
        """
        b = self.config.eval_batch_size
        u = len(arrays)
        all_idx, all_scores = [], []
        items = self._prepare_items(params, item_table)  # once per pass
        for lo in range(0, u, b):
            hw, hf, tg, nt = arrays.batch(lo, min(lo + b, u), b)
            _, top_idx, top_scores = self._eval_step(
                params, item_table, items, hw, hf, tg, nt, return_recs=True
            )
            n_real = min(b, u - lo)
            all_idx.append(np.asarray(top_idx)[:n_real])
            all_scores.append(np.asarray(top_scores)[:n_real])
        return np.concatenate(all_idx), np.concatenate(all_scores)
