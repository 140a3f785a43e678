"""On-device exact MIPS retrieval index.

Replaces LanceDB's IVF_HNSW_PQ ANN (``xfmr_rec/index.py:50-292``) with
exact brute-force scoring on the accelerator (``ops/topk.py``): for
catalogs <= ~10^7 rows one MXU matmul beats an approximate CPU index on
both latency and recall (recall is exactly 1.0).  Surface parity:
``index_data`` / ``search`` / ``get_ids`` / ``get_id`` / ``save`` /
``load`` with ``score = cosine similarity`` (the reference's
``1 - cosine_distance``, index.py:252-254).

When constructed with a mesh, search runs column-sharded over the model
axis with an all-gather merge (``parallel/topk_sharded.py``).
"""

from __future__ import annotations

import pathlib
from typing import Any

import jax.numpy as jnp
import numpy as np
import pandas as pd

from transformer_recommenders_tpu.configs import IndexConfig
from transformer_recommenders_tpu.index.store import RecordStore
import transformer_recommenders_tpu.index.text_index as fts
from transformer_recommenders_tpu.index.text_index import BM25TextIndex
from transformer_recommenders_tpu.ops.topk import topk_items


class DeviceIndex:
    def __init__(self, config: IndexConfig, *, mesh=None) -> None:
        self.config = IndexConfig.model_validate(config)
        self.mesh = mesh
        self.store: RecordStore | None = None
        self.embeddings = None  # (N, D) device array (or sharded)
        self._text_index: BM25TextIndex | None = None
        self._num_items = 0
        import functools
        import jax

        metric = self.config.metric

        @functools.partial(jax.jit, static_argnums=(3,))
        def _search(queries, table, exclude, k):
            # the catalog is stored pre-normalized (index_data), so the
            # per-call N x D normalization sweep never happens
            return topk_items(
                queries, table, k, exclude_idx=exclude, metric=metric,
                items_prenormalized=True,
            )

        # table passed as a traced argument (NOT closed over) so re-indexing
        # with overwrite never serves a stale captured constant
        self._jit_search = lambda q, e, k: _search(q, self.embeddings, e, k)

    # -- building ------------------------------------------------------------

    def index_data(
        self,
        records: pd.DataFrame,
        *,
        embeddings: np.ndarray | None = None,
        overwrite: bool = False,
    ) -> None:
        """Build the index from a records frame (+ embedding matrix).

        Parity: ``LanceIndex.index_data`` (``xfmr_rec/index.py:135-212``);
        re-indexing is idempotent unless ``overwrite`` like the reference's
        table reuse (index.py:155-156).
        """
        if self.store is not None and not overwrite:
            return
        records = records.reset_index(drop=True)
        if embeddings is None and self.config.embedding_col:
            if self.config.embedding_col in records.columns:
                embeddings = np.stack(
                    records[self.config.embedding_col].to_numpy()
                ).astype(np.float32)
        store_cols = [c for c in records.columns if c != self.config.embedding_col]
        self.store = RecordStore(records[store_cols], self.config.id_col)
        self._text_index = None  # stale postings never outlive a re-index

        if self.config.embedding_col and embeddings is not None:
            self._num_items = len(embeddings)
            emb = embeddings.astype(np.float32)
            if self.config.metric == "cosine":
                # normalize ONCE here instead of on every search: the
                # per-call sweep over the full catalog dominated
                # single-query latency (~0.25 ms at 62k x 384)
                from transformer_recommenders_tpu.ops.topk import normalize_rows

                emb = np.asarray(normalize_rows(emb))
            if self.mesh is not None:
                from transformer_recommenders_tpu.parallel.embedding import place_table

                self.embeddings = place_table(emb, self.mesh)
            else:
                self.embeddings = jnp.asarray(emb, jnp.float32)

    # -- queries -------------------------------------------------------------

    def search(
        self,
        embedding: np.ndarray,
        exclude_item_ids: list[str] | None = None,
        top_k: int = 20,
    ) -> list[dict[str, Any]]:
        """Top-k rows by cosine score with id exclusion.

        Parity: ``LanceIndex.search`` (``xfmr_rec/index.py:214-255``) —
        returns row payloads + ``score``; excluded ids are prefiltered so
        exactly ``top_k`` non-excluded rows return (unless the catalog is
        smaller).
        """
        # single query = a batch of one (identical compiled shapes: B pads
        # to 1, exclusion width to the same power-of-two buckets) — ONE
        # implementation carries the exclusion padding / k guard / payload
        # mapping for both entry points
        return self.search_batch(
            np.asarray(embedding, np.float32)[None, :],
            [exclude_item_ids],
            top_k=top_k,
        )[0]

    def search_batch(
        self,
        embeddings: np.ndarray,
        exclude_item_ids_lists: list[list[str] | None],
        top_k: int = 20,
    ) -> list[list[dict[str, Any]]]:
        """Batched :meth:`search`: B queries -> ONE device MIPS + top-k.

        Serving motivation: per-request searches serialize on the
        device-dispatch path (one dispatch + one fetch each — ~2 tunnel
        round-trips/request on this host, SERVING_DEVICE.json); coalescing
        concurrent requests amortizes that over the batch.  Exclusion
        lists are padded to one power-of-two width and the batch dim to a
        power of two so compile count stays O(log^2).
        """
        assert self.store is not None and self.embeddings is not None
        b = len(exclude_item_ids_lists)
        queries = np.zeros(
            (1 << max(b - 1, 0).bit_length(), self.embeddings.shape[1]),
            np.float32,
        )
        queries[:b] = np.asarray(embeddings, np.float32)
        exclude_pos = [
            [
                self.store._pos[i] + 1
                for i in (ids or [])
                if i in self.store._pos
            ]
            for ids in exclude_item_ids_lists
        ]
        max_w = max((len(p) for p in exclude_pos), default=0)
        width = 1 << max(max_w - 1, 0).bit_length() if max_w else 1
        padded = np.zeros((queries.shape[0], width), np.int32)
        for row, pos in enumerate(exclude_pos):
            padded[row, : len(pos)] = pos
        k = min(top_k, self._num_items)
        if k <= 0:
            return [[] for _ in range(b)]
        if self.mesh is not None:
            from transformer_recommenders_tpu.parallel.topk_sharded import sharded_topk

            scores, idx = sharded_topk(
                jnp.asarray(queries), self.embeddings, k, self.mesh,
                exclude_idx=jnp.asarray(padded), metric=self.config.metric,
                num_items=self._num_items, items_prenormalized=True,
            )
        else:
            scores, idx = self._jit_search(
                jnp.asarray(queries), jnp.asarray(padded), k
            )
        scores = np.asarray(scores[:b])
        idx = np.asarray(idx[:b])
        out: list[list[dict[str, Any]]] = []
        for row in range(b):
            rows = []
            for s, i in zip(scores[row], idx[row]):
                if not np.isfinite(s):
                    continue
                payload = self.store.row(int(i) - 1)
                payload["score"] = float(s)
                rows.append(payload)
            out.append(rows)
        return out

    def search_text(
        self,
        text: str,
        exclude_item_ids: list[str] | None = None,
        top_k: int = 20,
    ) -> list[dict[str, Any]]:
        """BM25 full-text search over ``text_col`` (parity:
        ``create_fts_index``, ``xfmr_rec/index.py:185``).  Host-side even
        on this backend: lexical scoring is sparse string work the MXU
        cannot accelerate (see ``index/text_index.py``)."""
        assert self.store is not None
        return fts.search_text_rows(
            self.store, self._ensure_text_index(), text, exclude_item_ids, top_k
        )

    def _ensure_text_index(self) -> BM25TextIndex:
        """Built lazily so the training loop's per-validation re-index
        never pays for postings nothing queries."""
        if self._text_index is None:
            assert self.store is not None
            self._text_index = fts.build_for_store(self.store, self.config.text_col)
        return self._text_index

    def get_ids(self, ids: list[str]) -> list[dict[str, Any]]:
        assert self.store is not None
        return self.store.get_ids(ids)

    def get_id(self, id_val: str | None) -> dict[str, Any]:
        assert self.store is not None
        return self.store.get_id(id_val)

    # -- persistence ---------------------------------------------------------

    def save(self, path: str | pathlib.Path) -> None:
        """Persist records + embeddings (parity: ``LanceIndex.save`` copytree,
        ``xfmr_rec/index.py:66-80``)."""
        assert self.store is not None
        path = pathlib.Path(path) / self.config.table_name
        path.mkdir(parents=True, exist_ok=True)
        self.store.save(path / "records.parquet")
        (path / "config.json").write_text(self.config.model_dump_json(indent=2))
        if self.embeddings is not None:
            np.save(path / "embeddings.npy", np.asarray(self.embeddings)[: self._num_items])
        if self.config.text_col in self.store.records.columns and (
            self.config.persist_fts or self._text_index is not None
        ):
            # persist postings when the table OPTS IN (persist_fts — the
            # serving items table, whose search_item_text API must not pay
            # the corpus build inside a cold replica's first request) or
            # when something already queried/loaded them.  Other
            # text-bearing tables (users: no API searches user_text) skip
            # the build + artifact cost; loaders lazily rebuild if needed.
            self._ensure_text_index().save(path)
        else:
            fts.remove_artifacts(path)  # no stale postings from a prior corpus

    @classmethod
    def load(cls, config: IndexConfig, *, mesh=None) -> DeviceIndex:
        """Open a saved index, restoring column config from the artifact
        (parity: ``LanceIndex.load`` re-infers config, index.py:82-112)."""
        config = IndexConfig.model_validate(config)
        path = pathlib.Path(config.index_path) / config.table_name
        saved = IndexConfig.model_validate_json((path / "config.json").read_text())
        merged = saved.model_copy(
            update={"index_path": config.index_path, "backend": config.backend}
        )
        self = cls(merged, mesh=mesh)
        records = pd.read_parquet(path / "records.parquet")
        emb_file = path / "embeddings.npy"
        embeddings = np.load(emb_file) if emb_file.exists() else None
        self.index_data(records, embeddings=embeddings)
        # None (absent, or doc-count/content-fingerprint mismatch with the
        # live corpus) -> lazy rebuild
        self._text_index = fts.load_validated(path, records, merged.text_col)
        return self

