"""Host (numpy) exact retrieval backend.

The reference keeps a second, unused ANN backend (FaissIndex,
``xfmr_rec/index.py:295-507`` — defined but never imported; SURVEY.md §2.1
calls it part of the feature surface).  This is the equivalent alternate
backend here: the same index surface on plain numpy, useful for serving
without an accelerator and as a cross-check oracle for the device path.
"""

from __future__ import annotations

import pathlib
from typing import Any

import numpy as np
import pandas as pd

from transformer_recommenders_tpu.configs import IndexConfig
from transformer_recommenders_tpu.index.store import RecordStore
import transformer_recommenders_tpu.index.text_index as fts
from transformer_recommenders_tpu.index.text_index import BM25TextIndex


class HostIndex:
    def __init__(self, config: IndexConfig) -> None:
        self.config = IndexConfig.model_validate(config)
        self.store: RecordStore | None = None
        self.embeddings: np.ndarray | None = None
        self._normed: np.ndarray | None = None
        self._text_index: BM25TextIndex | None = None

    def index_data(
        self,
        records: pd.DataFrame,
        *,
        embeddings: np.ndarray | None = None,
        overwrite: bool = False,
    ) -> None:
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
        if embeddings is not None:
            self.embeddings = embeddings.astype(np.float32)
            norms = np.linalg.norm(self.embeddings, axis=1, keepdims=True)
            self._normed = self.embeddings / np.maximum(norms, 1e-12)

    def search(
        self,
        embedding: np.ndarray,
        exclude_item_ids: list[str] | None = None,
        top_k: int = 20,
    ) -> list[dict[str, Any]]:
        assert self.store is not None and self.embeddings is not None
        q = np.asarray(embedding, np.float32)
        if self.config.metric == "cosine":
            q = q / max(np.linalg.norm(q), 1e-12)
            scores = self._normed @ q
        else:
            scores = self.embeddings @ q
        for i in exclude_item_ids or []:
            if i in self.store._pos:
                scores[self.store._pos[i]] = -np.inf
        k = min(top_k, len(scores))
        if k <= 0:  # <= catches a client-supplied negative top_k, which
            return []  # would otherwise argpartition-slice the whole catalog
        top = np.argpartition(-scores, k - 1)[:k]
        top = top[np.argsort(-scores[top])]
        out = []
        for i in top:
            if not np.isfinite(scores[i]):
                continue
            row = self.store.row(int(i))
            row["score"] = float(scores[i])
            out.append(row)
        return out

    def search_batch(
        self,
        embeddings: np.ndarray,
        exclude_item_ids_lists: list[list[str] | None],
        top_k: int = 20,
    ) -> list[list[dict[str, Any]]]:
        """Batched :meth:`search` (backend symmetry with DeviceIndex — the
        host backend has no dispatch latency to amortize, so a loop is the
        whole implementation)."""
        embeddings = np.asarray(embeddings, np.float32)
        return [
            self.search(embeddings[i], exclude_item_ids=ids, top_k=top_k)
            for i, ids in enumerate(exclude_item_ids_lists)
        ]

    def search_text(
        self,
        text: str,
        exclude_item_ids: list[str] | None = None,
        top_k: int = 20,
    ) -> list[dict[str, Any]]:
        """BM25 full-text search over ``text_col`` (parity:
        ``create_fts_index``, ``xfmr_rec/index.py:185``)."""
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

    def save(self, path: str | pathlib.Path) -> None:
        assert self.store is not None
        path = pathlib.Path(path) / self.config.table_name
        path.mkdir(parents=True, exist_ok=True)
        self.store.save(path / "records.parquet")
        (path / "config.json").write_text(self.config.model_dump_json(indent=2))
        if self.embeddings is not None:
            np.save(path / "embeddings.npy", self.embeddings)
        if self.config.text_col in self.store.records.columns and (
            self.config.persist_fts or self._text_index is not None
        ):
            # opt-in (persist_fts) or already-built postings are persisted;
            # other text-bearing tables skip the cost — see DeviceIndex.save
            self._ensure_text_index().save(path)
        else:
            fts.remove_artifacts(path)  # no stale postings from a prior corpus

    @classmethod
    def load(cls, config: IndexConfig) -> HostIndex:
        config = IndexConfig.model_validate(config)
        path = pathlib.Path(config.index_path) / config.table_name
        saved = IndexConfig.model_validate_json((path / "config.json").read_text())
        merged = saved.model_copy(
            update={"index_path": config.index_path, "backend": "host"}
        )
        self = cls(merged)
        records = pd.read_parquet(path / "records.parquet")
        emb_file = path / "embeddings.npy"
        embeddings = np.load(emb_file) if emb_file.exists() else None
        self.index_data(records, embeddings=embeddings)
        # None (absent, or doc-count/content-fingerprint mismatch with the
        # live corpus) -> lazy rebuild
        self._text_index = fts.load_validated(path, records, merged.text_col)
        return self
