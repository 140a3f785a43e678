"""Serving services: Model / ItemIndex / UserIndex / composite Service.

Parity: ``xfmr_rec/service.py:96-315`` — the same four-service
composition and 8-API HTTP surface, on the dependency-free ASGI layer:

- ``Model``: loads the trained encoder; ``embed`` is a BATCHED API that
  pads variable-length ``input_embeds`` and runs one encoder forward
  (service.py:112-134);
- ``ItemIndex``: retrieval index over items (search / get_id / get_ids,
  service.py:137-180) — device-exact MIPS instead of LanceDB ANN;
- ``UserIndex``: user metadata lookup (service.py:183-203);
- ``Service``: composite with async APIs ``recommend_with_query``,
  ``recommend_with_item_id``, ``recommend_with_user_id``, ``embed_query``,
  ``item_id``, ``user_id``, ``model_name``, ``model_version``
  (service.py:206-315) plus ``search_item_text`` — lexical BM25 over the
  item texts, exposing the FTS index the reference builds but never
  routes (``xfmr_rec/index.py:185``) — including the query normalization chain
  item_ids -> input_embeds -> embedding with last-window truncation
  (service.py:226-249) and always excluding query item ids from results
  (service.py:218-221).
"""

from __future__ import annotations

import json
import pathlib
from typing import Any

import numpy as np
import pydantic

from transformer_recommenders_tpu.configs import IndexConfig
from transformer_recommenders_tpu.index import INDEX_BACKENDS
from transformer_recommenders_tpu.models.recommender import RecommenderModel
from transformer_recommenders_tpu.params import (
    INDEX_PATH,
    ITEMS_TABLE_NAME,
    MODEL_NAME,
    TOP_K,
    TRANSFORMER_PATH,
    USERS_TABLE_NAME,
)
from transformer_recommenders_tpu.serving.asgi import (
    CURRENT_TRACE,
    JSONApp,
    NotFound,
    trace_span,
)


# -- IO schemas (parity: xfmr_rec/service.py:30-92) --------------------------


class Activity(pydantic.BaseModel):
    item_id: list[str]
    item_text: list[str]


class Query(pydantic.BaseModel):
    embedding: list[float] | None = None
    item_ids: list[str] | None = None
    item_texts: list[str] | None = None
    input_embeds: list[list[float]] | None = None
    exclude_item_ids: list[str] | None = None
    top_k: int = TOP_K


class UserQuery(pydantic.BaseModel):
    user_id: str = "0"
    user_text: str = ""
    history: Activity | None = None
    target: Activity | None = None


class ItemQuery(pydantic.BaseModel):
    item_id: str = "0"
    item_text: str = ""
    embedding: list[float] | None = None


class ItemCandidate(pydantic.BaseModel):
    item_id: str
    item_text: str
    score: float


EXAMPLE_ITEM = ItemQuery(
    item_id="1",
    item_text='{"title":"Toy Story (1995)","genres":["Animation","Children\'s","Comedy"]}',
)
EXAMPLE_USER = UserQuery(
    user_id="1",
    user_text='{"gender":"F","age":1,"occupation":10,"zipcode":"48067"}',
)


# -- services ----------------------------------------------------------------


class MicroBatcher:
    """Dynamic request batching (parity: BentoML ``batchable=True`` APIs,
    reference service.py:112-114): concurrent ``embed`` calls within a
    small window coalesce into ONE encoder forward — the device sees large
    batches even when clients send single queries."""

    def __init__(
        self,
        fn,
        *,
        max_batch: int = 64,
        window_ms: float = 2.0,
        span: str = "encode",
    ) -> None:
        import threading

        self._fn = fn
        self._max_batch = max_batch
        self._window = window_ms / 1000.0
        self._span = span  # trace-span name for the shared fn time
        # THREAD SAFETY: the threaded HTTP server runs each request on its
        # own thread with its own event loop (asgi.serve), so requests
        # coalescing within one window live on DIFFERENT loops.  The queue
        # is lock-guarded and each future is resolved on ITS OWN loop via
        # call_soon_threadsafe — a plain fut.set_result from another thread
        # would never wake the owning loop's selector and could hang the
        # request forever.
        self._lock = threading.Lock()
        self._queue: list = []
        self._flusher = None
        # batch generation: each timer is armed FOR a specific generation;
        # after any flush the generation advances, so a stale timer from an
        # earlier window (cross-thread TimerHandle.cancel is unsafe) can
        # never flush a FRESH batch before its own coalescing window
        self._generation = 0

    async def submit(self, item):
        import asyncio

        loop = asyncio.get_running_loop()
        fut = loop.create_future()
        with self._lock:
            self._queue.append((item, fut, loop))
            flush_now = len(self._queue) >= self._max_batch
            if not flush_now and self._flusher is None:
                self._flusher = loop.call_later(
                    self._window, self._flush, self._generation
                )
        if flush_now:
            self._flush()
        # request tracing: the wait span covers coalescing window + fn +
        # cross-loop resolution; the batch's shared fn time and size ride
        # back with the result so each waiter can report the fn span.
        # Each batcher gets its OWN wait series ("batch_wait" stays the
        # encode batcher's name for continuity) so queue waits don't
        # conflate across batchers.
        wait_span = (
            "batch_wait" if self._span == "encode" else f"{self._span}_wait"
        )
        with trace_span(wait_span):
            res, encode_s, batch_n = await fut
        tr = CURRENT_TRACE.get()
        if tr is not None:
            # the batched fn is SHARED by batch_n waiters: aggregate each
            # waiter's amortized share so xrt_span_seconds_total{span=...}
            # sums to true fn seconds (not batch_n x), and surface the
            # full batch time per-request on the header only
            tr.add(self._span, encode_s / batch_n)
            tr.add_header_only(f"{self._span}_batch", encode_s)
            tr.add_metric(f"{self._span}_batch_size" if self._span != "encode"
                          else "batch_size", batch_n)
        return res

    def _flush(self, generation: int | None = None) -> None:
        with self._lock:
            if generation is not None and generation != self._generation:
                return  # stale timer from a window that was already flushed
            batch, self._queue = self._queue, []
            self._flusher = None
            self._generation += 1
        if not batch:
            return
        items = [item for item, _, _ in batch]
        import time

        t0 = time.perf_counter()
        try:
            results = self._fn(items)
            error = None
        except Exception as exc:  # noqa: BLE001 — propagate to every waiter
            results, error = [None] * len(batch), exc
        encode_s = time.perf_counter() - t0

        def resolve(fut, res) -> None:
            if fut.done():
                return
            if error is not None:
                fut.set_exception(error)
            else:
                fut.set_result((res, encode_s, len(batch)))

        for (_, fut, floop), res in zip(batch, results):
            try:
                floop.call_soon_threadsafe(resolve, fut, res)
            except RuntimeError:
                pass  # owning loop already closed (client gone)


class ModelService:
    """Trained-encoder service (parity: ``Model``, service.py:96-134)."""

    def __init__(self, artifact_dir: str | pathlib.Path) -> None:
        self.model = RecommenderModel.load(pathlib.Path(artifact_dir) / TRANSFORMER_PATH)
        self.embed_dim = self.model.config.resolved_input_dim
        self.batcher = MicroBatcher(lambda qs: self.embed(qs))

    def max_seq_length(self) -> int:
        return self.model.max_seq_length

    def embed(self, queries: list[Query]) -> list[Query]:
        """Batched: pad variable-length ``input_embeds`` to one (B, S, D)
        tensor, single forward, write back ``embedding``.  The batch dim is
        padded to power-of-two buckets so jit compiles O(log max_batch)
        programs instead of one per request count."""
        s = self.max_seq_length()
        b = 1 << (len(queries) - 1).bit_length() if queries else 1
        batch = np.zeros((b, s, self.embed_dim), np.float32)
        for i, query in enumerate(queries):
            if query.input_embeds is not None:
                window = np.asarray(query.input_embeds, np.float32)[-s:]
                batch[i, : len(window)] = window
        out = self.model(item_embeds=batch)
        embeddings = np.asarray(out["sentence_embedding"])[: len(queries)]
        for query, emb in zip(queries, embeddings):
            query.embedding = [float(x) for x in emb]
        return queries


class ItemIndexService:
    """Item retrieval service (parity: ``ItemIndex``, service.py:137-180)."""

    def __init__(self, artifact_dir: str | pathlib.Path, *, mesh=None) -> None:
        config = IndexConfig(
            index_path=str(pathlib.Path(artifact_dir) / INDEX_PATH),
            table_name=ITEMS_TABLE_NAME,
            id_col="item_id",
            text_col="item_text",
            embedding_col="embedding",
        )
        backend = INDEX_BACKENDS[config.backend]
        kwargs = {"mesh": mesh} if config.backend == "device" else {}
        self.index = backend.load(config, **kwargs)
        # frozen INPUT-space embeddings back the query-normalization chain
        # (ItemQuery.embedding feeds the encoder); the index's own
        # embeddings.npy is the retrieval (query-space) matrix, which
        # differs when a learned projection exists
        table_dir = pathlib.Path(artifact_dir) / INDEX_PATH / ITEMS_TABLE_NAME
        input_emb = table_dir / "input_embeddings.npy"
        self._embeddings = np.load(
            input_emb if input_emb.exists() else table_dir / "embeddings.npy"
        )
        # batchable vector search (beyond the reference, which marks only
        # embed as batchable — service.py:112-114): per-request searches
        # serialize on the device dispatch+fetch path, so concurrent
        # requests coalesce into ONE batched MIPS (index.search_batch)
        self.search_batcher = MicroBatcher(self._search_many, span="search_device")

    def _search_many(self, queries: list[Query]):
        """Batched search body.  Per-request failure isolation: a malformed
        embedding (wrong dim / ragged) must 500 ITS request only — one bad
        client must not poison every coalesced waiter — so invalid entries
        get an exception OBJECT as their slot's result (re-raised in
        :meth:`search_batched`) and only the valid rows hit the device."""
        dim = self.index.embeddings.shape[1]
        results: list = [None] * len(queries)
        valid: list[int] = []
        for i, q in enumerate(queries):
            emb = np.asarray(q.embedding, np.float32)
            if emb.shape != (dim,):
                results[i] = ValueError(
                    f"query embedding must have shape ({dim},), got {emb.shape}"
                )
            elif q.top_k <= 0:
                # the unbatched path's non-positive top_k guard returns []
                # — batching must not bypass it via max-k + negative slicing
                results[i] = []
            else:
                valid.append(i)
        if valid:
            top_k = max(queries[i].top_k for i in valid)
            batched = self.index.search_batch(
                np.asarray([queries[i].embedding for i in valid], np.float32),
                [queries[i].exclude_item_ids for i in valid],
                top_k=top_k,
            )
            for i, rows in zip(valid, batched):
                results[i] = [
                    ItemCandidate(
                        item_id=r["item_id"],
                        item_text=r["item_text"],
                        score=r["score"],
                    )
                    for r in rows[: queries[i].top_k]
                ]
        return results

    async def search_batched(self, query: Query) -> list[ItemCandidate]:
        assert query.embedding is not None
        res = await self.search_batcher.submit(query)
        if isinstance(res, Exception):
            raise res
        return res

    def search(self, query: Query) -> list[ItemCandidate]:
        assert query.embedding is not None
        results = self.index.search(
            np.asarray(query.embedding, np.float32),
            exclude_item_ids=query.exclude_item_ids,
            top_k=query.top_k,
        )
        return [
            ItemCandidate(
                item_id=r["item_id"], item_text=r["item_text"], score=r["score"]
            )
            for r in results
        ]

    def search_text(
        self,
        text: str,
        exclude_item_ids: list[str] | None = None,
        top_k: int = TOP_K,
    ) -> list[ItemCandidate]:
        """Lexical BM25 search over ``item_text`` (the reference's FTS
        index, ``xfmr_rec/index.py:185``)."""
        results = self.index.search_text(
            text, exclude_item_ids=exclude_item_ids, top_k=top_k
        )
        return [
            ItemCandidate(
                item_id=r["item_id"], item_text=r["item_text"], score=r["score"]
            )
            for r in results
        ]

    def _attach_embedding(self, row: dict[str, Any]) -> ItemQuery:
        pos = self.index.store._pos[row["item_id"]]
        return ItemQuery(
            item_id=row["item_id"],
            item_text=row["item_text"],
            embedding=[float(x) for x in self._embeddings[pos]],
        )

    def get_id(self, item_id: str) -> ItemQuery:
        row = self.index.get_id(item_id)
        if not row:
            msg = f"item not found: item_id = {item_id!r}"
            raise NotFound(msg)
        return self._attach_embedding(row)

    def get_ids(self, item_ids: list[str]) -> dict[str, ItemQuery]:
        rows = self.index.get_ids(item_ids)
        items = [self._attach_embedding(r) for r in rows]
        return {item.item_id: item for item in items}


class UserIndexService:
    """User lookup service (parity: ``UserIndex``, service.py:183-203)."""

    def __init__(self, artifact_dir: str | pathlib.Path) -> None:
        config = IndexConfig(
            index_path=str(pathlib.Path(artifact_dir) / INDEX_PATH),
            table_name=USERS_TABLE_NAME,
            id_col="user_id",
            text_col="user_text",
            embedding_col=None,
            backend="host",
        )
        self.index = INDEX_BACKENDS["host"].load(config)

    def get_id(self, user_id: str) -> UserQuery:
        row = self.index.get_id(user_id)
        if not row:
            msg = f"user not found: user_id = {user_id!r}"
            raise NotFound(msg)
        return UserQuery(
            user_id=row["user_id"],
            user_text=row.get("user_text") or "",
            history=_activity(row.get("history")),
            target=_activity(row.get("target")),
        )


def _activity(struct: dict | None) -> Activity | None:
    if not struct:
        return None
    return Activity(
        item_id=[str(x) for x in struct.get("item_id", [])],
        item_text=[str(x) for x in struct.get("item_text", [])],
    )


class Service:
    """Composite service (parity: ``Service``, service.py:206-315)."""

    def __init__(self, artifact_dir: str | pathlib.Path, *, mesh=None) -> None:
        self.artifact_dir = pathlib.Path(artifact_dir)
        self.model = ModelService(artifact_dir)
        self.item_index = ItemIndexService(artifact_dir, mesh=mesh)
        self.user_index = UserIndexService(artifact_dir)
        manifest_path = self.artifact_dir / "manifest.json"
        self.manifest = (
            json.loads(manifest_path.read_text())
            if manifest_path.exists()
            else {"name": MODEL_NAME, "version": "unversioned"}
        )

    # -- async APIs ----------------------------------------------------------

    async def recommend_with_query(self, query: Query) -> list[ItemCandidate]:
        with trace_span("process"):
            query = await self.process_query(query)
        query = await self.embed_query(query)
        query.exclude_item_ids = [
            *(query.exclude_item_ids or []),
            *(query.item_ids or []),
        ]
        if query.embedding is None:
            return []
        with trace_span("search"):
            return await self.item_index.search_batched(query)

    async def process_query(self, query: Query) -> Query:
        """item_ids -> stored frozen embeddings, truncated to the last
        window (parity: service.py:226-239)."""
        if query.item_ids is None:
            return query
        if query.input_embeds is not None:
            return query
        items = self.item_index.get_ids(query.item_ids)
        item_ids = [i for i in query.item_ids if i in items]
        query.item_ids = item_ids[-self.model.max_seq_length() :]
        embeddings = [items[i].embedding for i in query.item_ids]
        query.input_embeds = embeddings if embeddings else None
        return query

    async def embed_query(self, query: Query) -> Query:
        if query.input_embeds is None:
            return query
        if query.embedding is not None:
            return query
        return await self.model.batcher.submit(query)

    async def recommend_with_item_id(
        self,
        item_id: str,
        exclude_item_ids: list[str] | None = None,
        top_k: int = TOP_K,
    ) -> list[ItemCandidate]:
        item = await self.item_id(item_id)
        query = Query(
            item_ids=[item.item_id],
            item_texts=[item.item_text],
            input_embeds=[item.embedding] if item.embedding is not None else None,
            exclude_item_ids=exclude_item_ids,
            top_k=top_k,
        )
        return await self.recommend_with_query(query)

    async def recommend_with_user_id(
        self,
        user_id: str,
        exclude_item_ids: list[str] | None = None,
        top_k: int = TOP_K,
    ) -> list[ItemCandidate]:
        user = await self.user_id(user_id)
        item_ids: list[str] = []
        item_texts: list[str] = []
        if user.history:
            item_ids += user.history.item_id
            item_texts += user.history.item_text
        if user.target:
            item_ids += user.target.item_id
            item_texts += user.target.item_text
        query = Query(
            item_ids=item_ids,
            item_texts=item_texts,
            exclude_item_ids=exclude_item_ids,
            top_k=top_k,
        )
        return await self.recommend_with_query(query)

    async def search_item_text(
        self,
        text: str,
        exclude_item_ids: list[str] | None = None,
        top_k: int = TOP_K,
    ) -> list[ItemCandidate]:
        # distinct span name: "search" is the vector search; conflating the
        # two would mix MXU and host-BM25 seconds in one metrics series
        with trace_span("search_text"):
            return self.item_index.search_text(
                text, exclude_item_ids=exclude_item_ids, top_k=top_k
            )

    async def item_id(self, item_id: str) -> ItemQuery:
        return self.item_index.get_id(item_id)

    async def user_id(self, user_id: str) -> UserQuery:
        return self.user_index.get_id(user_id)

    async def model_version(self) -> str:
        return str(self.manifest["version"])

    async def model_name(self) -> str:
        return str(self.manifest["name"])

    # -- HTTP surface --------------------------------------------------------

    def to_asgi(self) -> JSONApp:
        app = JSONApp()

        @app.route("recommend_with_query")
        async def _recommend_with_query(payload: dict):
            query = Query.model_validate(payload.get("query") or payload)
            recs = await self.recommend_with_query(query)
            return [r.model_dump() for r in recs]

        @app.route("recommend_with_item_id")
        async def _recommend_with_item_id(payload: dict):
            recs = await self.recommend_with_item_id(
                item_id=payload["item_id"],
                exclude_item_ids=payload.get("exclude_item_ids"),
                top_k=payload.get("top_k", TOP_K),
            )
            return [r.model_dump() for r in recs]

        @app.route("recommend_with_user_id")
        async def _recommend_with_user_id(payload: dict):
            recs = await self.recommend_with_user_id(
                user_id=payload["user_id"],
                exclude_item_ids=payload.get("exclude_item_ids"),
                top_k=payload.get("top_k", TOP_K),
            )
            return [r.model_dump() for r in recs]

        @app.route("embed_query")
        async def _embed_query(payload: dict):
            query = Query.model_validate(payload.get("query") or payload)
            query = await self.process_query(query)
            return (await self.embed_query(query)).model_dump()

        @app.route("search_item_text")
        async def _search_item_text(payload: dict):
            recs = await self.search_item_text(
                text=payload["text"],
                exclude_item_ids=payload.get("exclude_item_ids"),
                top_k=payload.get("top_k", TOP_K),
            )
            return [r.model_dump() for r in recs]

        @app.route("item_id")
        async def _item_id(payload: dict):
            return (await self.item_id(payload["item_id"])).model_dump()

        @app.route("user_id")
        async def _user_id(payload: dict):
            return (await self.user_id(payload["user_id"])).model_dump()

        @app.route("model_name")
        async def _model_name(payload: dict):
            return await self.model_name()

        @app.route("model_version")
        async def _model_version(payload: dict):
            return await self.model_version()

        return app
