"""Serving tests: the 8-API HTTP surface driven in-process.

Parity: the reference smoke-tests its BentoML service through an ASGI
TestClient (``xfmr_rec/deploy.py:23-72``); these tests cover the same
surface plus error paths the reference never exercises.
"""

import numpy as np
import pytest

from transformer_recommenders_tpu.serving import deploy as deploy_mod
from transformer_recommenders_tpu.serving.asgi import JSONApp, TestClient
from transformer_recommenders_tpu.serving.service import Query, Service


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    work = tmp_path_factory.mktemp("deploy")
    trainer = deploy_mod._fast_dev_trainer(str(work))
    trainer.save(work / "artifact")
    return Service(work / "artifact")


@pytest.fixture(scope="module")
def client(service):
    return TestClient(service.to_asgi())


def test_deploy_smoke(service):
    deploy_mod.test_queries(service)


def test_search_item_text(service, client):
    # synthetic item texts are '{"title":"Movie K (YYYY)","genres":[...]}';
    # pick a year token unique to one item and check lexical rank + exclusion
    texts = service.item_index.index.store.records["item_text"]
    import json as _json

    title0 = _json.loads(texts.iloc[0])["title"]  # e.g. "Movie 1 (1990)"
    year = title0.split("(")[1].strip(")")
    resp = client.post("search_item_text", {"text": f"movie {year}", "top_k": 5})
    assert resp.ok
    recs = resp.json()
    assert recs, "lexical search over item_text returned nothing"
    assert all(set(r) == {"item_id", "item_text", "score"} for r in recs)
    assert year in recs[0]["item_text"]
    top_id = recs[0]["item_id"]
    resp2 = client.post(
        "search_item_text",
        {"text": f"movie {year}", "top_k": 5, "exclude_item_ids": [top_id]},
    )
    assert resp2.ok
    assert all(r["item_id"] != top_id for r in resp2.json())


def test_search_item_text_rejects_nonpositive_top_k(client):
    # a negative top_k must return nothing, not dump the whole catalog
    resp = client.post("search_item_text", {"text": "movie", "top_k": -1})
    assert resp.ok and resp.json() == []


def test_recommend_with_query_item_ids(service, client):
    item_id = service.item_index.index.store.records["item_id"].iloc[0]
    resp = client.post(
        "recommend_with_query", {"query": {"item_ids": [str(item_id)], "top_k": 7}}
    )
    assert resp.ok
    recs = resp.json()
    assert len(recs) == 7
    # query item ids are always excluded (service.py:218-221)
    assert all(r["item_id"] != str(item_id) for r in recs)
    assert all(set(r) == {"item_id", "item_text", "score"} for r in recs)


def test_recommend_with_query_raw_embeds(service, client):
    d = service.model.embed_dim
    embeds = np.random.default_rng(0).normal(size=(3, d)).astype(float).tolist()
    resp = client.post("recommend_with_query", {"query": {"input_embeds": embeds}})
    assert resp.ok
    assert len(resp.json()) == 20


def test_recommend_empty_query_returns_empty(client):
    resp = client.post("recommend_with_query", {"query": {}})
    assert resp.ok
    assert resp.json() == []


def test_embed_query_normalization_chain(service, client):
    item_ids = service.item_index.index.store.records["item_id"].iloc[:3].tolist()
    resp = client.post("embed_query", {"query": {"item_ids": item_ids}})
    assert resp.ok
    payload = resp.json()
    assert payload["embedding"] is not None
    assert len(payload["embedding"]) == service.model.model.config.hidden_size
    # unknown ids are silently dropped; embedding still produced
    resp2 = client.post(
        "embed_query", {"query": {"item_ids": [item_ids[0], "does-not-exist"]}}
    )
    assert resp2.ok
    assert resp2.json()["embedding"] is not None


def test_user_roundtrip_and_recs(service, client):
    user_id = service.user_index.index.store.records["user_id"].iloc[0]
    user = client.post("user_id", {"user_id": str(user_id)}).json()
    assert user["user_id"] == str(user_id)
    assert user["history"] is not None
    recs = client.post("recommend_with_user_id", {"user_id": str(user_id)}).json()
    assert len(recs) == 20
    # reference parity: process_query truncates item_ids to the LAST window
    # BEFORE they are added to the exclusions (xfmr_rec/service.py:226-239,
    # 218-221), so only that window is guaranteed excluded
    all_ids = user["history"]["item_id"] + (
        (user.get("target") or {"item_id": []})["item_id"]
    )
    known = [
        i for i in all_ids if i in service.item_index.index.store._pos
    ]
    window = set(known[-service.model.max_seq_length() :])
    assert window.isdisjoint({r["item_id"] for r in recs})


def test_404s(client):
    assert client.post("item_id", {"item_id": "missing"}).status_code == 404
    assert client.post("user_id", {"user_id": "missing"}).status_code == 404
    assert client.post("nonexistent_route", {}).status_code == 404


def test_malformed_requests(client):
    resp = client.post("recommend_with_item_id", {})  # missing required field
    assert resp.status_code == 400


def test_model_name_version(client):
    assert client.post("model_name", {}).json() == "xfmr_rec_tpu"
    assert isinstance(client.post("model_version", {}).json(), str)


def test_batched_embed(service):
    d = service.model.embed_dim
    rng = np.random.default_rng(0)
    queries = [
        Query(input_embeds=rng.normal(size=(5, d)).tolist()),
        Query(input_embeds=rng.normal(size=(2, d)).tolist()),
        Query(),  # empty -> zero inputs
    ]
    out = service.model.embed(queries)
    assert all(q.embedding is not None for q in out)
    assert len(out[0].embedding) == service.model.model.config.hidden_size


def test_asgi_bad_json():
    app = JSONApp()

    @app.route("echo")
    async def _echo(payload):
        return payload

    client = TestClient(app)
    import asyncio

    async def raw():
        status, payload, _timing = await app._dispatch("echo", b"not-json{")
        return status

    assert asyncio.run(raw()) == 400
    assert client.post("echo", {"a": 1}).json() == {"a": 1}


def test_serving_with_projection(tmp_path):
    """Projection configs (input_dim != hidden): the retrieval index ranks
    in the query space while ItemQuery.embedding stays in the input space
    for the normalization chain."""
    from transformer_recommenders_tpu.configs import SeqDataModuleConfig, TrainConfig
    from transformer_recommenders_tpu.data.module import SeqDataModule
    from transformer_recommenders_tpu.training.trainer import Trainer

    data_config = SeqDataModuleConfig(
        data_dir=str(tmp_path / "data"),
        dataset="synthetic",
        embedder="hash",
        embedding_dim=48,
        max_seq_length=8,
        batch_size=8,
        synthetic_num_users=40,
        synthetic_num_items=60,
        synthetic_num_events=2000,
    )
    config = TrainConfig(
        input_dim=48,
        hidden_size=16,
        num_hidden_layers=1,
        num_attention_heads=4,
        intermediate_size=16,
        max_seq_length=8,
        compute_dtype="float32",
        max_epochs=1,
        limit_train_batches=2,
        eval_batch_size=16,
        log_every_n_steps=1000,
        ckpt_dir=str(tmp_path / "ckpt"),
    )
    trainer = Trainer(config, SeqDataModule(data_config), log_dir=str(tmp_path / "logs"))
    trainer.fit()
    trainer.save(tmp_path / "artifact")

    svc = Service(tmp_path / "artifact")
    client = TestClient(svc.to_asgi())
    item_id = svc.item_index.index.store.records["item_id"].iloc[0]
    item = client.post("item_id", {"item_id": str(item_id)}).json()
    assert len(item["embedding"]) == 48  # input space
    assert svc.item_index._embeddings.shape[1] == 48
    # index embeddings are hidden-space
    assert svc.item_index.index.embeddings.shape[1] == 16
    recs = client.post("recommend_with_item_id", {"item_id": str(item_id), "top_k": 5}).json()
    assert len(recs) == 5


def test_microbatcher_coalesces_concurrent_requests(service):
    """Concurrent embed_query calls within the window run as ONE forward."""
    import asyncio

    calls = []
    original = service.model.embed

    def counting_embed(queries):
        calls.append(len(queries))
        return original(queries)

    service.model.batcher._fn = counting_embed
    d = service.model.embed_dim
    rng = np.random.default_rng(0)

    async def drive():
        qs = [Query(input_embeds=rng.normal(size=(3, d)).tolist()) for _ in range(6)]
        return await asyncio.gather(
            *(service.model.batcher.submit(q) for q in qs)
        )

    out = asyncio.run(drive())
    service.model.batcher._fn = original
    assert all(q.embedding is not None for q in out)
    # all six requests coalesced into a single batched forward
    assert calls == [6], calls


def test_threaded_http_server(service):
    """The stdlib HTTP bridge serves the real 8-API surface over a socket."""
    import http.client
    import json as jsonlib
    import socket
    import threading
    import time as timelib

    from transformer_recommenders_tpu.serving.asgi import serve

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    thread = threading.Thread(
        target=serve, args=(service.to_asgi(),), kwargs={"host": "127.0.0.1", "port": port},
        daemon=True,
    )
    thread.start()
    deadline = timelib.time() + 10
    last_exc = None
    while timelib.time() < deadline:
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
            conn.request("POST", "/model_name", "{}")
            resp = conn.getresponse()
            assert resp.status == 200
            assert jsonlib.loads(resp.read()) == "xfmr_rec_tpu"
            break
        except OSError as exc:  # server not up yet
            last_exc = exc
            timelib.sleep(0.2)
    else:
        raise AssertionError(f"server never came up: {last_exc}")

    item_id = service.item_index.index.store.records["item_id"].iloc[0]
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request(
        "POST", "/recommend_with_item_id",
        jsonlib.dumps({"item_id": str(item_id), "top_k": 3}),
    )
    resp = conn.getresponse()
    assert resp.status == 200
    recs = jsonlib.loads(resp.read())
    assert len(recs) == 3
    conn.request("POST", "/item_id", jsonlib.dumps({"item_id": "missing"}))
    assert conn.getresponse().status == 404


def test_metrics_endpoint(service):
    client = TestClient(service.to_asgi())
    app = client.app
    client.post("model_name", {})
    client.post("item_id", {"item_id": "missing"})
    resp = client.post("metrics", {})
    assert resp.ok
    text = resp.json()
    assert 'xrt_requests_total{route="model_name",status="200"} 1' in text
    assert 'route="item_id",status="404"' in text
    assert "xrt_request_seconds_total" in text


# -- request-level tracing (round 3; ROADMAP serving item) --------------------


def test_request_tracing_server_timing_header(service, client):
    """A recommend request carries per-stage spans on the standard
    Server-Timing header: process (id->embeds), batch_wait (micro-batcher
    queue incl. the encoder run), encode (the batch's shared forward),
    batch_size (count, reported through the ms field), search (MIPS)."""
    item_id = service.item_index.index.store.records["item_id"].iloc[0]
    resp = client.post(
        "recommend_with_query", {"query": {"item_ids": [str(item_id)]}}
    )
    assert resp.ok
    timing = resp.headers.get("server-timing", "")
    spans = {part.split(";")[0].strip() for part in timing.split(",") if part}
    assert {"process", "batch_wait", "encode", "batch_size", "search"} <= spans
    durs = {
        part.split(";")[0].strip(): float(part.split("dur=")[1])
        for part in timing.split(",")
    }
    assert durs["batch_wait"] >= durs["encode"] >= 0.0
    # batch_size rides the ms field: stored as n/1e3 s -> renders as n
    assert durs["batch_size"] == pytest.approx(1.0)  # one request -> batch 1


def test_request_tracing_span_metrics(service):
    app = service.to_asgi()
    c = TestClient(app)
    item_id = service.item_index.index.store.records["item_id"].iloc[0]
    for _ in range(2):
        assert c.post(
            "recommend_with_query", {"query": {"item_ids": [str(item_id)]}}
        ).ok
    text = c.post("metrics").json()
    assert 'xrt_span_seconds_total{span="search"}' in text
    assert 'xrt_span_seconds_total{span="encode"}' in text
    # batch_size is a COUNT: it aggregates under span_metric, never into
    # the seconds counter (round-3 review finding)
    assert 'xrt_span_seconds_total{span="batch_size"}' not in text
    assert 'xrt_span_metric_total{metric="batch_size"} 2.0' in text
    # spans aggregate across requests: search total >= one request's search
    line = next(
        ln for ln in text.splitlines()
        if ln.startswith('xrt_span_seconds_total{span="search"}')
    )
    assert float(line.split()[-1]) > 0.0


def test_untraced_code_paths_have_no_span_overhead(service):
    """Calling the service OUTSIDE a request context records nothing and
    returns normally (trace_span is a no-op without an active trace)."""
    import asyncio

    from transformer_recommenders_tpu.serving.asgi import CURRENT_TRACE

    assert CURRENT_TRACE.get() is None
    item_id = service.item_index.index.store.records["item_id"].iloc[0]
    recs = asyncio.run(service.recommend_with_item_id(str(item_id)))
    assert len(recs) == 20
    assert CURRENT_TRACE.get() is None


def test_search_batcher_isolates_malformed_and_nonpositive_topk(service):
    """One coalesced batch with a wrong-dim embedding, a top_k=-1, and a
    healthy query: the malformed one 500s alone, the negative-k one gets
    the unbatched path's [] semantics, the healthy one gets its results."""
    import asyncio

    from transformer_recommenders_tpu.serving.service import Query

    svc = service.item_index
    dim = svc.index.embeddings.shape[1]
    good = Query(embedding=[0.1] * dim, top_k=3)
    neg = Query(embedding=[0.2] * dim, top_k=-1)
    bad = Query(embedding=[0.1, 0.2], top_k=3)  # wrong dim

    results = svc._search_many([good, neg, bad])
    assert len(results[0]) == 3
    assert results[1] == []
    assert isinstance(results[2], Exception)

    async def run_bad():
        return await svc.search_batched(bad)

    with pytest.raises(ValueError, match="shape"):
        asyncio.run(run_bad())

    async def run_good():
        return await svc.search_batched(good)

    out = asyncio.run(run_good())
    assert len(out) == 3
