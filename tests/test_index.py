"""Index-layer tests: both backends, exclusion, persistence, cross-check.

Parity semantics from ``xfmr_rec/index.py``: search returns row payloads +
cosine ``score`` (index.py:252-254), excluded ids are prefiltered
(index.py:239-246), get_id returns {} for misses (index.py:275-292).
"""

import json

import numpy as np
import pandas as pd
import pytest

from transformer_recommenders_tpu.configs import IndexConfig
from transformer_recommenders_tpu.index import DeviceIndex, HostIndex

RNG = np.random.default_rng(0)
N, D = 50, 16


@pytest.fixture(scope="module")
def records():
    return pd.DataFrame(
        {
            "item_id": [f"i{k}" for k in range(N)],
            "item_text": [json.dumps({"title": f"t{k}"}) for k in range(N)],
        }
    )


@pytest.fixture(scope="module")
def embeddings():
    e = RNG.normal(size=(N, D)).astype(np.float32)
    return e / np.linalg.norm(e, axis=1, keepdims=True)


@pytest.fixture(scope="module", params=["device", "host"])
def index(request, records, embeddings):
    config = IndexConfig(table_name="items", backend=request.param)
    cls = DeviceIndex if request.param == "device" else HostIndex
    idx = cls(config)
    idx.index_data(records, embeddings=embeddings)
    return idx


def test_search_returns_scored_rows(index, embeddings):
    results = index.search(embeddings[7], top_k=5)
    assert len(results) == 5
    assert results[0]["item_id"] == "i7"  # self-similarity = 1.0
    np.testing.assert_allclose(results[0]["score"], 1.0, rtol=1e-5)
    scores = [r["score"] for r in results]
    assert scores == sorted(scores, reverse=True)
    assert all({"item_id", "item_text", "score"} <= set(r) for r in results)


def test_search_excludes_ids(index, embeddings):
    results = index.search(embeddings[7], exclude_item_ids=["i7"], top_k=5)
    assert all(r["item_id"] != "i7" for r in results)
    assert len(results) == 5  # exclusion is a prefilter: still top_k results


def test_search_nonpositive_top_k_returns_nothing(index, embeddings):
    # Query.top_k is client-controlled over HTTP: a negative value must
    # return nothing, not dump the catalog (host) or crash lax.top_k (device)
    assert index.search(embeddings[0], top_k=-1) == []
    assert index.search(embeddings[0], top_k=0) == []


def test_search_topk_larger_than_catalog(index, embeddings):
    results = index.search(embeddings[0], top_k=100)
    assert len(results) == N


def test_get_id_and_get_ids(index):
    row = index.get_id("i3")
    assert row["item_id"] == "i3"
    assert index.get_id("nope") == {}
    assert index.get_id(None) == {}
    rows = index.get_ids(["i5", "i3", "zzz", "i5"])
    # SQL IN semantics: table order, dedup, missing skipped
    assert [r["item_id"] for r in rows] == ["i3", "i5"]


def test_save_load_roundtrip(index, embeddings, tmp_path):
    index.save(tmp_path)
    cls = type(index)
    config = IndexConfig(
        index_path=str(tmp_path), table_name="items", backend=index.config.backend
    )
    loaded = cls.load(config)
    r1 = index.search(embeddings[11], top_k=4)
    r2 = loaded.search(embeddings[11], top_k=4)
    assert [r["item_id"] for r in r1] == [r["item_id"] for r in r2]


def test_device_and_host_backends_agree(records, embeddings):
    dev = DeviceIndex(IndexConfig(table_name="items"))
    dev.index_data(records, embeddings=embeddings)
    host = HostIndex(IndexConfig(table_name="items", backend="host"))
    host.index_data(records, embeddings=embeddings)
    q = RNG.normal(size=D).astype(np.float32)
    r_dev = dev.search(q, exclude_item_ids=["i1", "i2"], top_k=10)
    r_host = host.search(q, exclude_item_ids=["i1", "i2"], top_k=10)
    assert [r["item_id"] for r in r_dev] == [r["item_id"] for r in r_host]
    np.testing.assert_allclose(
        [r["score"] for r in r_dev], [r["score"] for r in r_host], rtol=1e-5
    )


def test_index_data_idempotent_unless_overwrite(records, embeddings):
    idx = HostIndex(IndexConfig(table_name="items", backend="host"))
    idx.index_data(records, embeddings=embeddings)
    fewer = records.iloc[:10]
    idx.index_data(fewer, embeddings=embeddings[:10])  # ignored
    assert len(idx.store) == N
    idx.index_data(fewer, embeddings=embeddings[:10], overwrite=True)
    assert len(idx.store) == 10


def test_device_index_with_mesh(records, embeddings):
    """DeviceIndex built over a mesh uses column-sharded retrieval and
    matches the unsharded index."""
    from transformer_recommenders_tpu.configs import MeshConfig
    from transformer_recommenders_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(MeshConfig(data_axis_size=2, model_axis_size=4))
    sharded = DeviceIndex(IndexConfig(table_name="items"), mesh=mesh)
    sharded.index_data(records, embeddings=embeddings)
    plain = DeviceIndex(IndexConfig(table_name="items"))
    plain.index_data(records, embeddings=embeddings)
    q = RNG.normal(size=D).astype(np.float32)
    r1 = sharded.search(q, exclude_item_ids=["i3"], top_k=7)
    r2 = plain.search(q, exclude_item_ids=["i3"], top_k=7)
    assert [r["item_id"] for r in r1] == [r["item_id"] for r in r2]


def test_prenormalized_scores_match_cosine():
    """score_items with a pre-normalized catalog (what DeviceIndex stores)
    equals the on-the-fly cosine path."""
    import jax.numpy as jnp

    from transformer_recommenders_tpu.ops.topk import normalize_rows, score_items

    rng = np.random.default_rng(3)
    items = jnp.asarray(rng.normal(size=(50, 16)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    ref = score_items(q, items, metric="cosine")
    pre = score_items(
        q, normalize_rows(items), metric="cosine", items_prenormalized=True
    )
    np.testing.assert_allclose(np.asarray(pre), np.asarray(ref), rtol=1e-6,
                               atol=1e-6)
    # double-normalization is idempotent (save/load of a normalized index)
    twice = score_items(
        q, normalize_rows(normalize_rows(items)), metric="cosine",
        items_prenormalized=True,
    )
    np.testing.assert_allclose(np.asarray(twice), np.asarray(ref), rtol=1e-6,
                               atol=1e-6)
