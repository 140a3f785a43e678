"""BM25 full-text index tests.

Parity target: the reference's LanceIndex builds a Tantivy BM25 FTS index
over the text column at index time (``xfmr_rec/index.py:185``); here the
equivalent is ``index/text_index.py``, surfaced as ``search_text`` on both
backends.  Scores are checked against an independent straight-from-the-
formula reimplementation, not against the module under test.
"""

import json
import math

import numpy as np
import pandas as pd
import pytest

from transformer_recommenders_tpu.configs import IndexConfig
from transformer_recommenders_tpu.index import DeviceIndex, HostIndex
from transformer_recommenders_tpu.index.text_index import (
    BM25TextIndex,
    tokenize,
)

CORPUS = [
    "The quick brown fox jumps over the lazy dog",
    "A quick movie about a brown bear",
    "Slow cinema: the art of patience",
    "Fox hunting was banned; the fox rejoiced",
    "",
]


def bm25_reference(texts, query, k1=1.2, b=0.75):
    """Independent Okapi BM25 with the Lucene idf: one clause per query
    token occurrence, idf = ln(1 + (N - df + 0.5) / (df + 0.5))."""
    docs = [tokenize(t) for t in texts]
    n = len(docs)
    avg = sum(len(d) for d in docs) / n
    scores = []
    for d in docs:
        s = 0.0
        for tok in tokenize(query):
            tf = d.count(tok)
            if tf == 0:
                continue
            df = sum(tok in other for other in docs)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(d) / avg))
        scores.append(s)
    return np.array(scores, np.float32)


def test_tokenize():
    assert tokenize("The QUICK-brown fox_42!") == ["the", "quick", "brown", "fox", "42"]
    assert tokenize("") == []
    # Unicode alphanumerics are token chars (Tantivy simple tokenizer):
    # an ASCII-only class would shred accented titles into junk fragments
    assert tokenize("Amélie (2001)") == ["amélie", "2001"]


def test_search_nonpositive_top_k_returns_nothing():
    idx = BM25TextIndex()
    idx.build(CORPUS)
    # a client-supplied negative top_k must not dump the whole corpus
    assert idx.search("fox", top_k=-1) == []
    assert idx.search("fox", top_k=0) == []


def test_all_empty_corpus_scores_cleanly():
    idx = BM25TextIndex()
    idx.build([""] * 5)  # the text_col-missing path builds exactly this
    with np.errstate(all="raise"):
        assert idx.search("anything", top_k=3) == []


@pytest.mark.parametrize(
    "query", ["quick brown", "fox", "the the the", "unseen tokens only", "FOX Hunting"]
)
def test_scores_match_reference_formula(query):
    idx = BM25TextIndex()
    idx.build(CORPUS)
    np.testing.assert_allclose(
        idx.scores(query), bm25_reference(CORPUS, query), rtol=1e-5, atol=1e-7
    )


def test_search_ranks_and_drops_zero_scores():
    idx = BM25TextIndex()
    idx.build(CORPUS)
    results = idx.search("fox", top_k=10)
    # doc 3 has tf=2 for "fox" and is shorter-normalized; doc 0 has tf=1;
    # no other doc contains the term, and zero-score docs must not appear
    assert [pos for pos, _ in results] == [3, 0]
    assert all(score > 0 for _, score in results)
    assert idx.search("unseen tokens only", top_k=10) == []


def test_search_excludes_positions():
    idx = BM25TextIndex()
    idx.build(CORPUS)
    results = idx.search("fox", top_k=10, exclude_positions=[3])
    assert [pos for pos, _ in results] == [0]


def test_save_load_roundtrip(tmp_path):
    idx = BM25TextIndex()
    idx.build(CORPUS)
    idx.save(tmp_path)
    loaded = BM25TextIndex.load(tmp_path)
    assert loaded is not None
    for query in ["quick brown", "fox rejoiced", "art"]:
        np.testing.assert_array_equal(loaded.scores(query), idx.scores(query))
    assert BM25TextIndex.load(tmp_path / "absent") is None


# -- backend surface ----------------------------------------------------------

N, D = 30, 8
RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def records():
    return pd.DataFrame(
        {
            "item_id": [f"i{k}" for k in range(N)],
            "item_text": [
                json.dumps({"title": f"Movie {k} ({1990 + k})", "genres": ["Drama"]})
                for k in range(N)
            ],
        }
    )


@pytest.fixture(scope="module", params=["device", "host"])
def index(request, records):
    config = IndexConfig(table_name="items", backend=request.param)
    cls = DeviceIndex if request.param == "device" else HostIndex
    idx = cls(config)
    emb = RNG.normal(size=(N, D)).astype(np.float32)
    idx.index_data(records, embeddings=emb)
    return idx


def test_backend_search_text(index):
    results = index.search_text("movie 1995", top_k=5)
    assert len(results) == 5
    # "1995" appears only in i5's title -> top hit; "movie" is in every doc
    assert results[0]["item_id"] == "i5"
    scores = [r["score"] for r in results]
    assert scores == sorted(scores, reverse=True)
    assert all({"item_id", "item_text", "score"} <= set(r) for r in results)


def test_backend_search_text_excludes(index):
    results = index.search_text("movie 1995", exclude_item_ids=["i5"], top_k=5)
    assert all(r["item_id"] != "i5" for r in results)


def test_backend_search_text_survives_save_load(index, tmp_path):
    index.search_text("movie")  # force the lazy build so save persists it
    index.save(tmp_path)
    table_dir = tmp_path / index.config.table_name
    assert (table_dir / "fts_postings.npz").exists()
    assert (table_dir / "fts_meta.json").exists()
    config = index.config.model_copy(update={"index_path": str(tmp_path)})
    loaded = type(index).load(config)
    assert loaded._text_index is not None  # postings loaded, not rebuilt
    got = loaded.search_text("movie 1995", top_k=3)
    want = index.search_text("movie 1995", top_k=3)
    assert [(r["item_id"], r["score"]) for r in got] == [
        (r["item_id"], r["score"]) for r in want
    ]


def test_load_rejects_stale_doc_count(tmp_path):
    idx = BM25TextIndex()
    idx.build(CORPUS)
    idx.save(tmp_path)
    assert BM25TextIndex.load(tmp_path, expected_docs=len(CORPUS)) is not None
    # postings from an earlier corpus must never be adopted for a new one
    assert BM25TextIndex.load(tmp_path, expected_docs=len(CORPUS) + 1) is None


def test_save_removes_stale_fts_artifacts(records, tmp_path):
    config = IndexConfig(table_name="items", backend="host")
    idx = HostIndex(config)
    idx.index_data(records, embeddings=RNG.normal(size=(N, D)).astype(np.float32))
    idx.search_text("movie")  # build postings so save persists them
    idx.save(tmp_path)
    table_dir = tmp_path / "items"
    assert (table_dir / "fts_postings.npz").exists()
    # replace the corpus with one LACKING the text column: saving to the
    # same dir must remove the old postings, and a load must not serve them
    textless = records[["item_id"]].iloc[:5]
    idx.index_data(
        textless, embeddings=RNG.normal(size=(5, D)).astype(np.float32),
        overwrite=True,
    )
    idx.save(tmp_path)
    assert not (table_dir / "fts_postings.npz").exists()
    assert not (table_dir / "fts_meta.json").exists()
    loaded = HostIndex.load(
        config.model_copy(update={"index_path": str(tmp_path)})
    )
    assert loaded.search_text("movie 1995") == []  # empty corpus, no crash


def test_backend_reindex_invalidates_text_index(records):
    config = IndexConfig(table_name="items", backend="host")
    idx = HostIndex(config)
    idx.index_data(records, embeddings=RNG.normal(size=(N, D)).astype(np.float32))
    assert idx.search_text("1995")[0]["item_id"] == "i5"
    shuffled = records.iloc[::-1].reset_index(drop=True)
    idx.index_data(
        shuffled,
        embeddings=RNG.normal(size=(N, D)).astype(np.float32),
        overwrite=True,
    )
    assert idx.search_text("1995")[0]["item_id"] == "i5"  # fresh postings
