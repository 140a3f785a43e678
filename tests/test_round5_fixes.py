"""Round-5 advisor/verdict fixes.

- FTS postings are persisted only when actually built (advisor r4 #1):
  ``save()`` on a never-text-queried table must not pay the build cost,
  and loaders must fall back to the lazy rebuild.
- ``BM25TextIndex.load`` rejects stale postings by corpus CONTENT, not
  just doc count (advisor r4 #2).
- Repeated query terms score via one scatter scaled by the term count
  (advisor r4 #3) while preserving Lucene's per-clause sum.
- The two-stage top-k gate (``ops/topk.py``) routes every batch >= 2 to
  direct ``lax.top_k`` (VERDICT r4 next #6) and stays exact either way.
"""

import json

import numpy as np
import pandas as pd
import pytest

from transformer_recommenders_tpu.configs import IndexConfig
from transformer_recommenders_tpu.index import DeviceIndex, HostIndex
from transformer_recommenders_tpu.index.text_index import (
    BM25TextIndex,
    corpus_fingerprint,
)
from transformer_recommenders_tpu.ops.topk import (
    _TWO_STAGE_BLOCKS,
    topk_items,
    use_two_stage,
)

N, D = 24, 8
RNG = np.random.default_rng(11)


def _records(tag: str) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "item_id": [f"i{k}" for k in range(N)],
            "item_text": [
                json.dumps({"title": f"{tag} {k} ({1990 + k})"}) for k in range(N)
            ],
        }
    )


# -- FTS persisted only when built -------------------------------------------


@pytest.mark.parametrize("cls", [DeviceIndex, HostIndex])
def test_save_skips_fts_when_never_queried(cls, tmp_path):
    config = IndexConfig(table_name="users", backend="host")
    idx = cls(config)
    idx.index_data(_records("Movie"), embeddings=RNG.normal(size=(N, D)).astype(np.float32))
    idx.save(tmp_path)  # no search_text ever ran -> no postings build
    table_dir = tmp_path / "users"
    assert not (table_dir / "fts_postings.npz").exists()
    assert not (table_dir / "fts_meta.json").exists()
    loaded = cls.load(config.model_copy(update={"index_path": str(tmp_path)}))
    assert loaded._text_index is None  # nothing to adopt
    # the lazy rebuild still serves text search correctly
    assert loaded.search_text("1995")[0]["item_id"] == "i5"


# -- content-fingerprint staleness --------------------------------------------


def test_load_rejects_same_size_different_content(tmp_path):
    old = [f"old movie {k}" for k in range(6)]
    new = [f"new film {k}" for k in range(6)]  # same count, new content
    idx = BM25TextIndex()
    idx.build(old)
    idx.save(tmp_path)
    fp_old = corpus_fingerprint(old)
    fp_new = corpus_fingerprint(new)
    assert fp_old != fp_new
    assert BM25TextIndex.load(tmp_path, expected_docs=6, expected_fingerprint=fp_old) is not None
    # doc count matches but the corpus changed -> must NOT adopt stale postings
    assert BM25TextIndex.load(tmp_path, expected_docs=6, expected_fingerprint=fp_new) is None


def test_fingerprint_is_boundary_sensitive():
    # the separator must distinguish ["ab",""] from ["a","b"]
    assert corpus_fingerprint(["ab", ""]) != corpus_fingerprint(["a", "b"])


def test_backend_load_rejects_tampered_corpus(tmp_path):
    config = IndexConfig(table_name="items", backend="host")
    idx = HostIndex(config)
    emb = RNG.normal(size=(N, D)).astype(np.float32)
    idx.index_data(_records("Movie"), embeddings=emb)
    idx.search_text("movie")  # build so save persists postings
    idx.save(tmp_path)
    # simulate a partial re-save from a different corpus of IDENTICAL size:
    # records.parquet is replaced but the old postings linger on disk
    swapped = HostIndex(config)
    swapped.index_data(_records("Film"), embeddings=emb)
    swapped.store.save(tmp_path / "items" / "records.parquet")
    loaded = HostIndex.load(config.model_copy(update={"index_path": str(tmp_path)}))
    assert loaded._text_index is None  # stale postings rejected by fingerprint
    # the rebuild indexes the LIVE corpus ("film", not "movie")
    assert loaded.search_text("film 1995")[0]["item_id"] == "i5"
    assert loaded.search_text("movie") == []


def test_pre_fingerprint_artifact_not_trusted(tmp_path):
    corpus = ["alpha beta", "gamma"]
    idx = BM25TextIndex()
    idx.build(corpus)
    idx.save(tmp_path)
    meta = json.loads((tmp_path / "fts_meta.json").read_text())
    del meta["fingerprint"]  # a round-4 artifact predating the field
    (tmp_path / "fts_meta.json").write_text(json.dumps(meta))
    fp = corpus_fingerprint(corpus)
    assert BM25TextIndex.load(tmp_path, expected_fingerprint=fp) is None
    assert BM25TextIndex.load(tmp_path) is not None  # no expectation -> loads


# -- repeated query terms ------------------------------------------------------


def test_repeated_query_terms_scale_one_scatter():
    corpus = ["the cat sat", "a dog ran", "the the thesis"]
    idx = BM25TextIndex()
    idx.build(corpus)
    # Lucene's per-clause sum: each occurrence contributes identically, so
    # 'the the the' must equal 3x 'the' (same scatter, scaled; 1-ulp f32
    # tolerance — the scale folds into the f64 contrib before the f32 cast)
    np.testing.assert_allclose(
        idx.scores("the the the"), 3 * idx.scores("the"), rtol=1e-6
    )
    # mixed multiplicities still sum per clause
    np.testing.assert_allclose(
        idx.scores("the dog the"),
        2 * idx.scores("the") + idx.scores("dog"),
        rtol=1e-6,
    )


# -- two-stage top-k gate -------------------------------------------------------


def test_use_two_stage_gate_batches():
    n, k = 62000, 100
    assert use_two_stage(1, n, k)
    # measured crossover: batch 2 already loses (1.22 vs 0.95 ms, round 4);
    # every mid-batch 2..31 (and beyond) must route to direct lax.top_k
    for batch in range(2, 33):
        assert not use_two_stage(batch, n, k)
    # size floor: the merge stage must stay far smaller than the row
    assert not use_two_stage(1, _TWO_STAGE_BLOCKS * k * 4 - 1, k)
    assert use_two_stage(1, _TWO_STAGE_BLOCKS * k * 4, k)


@pytest.mark.parametrize("batch", [1, 2, 7, 31])
def test_topk_items_exact_on_both_routes(batch):
    rng = np.random.default_rng(batch)
    n_items, d, k = 7000, 16, 100  # n >= 16*100*4 only when batch routing allows
    items = rng.normal(size=(n_items, d)).astype(np.float32)
    queries = rng.normal(size=(batch, d)).astype(np.float32)
    scores, idx = topk_items(queries, items, k, metric="dot")
    qn = queries
    ref = qn @ items.T
    for row in range(batch):
        want = np.sort(ref[row])[::-1][:k]
        np.testing.assert_allclose(np.asarray(scores[row]), want, rtol=1e-5)
        got_ids = np.asarray(idx[row]) - 1
        np.testing.assert_allclose(
            ref[row][got_ids], want, rtol=1e-5
        )  # returned indices really score that much


# -- scanned host loop: deferred logs, scanned tail, cpu split ---------------


def test_scanned_loop_defers_logs_and_scans_tail(tmp_path):
    """VERDICT r4 next #4: the scanned epoch loop must (a) fetch queued log
    events in one flush per epoch instead of one blocking download per
    event, (b) dispatch the ragged tail as ONE scanned window rather than
    per-step dispatches, and (c) record the thread-CPU split + event counts
    behind each phase."""
    import json as json_mod

    from transformer_recommenders_tpu.configs import (
        SeqDataModuleConfig,
        TrainConfig,
    )
    from transformer_recommenders_tpu.data.module import SeqDataModule
    from transformer_recommenders_tpu.training.trainer import Trainer

    data_config = SeqDataModuleConfig(
        data_dir=str(tmp_path / "data"),
        dataset="synthetic",
        embedder="hash",
        embedding_dim=16,
        max_seq_length=8,
        batch_size=8,
        synthetic_num_users=44,  # 5 full batches + a 4-row tail
        synthetic_num_items=50,
        synthetic_num_events=3000,
    )
    config = TrainConfig(
        hidden_size=16,
        num_hidden_layers=1,
        num_attention_heads=2,
        intermediate_size=16,
        max_seq_length=8,
        compute_dtype="float32",
        train_loss="InfoNCELoss",
        max_epochs=2,
        eval_batch_size=16,
        top_k=5,
        log_every_n_steps=2,
        steps_per_dispatch=2,
        checkpoint_every_epoch=False,
        ckpt_dir=str(tmp_path / "ckpt"),
    )
    trainer = Trainer(config, SeqDataModule(data_config), log_dir=str(tmp_path / "logs"))
    result = trainer.fit()
    trainer.close()
    assert np.isfinite(result["val/retrieval_normalized_dcg"])

    counts = trainer.phase_counts
    n_batches = trainer.datamodule.train_data.num_batches(data_config.batch_size)
    k = config.steps_per_dispatch
    assert counts["windows"] == 2 * (n_batches // k)
    assert counts.get("tail_steps", 0) == 2 * (n_batches % k)
    assert counts["log_events"] >= 2
    # deferred: flushes happen at epoch end plus every 16 queued events
    # (the crash-loss bound) — far fewer than one per event
    events_per_epoch = counts["log_events"] // 2
    expected_flushes = 2 * -(-events_per_epoch // 16)  # 2 epochs x ceil(e/16)
    assert counts["log_flushes"] == expected_flushes
    assert counts["log_flushes"] < counts["log_events"]
    # nothing left queued after fit
    assert trainer._pending_logs == []
    # thread-CPU split exists and never exceeds wall
    for phase in ("dispatch", "log", "tail_dispatch"):
        assert trainer.phase_cpu_seconds[phase] <= trainer.phase_seconds[phase] + 0.05
    # per-epoch loop CPU recorded alongside per-epoch walls
    assert len(trainer.epoch_cpu_walls) == len(trainer.epoch_walls) == 2
    assert all(c >= 0.0 for c in trainer.epoch_cpu_walls)

    # the deferred rows actually reached the logger sinks
    rows = [
        json_mod.loads(line)
        for line in (tmp_path / "logs" / "metrics.jsonl").read_text().splitlines()
    ]
    train_rows = [r for r in rows if any(k.startswith("loss/") for k in r)]
    assert len(train_rows) == counts["log_events"]
    steps_logged = [r["step"] for r in train_rows]
    assert steps_logged == sorted(steps_logged)


@pytest.mark.parametrize("cls", [DeviceIndex, HostIndex])
def test_persist_fts_opt_in_ships_prebuilt_postings(cls, tmp_path):
    """Tables whose text search IS routed (the serving items table) opt in
    via ``persist_fts`` so a cold replica never pays the corpus build
    inside its first request — save() force-builds, load() adopts."""
    config = IndexConfig(table_name="items", backend="host", persist_fts=True)
    idx = cls(config)
    idx.index_data(_records("Movie"), embeddings=RNG.normal(size=(N, D)).astype(np.float32))
    idx.save(tmp_path)  # never queried, but opted in
    table_dir = tmp_path / "items"
    assert (table_dir / "fts_postings.npz").exists()
    assert (table_dir / "fts_meta.json").exists()
    loaded = cls.load(config.model_copy(update={"index_path": str(tmp_path)}))
    assert loaded._text_index is not None  # adopted, no lazy rebuild needed
    hits = loaded.search_text("movie 3", top_k=3)
    assert hits and hits[0]["item_id"] == "i3"


# -- batched vector search -----------------------------------------------------


@pytest.mark.parametrize("cls", [DeviceIndex, HostIndex])
def test_search_batch_matches_per_query(cls, tmp_path):
    """search_batch (the serving search micro-batcher's backend) must
    return exactly what per-query search returns, across mixed exclusion
    lengths and top_k values in one coalesced batch."""
    config = IndexConfig(table_name="items", backend="host")
    idx = cls(config)
    emb = RNG.normal(size=(N, D)).astype(np.float32)
    idx.index_data(_records("Movie"), embeddings=emb)

    rng = np.random.default_rng(5)
    queries = rng.normal(size=(5, D)).astype(np.float32)
    excludes = [None, ["i0"], ["i1", "i2", "i3"], [], ["i9"] * 1 + [f"i{j}" for j in range(7)]]
    batched = idx.search_batch(queries, excludes, top_k=4)
    assert len(batched) == 5
    for q, ids, rows in zip(queries, excludes, batched):
        single = idx.search(q, exclude_item_ids=ids, top_k=4)
        assert [r["item_id"] for r in rows] == [r["item_id"] for r in single]
        np.testing.assert_allclose(
            [r["score"] for r in rows], [r["score"] for r in single], rtol=1e-5
        )
        assert not set(r["item_id"] for r in rows) & set(ids or [])
