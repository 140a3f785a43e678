"""Data-layer tests: ETL split semantics, artifact schema, sampler invariants.

Covers parity semantics from ``xfmr_rec/data.py`` §2 of SURVEY.md: temporal
split (data.py:261-321), user aggregation (data.py:445-487), SeqDataset
sampling rules (data.py:558-805).
"""

import numpy as np
import pandas as pd
import pytest

from transformer_recommenders_tpu.configs import SeqDataConfig, SeqDataModuleConfig
from transformer_recommenders_tpu.data import movielens
from transformer_recommenders_tpu.data.dataset import SeqData
from transformer_recommenders_tpu.data.embeddings import hash_embed_texts
from transformer_recommenders_tpu.data.module import SeqDataModule
from transformer_recommenders_tpu.data.synthetic import generate_raw


# ---------------------------------------------------------------------------
# split semantics
# ---------------------------------------------------------------------------


def test_train_test_split_per_user_temporal():
    events = pd.DataFrame(
        {
            "user_id": ["u1"] * 10 + ["u2"] * 5,
            "item_id": [str(i) for i in range(15)],
            "datetime": list(range(10)) + list(range(5)),
        }
    )
    out = movielens.train_test_split(events, train_prop=0.8, val_prop=0.5)
    u1 = out[out.user_id == "u1"].sort_values("datetime")
    u2 = out[out.user_id == "u2"].sort_values("datetime")
    # earliest 80% of each user's events are train
    assert u1["is_train"].tolist() == [True] * 8 + [False] * 2
    assert u2["is_train"].tolist() == [True] * 4 + [False]
    # non-train events are exactly val or test, and is_predict always True
    nt = out[~out.is_train]
    assert ((nt.is_val ^ nt.is_test)).all()
    assert out.is_predict.all()
    # u1 has more leftover events (2 > 1) -> with val_prop=0.5 u1 is the val user
    assert u1[~u1.is_train]["is_val"].all()
    assert u2[~u2.is_train]["is_test"].all()


def test_split_rank_ties_share_assignment():
    # two events with identical timestamps get the same (min) rank
    events = pd.DataFrame(
        {
            "user_id": ["u"] * 4,
            "item_id": list("abcd"),
            "datetime": [1, 2, 2, 3],
        }
    )
    out = movielens.train_test_split(events, train_prop=0.6)
    # ranks: 0, 1, 1, 3 -> p: 0, .25, .25, .75 -> train, train, train, test
    assert out["is_train"].tolist() == [True, True, True, False]


# ---------------------------------------------------------------------------
# ETL pipeline on synthetic raw data
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def prepared(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("data")
    config = SeqDataModuleConfig(
        data_dir=str(data_dir),
        dataset="synthetic",
        embedder="hash",
        embedding_dim=64,
        max_seq_length=8,
        batch_size=4,
        synthetic_num_users=30,
        synthetic_num_items=50,
        synthetic_num_events=1500,
    )
    dm = SeqDataModule(config)
    dm.prepare_data()
    dm.setup()
    return dm


def test_artifacts_schema(prepared):
    dm = prepared
    assert set(dm.items.columns) >= {
        "item_id", "item_text", "is_train", "is_val", "is_test", "is_predict",
    }
    assert set(dm.users.columns) == {
        "user_id", "user_text", "history", "target",
        "is_train", "is_val", "is_test", "is_predict",
    }
    hist = dm.users.iloc[0]["history"]
    assert set(hist.keys()) == {
        "datetime", "event_name", "event_value", "label", "item_id", "item_text",
    }
    # histories are in time order
    for _, row in dm.users.iterrows():
        dt = list(row["history"]["datetime"])
        assert dt == sorted(dt)


def test_embeddings_shape_and_determinism(prepared):
    dm = prepared
    assert dm.item_embeddings.shape == (len(dm.items), 64)
    again = hash_embed_texts(dm.items["item_text"].tolist(), 64)
    np.testing.assert_array_equal(dm.item_embeddings, again)
    norms = np.linalg.norm(dm.item_embeddings, axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_hash_embedder_token_overlap_correlates():
    a, b, c = (
        '{"title":"Star Wars (1977)","genres":["Sci-Fi"]}',
        '{"title":"Star Trek (1979)","genres":["Sci-Fi"]}',
        '{"title":"Amelie (2001)","genres":["Romance"]}',
    )
    e = hash_embed_texts([a, b, c], 128)
    sim_ab = e[0] @ e[1]
    sim_ac = e[0] @ e[2]
    assert sim_ab > sim_ac  # shared tokens -> higher similarity


# ---------------------------------------------------------------------------
# SeqData sampler invariants
# ---------------------------------------------------------------------------


def make_seqdata(max_seq_length=4, pos_lookahead=0, histories=None, n_items=20):
    item_ids = [f"i{k}" for k in range(1, n_items + 1)]
    if histories is None:
        histories = [
            (np.asarray([f"i{k}" for k in [1, 2, 3, 4, 5, 6]]), np.ones(6, bool)),
        ]
    return SeqData(
        SeqDataConfig(max_seq_length=max_seq_length, pos_lookahead=pos_lookahead),
        item_ids=item_ids,
        histories=histories,
        seed=0,
    )


def test_trim_after_last_positive():
    hist = (np.asarray(["i1", "i2", "i3", "i4"]), np.asarray([True, True, False, False]))
    sd = make_seqdata(histories=[hist])
    idx, labels = sd.rows[0]
    assert idx.tolist() == [1, 2]  # trimmed after last positive


def test_empty_after_trim_dropped():
    hist = (np.asarray(["i1", "i2"]), np.asarray([False, False]))
    sd = make_seqdata(histories=[hist])
    assert len(sd) == 0


def test_unknown_ids_filtered():
    hist = (np.asarray(["i1", "zzz", "i2"]), np.asarray([True, True, True]))
    sd = make_seqdata(histories=[hist])
    assert sd.rows[0][0].tolist() == [1, 2]


def test_long_history_duplicated():
    ids = np.asarray([f"i{k}" for k in range(1, 11)])  # len 10, S=4 -> 3 copies
    sd = make_seqdata(histories=[(ids, np.ones(10, bool))], max_seq_length=4)
    assert len(sd) == 3


def test_batch_shapes_and_padding():
    sd = make_seqdata()
    batches = list(sd.epoch_batches(0, batch_size=3))
    assert len(batches) == 1
    b = batches[0]
    assert b["history_item_idx"].shape == (3, 4)
    assert b["pos_item_idx"].shape == (3, 4)
    assert b["neg_item_idx"].shape == (3, 4)
    # the 6-event history duplicates into 2 rows (ceil(6/4)); 3rd row padded
    assert (b["history_item_idx"][2:] == 0).all()
    assert (b["history_item_idx"][:2] != 0).any(axis=1).all()


def test_sampling_invariants():
    ids = np.asarray([f"i{k}" for k in range(1, 11)])
    labels = np.ones(10, bool)
    sd = make_seqdata(histories=[(ids, labels)], max_seq_length=4, n_items=20)
    hist_vals = set(range(1, 11))
    rng = np.random.default_rng(0)
    for _ in range(50):
        h, p, n = sd._sample_row(rng, *sd.rows[0])
        assert len(h) == len(p) == len(n) == 4
        # sampled positions exclude the final event and are sorted in time
        order = [list(range(1, 11)).index(v) for v in h]
        assert order == sorted(order)
        assert 10 not in h  # final event never a query position... idx 10 allowed?
        # positives strictly from the future of each position
        for qi, pi in zip(h, p):
            assert pi != 0
            assert pi > qi  # ring structure: future == larger idx here
        # negatives: outside the user's history, no duplicates
        assert hist_vals.isdisjoint(n.tolist())
        assert len(set(n.tolist())) == len(n)
        assert all(1 <= v <= 20 for v in n)


def test_pos_lookahead_window():
    ids = np.asarray([f"i{k}" for k in range(1, 11)])
    sd = make_seqdata(
        histories=[(ids, np.ones(10, bool))], max_seq_length=9, pos_lookahead=1
    )
    rng = np.random.default_rng(0)
    h, p, n = sd._sample_row(rng, *sd.rows[0])
    # with lookahead=1 the positive is exactly the next event
    np.testing.assert_array_equal(p, h + 1)


def test_epoch_determinism_and_variation():
    ids = np.asarray([f"i{k}" for k in range(1, 11)])
    sd = make_seqdata(histories=[(ids, np.ones(10, bool))], max_seq_length=4)
    b1 = next(iter(sd.epoch_batches(0, 2)))
    b2 = next(iter(sd.epoch_batches(0, 2)))
    b3 = next(iter(sd.epoch_batches(1, 2)))
    np.testing.assert_array_equal(b1["history_item_idx"], b2["history_item_idx"])
    np.testing.assert_array_equal(b1["neg_item_idx"], b2["neg_item_idx"])
    assert not np.array_equal(b1["neg_item_idx"], b3["neg_item_idx"])


def test_small_complement_falls_back_to_replacement():
    # 6 items total, history covers 5 -> complement size 1 < seq_len
    ids = np.asarray([f"i{k}" for k in [1, 2, 3, 4, 5]])
    sd = make_seqdata(histories=[(ids, np.ones(5, bool))], max_seq_length=4, n_items=6)
    rng = np.random.default_rng(0)
    h, p, n = sd._sample_row(rng, *sd.rows[0])
    assert set(n.tolist()) == {6}


# ---------------------------------------------------------------------------
# eval arrays
# ---------------------------------------------------------------------------


def test_eval_arrays(prepared):
    dm = prepared
    ev = dm.eval_arrays("val")
    assert len(ev) > 0
    assert ev.history_window.shape[1] == dm.config.max_seq_length
    assert ev.history_full.shape[0] == len(ev.user_ids)
    # targets are deduped and padded with 0
    for i in range(len(ev)):
        t = ev.targets[i]
        t = t[t > 0]
        assert len(set(t.tolist())) == len(t)
    # every val user's n_targets counts distinct positive target ids
    val_users = dm.users[dm.users["is_val"]].reset_index(drop=True)
    row = val_users.iloc[0]
    expected = len(
        {i for i, lab in zip(row["target"]["item_id"], row["target"]["label"]) if lab}
    )
    assert ev.n_targets[0] == expected
    # history window is the LAST max_seq_length events
    hist_ids = [i for i in row["history"]["item_id"] if i in dm.train_data.id2idx]
    idx = [dm.train_data.id2idx[i] for i in hist_ids][-dm.config.max_seq_length :]
    np.testing.assert_array_equal(ev.history_window[0, : len(idx)], idx)


def test_train_batches_cover_epoch(prepared):
    dm = prepared
    n = 0
    for batch in dm.train_batches(0):
        assert batch["history_item_idx"].shape == (4, 8)
        n += 1
    assert n == dm.train_data.num_batches(4)


def test_vectorized_event_walk_matches_loop_semantics():
    """The scale-path event generator (``_events_vectorized``, used at
    >=2M events for the ML-25M shape) must produce the same schema and the
    same walk structure as the per-event loop: per-user event counts,
    1-based string ids, per-user strictly increasing timestamps, and ~70%
    ring-local transitions."""
    from transformer_recommenders_tpu.data import synthetic

    rng = np.random.default_rng(0)
    num_items, num_users = 300, 50
    pop = 1.0 / np.arange(1, num_items + 1) ** 0.8
    pop /= pop.sum()
    counts = rng.multinomial(8_000 - 5 * num_users, np.full(num_users, 1 / num_users)) + 5

    vec = synthetic._events_vectorized(np.random.default_rng(1), num_items, counts, pop)
    loop = synthetic._events_loop(
        np.random.default_rng(1),
        [str(u + 1) for u in range(num_users)],
        [str(i + 1) for i in range(num_items)],
        num_items, counts, pop,
    )
    assert list(vec.columns) == list(loop.columns)
    assert {c: str(t) for c, t in vec.dtypes.items()} == {
        c: str(t) for c, t in loop.dtypes.items()
    }
    assert len(vec) == counts.sum()
    assert (vec.groupby("user_id", sort=False).size().values == counts).all()

    items = vec.item_id.astype(int).values
    assert items.min() >= 1 and items.max() <= num_items
    first = np.concatenate([[0], np.cumsum(counts)[:-1]])
    same_user = np.ones(len(vec), bool)
    same_user[first] = False
    assert (np.diff(vec.datetime.values)[same_user[1:]] > 0).all()
    d = (items[1:] - items[:-1]) % num_items
    local = ((d >= 1) & (d <= 3))[same_user[1:]].mean()
    assert 0.55 < local < 0.85
