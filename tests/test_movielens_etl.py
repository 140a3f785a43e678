"""Raw MovieLens format parsing through the real loaders.

Covers the exact file formats the reference parses (``xfmr_rec/data.py``):
ml-1m ``::``-separated iso-8859-1 .dat files (data.py:147-253), ml-100k
pipe/tab files, and the full prepare pipeline over them.
"""

import json
import pathlib

import numpy as np
import pytest

from transformer_recommenders_tpu.data import movielens


@pytest.fixture()
def ml1m_dir(tmp_path):
    root = tmp_path / "ml-1m"
    root.mkdir()
    (root / "movies.dat").write_bytes(
        "1::Toy Story (1995)::Animation|Children's|Comedy\n"
        "2::Jumanji (1995)::Adventure|Children's|Fantasy\n"
        "3::Les Misérables (1995)::Drama\n".encode("iso-8859-1")
    )
    users_lines = [f"{u}::F::1::10::48067" for u in range(1, 7)]
    (root / "users.dat").write_text("\n".join(users_lines) + "\n")
    # user 1: a hand-written 5-event sequence (items 1,3,2 then 1,3 again);
    # users 2-6: 5 events each so the val-user ranking has enough users
    ratings = [
        "1::1::5::978300760",
        "1::3::4::978301968",
        "1::2::3::978302109",
        "1::1::4::978302500",
        "1::2::5::978303000",
    ]
    for u in range(2, 7):
        # user 6 gets 15 events (3 leftovers, the unique max) so the
        # rank-min val assignment (ties -> rank 1 -> p=0) selects it
        for t in range(15 if u == 6 else 5):
            ratings.append(f"{u}::{(u + t) % 3 + 1}::4::{978300000 + u * 100 + t}")
    (root / "ratings.dat").write_text("\n".join(ratings) + "\n")
    return tmp_path


def test_ml1m_loaders(ml1m_dir):
    items = movielens.load_items(str(ml1m_dir), "ml-1m")
    assert len(items) == 3
    payload = json.loads(items.iloc[0]["item_text"])
    assert payload == {
        "title": "Toy Story (1995)",
        "genres": ["Animation", "Children's", "Comedy"],
    }
    # iso-8859-1 title survives
    assert "Misérables" in json.loads(items.iloc[2]["item_text"])["title"]

    users = movielens.load_users(str(ml1m_dir), "ml-1m")
    assert json.loads(users.iloc[0]["user_text"]) == {
        "gender": "F", "age": 1, "occupation": 10, "zipcode": "48067",
    }

    events = movielens.load_events(str(ml1m_dir), "ml-1m")
    assert len(events) == 40
    assert (events["event_name"] == "rating").all()
    assert events["label"].all()  # every rating is a positive
    assert events.iloc[0]["event_value"] == 5


def test_ml1m_prepare_pipeline(ml1m_dir):
    movielens.prepare_movielens(str(ml1m_dir), "ml-1m")
    out = pathlib.Path(ml1m_dir, "ml-1m")
    assert (out / "events.parquet").exists()
    assert (out / "items.parquet").exists()
    assert (out / "users.parquet").exists()

    import pandas as pd

    users = pd.read_parquet(out / "users.parquet")
    assert len(users) == 6
    u1 = users[users.user_id == "1"].iloc[0]
    # 5 events in time order (1,3,2,1,2); earliest 80% -> first 4 train,
    # the last becomes the target (reference rank semantics)
    assert list(u1["history"]["item_id"]) == ["1", "3", "2", "1"]
    assert list(u1["target"]["item_id"]) == ["2"]
    # exactly the top-20% of leftover-ranked users are val, rest test
    assert users["is_val"].sum() >= 1
    assert (users["is_val"] & users["is_test"]).sum() == 0

    items = pd.read_parquet(out / "items.parquet")
    assert items["is_train"].any()


@pytest.fixture()
def ml100k_dir(tmp_path):
    root = tmp_path / "ml-100k"
    root.mkdir()
    genre_flags = ["0"] * 19
    genre_flags[5] = "1"  # Comedy
    (root / "u.item").write_bytes(
        (
            "1|Toy Story (1995)|01-Jan-1995||http://x|" + "|".join(genre_flags) + "\n"
            "2|GoldenEye (1995)|01-Jan-1995||http://y|" + "|".join(genre_flags) + "\n"
        ).encode("iso-8859-1")
    )
    (root / "u.user").write_text("1|24|M|technician|85711\n2|53|F|other|94043\n")
    (root / "u.data").write_text(
        "1\t1\t5\t874965758\n1\t2\t3\t876893171\n2\t1\t4\t888550871\n"
    )
    return tmp_path


def test_ml100k_loaders(ml100k_dir):
    items = movielens.load_items(str(ml100k_dir), "ml-100k")
    assert json.loads(items.iloc[0]["item_text"])["genres"] == ["Comedy"]
    users = movielens.load_users(str(ml100k_dir), "ml-100k")
    assert json.loads(users.iloc[0]["user_text"])["age"] == 24
    events = movielens.load_events(str(ml100k_dir), "ml-100k")
    assert len(events) == 3
    movielens.prepare_movielens(str(ml100k_dir), "ml-100k")
    assert (pathlib.Path(ml100k_dir) / "ml-100k" / "users.parquet").exists()


def test_full_train_on_ml1m_format(ml1m_dir):
    """The whole stack consumes a real ml-1m-format directory end to end."""
    from transformer_recommenders_tpu.configs import (
        SeqDataModuleConfig,
        TrainConfig,
    )
    from transformer_recommenders_tpu.data.module import SeqDataModule
    from transformer_recommenders_tpu.training.trainer import Trainer

    movielens.prepare_movielens(str(ml1m_dir), "ml-1m")
    dm = SeqDataModule(
        SeqDataModuleConfig(
            data_dir=str(ml1m_dir),
            dataset="ml-1m",
            embedder="hash",
            embedding_dim=16,
            max_seq_length=4,
            batch_size=8,
        )
    )
    config = TrainConfig(
        hidden_size=16,
        num_hidden_layers=1,
        num_attention_heads=4,
        intermediate_size=16,
        max_seq_length=4,
        compute_dtype="float32",
        max_epochs=1,
        eval_batch_size=4,
        top_k=2,
        ckpt_dir=str(ml1m_dir / "ckpt"),
    )
    trainer = Trainer(config, dm, log_dir=str(ml1m_dir / "logs"))
    result = trainer.fit()
    assert np.isfinite(result.get("val/retrieval_normalized_dcg", np.nan))


def test_ml25m_loaders(tmp_path):
    root = tmp_path / "ml-25m"
    root.mkdir()
    (root / "movies.csv").write_text(
        "movieId,title,genres\n"
        '1,Toy Story (1995),Adventure|Animation|Children\n'
        '2,"American President, The (1995)",Comedy|Drama|Romance\n'
    )
    (root / "ratings.csv").write_text(
        "userId,movieId,rating,timestamp\n"
        "1,1,4.0,1147880044\n1,2,3.5,1147880055\n2,1,5.0,1147880066\n"
    )
    items = movielens.load_items(str(tmp_path), "ml-25m")
    assert len(items) == 2
    assert json.loads(items.iloc[1]["item_text"])["title"].startswith("American President")
    users = movielens.load_users(str(tmp_path), "ml-25m")
    assert set(users["user_id"]) == {"1", "2"}
    assert users.iloc[0]["user_text"] == "{}"  # no demographics published
    events = movielens.load_events(str(tmp_path), "ml-25m")
    assert len(events) == 3
    assert float(events.iloc[1]["event_value"]) == 3.5
