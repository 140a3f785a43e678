"""End-to-end training tests on the synthetic dataset.

Mirrors the reference test strategy (``tests/test_recommender.py:1-63``:
batch shapes, forward keys, finite training loss, val NDCG produced) and
adds what the reference lacks (SURVEY.md §4): checkpoint/resume equality
and learning-signal assertions.
"""

import numpy as np
import pytest

from transformer_recommenders_tpu.configs import SeqDataModuleConfig, TrainConfig
from transformer_recommenders_tpu.data.module import SeqDataModule
from transformer_recommenders_tpu.training import checkpoint as ckpt_lib
from transformer_recommenders_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data_config = SeqDataModuleConfig(
        data_dir=str(root / "data"),
        dataset="synthetic",
        embedder="hash",
        embedding_dim=32,
        max_seq_length=8,
        batch_size=16,
        synthetic_num_users=60,
        synthetic_num_items=80,
        synthetic_num_events=6000,
    )
    config = TrainConfig(
        hidden_size=32,
        num_hidden_layers=1,
        num_attention_heads=4,
        intermediate_size=32,
        max_seq_length=8,
        compute_dtype="float32",
        train_loss="InfoNCELoss",
        learning_rate=3e-3,
        max_epochs=2,
        eval_batch_size=32,
        top_k=10,
        log_every_n_steps=1000,
        ckpt_dir=str(root / "ckpt"),
    )
    t = Trainer(config, SeqDataModule(data_config), log_dir=str(root / "logs"))
    t.result = t.fit()
    return t


def test_fit_produces_val_metrics(trainer):
    assert "val/retrieval_normalized_dcg" in trainer.result
    ndcg = trainer.result["val/retrieval_normalized_dcg"]
    assert np.isfinite(ndcg)
    assert 0.0 <= ndcg <= 1.0


def test_training_learns_structure(trainer):
    """Synthetic data is a genre-ring random walk; a trained model must beat
    a popularity-free random baseline by a wide margin (random NDCG@10 with
    80 items ~ 0.05-0.1)."""
    assert trainer.result["val/retrieval_hit_rate"] > 0.3


def test_test_and_predict_paths(trainer):
    test_metrics = trainer.test()
    assert "test/retrieval_normalized_dcg" in test_metrics
    recs = trainer.predict()
    u = len(recs["user_ids"])
    assert recs["item_idx"].shape == (u, trainer.config.top_k)
    assert recs["item_ids"].shape == (u, trainer.config.top_k)
    # recommendations exclude history (spot-check user 0)
    arrays = trainer.datamodule.eval_arrays("predict")
    hist = set(arrays.history_full[0][arrays.history_full[0] > 0].tolist())
    assert hist.isdisjoint(recs["item_idx"][0].tolist())
    # scores are sorted descending
    assert (np.diff(recs["scores"], axis=1) <= 1e-6).all()


def test_checkpoint_resume_exact(trainer, tmp_path):
    """Reload the best checkpoint into a fresh trainer -> identical params
    and identical val metrics (distributed-invariance test base case)."""
    best = str(np.vectorize(str)(trainer.config.ckpt_dir)) + "/best"
    fresh = Trainer(trainer.config, trainer.datamodule, log_dir=str(tmp_path))
    meta = fresh.restore(best)
    assert meta["step"] > 0
    for a, b in zip(
        np.asarray(trainer.model.params["pos_embed"]),
        np.asarray(fresh.model.params["pos_embed"]),
    ):
        np.testing.assert_array_equal(a, b)
    m1 = trainer.validate()
    m2 = fresh.validate()
    assert m1 == m2


def test_checkpoint_roundtrip_arbitrary_state(trainer, tmp_path):
    state = trainer.state
    ckpt_lib.save_checkpoint(tmp_path / "c", state, epoch=0, metrics={"x": 1.0})
    restored, meta = ckpt_lib.load_checkpoint(tmp_path / "c", state)
    assert meta["metrics"] == {"x": 1.0}
    leaves1 = [np.asarray(x) for x in __import__("jax").tree.leaves(state)]
    leaves2 = [np.asarray(x) for x in __import__("jax").tree.leaves(restored)]
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(a, b)


def test_artifact_save(trainer, tmp_path):
    trainer.save(tmp_path / "artifact")
    store = tmp_path / "artifact" / "index_store"
    assert (tmp_path / "artifact" / "transformer" / "params.npz").exists()
    assert (tmp_path / "artifact" / "manifest.json").exists()
    assert (store / "items" / "records.parquet").exists()
    assert (store / "items" / "embeddings.npy").exists()
    assert (store / "users" / "records.parquet").exists()


def test_logs_written(trainer):
    jsonl = trainer.log_dir / "metrics.jsonl"
    assert jsonl.exists()
    lines = jsonl.read_text().strip().splitlines()
    assert len(lines) >= 2  # at least the two epoch-end val logs


def test_checkpoint_orbax_backend(trainer, tmp_path):
    state = trainer.state
    ckpt_lib.save_checkpoint(
        tmp_path / "oc", state, epoch=2, metrics={"m": 1.5}, backend="orbax"
    )
    restored, meta = ckpt_lib.load_checkpoint(tmp_path / "oc", state)
    assert meta["epoch"] == 2 and meta["metrics"] == {"m": 1.5}
    import jax

    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_every_epoch_false_writes_once(tmp_path, trainer):
    """Device-resident best state: disk writes happen only at fit end,
    best weights still restored."""
    dm = trainer.datamodule
    config = trainer.config.model_copy(
        update={
            "checkpoint_every_epoch": False,
            "max_epochs": 2,
            "ckpt_dir": str(tmp_path / "ckpt"),
        }
    )
    t = Trainer(config, dm, log_dir=str(tmp_path / "logs"))
    result = t.fit()
    assert np.isfinite(result["val/retrieval_normalized_dcg"])
    assert (tmp_path / "ckpt" / "best" / "state.npz").exists()
    assert (tmp_path / "ckpt" / "last" / "state.npz").exists()
    # restoring the written best reproduces the final (restored-best) params
    fresh = Trainer(config, dm, log_dir=str(tmp_path / "logs2"))
    fresh.restore(str(tmp_path / "ckpt" / "best"))
    import jax

    for a, b in zip(jax.tree.leaves(t.model.params), jax.tree.leaves(fresh.model.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_predict_output_parquet(tmp_path, trainer):
    """xrt-train predict --predict_output writes a recommendations table."""
    import pandas as pd

    from transformer_recommenders_tpu.training import cli

    ckpt = str(np.vectorize(str)(trainer.config.ckpt_dir)) + "/best"
    out = tmp_path / "recs.parquet"
    cfg_dir = str(trainer.config.ckpt_dir)
    cli.main(
        [
            "predict",
            "--ckpt_path", ckpt,
            "--log_dir", str(tmp_path / "logs"),
            "--predict_output", str(out),
            "--data.data_dir", str(trainer.datamodule.config.data_dir),
            "--data.dataset", "synthetic",
            "--data.embedder", "hash",
            "--data.embedding_dim", "32",
            "--data.max_seq_length", "8",
            "--data.batch_size", "16",
            "--data.synthetic_num_users", "60",
            "--data.synthetic_num_items", "80",
            "--data.synthetic_num_events", "6000",
            "--model.hidden_size", "32",
            "--model.num_hidden_layers", "1",
            "--model.num_attention_heads", "4",
            "--model.intermediate_size", "32",
            "--model.max_seq_length", "8",
            "--model.compute_dtype", "float32",
            "--model.top_k", "10",
            "--model.eval_batch_size", "32",
        ]
    )
    df = pd.read_parquet(out)
    assert {"user_id", "item_ids", "scores"} <= set(df.columns)
    assert len(df) > 0
    assert len(df.iloc[0]["item_ids"]) == 10


def test_fit_phase_attribution_populated(trainer):
    """fit() accounts per-phase wall time (round-4 verdict #3): the phase
    dict carries every key, epoch walls are recorded, and the accounted
    epoch phases are consistent (children never exceed epoch_wall)."""
    ph = trainer.phase_seconds
    for key in ("host_sample", "queue_wait", "upload", "dispatch", "log",
                "tail_dispatch", "epoch_wall", "validate", "checkpoint",
                "final_checkpoint"):
        assert key in ph
        assert ph[key] >= 0.0
    # the scanned path ran (steps_per_dispatch default > 1 in the fixture
    # config only if set; epoch walls exist whenever the scanned path ran)
    if trainer.config.steps_per_dispatch > 1:
        assert len(trainer.epoch_walls) >= 1
        in_epoch = sum(
            ph[k]
            for k in ("queue_wait", "upload", "dispatch", "log", "tail_dispatch")
        )
        assert in_epoch <= ph["epoch_wall"] + 0.5
    assert ph["validate"] > 0.0  # at least one epoch-end validation ran
