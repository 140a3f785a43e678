"""Moderate-scale smoke: bucketed eval + full pipeline on a bigger synthetic
set (exercises ragged eval batching across several width buckets)."""

import numpy as np

from transformer_recommenders_tpu.configs import SeqDataModuleConfig, TrainConfig
from transformer_recommenders_tpu.data.module import SeqDataModule
from transformer_recommenders_tpu.training.trainer import Trainer


def test_scale_pipeline(tmp_path):
    data_config = SeqDataModuleConfig(
        data_dir=str(tmp_path / "data"),
        dataset="synthetic",
        embedder="hash",
        embedding_dim=32,
        max_seq_length=16,
        batch_size=64,
        synthetic_num_users=400,
        synthetic_num_items=600,
        synthetic_num_events=30_000,
    )
    config = TrainConfig(
        hidden_size=32,
        num_hidden_layers=1,
        num_attention_heads=4,
        intermediate_size=32,
        max_seq_length=16,
        compute_dtype="float32",
        max_epochs=1,
        limit_train_batches=10,
        eval_batch_size=64,
        top_k=20,
        log_every_n_steps=1000,
        ckpt_dir=str(tmp_path / "ckpt"),
    )
    trainer = Trainer(config, SeqDataModule(data_config), log_dir=str(tmp_path / "logs"))
    result = trainer.fit()
    assert np.isfinite(result["val/retrieval_normalized_dcg"])

    # the val split spans users with very different history/target lengths;
    # bucketed batches must agree with a dense-padded recompute
    arrays = trainer.datamodule.eval_arrays("val")
    lens = sorted({len(h) for h in arrays.histories})
    assert len(lens) > 3  # genuinely ragged
    hw, hf, tg, nt = arrays.batch(0, min(64, len(arrays)), 64)
    dense_hf = arrays.history_full
    for j in range(min(64, len(arrays))):
        h = dense_hf[j][dense_hf[j] > 0]
        np.testing.assert_array_equal(hf[j][: len(h)], h)
        assert (hf[j][len(h) :] == 0).all()


def test_ml25m_scale_config_trains_sharded(tmp_path):
    """Benchmark config #4 end to end (shrunk data, full topology): 6-layer
    d=256 seq-128 CCL with the item table row-sharded over a (4, 2) mesh."""
    from transformer_recommenders_tpu.configs import MeshConfig

    data_config = SeqDataModuleConfig(
        data_dir=str(tmp_path / "data"),
        dataset="synthetic",
        embedder="hash",
        embedding_dim=384,
        max_seq_length=128,
        batch_size=8,
        synthetic_num_users=30,
        synthetic_num_items=60,
        synthetic_num_events=6000,
    )
    config = TrainConfig(
        input_dim=384,
        hidden_size=256,
        num_hidden_layers=6,
        num_attention_heads=8,
        intermediate_size=1024,
        max_seq_length=128,
        compute_dtype="float32",
        train_loss="ContrastiveLoss",
        margin=0.5,
        max_epochs=1,
        limit_train_batches=2,
        eval_batch_size=8,
        top_k=10,
        log_every_n_steps=1000,
        ckpt_dir=str(tmp_path / "ckpt"),
        mesh=MeshConfig(data_axis_size=4, model_axis_size=2),
    )
    trainer = Trainer(config, SeqDataModule(data_config), log_dir=str(tmp_path / "logs"))
    result = trainer.fit()
    assert trainer.mesh.shape == {"data": 4, "model": 2}
    assert np.isfinite(result["val/retrieval_normalized_dcg"])
