"""End-to-end quality parity: this framework vs a reference-semantics torch run.

The reference stack itself (Lightning/BentoML/LanceDB) is not installed
here, so this constructs its exact computational pipeline from parts
proven equivalent piecewise:

- the SAME initial weights loaded into a real HF ``BertModel`` (the
  reference's model class; weight-level forward parity proven in
  tests/test_hf_bert_parity.py),
- the SAME training batches (our deterministic sampler),
- the reference's loss math (``xfmr_rec/losses.py`` InfoNCE + false-
  negative masking + shared in-batch pool) written in torch,
- torch AdamW with the reference's hyperparameters
  (``xfmr_rec/trainer.py:327-332``),
- the SAME evaluation protocol on both sides.

With dropout disabled and float32 everywhere, the two frameworks see
identical data and optimize near-identical functions — final retrieval
quality must agree closely.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.reference_pipeline import torch_reference_run
from transformer_recommenders_tpu.configs import SeqDataModuleConfig, TrainConfig
from transformer_recommenders_tpu.data.module import SeqDataModule
from transformer_recommenders_tpu.ops.metrics import aggregate_metrics, retrieval_metrics
from transformer_recommenders_tpu.training.trainer import Trainer

D, L, H, F, S = 64, 2, 4, 128, 8
EPOCHS, LR, TOPK = 3, 3e-3, 10
LOSS = "InfoNCELoss"


@pytest.fixture(scope="module")
def shared(tmp_path_factory):
    root = tmp_path_factory.mktemp("parity")
    data_config = SeqDataModuleConfig(
        data_dir=str(root / "data"),
        dataset="synthetic",
        embedder="hash",
        embedding_dim=D,
        max_seq_length=S,
        batch_size=16,
        synthetic_num_users=60,
        synthetic_num_items=80,
        synthetic_num_events=6000,
    )
    config = TrainConfig(
        hidden_size=D,
        num_hidden_layers=L,
        num_attention_heads=H,
        intermediate_size=F,
        max_seq_length=S,
        compute_dtype="float32",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        train_loss=LOSS,
        learning_rate=LR,
        max_epochs=EPOCHS,
        early_stopping_patience=99,
        eval_batch_size=32,
        top_k=TOPK,
        log_every_n_steps=10_000,
        ckpt_dir=str(root / "ckpt"),
    )
    trainer = Trainer(config, SeqDataModule(data_config), log_dir=str(root / "logs"))
    trainer.configure()
    init_params = jax.tree.map(np.array, trainer.model.params)
    return trainer, init_params


def test_quality_matches_torch_reference_pipeline(shared):
    trainer, init_params = shared
    ours = trainer.fit()
    theirs = torch_reference_run(trainer, init_params, LOSS)

    ndcg_ours = ours["val/retrieval_normalized_dcg"]
    ndcg_theirs = theirs["retrieval_normalized_dcg"]
    hit_ours = ours["val/retrieval_hit_rate"]
    hit_theirs = theirs["retrieval_hit_rate"]
    print(f"ours: ndcg={ndcg_ours:.4f} hit={hit_ours:.4f}")
    print(f"torch reference: ndcg={ndcg_theirs:.4f} hit={hit_theirs:.4f}")

    # both learned far beyond the random floor...
    assert ndcg_ours > 0.05 and ndcg_theirs > 0.05
    # ...and agree within run-to-run variance
    assert abs(ndcg_ours - ndcg_theirs) < 0.08
    assert abs(hit_ours - hit_theirs) < 0.15


def test_bpr_quality_matches_torch_reference(shared, tmp_path):
    """Same protocol with the BPR family (PairwiseLogisticLoss, margin=0) —
    benchmark config #1's loss."""
    base_trainer, init_params = shared
    config = base_trainer.config.model_copy(
        update={
            "train_loss": "PairwiseLogisticLoss",
            "margin": 0.0,
            "ckpt_dir": str(tmp_path / "ckpt"),
        }
    )
    trainer = Trainer(config, base_trainer.datamodule, log_dir=str(tmp_path / "logs"))
    trainer.configure()
    trainer.model.params = jax.tree.map(jnp.asarray, init_params)
    trainer.state = None
    trainer._train_step = None
    trainer.configure()
    ours = trainer.fit()
    theirs = torch_reference_run(trainer, init_params, "PairwiseLogisticLoss")
    print(f"BPR ours: ndcg={ours['val/retrieval_normalized_dcg']:.4f}")
    print(f"BPR torch: ndcg={theirs['retrieval_normalized_dcg']:.4f}")
    assert ours["val/retrieval_normalized_dcg"] > 0.05
    assert abs(
        ours["val/retrieval_normalized_dcg"] - theirs["retrieval_normalized_dcg"]
    ) < 0.08
