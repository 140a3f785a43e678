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

from tests.test_hf_bert_parity import build_hf_model
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


def torch_reference_run(trainer, init_params, loss_name="InfoNCELoss"):
    """Reference-semantics training loop in torch on the same data."""
    dm = trainer.datamodule
    model = build_hf_model(init_params)
    model.train()
    table = torch.zeros(len(dm.item_ids) + 1, D)
    table[1:] = torch.as_tensor(np.asarray(dm.item_embeddings, np.float32))

    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=0.01)
    for epoch in range(EPOCHS):
        for batch in dm.train_batches(epoch):
            hist = torch.as_tensor(batch["history_item_idx"].astype(np.int64))
            pos = torch.as_tensor(batch["pos_item_idx"].astype(np.int64))
            neg = torch.as_tensor(batch["neg_item_idx"].astype(np.int64))
            inputs = table[hist]
            mask = (inputs != 0).any(-1)
            out = model(
                inputs_embeds=inputs, attention_mask=mask.long()
            ).last_hidden_state
            # reference compute_embeds semantics (xfmr_rec/models.py:366-419):
            # valid-token queries, positives per position, shared neg pool
            q = out[mask]
            pos_flat, neg_flat = pos[mask], neg[mask]
            pos_keep = pos_flat != 0
            q, pos_flat = q[pos_keep], pos_flat[pos_keep]
            pos_e = table[pos_flat]
            neg_e = table[neg[mask]]  # pool from attention-valid positions
            pos_logit = (q * pos_e).sum(-1)
            neg_logits = q @ neg_e.T
            fn_mask = neg_logits < pos_logit[:, None]
            if loss_name == "InfoNCELoss":
                logits = torch.cat(
                    [pos_logit[:, None], neg_logits.masked_fill(~fn_mask, -torch.inf)],
                    dim=1,
                )
                loss = torch.nn.functional.cross_entropy(
                    logits,
                    torch.zeros(len(q), dtype=torch.long),
                    reduction="sum",
                )
            else:  # PairwiseLogisticLoss at margin=0 ~= BPR (losses.py:530-543)
                margin = 0.0
                scores = neg_logits - pos_logit[:, None] * (1 - margin)
                w = fn_mask.float()
                denom = w.sum(dim=1, keepdim=True) + 1e-9
                loss = (
                    torch.nn.functional.softplus(scores) * w / denom
                ).sum()
            opt.zero_grad()
            loss.backward()
            opt.step()

    # identical eval protocol
    model.eval()
    arrays = dm.eval_arrays("val")
    with torch.inference_mode():
        inputs = table[torch.as_tensor(arrays.history_window.astype(np.int64))]
        mask = (inputs != 0).any(-1)
        tok = model(
            inputs_embeds=inputs, attention_mask=mask.long()
        ).last_hidden_state
        pooled = (tok * mask[:, :, None]).sum(1) / mask.sum(1, keepdim=True).clamp(
            min=1e-9
        )
    queries = pooled.numpy()
    items = np.asarray(dm.item_embeddings, np.float32)
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    tn = items / np.maximum(np.linalg.norm(items, axis=1, keepdims=True), 1e-12)
    scores = qn @ tn.T
    for u, h in enumerate(arrays.histories):
        scores[u, h - 1] = -np.inf
    top = np.argsort(-scores, axis=1)[:, :TOPK] + 1
    targets = arrays.targets
    rel = (top[:, :, None] == targets[:, None, :]) & (targets[:, None, :] > 0)
    metrics = retrieval_metrics(
        jnp.asarray(rel.any(-1)), jnp.asarray(arrays.n_targets), TOPK
    )
    return {k: float(v) for k, v in aggregate_metrics(metrics).items()}


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
