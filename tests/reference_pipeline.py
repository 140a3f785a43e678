"""Reference-semantics torch training pipeline (shared by the parity tests
and scripts/parity_ml1m.py).

Reconstructs the reference's exact computational path from parts proven
equivalent piecewise:

- the SAME initial weights loaded into a real HF ``BertModel`` (the
  reference's model class; weight-level forward parity proven in
  tests/test_hf_bert_parity.py),
- the SAME training batches (our deterministic sampler),
- the reference's loss math in torch (``xfmr_rec/losses.py``): logits ->
  false-negative mask -> optional hard-negative top-k -> head; dot heads
  (InfoNCE/NCE/pairwise) and cosine heads (Contrastive/Alignment families),
- torch AdamW with the reference's hyperparameters
  (``xfmr_rec/trainer.py:327-332``),
- the SAME evaluation protocol on both sides.
"""

from __future__ import annotations

import numpy as np

COSINE_HEADS = {"AlignmentLoss", "AlignmentContrastiveLoss", "ContrastiveLoss"}


def torch_loss(loss_name, pos_logit, neg_logits, *, margin, scale, num_hard):
    """Reference loss math (``xfmr_rec/losses.py:263-543``) on filtered
    rows x shared-pool logits."""
    import torch

    fn_mask = neg_logits < pos_logit[:, None]
    if 0 < num_hard < neg_logits.shape[1]:
        masked = neg_logits.masked_fill(~fn_mask, -torch.inf)
        top = masked.topk(num_hard, dim=1).indices
        keep = torch.zeros_like(fn_mask).scatter(1, top, True)
        fn_mask = fn_mask & keep
    w = fn_mask.float()
    denom = w.sum(dim=1, keepdim=True) + 1e-9

    def wmean(vals):
        return (vals * w / denom).sum(dim=1)

    if loss_name == "InfoNCELoss":
        logits = torch.cat(
            [pos_logit[:, None], neg_logits.masked_fill(~fn_mask, -torch.inf)],
            dim=1,
        ) * scale
        return torch.nn.functional.cross_entropy(
            logits,
            torch.zeros(len(pos_logit), dtype=torch.long),
            reduction="sum",
        )
    if loss_name == "NCELoss":
        return (
            torch.nn.functional.softplus(-pos_logit)
            + wmean(torch.nn.functional.softplus(neg_logits))
        ).sum()
    if loss_name == "PairwiseLogisticLoss":
        scores = neg_logits - pos_logit[:, None] * (1 - margin)
        return wmean(torch.nn.functional.softplus(scores)).sum()
    if loss_name == "PairwiseHingeLoss":
        scores = neg_logits - pos_logit[:, None] * (1 - margin)
        return wmean(scores.relu()).sum()
    if loss_name == "ContrastiveLoss":
        return wmean((neg_logits - 1 + margin).relu()).sum()
    if loss_name == "AlignmentLoss":
        return (1 - pos_logit).sum()
    if loss_name == "AlignmentContrastiveLoss":
        return (1 - pos_logit).sum() + wmean((neg_logits - 1 + margin).relu()).sum()
    msg = f"unknown loss {loss_name}"
    raise ValueError(msg)


def torch_reference_run(
    trainer,
    init_params,
    loss_name: str = "InfoNCELoss",
    *,
    epochs: int | None = None,
    lr: float | None = None,
    progress: bool = False,
):
    """Train the reference-semantics torch pipeline on the trainer's data
    and return the val retrieval metrics under the identical protocol."""
    import jax.numpy as jnp
    import torch

    from tests.test_hf_bert_parity import build_hf_model
    from transformer_recommenders_tpu.ops.metrics import (
        aggregate_metrics,
        retrieval_metrics,
    )

    cfg = trainer.config
    epochs = epochs if epochs is not None else cfg.max_epochs
    lr = lr if lr is not None else cfg.learning_rate
    top_k = cfg.top_k
    d = cfg.hidden_size
    cosine = loss_name in COSINE_HEADS

    dm = trainer.datamodule
    model = build_hf_model(init_params, num_heads=cfg.num_attention_heads)
    model.train()
    table = torch.zeros(len(dm.item_ids) + 1, d)
    table[1:] = torch.as_tensor(np.asarray(dm.item_embeddings, np.float32))

    opt = torch.optim.AdamW(model.parameters(), lr=lr, weight_decay=0.01)
    for epoch in range(epochs):
        for step, batch in enumerate(dm.train_batches(epoch)):
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
            pos_flat = pos[mask]
            pos_keep = pos_flat != 0
            q, pos_flat = q[pos_keep], pos_flat[pos_keep]
            pos_e = table[pos_flat]
            neg_e = table[neg[mask]]  # pool from attention-valid positions
            if cosine:
                q = torch.nn.functional.normalize(q, dim=-1, eps=1e-8)
                pos_e = torch.nn.functional.normalize(pos_e, dim=-1, eps=1e-8)
                neg_e = torch.nn.functional.normalize(neg_e, dim=-1, eps=1e-8)
            pos_logit = (q * pos_e).sum(-1)
            neg_logits = q @ neg_e.T
            loss = torch_loss(
                loss_name, pos_logit, neg_logits,
                margin=cfg.margin, scale=cfg.scale,
                num_hard=cfg.num_hard_negatives,
            )
            opt.zero_grad()
            loss.backward()
            opt.step()
            if progress and step % 200 == 0:
                print(f"  torch epoch {epoch} step {step}", flush=True)

    # identical eval protocol (batched like the Evaluator, cosine retrieval)
    model.eval()
    arrays = dm.eval_arrays("val")
    pooled_chunks = []
    with torch.inference_mode():
        hw = torch.as_tensor(arrays.history_window.astype(np.int64))
        for lo in range(0, len(hw), 256):
            inputs = table[hw[lo : lo + 256]]
            mask = (inputs != 0).any(-1)
            tok = model(
                inputs_embeds=inputs, attention_mask=mask.long()
            ).last_hidden_state
            pooled_chunks.append(
                (tok * mask[:, :, None]).sum(1)
                / mask.sum(1, keepdim=True).clamp(min=1e-9)
            )
        pooled = torch.cat(pooled_chunks)
    queries = pooled.numpy()
    items = np.asarray(dm.item_embeddings, np.float32)
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    tn = items / np.maximum(np.linalg.norm(items, axis=1, keepdims=True), 1e-12)
    scores = qn @ tn.T
    for u, h in enumerate(arrays.histories):
        scores[u, h - 1] = -np.inf
    top = np.argsort(-scores, axis=1)[:, :top_k] + 1
    targets = arrays.targets
    rel = (top[:, :, None] == targets[:, None, :]) & (targets[:, None, :] > 0)
    metrics = retrieval_metrics(
        jnp.asarray(rel.any(-1)), jnp.asarray(arrays.n_targets), top_k
    )
    return {k: float(v) for k, v in aggregate_metrics(metrics).items()}
