"""Quality parity at FULL synthetic ML-1M shape (VERDICT round-1 item #3).

Runs this framework's trainer vs the reference-semantics torch pipeline
(tests/reference_pipeline.py — same initial HF-parity weights, same
batches, reference loss math, torch AdamW, identical eval protocol) at the
exact ML-1M shape: 6040 users / 3706 items / 1M events, across the loss
configs VERDICT asked for:

  1. InfoNCELoss                         (config #2's SSM loss)
  2. PairwiseLogisticLoss margin=0       (config #1's BPR)
  3. ContrastiveLoss margin=0.5          (config #4's CCL, cosine head)
  4. InfoNCE + pos_lookahead=8           (windowed positive sampling)
  5. InfoNCE + num_hard_negatives=32     (hard-negative mining)

Writes PARITY_ML1M.json and prints a markdown table for BASELINE.md.

Runs on CPU by design: parity is a QUALITY claim — the torch side only
runs on CPU here and both sides must see identical data; device choice
does not change the measured metrics (our trainer's TPU-vs-CPU numerics
are covered by the kernel/step tests).

Usage: JAX_PLATFORMS=cpu python scripts/parity_ml1m.py [--quick]
(--quick: 1/10th-size dataset for a smoke run)
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("XLA_FLAGS", "")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from transformer_recommenders_tpu.configs import (  # noqa: E402
    SeqDataModuleConfig,
    TrainConfig,
)
from transformer_recommenders_tpu.data.module import SeqDataModule  # noqa: E402
from transformer_recommenders_tpu.training.trainer import Trainer  # noqa: E402

QUICK = "--quick" in sys.argv
REFSHAPE = "--reference-shape" in sys.argv
SCALE = 10 if QUICK else 1

if REFSHAPE:
    # the EXACT reference topology (/root/reference/config.yaml:47-53 —
    # 1L, 12 heads, ffn 48, seq 32, d=384 from MiniLM, batch 32) at full
    # ML-1M data shape (VERDICT round-2 item #5)
    D, L, H, F, S = 384, 1, 12, 48, 32
    BATCH = 32
    OUT = "PARITY_REFSHAPE.json"
else:
    # small encoder so the torch side stays tractable at 1M events; the DATA
    # scale (users/items/pool statistics) is what round 1 lacked
    D, L, H, F, S = 64, 2, 4, 128, 16
    BATCH = 64
    OUT = "PARITY_ML1M.json"
EPOCHS = 1 if QUICK else 2
LR = 1e-3
TOPK = 10

CONFIGS = [
    {"name": "InfoNCE", "train_loss": "InfoNCELoss"},
    {"name": "BPR", "train_loss": "PairwiseLogisticLoss", "margin": 0.0},
    {"name": "CCL-cosine", "train_loss": "ContrastiveLoss", "margin": 0.5},
    {"name": "InfoNCE+lookahead8", "train_loss": "InfoNCELoss", "pos_lookahead": 8},
    {"name": "InfoNCE+hard32", "train_loss": "InfoNCELoss", "num_hard_negatives": 32},
]
if REFSHAPE:  # the three VERDICT-named heads; lookahead/hard32 stay in the
    CONFIGS = CONFIGS[:3]  # full-shape run above


def run_config(spec: dict, root: str) -> dict:
    import jax.numpy as jnp

    from tests.reference_pipeline import torch_reference_run

    pos_lookahead = spec.get("pos_lookahead", 0)
    data_config = SeqDataModuleConfig(
        data_dir=f"{root}/data_la{pos_lookahead}",
        dataset="synthetic",
        embedder="hash",
        embedding_dim=D,
        max_seq_length=S,
        pos_lookahead=pos_lookahead,
        batch_size=BATCH,
        synthetic_num_users=6040 // SCALE,
        synthetic_num_items=3706 // SCALE,
        synthetic_num_events=1_000_000 // SCALE,
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
        train_loss=spec["train_loss"],
        margin=spec.get("margin", 0.5),
        num_hard_negatives=spec.get("num_hard_negatives", 0),
        learning_rate=LR,
        max_epochs=EPOCHS,
        early_stopping_patience=99,
        eval_batch_size=256,
        top_k=TOPK,
        log_every_n_steps=100_000,
        use_mlflow=False,
        ckpt_dir=f"{root}/ckpt_{spec['name']}",
    )
    trainer = Trainer(
        config, SeqDataModule(data_config), log_dir=f"{root}/logs_{spec['name']}"
    )
    trainer.configure()
    init_params = jax.tree.map(np.array, trainer.model.params)

    t0 = time.time()
    ours = trainer.fit()
    t_ours = time.time() - t0
    print(f"[{spec['name']}] ours done in {t_ours:.0f}s", flush=True)

    t0 = time.time()
    theirs = torch_reference_run(
        trainer, init_params, spec["train_loss"], progress=True
    )
    t_torch = time.time() - t0
    print(f"[{spec['name']}] torch done in {t_torch:.0f}s", flush=True)

    return {
        "config": spec,
        "ours": {
            k: v for k, v in ours.items() if k.startswith("val/")
        },
        "torch_reference": theirs,
        "ndcg_ours": ours["val/retrieval_normalized_dcg"],
        "ndcg_torch": theirs["retrieval_normalized_dcg"],
        "hit_ours": ours["val/retrieval_hit_rate"],
        "hit_torch": theirs["retrieval_hit_rate"],
        "seconds_ours": round(t_ours, 1),
        "seconds_torch": round(t_torch, 1),
    }


def main() -> None:
    # never share data across scales/shapes
    root = f"/tmp/parity_ml1m_scale{SCALE}_d{D}s{S}"
    results = []
    for spec in CONFIGS:
        results.append(run_config(spec, root))
        with open(OUT, "w") as f:
            json.dump(
                {
                    "shape": {
                        "users": 6040 // SCALE,
                        "items": 3706 // SCALE,
                        "events": 1_000_000 // SCALE,
                        "model": f"{L}L d={D} seq={S} batch={BATCH}",
                        "epochs": EPOCHS,
                    },
                    "results": results,
                },
                f,
                indent=2,
            )
    print("\n| config | NDCG@10 ours | NDCG@10 torch-ref | Δ | hit@10 ours | hit@10 torch |")
    print("|---|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['config']['name']} | {r['ndcg_ours']:.4f} | {r['ndcg_torch']:.4f} "
            f"| {abs(r['ndcg_ours'] - r['ndcg_torch']):.4f} "
            f"| {r['hit_ours']:.3f} | {r['hit_torch']:.3f} |"
        )


if __name__ == "__main__":
    main()
