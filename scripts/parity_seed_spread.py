"""Seed spread of our trainer at the EXACT reference topology.

The parity tables (PARITY_REFSHAPE.json) claim ours-vs-torch deltas are
"within run-to-run variance", but the round-3 variance yardstick was
measured on the SMALL harness shape (2L d=64, PARITY_ML1M lookahead8
seeds 0/1/2).  This script measures the spread where the claim is made:
the reference topology (1L d=384 ffn=48 seq=32 batch=32,
/root/reference/config.yaml:47-53) on full-ML-1M-shape synthetic data,
our trainer only, N model seeds on identical data.

Writes PARITY_SEED_SPREAD.json.  CPU by design (parity is a quality
claim; see scripts/parity_ml1m.py).

Usage: JAX_PLATFORMS=cpu python scripts/parity_seed_spread.py [--seeds 3]
"""

from __future__ import annotations

import argparse
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

D, L, H, F, S, BATCH = 384, 1, 12, 48, 32, 32


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--root", default="/tmp/xrt_seed_spread")
    args = ap.parse_args()

    data_config = SeqDataModuleConfig(
        data_dir=f"{args.root}/data",
        dataset="synthetic",
        embedder="hash",
        embedding_dim=D,
        max_seq_length=S,
        batch_size=BATCH,
        synthetic_num_users=6040,
        synthetic_num_items=3706,
        synthetic_num_events=1_000_000,
    )
    runs = []
    for seed in range(args.seeds):
        config = TrainConfig(
            hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
            intermediate_size=F, max_seq_length=S, compute_dtype="float32",
            hidden_dropout=0.0, attention_dropout=0.0,
            train_loss="InfoNCELoss", learning_rate=1e-3, max_epochs=2,
            early_stopping_patience=99, eval_batch_size=256, top_k=10,
            log_every_n_steps=100_000, use_mlflow=False, seed=seed,
            ckpt_dir=f"{args.root}/ckpt_s{seed}",
        )
        trainer = Trainer(
            config, SeqDataModule(data_config), log_dir=f"{args.root}/logs_s{seed}"
        )
        t0 = time.time()
        val = trainer.fit()
        trainer.close()
        runs.append(
            {
                "seed": seed,
                "ndcg10": round(val["val/retrieval_normalized_dcg"], 5),
                "hit10": round(val["val/retrieval_hit_rate"], 5),
                "wall_s": round(time.time() - t0, 1),
            }
        )
        print(f"seed {seed}: {runs[-1]}", flush=True)

    ndcgs = [r["ndcg10"] for r in runs]
    out = {
        "config": "reference topology 1L d=384 ffn=48 seq=32 batch=32, "
        "InfoNCE, full ML-1M-shape synthetic, 2 epochs, ours only",
        "runs": runs,
        "ndcg10_spread": round(max(ndcgs) - min(ndcgs), 5),
        "ndcg10_mean": round(float(np.mean(ndcgs)), 5),
    }
    pathlib.Path("PARITY_SEED_SPREAD.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
