"""Config-#1 end-to-end run: ML-100K shape, BPR (PairwiseLogisticLoss).

Drives ``configs/ml100k_bpr.yaml`` — BASELINE.json's CPU-runnable config —
through the real ``Trainer.fit`` + batched eval on synthetic data with the
ML-100K shape (943 users / 1682 items / 100k events, hash embedder; no
egress -> no real ML-100K).  Completes the per-config execution evidence:
config #4 has QUALITY_RUN_25M.json, configs #2/#3 the ML-1M-shape
QUALITY_RUN.json, and this is #1 — notably the only benchmark config
training through the pairwise-logistic (BPR) head end-to-end.

Usage: python scripts/quality_run_100k.py [--epochs 16]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import yaml  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=16)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--data_dir", default="/tmp/xrt_100k_data")
    parser.add_argument("--out", default="QUALITY_RUN_100K.json")
    args = parser.parse_args()

    if args.cpu:
        import os

        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from transformer_recommenders_tpu.configs import SeqDataModuleConfig, TrainConfig
    from transformer_recommenders_tpu.data.module import SeqDataModule
    from transformer_recommenders_tpu.training.trainer import Trainer

    payload = yaml.safe_load(
        (pathlib.Path(__file__).parent.parent / "configs" / "ml100k_bpr.yaml").read_text()
    )
    payload["model"].update(
        max_epochs=args.epochs,
        early_stopping_patience=4,
        log_every_n_steps=50,
        steps_per_dispatch=8,
        checkpoint_every_epoch=False,
        ckpt_dir="/tmp/xrt_100k_ckpt",
    )
    payload["data"].update(
        dataset="synthetic",
        embedder="hash",
        data_dir=args.data_dir,
        synthetic_num_users=943,
        synthetic_num_items=1682,
        synthetic_num_events=100_000,
    )
    config = TrainConfig.model_validate(payload["model"])
    data_config = SeqDataModuleConfig.model_validate(payload["data"])

    t0 = time.time()
    trainer = Trainer(config, SeqDataModule(data_config), log_dir="/tmp/xrt_100k_logs")
    trainer.configure()
    t_fit = time.time()
    result = trainer.fit()
    fit_wall = time.time() - t_fit
    test = trainer.test()
    trainer.close()

    phases = {k: round(v, 1) for k, v in trainer.phase_seconds.items()}
    phases["per_epoch_wall"] = trainer.epoch_walls

    out = {
        "config": "configs/ml100k_bpr.yaml (BPR ~= PairwiseLogisticLoss, "
                  "margin 0) on synthetic ML-100K shape "
                  "(943 users / 1682 items / 100k events, hash embedder)",
        "epochs_ran": len(trainer.epoch_walls),
        "max_epochs": args.epochs,
        "wall_s": round(time.time() - t0, 1),
        "fit_wall_s": round(fit_wall, 1),
        "fit_phase_seconds": phases,
        "val": {k: round(v, 4) for k, v in result.items()},
        "test": {k: round(v, 4) for k, v in test.items()},
    }
    pathlib.Path(args.out).write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
