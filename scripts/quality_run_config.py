"""Generic yaml-driven end-to-end runner: any benchmark config through the
real ``Trainer.fit`` + batched eval on synthetic data of a given shape.

Companions: quality_run.py (reference-equivalent topology, tunnel/host
split) and quality_run_25m.py (config #4 at scale).  Produced
QUALITY_RUN_100K.json (configs/ml100k_bpr.yaml at 943/1682/100k),
QUALITY_RUN_ML1M_SSM.json and QUALITY_RUN_ML1M_REF.json.

The yaml's MODEL topology and loss run as written; run-harness fields
(epochs/patience/log cadence/dispatch width/checkpointing) and the data
source (synthetic + hash embedder — no egress) are overridden, and the
single-chip host forces a 1x1 mesh.  Every override is recorded in the
output artifact's ``overrides`` field so the JSON states exactly what
ran.  Example:

    python scripts/quality_run_config.py --config configs/ml1m_ssm.yaml \
        --users 6040 --items 3706 --events 1000000 --epochs 4 \
        --data_dir /tmp/xrt_quality_data --out QUALITY_RUN_ML1M_SSM.json
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
    parser.add_argument("--config", required=True)
    parser.add_argument("--users", type=int, required=True)
    parser.add_argument("--items", type=int, required=True)
    parser.add_argument("--events", type=int, required=True)
    parser.add_argument("--epochs", type=int, default=4)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    if args.cpu:
        import jax

        # single-device CPU (the run pins a 1x1 mesh anyway; forcing 8
        # virtual devices would just pay extra XLA startup)
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from transformer_recommenders_tpu.configs import SeqDataModuleConfig, TrainConfig
    from transformer_recommenders_tpu.data.module import SeqDataModule
    from transformer_recommenders_tpu.training.trainer import Trainer

    payload = yaml.safe_load(pathlib.Path(args.config).read_text())
    model_overrides = dict(
        max_epochs=args.epochs,
        early_stopping_patience=4,
        log_every_n_steps=100,
        steps_per_dispatch=8,
        checkpoint_every_epoch=False,
        ckpt_dir=f"/tmp/xrt_cfg_ckpt_{pathlib.Path(args.config).stem}",
        mesh={"data_axis_size": 1, "model_axis_size": 1},
    )
    payload["model"].update(model_overrides)
    data_overrides = dict(
        dataset="synthetic",
        embedder="hash",  # no egress: the ST weights can't download
        data_dir=args.data_dir,
        synthetic_num_users=args.users,
        synthetic_num_items=args.items,
        synthetic_num_events=args.events,
    )
    payload["data"].update(data_overrides)
    config = TrainConfig.model_validate(payload["model"])
    data_config = SeqDataModuleConfig.model_validate(payload["data"])

    t0 = time.time()
    trainer = Trainer(
        config, SeqDataModule(data_config),
        log_dir=f"/tmp/xrt_cfg_logs_{pathlib.Path(args.config).stem}",
    )
    trainer.configure()
    t_fit = time.time()
    try:
        result = trainer.fit()
        fit_wall = time.time() - t_fit
        test = trainer.test()
    finally:
        trainer.close()

    phases = {k: round(v, 1) for k, v in trainer.phase_seconds.items()}
    phases["per_epoch_wall"] = trainer.epoch_walls
    out = {
        "config": f"{args.config} on synthetic shape "
                  f"({args.users} users / {args.items} items / {args.events} events, hash embedder)",
        "epochs_ran": len(trainer.epoch_walls),
        "max_epochs": args.epochs,
        "wall_s": round(time.time() - t0, 1),
        "fit_wall_s": round(fit_wall, 1),
        "fit_phase_seconds": phases,
        "overrides": {"model": model_overrides, "data": data_overrides},
        "val": {k: round(v, 4) for k, v in result.items()},
        "test": {k: round(v, 4) for k, v in test.items()},
    }
    pathlib.Path(args.out).write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
