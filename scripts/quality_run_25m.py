"""ML-25M-SCALE end-to-end run (VERDICT r4 next #2).

Drives ``configs/ml25m_ccl.yaml`` — the BASELINE.json scale config — through
the real ``Trainer.fit`` + batched evaluator on synthetic data with the
exact ML-25M shape (162k users / 62k items / 25M events, hash embedder; no
egress -> no real ML-25M).  This is the config that had never executed
end-to-end: ETL-25M, the step-time bench and the 62k-catalog retrieval
bench existed separately, but the evaluator had never faced a
162k-user x 62k-item score problem per epoch.

Single-chip: the yaml's model_axis_size=2 topology is overridden to 1 (the
sharded path is certified by tests/test_parallel.py and
__graft_entry__.dryrun_multichip on the virtual mesh; this host has one
chip).

Publishes QUALITY_RUN_25M.json: per-phase walls, steady-state train
throughput, and eval throughput in users/s at the full eval shape.

Usage: python scripts/quality_run_25m.py [--epochs 2]
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
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--data_dir", default="/tmp/xrt_25m_data")
    parser.add_argument("--out", default="QUALITY_RUN_25M.json")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from transformer_recommenders_tpu.configs import SeqDataModuleConfig, TrainConfig
    from transformer_recommenders_tpu.data.module import SeqDataModule
    from transformer_recommenders_tpu.training.trainer import Trainer

    payload = yaml.safe_load(
        (pathlib.Path(__file__).parent.parent / "configs" / "ml25m_ccl.yaml").read_text()
    )
    payload["model"].update(
        max_epochs=args.epochs,
        early_stopping_patience=0,
        log_every_n_steps=100,
        steps_per_dispatch=8,
        checkpoint_every_epoch=False,
        ckpt_dir="/tmp/xrt_25m_ckpt",
        mesh={"data_axis_size": 1, "model_axis_size": 1},
    )
    payload["data"].update(
        dataset="synthetic",
        embedder="hash",
        data_dir=args.data_dir,
        synthetic_num_users=162_000,
        synthetic_num_items=62_000,
        synthetic_num_events=25_000_000,
    )
    config = TrainConfig.model_validate(payload["model"])
    data_config = SeqDataModuleConfig.model_validate(payload["data"])

    t0 = time.time()
    trainer = Trainer(config, SeqDataModule(data_config), log_dir="/tmp/xrt_25m_logs")
    trainer.configure()  # ETL (generate + split + embed) + compile
    t_configure = time.time() - t0

    t_fit = time.time()
    result = trainer.fit()
    fit_wall = time.time() - t_fit

    # eval throughput at the full shape: time one validate pass alone
    n_val_users = len(trainer.datamodule.eval_arrays("val").user_ids)
    t_val = time.time()
    val_again = trainer.validate()
    val_wall = time.time() - t_val

    test = trainer.test()
    trainer.close()

    phases = {k: round(v, 1) for k, v in trainer.phase_seconds.items()}
    ph = trainer.phase_seconds
    in_epoch = sum(
        ph[k] for k in ("queue_wait", "upload", "dispatch", "log", "tail_dispatch")
    )
    phases["epoch_gap"] = round(max(0.0, ph["epoch_wall"] - in_epoch), 1)
    phases["per_epoch_wall"] = trainer.epoch_walls
    steady = trainer.epoch_walls[1:]
    if steady:
        import numpy as np

        med_epoch = float(np.median(steady))
        examples_per_epoch = (
            result["train/examples_per_s"] * fit_wall / len(trainer.epoch_walls)
        )
        phases["steady_state_examples_per_s"] = round(
            examples_per_epoch / max(med_epoch, 1e-9), 1
        )
        phases["median_steady_epoch_s"] = round(med_epoch, 2)
        phases["warmup_epoch0_s"] = trainer.epoch_walls[0]

    payload_out = {
        "config": "configs/ml25m_ccl.yaml on synthetic ML-25M shape "
                  "(162k users / 62k items / 25M events, hash embedder, 1 chip)",
        "epochs": args.epochs,
        "wall_s": round(time.time() - t0, 1),
        "configure_s": round(t_configure, 1),
        "fit_wall_s": round(fit_wall, 1),
        "fit_phase_seconds": phases,
        "eval_shape": f"{n_val_users} users x 62000 items",
        "eval_wall_s": round(val_wall, 1),
        "eval_users_per_s": round(n_val_users / max(val_wall, 1e-9), 1),
        "val": {k: round(v, 4) for k, v in result.items()},
        "val_repeat": {k: round(v, 4) for k, v in val_again.items()},
        "test": {k: round(v, 4) for k, v in test.items()},
    }
    pathlib.Path(args.out).write_text(json.dumps(payload_out, indent=2))
    print(json.dumps(payload_out, indent=2))


if __name__ == "__main__":
    main()
