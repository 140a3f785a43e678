"""Train CLI: ``xrt-train {fit,validate,test,predict} [--config cfg.yaml] [--key value ...]``.

Parity: the reference's LightningCLI/jsonargparse surface
(``xfmr_rec/trainer.py:376-508``, ``config.yaml``): subcommand + YAML file +
dotted CLI overrides for every trainer/model/data field, ``--print_config``,
and ``--ckpt_path`` resume.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
from typing import Any

import yaml

from transformer_recommenders_tpu.configs import SeqDataModuleConfig, TrainConfig
from transformer_recommenders_tpu.data.module import SeqDataModule
from transformer_recommenders_tpu.training.trainer import Trainer


def _coerce(value: str) -> Any:
    try:
        return yaml.safe_load(value)
    except yaml.YAMLError:
        return value


def _apply_overrides(payload: dict, overrides: list[str]) -> dict:
    it = iter(overrides)
    for key in it:
        if not key.startswith("--"):
            msg = f"expected --dotted.key, got {key!r}"
            raise SystemExit(msg)
        key = key[2:]
        try:
            raw = next(it)
        except StopIteration:
            raw = "true"
        node = payload
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _coerce(raw)
    return payload


def build(args: argparse.Namespace, overrides: list[str]):
    payload: dict = {"model": {}, "data": {}}
    if args.config:
        with open(args.config) as f:
            payload.update(yaml.safe_load(f) or {})
    payload = _apply_overrides(payload, overrides)

    train_config = TrainConfig.model_validate(payload.get("model") or {})
    data_config = SeqDataModuleConfig.model_validate(payload.get("data") or {})
    if args.print_config:
        print(
            yaml.safe_dump(
                {
                    "model": train_config.model_dump(),
                    "data": data_config.model_dump(),
                },
                sort_keys=False,
            )
        )
        raise SystemExit(0)
    datamodule = SeqDataModule(data_config)
    trainer = Trainer(train_config, datamodule, log_dir=args.log_dir)
    if args.ckpt_path:
        trainer.restore(args.ckpt_path)
    return trainer


def main(argv: list[str] | None = None) -> dict[str, float]:
    # multi-host bring-up at process start, BEFORE any backend-touching
    # JAX call (ADVICE round 1: jax.devices()-before-initialize leaves each
    # host with a silently local-only mesh)
    from transformer_recommenders_tpu.parallel.mesh import (
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed()
    import jax

    # persistent compile cache: TPU programs (especially via remote compile
    # services) can take minutes to build; repeat runs should not pay twice
    if not jax.config.jax_compilation_cache_dir:
        jax.config.update(
            "jax_compilation_cache_dir",
            str(pathlib.Path.home() / ".cache" / "jax_compilation"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    parser = argparse.ArgumentParser(prog="xrt-train")
    parser.add_argument(
        "command", choices=["fit", "validate", "test", "predict"], nargs="?", default="fit"
    )
    parser.add_argument("--config", default=None, help="YAML config file")
    parser.add_argument("--ckpt_path", default=None, help="checkpoint dir to resume from")
    parser.add_argument("--log_dir", default="runs/default")
    parser.add_argument("--save_path", default=None, help="artifact dir to export after fit")
    parser.add_argument(
        "--predict_output", default=None, help="parquet path for predict results"
    )
    parser.add_argument("--print_config", action="store_true")
    args, overrides = parser.parse_known_args(argv)

    trainer = build(args, overrides)
    try:
        result = _dispatch(trainer, args)
    finally:
        # terminate the logger sinks — the MLflow run otherwise stays
        # status RUNNING forever (Lightning finalizes its loggers too)
        trainer.close()
    return result


def _dispatch(trainer, args) -> dict[str, float]:
    if args.command == "fit":
        result = trainer.fit()
        if args.save_path:
            trainer.save(args.save_path)
    elif args.command == "validate":
        result = trainer.validate()
    elif args.command == "test":
        result = trainer.test()
    else:
        recs = trainer.predict()
        if args.predict_output:
            import pandas as pd

            pd.DataFrame(
                {
                    "user_id": recs["user_ids"],
                    "item_ids": [list(row) for row in recs["item_ids"]],
                    "scores": [list(map(float, row)) for row in recs["scores"]],
                }
            ).to_parquet(args.predict_output, index=False)
        result = {"num_users": float(len(recs["user_ids"]))}
    print(yaml.safe_dump({k: float(v) for k, v in result.items()}, sort_keys=False))
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
