"""Data CLI: ``xrt-data [--data_dir data] [--dataset ml-1m] [--overwrite]``.

Parity: the reference ``data`` entrypoint (``xfmr_rec/data.py:942-961``).
"""

from __future__ import annotations

import argparse

from transformer_recommenders_tpu.configs import SeqDataModuleConfig
from transformer_recommenders_tpu.data.module import SeqDataModule


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(prog="xrt-data")
    parser.add_argument("--data_dir", default="data")
    parser.add_argument(
        "--dataset", default="ml-1m", choices=["ml-1m", "ml-100k", "ml-25m", "synthetic"]
    )
    parser.add_argument("--overwrite", action="store_true")
    args = parser.parse_args(argv)

    dm = SeqDataModule(
        SeqDataModuleConfig(data_dir=args.data_dir, dataset=args.dataset)
    )
    dm.prepare_data(overwrite=args.overwrite)
    dm.setup()
    print(
        f"dataset={args.dataset} items={len(dm.items)} users={len(dm.users)} "
        f"train_rows={len(dm.train_data)}"
    )


if __name__ == "__main__":
    main()
