"""ETL throughput bench at ML-25M scale (VERDICT round-1 item #7).

Generates a synthetic 25M-event frame (162k users — the real ML-25M shape)
and times the vectorized ``process_users`` aggregation, which replaced the
per-user Python loop.  Reference anchor: the polars group_by/agg of
``xfmr_rec/data.py:445-487``.

Usage: python scripts/bench_etl.py [n_events] [n_users]
"""

from __future__ import annotations

import pathlib
import sys
import tempfile
import time

import numpy as np
import pandas as pd


def make_events(n_events: int, n_users: int, n_items: int, seed=0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    user = rng.integers(0, n_users, size=n_events)
    item = rng.integers(1, n_items + 1, size=n_events)
    is_train = rng.random(n_events) < 0.8
    is_val = ~is_train & (rng.random(n_events) < 0.5)
    return pd.DataFrame(
        {
            "user_id": pd.Series(user).astype(str),
            "item_id": pd.Series(item).astype(str),
            "item_text": pd.Series(item).astype(str).radd("title-"),
            "datetime": rng.integers(1e9, 2e9, size=n_events),
            "event_name": np.full(n_events, "rating", object),
            "event_value": rng.integers(1, 6, size=n_events).astype(float),
            "label": rng.random(n_events) < 0.8,
            "is_train": is_train,
            "is_val": is_val,
            "is_test": ~is_train & ~is_val,
            "is_predict": np.ones(n_events, bool),
        }
    )


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000_000
    n_users = int(sys.argv[2]) if len(sys.argv) > 2 else 162_000
    from transformer_recommenders_tpu.data.movielens import process_users

    t0 = time.time()
    events = make_events(n_events, n_users, n_items=30_000)
    users = pd.DataFrame(
        {
            "user_id": pd.Series(np.arange(n_users)).astype(str),
            "user_text": np.full(n_users, "{}", object),
        }
    )
    print(f"generate: {time.time() - t0:.1f}s ({n_events:,} events, {n_users:,} users)")

    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.time()
        out = process_users(
            users, events, out_dir=pathlib.Path(tmp), overwrite=True
        )
        dt = time.time() - t0
        print(
            f"process_users: {dt:.1f}s -> {len(out):,} user rows "
            f"({n_events / dt / 1e6:.1f}M events/s)"
        )


if __name__ == "__main__":
    main()
