"""Synthetic MovieLens-compatible dataset generator.

The reference always trains on a live ML-1M download
(``xfmr_rec/data.py:37-124``, ``tests/test_recommender.py:8-14``).  This
environment has no egress, so tests and benches use a generator that emits
raw frames in the exact raw-loader schema and reuses the real
split/processing pipeline (``movielens.prepare_movielens`` with ``raw=``),
guaranteeing artifact-schema parity.

The generated interactions have learnable sequential structure: items live
on a ring of genres; each user random-walks with popularity (zipf) mixing,
so "next item" is statistically predictable from recent history.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np
import pandas as pd

from transformer_recommenders_tpu.data import movielens

GENRES = [
    "Action", "Comedy", "Drama", "Horror", "Romance", "Sci-Fi", "Thriller",
    "Animation", "Documentary", "Fantasy",
]


def generate_raw(
    num_users: int = 200,
    num_items: int = 500,
    num_events: int = 20_000,
    seed: int = 0,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Build (items, users, events) frames in the raw-loader schema."""
    rng = np.random.default_rng(seed)

    item_ids = [str(i + 1) for i in range(num_items)]
    genres = [GENRES[i % len(GENRES)] for i in range(num_items)]
    items = pd.DataFrame(
        {
            "item_id": item_ids,
            "item_text": [
                json.dumps(
                    {"title": f"Movie {i + 1} ({1990 + i % 30})", "genres": [g]},
                    separators=(",", ":"),
                )
                for i, g in enumerate(genres)
            ],
        }
    )

    user_ids = [str(u + 1) for u in range(num_users)]
    users = pd.DataFrame(
        {
            "user_id": user_ids,
            "user_text": [
                json.dumps(
                    {
                        "gender": "MF"[int(rng.integers(2))],
                        "age": int(rng.choice([1, 18, 25, 35, 45, 50, 56])),
                        "occupation": int(rng.integers(21)),
                        "zipcode": f"{rng.integers(10000, 99999)}",
                    },
                    separators=(",", ":"),
                )
                for _ in user_ids
            ],
        }
    )

    # popularity: zipf-ish weights
    pop = 1.0 / np.arange(1, num_items + 1) ** 0.8
    pop /= pop.sum()

    events_per_user = rng.multinomial(num_events - 5 * num_users, np.full(num_users, 1 / num_users))
    events_per_user += 5  # every user gets at least 5 events

    if num_events >= 2_000_000:
        events = _events_vectorized(rng, num_items, events_per_user, pop)
    else:
        events = _events_loop(
            rng, user_ids, item_ids, num_items, events_per_user, pop
        )
    events["event_name"] = "rating"
    events["label"] = True
    return items, users, events


def _events_loop(rng, user_ids, item_ids, num_items, events_per_user, pop):
    """Per-event Python loop — kept verbatim for small datasets so existing
    seeded fixtures (tests, QUALITY_RUN) stay bit-identical."""
    rows_user, rows_item, rows_time, rows_val = [], [], [], []
    t0 = 978_300_000  # ~2001, like ml-1m timestamps
    for u, n in enumerate(events_per_user):
        # random walk: next item near the previous one on the ring w.p. 0.7
        cur = int(rng.choice(num_items, p=pop))
        t = t0 + int(rng.integers(0, 10_000_000))
        seen = []
        for _ in range(int(n)):
            seen.append(cur)
            rows_user.append(user_ids[u])
            rows_item.append(item_ids[cur])
            rows_time.append(t)
            rows_val.append(int(rng.integers(1, 6)))
            t += int(rng.integers(60, 100_000))
            if rng.random() < 0.7:
                cur = (cur + int(rng.integers(1, 4))) % num_items
            else:
                cur = int(rng.choice(num_items, p=pop))
    return pd.DataFrame(
        {
            "user_id": rows_user,
            "item_id": rows_item,
            "event_value": np.asarray(rows_val, np.int32),
            "datetime": np.asarray(rows_time, np.int64),
        }
    )


def _events_vectorized(rng, num_items, events_per_user, pop):
    """Segmented-cumsum formulation of the same ring random walk for scale
    datasets (ML-25M shape: a per-event loop over 25M events costs tens of
    minutes; this is a handful of length-E numpy passes).

    Walk semantics match ``_events_loop`` distributionally: each event is a
    popularity (zipf) jump with p = 0.3 — and always at a user's first
    event — otherwise ring-adjacent to the previous item (step 1..3).
    Positions between jumps are ``jump_value + cumsum(steps)``; timestamps
    are a per-user base plus ``cumsum`` of per-event increments.  Both are
    recovered segment-wise via the last-jump-index ``maximum.accumulate``
    trick, so no Python-level loop touches the E-length arrays.
    """
    counts = events_per_user.astype(np.int64)
    e_total = int(counts.sum())
    first_idx = np.concatenate([[0], np.cumsum(counts)[:-1]])
    is_first = np.zeros(e_total, bool)
    is_first[first_idx] = True

    jumps = (rng.random(e_total) < 0.3) | is_first
    jump_vals = rng.choice(num_items, size=e_total, p=pop)
    steps = rng.integers(1, 4, size=e_total)
    cs = np.cumsum(steps)
    last_jump = np.maximum.accumulate(np.where(jumps, np.arange(e_total), 0))
    item_pos = (jump_vals[last_jump] + (cs - cs[last_jump])) % num_items

    incs = rng.integers(60, 100_000, size=e_total)
    cs_t = np.cumsum(incs)
    t0s = 978_300_000 + rng.integers(0, 10_000_000, size=len(counts))
    user_first = np.repeat(first_idx, counts)
    times = np.repeat(t0s, counts) + (cs_t - cs_t[user_first])

    user_num = np.repeat(np.arange(1, len(counts) + 1), counts)
    return pd.DataFrame(
        {
            "user_id": pd.Series(user_num).astype(str),
            "item_id": pd.Series(item_pos + 1).astype(str),
            "event_value": rng.integers(1, 6, size=e_total).astype(np.int32),
            "datetime": times.astype(np.int64),
        }
    )


def prepare_synthetic(
    data_dir: str,
    *,
    num_users: int = 200,
    num_items: int = 500,
    num_events: int = 20_000,
    seed: int = 0,
    overwrite: bool = False,
) -> pathlib.Path:
    """Generate and run the shared ETL.  Writes ``<data_dir>/synthetic/*.parquet``
    and returns the dataset directory."""
    out_dir = pathlib.Path(data_dir, "synthetic")
    if not overwrite and (out_dir / "users.parquet").exists():
        return out_dir
    raw = generate_raw(num_users, num_items, num_events, seed)
    movielens.prepare_movielens(
        data_dir, "synthetic", overwrite=overwrite, raw=raw
    )
    return out_dir
