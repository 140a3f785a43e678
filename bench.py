"""Benchmark harness: flagship train throughput vs the reference stack.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

- ours: jitted train step (4-layer d=128 encoder, frozen 384-d item table,
  fused in-batch InfoNCE over the shared negative pool) on the available
  accelerator (TPU via axon when present, else CPU).
- baseline: the reference's compute path — an HF torch ``BertModel``
  (``is_decoder=True``) driven with ``inputs_embeds`` + the same candidate
  scoring/loss shape + AdamW — on torch CPU, matching the reference's
  shipped configuration (``accelerator: cpu``, reference config.yaml:4).
  The reference publishes no numbers (BASELINE.md), so this measured
  torch path IS the baseline.

All progress chatter goes to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

B = 256
S = 32
N_ITEMS = 4096
EMB_DIM = 384
STEPS = 30
WARMUP = 5
# >=20 timed torch steps so the vs_baseline multiple carries error bars
# (round-3 verdict: a 6-step window on a shared host is too noisy to quote
# to four significant figures)
TORCH_STEPS = 20
TORCH_WARMUP = 2


def log(*args) -> None:
    print(*args, file=sys.stderr, flush=True)


def _spread_pct(values: list[float]) -> float:
    """(max - min) / median as a percentage — the published spread figure."""
    med = float(np.median(values))
    return round((max(values) - min(values)) / med * 100, 1) if med else 0.0


def bench_ours() -> tuple[float, list[float]]:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from transformer_recommenders_tpu.training.scan_steps import (
        make_scanned_train_steps,
    )
    from transformer_recommenders_tpu.training.train_state import init_train_state
    from __graft_entry__ import _flagship_config
    from transformer_recommenders_tpu.models.transformer import init_transformer_params

    cfg = _flagship_config()
    log(f"devices: {jax.devices()}")
    params = init_transformer_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        np.concatenate(
            [
                np.zeros((1, EMB_DIM), np.float32),
                rng.normal(size=(N_ITEMS, EMB_DIM)).astype(np.float32),
            ]
        )
    )
    state = init_train_state(cfg, params)
    steps_fn = make_scanned_train_steps(cfg)

    def make_batch(seed: int):
        r = np.random.default_rng(seed)
        return {
            "history_item_idx": jnp.asarray(
                r.integers(1, N_ITEMS + 1, size=(B, S)).astype(np.int32)
            ),
            "pos_item_idx": jnp.asarray(
                r.integers(1, N_ITEMS + 1, size=(B, S)).astype(np.int32)
            ),
            "neg_item_idx": jnp.asarray(
                r.integers(1, N_ITEMS + 1, size=(B, S)).astype(np.int32)
            ),
        }

    k_steps = 16
    stacked = {
        key: jnp.asarray(
            np.stack([np.asarray(make_batch(i)[key]) for i in range(k_steps)])
        )
        for key in ["history_item_idx", "pos_item_idx", "neg_item_idx"]
    }
    key = jax.random.key(0)
    t0 = time.time()
    state, logs = steps_fn(state, table, stacked, key)
    jax.block_until_ready(state.params)
    log(f"compile+warmup: {time.time() - t0:.1f}s")

    # burn 3 calls: the axon runtime can serve the first post-warmup call
    # of a program near-instantly, AND the donated-buffer program variant
    # compiles asynchronously during the first burn — gate the burn phase
    # with a VALUE download or the residual compile bleeds into the timed
    # window (measured: first window 4.2 ms/step, gated window 1.87)
    for _ in range(3):
        state, logs = steps_fn(state, table, stacked, key)
    float(jax.device_get(jax.tree.leaves(state.params)[1].ravel()[0]))

    # 3 spaced windows of 20 reps (320 scanned steps each — the round-3
    # window length, so the ~31 ms tunnel round-trip each window pays on
    # its value gate stays ~5% like previous rounds): the median is the
    # headline and the spread is published, so a tunnel-contended window
    # is visible instead of silently polluting the number
    windows = []
    reps = 20
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            state, logs = steps_fn(state, table, stacked, key)
        # gate on a VALUE download, not just block_until_ready: over the
        # axon tunnel block_until_ready can return before execution for
        # some programs (observed: a 6L seq-128 scan "finished" in 3 ms;
        # the same window gated by device_get measured 1.9 s) — a scalar
        # fetch is the only sync that provably waits
        float(jax.device_get(jax.tree.leaves(state.params)[1].ravel()[0]))
        windows.append(B * k_steps * reps / (time.time() - t0))
        time.sleep(0.25)
    eps = float(np.median(windows))
    spread = _spread_pct(windows)
    log(
        f"ours: 3 windows x {k_steps * reps} scanned steps -> "
        f"median {eps:.1f} examples/s (spread {spread}%: "
        f"{[round(w, 1) for w in windows]})"
    )
    return eps, windows


def bench_torch_reference() -> tuple[float, list[float]]:
    """Reference-equivalent step on torch CPU (HF BertModel, same shapes)."""
    import torch
    from transformers.models.bert import BertConfig, BertModel

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    config = BertConfig(
        vocab_size=1,
        hidden_size=128,
        num_hidden_layers=4,
        num_attention_heads=8,
        intermediate_size=512,
        max_position_embeddings=S,
        is_decoder=True,
    )
    model = BertModel(config)
    proj = torch.nn.Linear(EMB_DIM, 128)
    table = torch.randn(N_ITEMS + 1, EMB_DIM)
    table[0] = 0
    params = list(model.parameters()) + list(proj.parameters())
    opt = torch.optim.AdamW(params, lr=1e-3, weight_decay=0.01)

    rng = np.random.default_rng(0)

    def run_step():
        hist = torch.as_tensor(rng.integers(1, N_ITEMS + 1, size=(B, S)))
        pos = torch.as_tensor(rng.integers(1, N_ITEMS + 1, size=(B, S)))
        neg = torch.as_tensor(rng.integers(1, N_ITEMS + 1, size=(B, S)))
        inputs = proj(table[hist])
        mask = (inputs != 0).any(-1).long()
        out = model(inputs_embeds=inputs, attention_mask=mask)
        q = out.last_hidden_state.reshape(B * S, -1)
        pos_e = proj(table[pos]).reshape(B * S, -1)
        neg_e = proj(table[neg]).reshape(B * S, -1)
        pos_logit = (q * pos_e).sum(-1)
        neg_logits = q @ neg_e.T
        fn_mask = neg_logits < pos_logit[:, None]
        logits = torch.cat(
            [pos_logit[:, None], neg_logits.masked_fill(~fn_mask, -torch.inf)], dim=1
        )
        loss = torch.nn.functional.cross_entropy(
            logits, torch.zeros(B * S, dtype=torch.long), reduction="sum"
        )
        opt.zero_grad()
        loss.backward()
        opt.step()

    for _ in range(TORCH_WARMUP):
        run_step()
    step_times = []
    for _ in range(TORCH_STEPS):
        t0 = time.time()
        run_step()
        step_times.append(time.time() - t0)
    med = float(np.median(step_times))
    eps = B / med
    spread = _spread_pct(step_times)
    log(
        f"torch reference: {TORCH_STEPS} steps, median {med * 1e3:.0f} ms "
        f"-> {eps:.1f} examples/s (per-step spread {spread}%)"
    )
    return eps, step_times


def bench_retrieval_qps() -> dict:
    """On-device exact MIPS top-100 over an ML-25M-scale catalog
    (62k items x 384-d), the BASELINE.md retrieval benchmark."""
    import jax
    import jax.numpy as jnp

    from transformer_recommenders_tpu.ops.topk import topk_items

    from transformer_recommenders_tpu.ops.topk import normalize_rows

    rng = np.random.default_rng(0)
    n_items, d, k = 62_000, 384, 100
    # pre-normalized catalog: what DeviceIndex serves (normalize_rows at
    # index build), so the bench measures the real serving path
    items = jax.jit(normalize_rows)(
        jnp.asarray(rng.normal(size=(n_items, d)).astype(np.float32))
    )
    out = {}
    fn = jax.jit(lambda q: topk_items(q, items, k, items_prenormalized=True)[1])
    # variance defense (round-3 verdict #1: one 50-rep window per batch
    # size is exactly the condition under which earlier rounds mis-read
    # tunnel contention as kernel regression): 5 spaced windows per batch
    # size, median is the headline, spread and per-window values are
    # published, and a wide spread is flagged as suspected contention.
    n_windows, reps = 5, 50
    for qbatch in (1, 32, 256):
        # distinct queries per rep AND per window: the axon tunnel
        # memoizes identical (program, args) dispatches (see BASELINE.md)
        qs = [
            jnp.asarray(rng.normal(size=(qbatch, d)).astype(np.float32))
            for _ in range(n_windows * reps)
        ]
        float(jax.device_get(fn(qs[0]).ravel()[0]))  # warm + gate
        lat_ms = []
        for w in range(n_windows):
            t0 = time.time()
            for i in range(w * reps, (w + 1) * reps):
                idx = fn(qs[i])
            # value-download gate (block_until_ready can return
            # pre-execution over the tunnel — see the train bench note)
            float(jax.device_get(idx.ravel()[0]))
            lat_ms.append((time.time() - t0) / reps * 1000)
            time.sleep(0.25)
        med = float(np.median(lat_ms))
        spread = _spread_pct(lat_ms)
        out[f"qps_batch{qbatch}"] = round(qbatch / med * 1000, 1)
        out[f"latency_ms_batch{qbatch}"] = round(med, 3)
        out[f"latency_ms_batch{qbatch}_windows"] = [round(t, 3) for t in lat_ms]
        out[f"latency_ms_batch{qbatch}_spread_pct"] = spread
        if spread > 25.0:
            out[f"batch{qbatch}_suspected_contention"] = True
            log(
                f"WARNING: retrieval batch={qbatch} window spread {spread}% "
                f"> 25% — suspected tunnel contention; median reported"
            )
    log(f"retrieval top-100 over {n_items}x{d}: {out}")
    return out


def main() -> None:
    ours, train_windows = bench_ours()
    try:
        retrieval = bench_retrieval_qps()
    except Exception as exc:  # noqa: BLE001
        log(f"retrieval bench failed: {exc!r}")
        retrieval = {}
    try:
        baseline, torch_steps = bench_torch_reference()
    except Exception as exc:  # noqa: BLE001 — baseline is best-effort
        log(f"torch baseline failed: {exc!r}")
        baseline, torch_steps = float("nan"), []
    vs = ours / baseline if baseline == baseline and baseline > 0 else float("nan")
    details = {
        "train_examples_per_s": round(ours, 1),
        "train_window_examples_per_s": [round(w, 1) for w in train_windows],
        "train_window_spread_pct": _spread_pct(train_windows),
        "torch_reference_examples_per_s": round(baseline, 1)
        if baseline == baseline
        else None,
        "torch_step_ms": [round(t * 1e3, 1) for t in torch_steps],
        "torch_step_spread_pct": _spread_pct(torch_steps) if torch_steps else None,
        "retrieval": retrieval,
    }
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)
    print(
        json.dumps(
            {
                "metric": "train_examples_per_s_flagship",
                "value": round(ours, 1),
                "unit": "examples/s",
                "vs_baseline": round(vs, 2) if vs == vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
