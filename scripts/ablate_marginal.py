"""Marginal in-context cost of each step component, measured the only way
that is reliable over the tunnel: run the REAL 16-step scanned program,
then re-run it with one component knocked out (monkeypatched to identity)
and diff the per-step time.

Usage: python scripts/ablate_marginal.py
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from __graft_entry__ import _flagship_config  # noqa: E402
from transformer_recommenders_tpu.models import recommender as R  # noqa: E402
from transformer_recommenders_tpu.models import transformer as T  # noqa: E402
from transformer_recommenders_tpu.ops import fused_table_infonce as FT  # noqa: E402
from transformer_recommenders_tpu.training import scan_steps as SS  # noqa: E402
from transformer_recommenders_tpu.training import train_state as TS  # noqa: E402

B, S, N, EMB, K, REPS = 256, 32, 4096, 384, 16, 20

CFG = _flagship_config()
PARAMS = T.init_transformer_params(jax.random.key(0), CFG)
_r = np.random.default_rng(0)
TABLE = jnp.asarray(
    np.concatenate([np.zeros((1, EMB), np.float32),
                    _r.normal(size=(N, EMB)).astype(np.float32)])
)
STACKED = {
    k: jnp.asarray(_r.integers(1, N + 1, size=(K, B, S)).astype(np.int32))
    for k in ["history_item_idx", "pos_item_idx", "neg_item_idx"]
}


def bench_scan(label):
    state = TS.init_train_state(CFG, PARAMS)
    scan = SS.make_scanned_train_steps(CFG, with_logs=True)
    # the axon tunnel memoizes identical (program, args) dispatches — a
    # unique key per rep keeps every dispatch real
    keys = [jax.random.key(100 + i) for i in range(REPS)]
    out = scan(state, TABLE, STACKED, jax.random.key(1))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(REPS):
        out = scan(state, TABLE, STACKED, keys[i])
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / REPS / K * 1e3
    loss0 = float(out[1][f"loss/{CFG.train_loss}"][0])
    print(f"{label:46s} {ms:7.3f} ms/step   (loss0={loss0:.1f})", flush=True)
    return ms


def main():
    base = bench_scan("baseline (full step)")

    # fused layer -> identity (keeps embedding/lookup/loss/opt)
    from transformer_recommenders_tpu.ops import fused_layer as FL

    orig_fl = FL.fused_layer
    FL.fused_layer = lambda x, *a, **k: x
    no_layers = bench_scan("all 4 fused layers knocked out")
    FL.fused_layer = orig_fl

    orig_attn = T._attention
    T._attention = lambda x, p, cfg, mask, rng=None: x
    no_attn = bench_scan("attention knocked out")
    T._attention = orig_attn

    orig_ffn = T._ffn
    T._ffn = lambda x, p, cfg: x
    no_ffn = bench_scan("ffn knocked out")
    T._ffn = orig_ffn

    orig_loss = FT.fused_table_infonce_loss
    FT.fused_table_infonce_loss = (
        lambda q, t, *a, **k: jnp.sum(q.astype(jnp.float32) ** 2)
        + 0.0 * jnp.sum(t.astype(jnp.float32))
    )
    no_loss = bench_scan("loss kernel knocked out")
    FT.fused_table_infonce_loss = orig_loss

    orig_lookup = R.fast_table_lookup
    R.fast_table_lookup = lambda tab, idx, *, compute_dtype: jnp.broadcast_to(
        tab[1].astype(compute_dtype), (idx.shape[0], tab.shape[1])
    )
    no_lookup = bench_scan("history lookup knocked out")
    R.fast_table_lookup = orig_lookup

    orig_upd = TS.make_flat_update
    TS.make_flat_update = lambda config: lambda p, g, o: (p - 0.0 * g, o, 0.0)
    no_opt = bench_scan("adamw knocked out (sgd-0)")
    TS.make_flat_update = orig_upd

    print()
    for name, v in [
        ("4x fused layers marginal", base - no_layers),
        ("attention marginal", base - no_attn),
        ("ffn marginal", base - no_ffn),
        ("loss kernel marginal", base - no_loss),
        ("history lookup marginal", base - no_lookup),
        ("adamw marginal", base - no_opt),
    ]:
        print(f"{name:46s} {v:7.3f} ms/step")


if __name__ == "__main__":
    main()
