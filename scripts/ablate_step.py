"""Wall-clock attribution of the flagship train step: time each piece
(encoder fwd+bwd, gathers, fused loss fwd+bwd, AdamW) as separate jits and
compare their sum against the full step — the difference is XLA
serialization/staging that no kernel shows up for in the trace.

CAVEATS (round 2): isolated micro-timings over the axon tunnel proved
unreliable (dispatch memoization + the first-program anomaly, see
BASELINE.md); prefer scripts/ablate_marginal.py (in-context knockouts) and
scripts/trace_ops.py (per-op xplane times).  This script also predates the
table-scored loss — its "fused InfoNCE" row times the pool kernel the
flagship step no longer runs.

Usage: python scripts/ablate_step.py
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from __graft_entry__ import _flagship_config  # noqa: E402
from transformer_recommenders_tpu.models.transformer import (  # noqa: E402
    init_transformer_params, transformer_encode, _dense,
)
from transformer_recommenders_tpu.models.recommender import compute_embeds  # noqa: E402
from transformer_recommenders_tpu.ops import losses as loss_lib  # noqa: E402
from transformer_recommenders_tpu.ops.fused_infonce import fused_infonce_loss  # noqa: E402
from transformer_recommenders_tpu.models.recommender import fast_table_lookup  # noqa: E402
from transformer_recommenders_tpu.training.train_state import init_train_state  # noqa: E402

B, S, N, EMB = 256, 32, 4096, 384
REPS = 100


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:34s} {dt:7.3f} ms", flush=True)
    return dt


def main():
    cfg = _flagship_config()
    params = init_transformer_params(jax.random.key(0), cfg)
    state = init_train_state(cfg, params)
    r = np.random.default_rng(0)
    table = jnp.asarray(
        np.concatenate([np.zeros((1, EMB), np.float32),
                        r.normal(size=(N, EMB)).astype(np.float32)])
    )
    hist = jnp.asarray(r.integers(1, N + 1, size=(B, S)).astype(np.int32))
    pos = jnp.asarray(r.integers(1, N + 1, size=(B, S)).astype(np.int32))
    neg = jnp.asarray(r.integers(1, N + 1, size=(B, S)).astype(np.int32))
    key = jax.random.key(0)
    d = cfg.hidden_size
    rows = B * S

    # pre-projected table (what the step computes once per step)
    @jax.jit
    def project(params, table):
        t = _dense(table, params["input_proj"], jnp.dtype(cfg.compute_dtype))
        return t.at[0].set(0.0)

    ptable = project(params, table)
    qf = jnp.asarray(r.normal(size=(rows, d)).astype(np.float32))
    pf = jnp.asarray(r.normal(size=(rows, d)).astype(np.float32))
    nf = jnp.asarray(r.normal(size=(rows, d)).astype(np.float32))
    rv = jnp.ones((rows,), jnp.float32)
    nv = jnp.ones((rows,), jnp.float32)

    t_proj = timeit("table projection", project, params, table)

    # gathers: 3*B*S fused lookup + grad (scatter) wrt table
    @jax.jit
    def gathers(ptable, hist, pos, neg):
        def f(t):
            all_idx = jnp.concatenate(
                [hist.reshape(-1), pos.reshape(-1), neg.reshape(-1)]
            )
            rows_ = fast_table_lookup(t, all_idx, compute_dtype=cfg.compute_dtype)
            return jnp.sum(rows_.astype(jnp.float32) ** 2)

        return jax.grad(f)(ptable)

    t_gather = timeit("3-way gather fwd+bwd(scatter)", gathers, ptable, hist, pos, neg)

    # encoder fwd+bwd on pre-looked-up embeds
    hemb = fast_table_lookup(ptable, hist.reshape(-1), compute_dtype=cfg.compute_dtype)
    hemb = hemb.reshape(B, S, d)

    @jax.jit
    def encoder(params, hemb, key):
        def f(p):
            out = transformer_encode(
                p, cfg, hemb, dropout_rng=key, inputs_projected=True
            )
            return jnp.sum(out["token_embeddings"].astype(jnp.float32) ** 2)

        return jax.grad(f)(params)

    t_enc = timeit("encoder fwd+bwd", encoder, params, hemb, key)

    # fused loss fwd+bwd on fixed rows
    @jax.jit
    def loss_only(q, p, n):
        def f(args):
            q_, p_, n_ = args
            return fused_infonce_loss(q_, p_, n_, rv, nv, scale=cfg_scale)

        return jax.grad(f)((q, p, n))

    from transformer_recommenders_tpu.configs import LossConfig
    cfg_scale = LossConfig().scale
    t_loss = timeit("fused InfoNCE fwd+bwd", loss_only, qf, pf, nf)

    # optimizer: per-leaf optax chain vs the fused flat-buffer form
    import optax
    from transformer_recommenders_tpu.training.train_state import (
        TrainState, make_optimizer, make_flat_adamw,
    )

    opt = make_optimizer(cfg)
    opt_state_leafy = opt.init(params)

    @jax.jit
    def opt_step(state):
        grads = jax.tree.map(jnp.ones_like, state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1)

    t_opt = timeit(
        "AdamW update (per-leaf optax)", opt_step,
        TrainState(params, opt_state_leafy, jnp.zeros((), jnp.int32)),
    )

    flat_init, flat_apply = make_flat_adamw(cfg)

    @jax.jit
    def opt_step_flat(state):
        grads = jax.tree.map(jnp.ones_like, state.params)
        p, os_, _ = flat_apply(grads, state.opt_state, state.params)
        return TrainState(p, os_, state.step + 1)

    t_opt_flat = timeit(
        "AdamW update (fused flat)", opt_step_flat,
        TrainState(params, flat_init(params), jnp.zeros((), jnp.int32)),
    )

    # full step via compute_embeds + loss + grads + update (flat AdamW,
    # what make_train_step now builds)
    @jax.jit
    def full(state, table, hist, pos, neg, key):
        def f(p):
            out = compute_embeds(p, cfg, table, hist, pos, neg, dropout_rng=key)
            return fused_infonce_loss(
                out["query"], out["pos_embed"], out["neg_pool"],
                out["row_valid"], out["neg_valid"], scale=cfg_scale,
            )

        grads = jax.grad(f)(state.params)
        p, os_, _ = flat_apply(grads, state.opt_state, state.params)
        return TrainState(p, os_, state.step + 1)

    t_full = timeit("FULL unscanned step (flat)", full, state, table, hist, pos, neg, key)

    # scanned step (what bench.py measures): amortizes dispatch
    from transformer_recommenders_tpu.training.scan_steps import (
        make_scanned_train_steps,
    )

    steps_fn = make_scanned_train_steps(cfg)
    k_steps = 16
    stacked = {
        "history_item_idx": jnp.tile(hist[None], (k_steps, 1, 1)),
        "pos_item_idx": jnp.tile(pos[None], (k_steps, 1, 1)),
        "neg_item_idx": jnp.tile(neg[None], (k_steps, 1, 1)),
    }

    def scanned(state):
        new_state, _ = steps_fn(state, table, stacked, key)
        return new_state

    t_scan = timeit("scanned 16 steps (total)", scanned, state) / k_steps
    print(f"{'scanned step / step':34s} {t_scan:7.3f} ms")
    parts = t_proj + t_gather + t_enc + t_loss + t_opt_flat
    print(f"{'sum of parts (flat opt)':34s} {parts:7.3f} ms")
    print(f"{'serialization/staging gap':34s} {t_full - parts:7.3f} ms")


if __name__ == "__main__":
    main()
