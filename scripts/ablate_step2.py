"""Round-2 step attribution for the TABLE-SCORED flagship step.

Times, as separate jits: the full loss fwd+bwd (projection + history
lookup + encoder + table-scored kernel), its pieces, and the flat update —
then the real scanned step for comparison.  The residual between the sum
of parts and the scanned step is cross-step pipelining/staging.

Usage: python scripts/ablate_step2.py
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
from jax.flatten_util import ravel_pytree  # noqa: E402

from __graft_entry__ import _flagship_config  # noqa: E402
from transformer_recommenders_tpu.models.recommender import (  # noqa: E402
    compute_query_embeds,
    fast_table_lookup,
)
from transformer_recommenders_tpu.models.transformer import (  # noqa: E402
    _dense,
    init_transformer_params,
    transformer_encode,
)
from transformer_recommenders_tpu.ops.fused_table_infonce import (  # noqa: E402
    fused_table_infonce_loss,
    neg_pool_counts,
)
from transformer_recommenders_tpu.training.train_state import (  # noqa: E402
    _table_objective,
    init_train_state,
    make_flat_update,
)

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
    print(f"{name:44s} {dt:7.3f} ms", flush=True)
    return dt


def main():
    cfg = _flagship_config()
    params = init_transformer_params(jax.random.key(0), cfg)
    r = np.random.default_rng(0)
    table = jnp.asarray(
        np.concatenate([np.zeros((1, EMB), np.float32),
                        r.normal(size=(N, EMB)).astype(np.float32)])
    )
    batch = {
        k: jnp.asarray(r.integers(1, N + 1, size=(B, S)).astype(np.int32))
        for k in ["history_item_idx", "pos_item_idx", "neg_item_idx"]
    }
    key = jax.random.key(0)
    d = cfg.hidden_size

    # full loss fwd+bwd (the serial core of the step)
    @jax.jit
    def loss_grad(params, table, batch, key):
        def f(p):
            qe = compute_query_embeds(
                p, cfg, table, batch["history_item_idx"],
                batch["pos_item_idx"], batch["neg_item_idx"], dropout_rng=key,
            )
            return _table_objective(cfg, qe)

        return jax.grad(f)(params)

    t_loss_grad = timeit("FULL loss fwd+bwd (proj+lookup+enc+kernel)",
                         loss_grad, params, table, batch, key)

    # encoder-only fwd+bwd on fixed embeds
    ptable = _dense(table, params["input_proj"], jnp.dtype(cfg.compute_dtype))
    hemb = fast_table_lookup(
        ptable, batch["history_item_idx"].reshape(-1),
        compute_dtype=cfg.compute_dtype,
    ).reshape(B, S, d)

    @jax.jit
    def enc_grad(params, hemb, key):
        def f(p):
            out = transformer_encode(p, cfg, hemb, dropout_rng=key,
                                     inputs_projected=True)
            return jnp.sum(out["token_embeddings"].astype(jnp.float32) ** 2)

        return jax.grad(f)(params)

    t_enc = timeit("encoder fwd+bwd (fixed embeds)", enc_grad, params, hemb, key)

    # table-scored kernel fwd+bwd on fixed queries
    q = jnp.asarray(r.normal(size=(B * S, d)).astype(np.float32))
    pt_q = ptable.astype(jnp.float32)
    pos = batch["pos_item_idx"].reshape(-1)
    neg = batch["neg_item_idx"].reshape(-1)
    rv = jnp.ones((B * S,), jnp.float32)

    @jax.jit
    def kern_grad(q, pt):
        def f(args):
            q_, t_ = args
            return fused_table_infonce_loss(
                q_, t_, pos, neg, rv, rv, scale=cfg.scale,
                mask_false_negatives=cfg.mask_false_negatives,
            )

        return jax.grad(f)((q, pt))

    t_kern = timeit("table-scored kernel fwd+bwd (fixed q)", kern_grad, q, pt_q)

    # flat update
    flat, _ = ravel_pytree(params)
    g = flat * 1e-3
    state = init_train_state(cfg, params)
    upd = make_flat_update(cfg)
    t_upd = timeit("flat AdamW update", jax.jit(upd), flat, g, state.opt_state)

    # real scanned step
    from transformer_recommenders_tpu.training.scan_steps import (
        make_scanned_train_steps,
    )

    K = 16
    stacked = {k: jnp.broadcast_to(v, (K,) + v.shape) for k, v in batch.items()}
    scan = make_scanned_train_steps(cfg, with_logs=True)
    state = init_train_state(cfg, params)

    def run_scan(state):
        s, logs = scan(state, table, stacked, jax.random.key(1))
        return logs

    t_scan = timeit("scanned step x16 (total)", run_scan, state)
    print(f"{'scanned per step':44s} {t_scan / K:7.3f} ms")
    print(f"{'loss_grad + update':44s} {t_loss_grad + t_upd:7.3f} ms")


if __name__ == "__main__":
    main()
