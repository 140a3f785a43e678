"""Where does flat-AdamW time go?  Compare on the real TPU:

(a) the shipped flat apply (ravel grads+params each step, unravel result)
(b) a pure flat-to-flat update (p, g, mu, nu already flat — the byte-bound
    ideal: one elementwise fusion over 7 x 3.4 MB buffers)
(c) per-leaf optax chain (baseline)

Usage: python scripts/tune_adamw.py
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
from transformer_recommenders_tpu.models.transformer import (  # noqa: E402
    init_transformer_params,
)
from transformer_recommenders_tpu.training.train_state import (  # noqa: E402
    make_flat_adamw,
    make_optimizer,
)

REPS = 200


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:40s} {dt:7.3f} ms", flush=True)
    return dt


def main():
    cfg = _flagship_config()
    params = init_transformer_params(jax.random.key(0), cfg)
    grads = jax.tree.map(lambda x: x * 1e-3, params)
    n = ravel_pytree(params)[0].size
    print(f"params: {n} ({n * 4 / 1e6:.1f} MB f32)")

    # (a) shipped flat apply
    _, apply = make_flat_adamw(cfg)
    from transformer_recommenders_tpu.training.train_state import FlatAdamWState

    flat0 = ravel_pytree(params)[0]
    st = FlatAdamWState(jnp.zeros((), jnp.int32), jnp.zeros_like(flat0),
                        jnp.zeros_like(flat0))
    timeit("(a) flat apply (ravel/unravel inside)", jax.jit(apply), grads, st, params)

    # (b) pure flat-to-flat
    lr, wd, b1, b2, eps = cfg.learning_rate, cfg.weight_decay, 0.9, 0.999, 1e-8

    @jax.jit
    def pure_flat(p, g, mu, nu, count):
        gnorm = jnp.sqrt(jnp.sum(g * g))
        count = count + 1
        mu = b1 * mu + (1 - b1) * g
        nu = b2 * nu + (1 - b2) * (g * g)
        cf = count.astype(mu.dtype)
        mu_hat = mu / (1 - b1**cf)
        nu_hat = nu / (1 - b2**cf)
        new_p = p - lr * (mu_hat / (jnp.sqrt(nu_hat) + eps) + wd * p)
        return new_p, mu, nu, count, gnorm

    g_flat = ravel_pytree(grads)[0]
    timeit("(b) pure flat-to-flat", pure_flat, flat0, g_flat,
           jnp.zeros_like(flat0), jnp.zeros_like(flat0),
           jnp.zeros((), jnp.int32))

    # (c) per-leaf optax
    opt = make_optimizer(cfg)
    ostate = opt.init(params)

    @jax.jit
    def leafy(g, o, p):
        u, o = opt.update(g, o, p)
        import optax

        return optax.apply_updates(p, u), o

    timeit("(c) per-leaf optax chain", leafy, grads, ostate, params)

    # (d) ravel alone (the concat copies)
    @jax.jit
    def ravel_only(g):
        return ravel_pytree(g)[0]

    timeit("(d) ravel_pytree(grads) alone", ravel_only, grads)

    # (e) unravel alone (the split/reshape copies)
    unravel = ravel_pytree(params)[1]
    timeit("(e) unravel(flat) alone", jax.jit(unravel), flat0)


if __name__ == "__main__":
    main()
