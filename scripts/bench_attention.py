"""Pallas vs XLA attention bench at BASELINE.json config #4 shape.

seq 128, d=256, 6 layers — the config where attention is the
quadratic-largest op (VERDICT round-1 item #4).  Times a full encoder
forward+backward (the training direction) with the XLA attention path vs
the fused Pallas kernel, dropout off and on.

Run on the real TPU: python scripts/bench_attention.py [batch]
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from transformer_recommenders_tpu.configs import ModelConfig  # noqa: E402
from transformer_recommenders_tpu.models import transformer as T  # noqa: E402


def bench(cfg: ModelConfig, x, mask, *, dropout: bool, reps=50) -> float:
    rng = jax.random.key(0) if dropout else None

    def loss(params, x):
        out = T.transformer_encode(params, cfg, x, mask, dropout_rng=rng)
        return jnp.sum(out["sentence_embedding"] ** 2)

    params = T.init_transformer_params(jax.random.key(1), cfg)
    step = jax.jit(jax.grad(loss))
    g = step(params, x)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(reps):
        g = step(params, x)
    jax.block_until_ready(g)
    return (time.perf_counter() - t0) / reps * 1e3


def main() -> None:
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    s, d, h, layers = 128, 256, 8, 6
    print(f"devices: {jax.devices()}  batch={b} seq={s} d={d} layers={layers}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    mask_np = np.ones((b, s), bool)
    mask_np[:, 100:] = False  # realistic padded tails
    mask = jnp.asarray(mask_np)

    base = dict(
        hidden_size=d, num_hidden_layers=layers, num_attention_heads=h,
        intermediate_size=4 * d, max_seq_length=s, compute_dtype="bfloat16",
    )
    results = {}
    for dropout in (False, True):
        for pallas in (False, True):
            cfg = ModelConfig(
                **base,
                use_pallas_attention=pallas,
                hidden_dropout=0.1 if dropout else 0.0,
                attention_dropout=0.1 if dropout else 0.0,
            )
            ms = bench(cfg, x, mask, dropout=dropout)
            key = f"{'pallas' if pallas else 'xla'}_dropout={dropout}"
            results[key] = ms
            print(f"{key}: {ms:.3f} ms/step (fwd+bwd)")
    for dropout in (False, True):
        xla = results[f"xla_dropout={dropout}"]
        pal = results[f"pallas_dropout={dropout}"]
        print(f"dropout={dropout}: pallas speedup {xla / pal:.2f}x")


if __name__ == "__main__":
    main()
