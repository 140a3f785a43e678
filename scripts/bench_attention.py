"""Fused-tall-layer vs XLA encoder bench at BASELINE.json config #4 shape.

seq 128, d=256, 6 layers — the config where attention is the
quadratic-largest op.  Times a full encoder forward+backward (the training
direction): the XLA layer stack (``use_fused_layer=False``, attention_impl
auto->split) vs the megafusion kernel's per-head TALL layout
(``use_fused_layer=True``, round 3 — the round-2 wide layout lost here and
the standalone Pallas attention kernel lost to XLA at every shape and was
retired; see BASELINE.md attention table).

Benchmark hygiene (memory: axon-dispatch-memoization): fresh input per rep,
first timed calls discarded, per-call block_until_ready medians.

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


def bench(cfg: ModelConfig, shape, mask, *, dropout: bool, reps=30) -> float:
    rng = jax.random.key(0) if dropout else None
    gen = np.random.default_rng(1)

    def loss(params, x):
        out = T.transformer_encode(params, cfg, x, mask, dropout_rng=rng)
        return jnp.sum(out["sentence_embedding"] ** 2)

    params = T.init_transformer_params(jax.random.key(1), cfg)
    step = jax.jit(jax.grad(loss))

    def fresh():
        return jnp.asarray(gen.normal(size=shape).astype(np.float32))

    jax.block_until_ready(step(params, fresh()))  # compile
    times = []
    for i in range(reps + 3):
        x = fresh()
        t0 = time.perf_counter()
        g = step(params, x)
        jax.block_until_ready(g)
        if i >= 3:
            times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1e3


_orig_gate = T._fused_layer_mode


def main() -> None:
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    s, d, h, layers = 128, 256, 8, 6
    print(f"devices: {jax.devices()}  batch={b} seq={s} d={d} layers={layers}")
    mask_np = np.ones((b, s), bool)
    mask_np[:, 100:] = False  # realistic padded tails
    mask = jnp.asarray(mask_np)

    base = dict(
        hidden_size=d, num_hidden_layers=layers, num_attention_heads=h,
        intermediate_size=4 * d, max_seq_length=s, compute_dtype="bfloat16",
    )
    results = {}
    for dropout in (False, True):
        for fused in (False, True):
            if fused:
                # force the TALL fused path past the auto gate (which hands
                # s > 64 to XLA, the measured winner) so the comparison
                # stays reproducible
                T._fused_layer_mode = lambda cfg, s: (
                    "compiled" if jax.default_backend() != "cpu" else None
                )
            else:
                T._fused_layer_mode = _orig_gate
            cfg = ModelConfig(
                **base,
                use_fused_layer=fused,
                hidden_dropout=0.1 if dropout else 0.0,
                attention_dropout=0.1 if dropout else 0.0,
            )
            ms = bench(cfg, (b, s, d), mask, dropout=dropout)
            key = f"{'fused_tall' if fused else 'xla'}_dropout={dropout}"
            results[key] = ms
            print(f"{key}: {ms:.3f} ms/step (fwd+bwd)", flush=True)
    for dropout in (False, True):
        xla = results[f"xla_dropout={dropout}"]
        fz = results[f"fused_tall_dropout={dropout}"]
        print(f"dropout={dropout}: fused-tall speedup {xla / fz:.2f}x")


if __name__ == "__main__":
    main()
