"""Measure fused-layer fwd / fwd+bwd under candidate optimizations
(VERDICT round-3 #2: land one fused-layer backward optimization).

Each variant monkeypatches one section of ``ops/fused_layer`` with a
cheaper (possibly WRONG — timing-only) implementation and times a
50-iteration lax.scan chain of the full layer fwd, and of grad(sum(layer)),
at the flagship shape.  The deltas bound what a real optimization of that
section can win, BEFORE any correctness work is spent.

Benchmark hygiene (BASELINE.md): pre-staged distinct inputs, chained
windows, value-download gating, median over spaced windows.

Usage: python scripts/bench_layer_variants.py [--shape flagship|s48]
(seq-128 shapes: the fused path is retired above s=64, so config4/tall512
only run the 'xla' variant -- fused variants are skipped with a note)
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from transformer_recommenders_tpu.ops import fused_layer as FL  # noqa: E402

SHAPES = {
    "flagship": dict(b=256, s=32, d=128, h=8, f=512),
    "config4": dict(b=128, s=128, d=256, h=8, f=1024),
    # tall-path win candidate (round-3 verdict #5): dh = 128 makes the
    # per-head (S, dh) contractions full MXU tiles
    "tall512": dict(b=64, s=128, d=512, h=4, f=2048),
    # partial lane packing (round-3 verdict #6): S=48 -> g=2, 96/128 lanes
    "s48": dict(b=256, s=48, d=128, h=8, f=512),
}

ITERS = 50  # kernel calls per dispatch (scan chain)
WINDOWS = 5
CALLS = 4  # dispatches per window, output feeding input


def make_params(d: int, f: int, rng) -> dict:
    def w(shape):
        return jnp.asarray(rng.normal(size=shape, scale=0.02).astype(np.float32))

    return {
        "qkv": {"w": w((d, 3 * d)), "b": w((3 * d,))},
        "out": {"w": w((d, d)), "b": w((d,))},
        "ffn_in": {"w": w((d, f)), "b": w((f,))},
        "ffn_out": {"w": w((f, d)), "b": w((d,))},
        "ln1": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "ln2": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
    }


def build_fns(shape, params):
    """(re)trace fwd-chain and fwd+bwd-chain jits against the CURRENT
    contents of the FL module (so monkeypatches are picked up)."""
    h = shape["h"]
    f = shape["f"]
    seeds = jnp.asarray([1, 2, 3], jnp.uint32)

    def layer(x):
        return FL.fused_layer(
            x, params, jnp.ones(x.shape[:2], jnp.int32),
            num_heads=h, causal=True, attn_dropout=0.1, hidden_dropout=0.1,
            dropout_seeds=seeds, ffn_dim=f,
        )

    @jax.jit
    def fwd_chain(x0):
        def step(x, _):
            return layer(x), ()

        y, _ = jax.lax.scan(step, x0, None, length=ITERS)
        return y

    @jax.jit
    def fwdbwd_chain(x0):
        def step(x, _):
            g = jax.grad(lambda xx: jnp.sum(layer(xx).astype(jnp.float32)))(x)
            return g.astype(x.dtype), ()

        y, _ = jax.lax.scan(step, x0, None, length=ITERS)
        return y

    return fwd_chain, fwdbwd_chain


def build_xla_fns(shape, params):
    """The XLA layer-stack equivalent (models/transformer.py functions) —
    the gate's alternative path, same dropout-on math."""
    from transformer_recommenders_tpu.configs import ModelConfig
    from transformer_recommenders_tpu.models import transformer as T

    cfg = ModelConfig(
        hidden_size=shape["d"], num_hidden_layers=1,
        num_attention_heads=shape["h"], intermediate_size=shape["f"],
        max_seq_length=shape["s"], compute_dtype="bfloat16",
        hidden_dropout=0.1, attention_dropout=0.1, is_decoder=True,
        use_fused_layer=False,
    )
    keys = list(jax.random.split(jax.random.key(7), 3))
    dtype = jnp.bfloat16

    def layer(x):
        mask = jnp.ones(x.shape[:2], bool)
        attn = T._attention(x, params, cfg, mask, keys[0])
        attn = T._dropout(attn, cfg.hidden_dropout, keys[1])
        hh = T._layer_norm(x + attn, params["ln1"], cfg.layer_norm_eps, dtype)
        ffn = T._ffn(hh, params, cfg)
        ffn = T._dropout(ffn, cfg.hidden_dropout, keys[2])
        return T._layer_norm(hh + ffn, params["ln2"], cfg.layer_norm_eps, dtype)

    @jax.jit
    def fwd_chain(x0):
        def step(x, _):
            return layer(x), ()

        y, _ = jax.lax.scan(step, x0, None, length=ITERS)
        return y

    @jax.jit
    def fwdbwd_chain(x0):
        def step(x, _):
            g = jax.grad(lambda xx: jnp.sum(layer(xx).astype(jnp.float32)))(x)
            return g.astype(x.dtype), ()

        y, _ = jax.lax.scan(step, x0, None, length=ITERS)
        return y

    return fwd_chain, fwdbwd_chain


def time_chain(fn, starts) -> float:
    """median ms per LAYER CALL over WINDOWS spaced windows."""
    fn(starts[0]).block_until_ready()
    times = []
    for w in range(WINDOWS):
        x = starts[w]
        t0 = time.perf_counter()
        for _ in range(CALLS):
            x = fn(x)
        float(jax.device_get(x.ravel()[0]))  # value gate
        times.append((time.perf_counter() - t0) / (CALLS * ITERS) * 1e3)
        time.sleep(0.2)
    return float(np.median(times))


# ---------------------------------------------------------------------------
# variants (timing-only: some are numerically WRONG on purpose)
# ---------------------------------------------------------------------------


def patch_none():
    return {}


def patch_erf_cheap():
    """erf -> a 3-op fake: bounds what ANY cheaper erf can win."""

    def _erf_fake(x):
        return jnp.clip(x * jnp.float32(1.1283791671), -1.0, 1.0)

    return {"_erf": _erf_fake}


def patch_gelu_grad_noexp():
    """gelu' without the u*phi(u) exp term: bounds the bwd exp cost."""

    def _gg(u, erf_u=None):
        if erf_u is None:
            erf_u = FL._erf(u * FL._INV_SQRT2)
        return 0.5 * (1.0 + erf_u)

    return {"_gelu_grad": _gg}


def patch_attn_bwd_skip():
    """Packed attention VJP -> zeros: bounds the whole attention-bwd
    section (gw build + 5 contractions + combines)."""

    def _zero_bwd(gctx, res, hmask_f, elem_base, seed, *, num_heads, s, d, g,
                  scale, rate, dtype):
        return jnp.zeros((g * s, 3 * d), jnp.float32)

    return {"_attention_wide_packed_bwd": _zero_bwd}


def patch_attn_bwd_nogw():
    """Packed attention VJP without the wide-gw build: dv/d_dropped use a
    REPEATED (wrong but shape/cost-correct) gw substitute built by one
    concat, no per-element _wide+mask.  Bounds the gw-build share."""

    def _nogw_bwd(gctx, res, hmask_f, elem_base, seed, *, num_heads, s, d, g,
                  scale, rate, dtype):
        probs, dropped, qp, kp, vp = res
        gwp = jnp.concatenate(
            [jnp.concatenate([gctx[: s]] * num_heads, axis=0)] * g, axis=1
        ).astype(dtype)  # (H*S, g*D) with NO masking / per-element slices
        dv_full = jax.lax.dot_general(
            dropped.astype(dtype), gwp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_dropped = jax.lax.dot_general(
            gwp, vp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            d_probs = jnp.where(dropped != 0.0, d_dropped / (1.0 - rate), 0.0)
        else:
            d_probs = d_dropped
        blockones = (
            jax.lax.broadcasted_iota(jnp.int32, (g * s, g * s), 0) // s
            == jax.lax.broadcasted_iota(jnp.int32, (g * s, g * s), 1) // s
        ).astype(jnp.float32)
        seg_sum = jax.lax.dot_general(
            d_probs * probs, blockones, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_scores = (probs * (d_probs - seg_sum) * scale).astype(dtype)
        dqw_p = jnp.dot(d_scores, kp, preferred_element_type=jnp.float32)
        dk_full = jax.lax.dot_general(
            d_scores, qp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rows = []
        for j in range(g):
            cs = slice(j * d, (j + 1) * d)
            rs = slice(j * s, (j + 1) * s)
            dq = FL._combine(dqw_p[:, cs], hmask_f, s, num_heads)
            rows.append(
                jnp.concatenate([dq, dk_full[rs, cs], dv_full[rs, cs]], axis=1)
            )
        return jnp.concatenate(rows, axis=0)

    return {"_attention_wide_packed_bwd": _nogw_bwd}


def patch_attn_bwd_nocombine():
    """Packed attention VJP where the g per-element dq combines collapse to
    one combine of the first block: bounds the combine share."""

    real = FL._attention_wide_packed_bwd

    def _nc_bwd(gctx, res, hmask_f, elem_base, seed, *, num_heads, s, d, g,
                scale, rate, dtype):
        probs, dropped, qp, kp, vp = res
        gws = [
            (FL._wide(gctx[j * s : (j + 1) * s], num_heads) * hmask_f).astype(dtype)
            for j in range(g)
        ]
        gwp = jnp.concatenate(gws, axis=1)
        dv_full = jax.lax.dot_general(
            dropped.astype(dtype), gwp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_dropped = jax.lax.dot_general(
            gwp, vp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            d_probs = jnp.where(dropped != 0.0, d_dropped / (1.0 - rate), 0.0)
        else:
            d_probs = d_dropped
        blockones = (
            jax.lax.broadcasted_iota(jnp.int32, (g * s, g * s), 0) // s
            == jax.lax.broadcasted_iota(jnp.int32, (g * s, g * s), 1) // s
        ).astype(jnp.float32)
        seg_sum = jax.lax.dot_general(
            d_probs * probs, blockones, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_scores = (probs * (d_probs - seg_sum) * scale).astype(dtype)
        dqw_p = jnp.dot(d_scores, kp, preferred_element_type=jnp.float32)
        dk_full = jax.lax.dot_general(
            d_scores, qp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq0 = FL._combine(dqw_p[:, :d], hmask_f, s, num_heads)  # ONE combine
        rows = []
        for j in range(g):
            cs = slice(j * d, (j + 1) * d)
            rs = slice(j * s, (j + 1) * s)
            rows.append(
                jnp.concatenate([dq0, dk_full[rs, cs], dv_full[rs, cs]], axis=1)
            )
        return jnp.concatenate(rows, axis=0)

    _ = real
    return {"_attention_wide_packed_bwd": _nc_bwd}


def patch_ln_fwd_passthrough():
    """Both forward LNs -> affine-only (skip mean/var/rsqrt): bounds the
    LN statistics cost in fwd AND the bwd recompute."""

    def _lf(h32, scale, bias, eps):
        n = h32  # wrong on purpose (timing-only)
        return n * scale + bias, n, jnp.ones_like(h32[..., :1])

    return {"_ln_fwd": _lf}


def patch_gelu_identity():
    """gelu -> identity (erf path untouched elsewhere): bounds the whole
    gelu section (erf poly + mul tree) in fwd + recompute."""

    def _g(u, erf_u=None):
        return u

    def _e(x):
        return x

    return {"_gelu": _g, "_erf": _e}


def patch_ln_bwd_skip():
    """LN backward -> passthrough: bounds both _ln_bwd calls."""

    def _lb(dy32, n, rstd, scale):
        return dy32

    return {"_ln_bwd": _lb}


def patch_unpacked():
    """Disable lane packing (g=1, the pre-round-3 wide path) — baseline
    minus this arm = what packing wins at this shape."""
    return {"_pack_group": lambda s, bt: 1}


def patch_exact_recompute_erf():
    """Force the exact Eigen erf in the backward recompute (the pre-round-4
    behavior) — baseline minus this arm = the A&S recompute-erf win."""
    return {"_APPROX_RECOMPUTE_ERF": False}


VARIANTS = {
    "baseline": patch_none,
    "unpacked": patch_unpacked,
    "exact_recompute_erf": patch_exact_recompute_erf,
    "ln_fwd_passthrough": patch_ln_fwd_passthrough,
    "gelu_identity": patch_gelu_identity,
    "erf_cheap": patch_erf_cheap,
    "gelu_grad_noexp": patch_gelu_grad_noexp,
    "attn_bwd_skip": patch_attn_bwd_skip,
    "attn_bwd_nogw": patch_attn_bwd_nogw,
    "attn_bwd_nocombine": patch_attn_bwd_nocombine,
    "ln_bwd_skip": patch_ln_bwd_skip,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="flagship", choices=list(SHAPES))
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()
    shape = SHAPES[args.shape]
    print(f"devices: {jax.devices()}", file=sys.stderr)

    rng = np.random.default_rng(0)
    params = make_params(shape["d"], shape["f"], rng)
    starts = [
        jnp.asarray(
            rng.normal(size=(shape["b"], shape["s"], shape["d"]), scale=0.5)
            .astype(np.float32)
        ).astype(jnp.bfloat16)
        for _ in range(WINDOWS)
    ]
    for x in starts:
        x.block_until_ready()

    fused_ok = shape["s"] <= 64  # fused_layer raises for s > 64 (retired)
    results = {}
    for name in args.variants.split(","):
        if name != "xla" and not fused_ok:
            print(f"{name:22s} skipped: fused path retired for s > 64",
                  file=sys.stderr, flush=True)
            continue
        if name == "xla":
            fwd_chain, fwdbwd_chain = build_xla_fns(shape, params)
            t_fwd = time_chain(fwd_chain, starts)
            t_fb = time_chain(fwdbwd_chain, starts)
            results[name] = {
                "fwd_ms": round(t_fwd, 4),
                "fwdbwd_ms": round(t_fb, 4),
                "bwd_ms": round(t_fb - t_fwd, 4),
            }
            print(f"{name:22s} fwd {t_fwd:.4f} ms  fwd+bwd {t_fb:.4f} ms  "
                  f"bwd {t_fb - t_fwd:.4f} ms", flush=True)
            continue
        patches = VARIANTS[name]()
        saved = {k: getattr(FL, k) for k in patches}
        for k, v in patches.items():
            setattr(FL, k, v)
        try:
            fwd_chain, fwdbwd_chain = build_fns(shape, params)
            t_fwd = time_chain(fwd_chain, starts)
            t_fb = time_chain(fwdbwd_chain, starts)
        finally:
            for k, v in saved.items():
                setattr(FL, k, v)
        results[name] = {
            "fwd_ms": round(t_fwd, 4),
            "fwdbwd_ms": round(t_fb, 4),
            "bwd_ms": round(t_fb - t_fwd, 4),
        }
        print(f"{name:22s} fwd {t_fwd:.4f} ms  fwd+bwd {t_fb:.4f} ms  "
              f"bwd {t_fb - t_fwd:.4f} ms", flush=True)

    base = results.get("baseline")
    if base:
        for name, r in results.items():
            if name == "baseline":
                continue
            print(f"{name:22s} saves fwd {base['fwd_ms'] - r['fwd_ms']:+.4f} "
                  f"bwd {base['bwd_ms'] - r['bwd_ms']:+.4f} ms/layer-call",
                  flush=True)
    out = pathlib.Path(f"LAYER_VARIANTS_{args.shape}.json")
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
