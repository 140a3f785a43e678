"""In-kernel section profile of the megafusion layer (VERDICT round-2 #3).

The fused layer's per-program cost (~7.4 us fwd, ~2.4x bwd at the flagship
shape) is no longer explained by VPU instruction counting alone
(ROADMAP round 2).  This script attributes it by compiling CUMULATIVE
kernel variants — each runs the real ``_layer_fwd_block`` up to stage k and
stores that stage's tensor — and differencing their measured times:

  fwd stages:  qkv dense | +attention | +out/dropout/LN1 | +FFN-in/gelu |
               full layer
  bwd stages:  fwd recompute only | +FFN/LN2 backward | +attention
               backward | full (param grads + dx)

Because every variant is a complete Pallas program over the same block
shapes, scheduling/pipelining effects stay in the measurement (standalone
sub-kernels would lose them).

Benchmark hygiene (memory: axon-dispatch-memoization): fresh input per rep,
first timed calls discarded, output consumed.

Usage: python scripts/profile_fused_sections.py [--shape flagship]
       [--interpret]   (interpret is a correctness smoke, not a timing)
"""

from __future__ import annotations

import argparse
import functools
import json
import math
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
if "--interpret" in sys.argv:  # correctness smoke must not touch the TPU
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

from transformer_recommenders_tpu.configs import ModelConfig  # noqa: E402
from transformer_recommenders_tpu.models import transformer as T  # noqa: E402
from transformer_recommenders_tpu.ops import fused_layer as FL  # noqa: E402

SHAPES = {
    # flagship config #2: 4L d=128 f=512 H=8 S=32 B=256
    "flagship": dict(b=256, s=32, d=128, h=8, f=512),
    # NOTE: config #4 (seq 128) is not profileable here any more — the
    # fused tall layout was retired round 4; seq > 64 runs the XLA stack.
    # interpret-mode smoke (CPU): correctness of the stage plumbing only
    "tiny": dict(b=4, s=8, d=32, h=4, f=64),
}

# kernel runs per dispatch (lax.scan chain); interpret mode is a
# correctness smoke and keeps the chain short
INNER_ITERS = 2 if "--interpret" in sys.argv else 50

FWD_STAGES = ["qkv", "attn", "out_ln1", "ffn_gelu", "full"]
BWD_STAGES = ["recompute", "ffn_bwd", "attn_bwd", "full"]


def _stage_fwd_kernel(x_ref, mask_ref, seed_ref, *rest, stage, num_heads, s,
                      d, causal, attn_rate, hidden_rate, eps, dtype):
    """Cumulative forward: run _layer_fwd_block's math up to ``stage``."""
    *param_refs, out_ref = rest
    params = {n: r[:] for n, r in zip(FL._PARAM_NAMES, param_refs)}
    seeds = [seed_ref[i] for i in range(3)]
    bt = x_ref.shape[0]
    rows = bt * s
    base_elem = pl.program_id(0) * bt
    xf = x_ref[:].reshape(rows, d)
    qkv = FL._matmul(xf, params["qkv_w"], params["qkv_b"], dtype)
    if stage == "qkv":
        out_ref[:] = qkv[:, :d].reshape(bt, s, d).astype(out_ref.dtype)
        return
    scale = 1.0 / math.sqrt(d // num_heads)
    hmask = FL._hmask(num_heads, s, d, dtype)
    g = FL._pack_group(s, bt)
    ctx_all = []
    if g > 1:  # lane-packed wide path (mirrors _layer_fwd_block)
        for grp in range(bt // g):
            rs = slice(grp * g * s, (grp + 1) * g * s)
            biases = [
                FL._bias(mask_ref[grp * g + j : grp * g + j + 1], s, causal)
                for j in range(g)
            ]
            ctx_g, _ = FL._attention_wide_packed(
                qkv[rs], biases, hmask, base_elem + grp * g, seeds[0],
                num_heads=num_heads, s=s, d=d, g=g, scale=scale,
                rate=attn_rate, dtype=dtype, want_residuals=False,
            )
            ctx_all.append(ctx_g)
    else:
        for b in range(bt):
            rs = slice(b * s, (b + 1) * s)
            q, k, v = qkv[rs, :d], qkv[rs, d : 2 * d], qkv[rs, 2 * d :]
            bias = FL._bias(mask_ref[b : b + 1], s, causal)
            ctx, *_ = FL._attention_wide(
                q, k, v, bias, hmask, base_elem + b, seeds[0],
                num_heads=num_heads, s=s, scale=scale, rate=attn_rate,
                dtype=dtype,
            )
            ctx_all.append(ctx)
    ctx = jnp.concatenate(ctx_all, axis=0)
    if stage == "attn":
        out_ref[:] = ctx.reshape(bt, s, d).astype(out_ref.dtype)
        return
    a = FL._matmul(ctx, params["out_w"], params["out_b"], dtype)
    base_row = base_elem * s
    if hidden_rate > 0.0:
        keep2 = FL._keep(seeds[1], FL._hidden_idx(base_row, rows, d), hidden_rate)
        a = jnp.where(keep2, a / (1.0 - hidden_rate), 0.0).astype(dtype)
    h1 = (xf + a).astype(jnp.float32)
    x1f, n1, rstd1 = FL._ln_fwd(h1, params["ln1_s"], params["ln1_b"], eps)
    x1 = x1f.astype(dtype)
    if stage == "out_ln1":
        out_ref[:] = x1.reshape(bt, s, d).astype(out_ref.dtype)
        return
    u = FL._matmul(x1, params["ffn_in_w"], params["ffn_in_b"], dtype)
    u32 = u.astype(jnp.float32)
    erf_u = FL._erf(u32 * FL._INV_SQRT2)
    g = FL._gelu(u32, erf_u).astype(dtype)
    if stage == "ffn_gelu":
        out_ref[:] = g[:, :d].reshape(bt, s, d).astype(out_ref.dtype)
        return
    f_out = FL._matmul(g, params["ffn_out_w"], params["ffn_out_b"], dtype)
    if hidden_rate > 0.0:
        keep3 = FL._keep(seeds[2], FL._hidden_idx(base_row, rows, d), hidden_rate)
        f_out = jnp.where(keep3, f_out / (1.0 - hidden_rate), 0.0).astype(dtype)
    h2 = (x1 + f_out).astype(jnp.float32)
    yf, n2, rstd2 = FL._ln_fwd(h2, params["ln2_s"], params["ln2_b"], eps)
    out_ref[:] = yf.astype(dtype).reshape(bt, s, d).astype(out_ref.dtype)


def _stage_bwd_kernel(x_ref, mask_ref, seed_ref, g_ref, *refs, stage,
                      num_heads, s, d, causal, attn_rate, hidden_rate, eps,
                      dtype):
    """Cumulative backward: recompute fwd (always), then walk the VJP back
    through ``stage``.  Mirrors ops/fused_layer._bwd_kernel exactly; the
    early stages store partial cotangents into dx_ref so Mosaic cannot DCE
    them."""
    param_refs = refs[: len(FL._PARAM_NAMES)]
    dx_ref = refs[len(FL._PARAM_NAMES)]
    bt = x_ref.shape[0]
    rows = bt * s
    params = {n: r[:] for n, r in zip(FL._PARAM_NAMES, param_refs)}
    seeds = [seed_ref[i_] for i_ in range(3)]
    base_elem = pl.program_id(0) * bt
    y, res = FL._layer_fwd_block(
        x_ref[:].reshape(bt, s, d), mask_ref, params, seeds, base_elem,
        num_heads=num_heads, s=s, d=d, causal=causal, attn_rate=attn_rate,
        hidden_rate=hidden_rate, eps=eps, dtype=dtype, want_residuals=True,
    )
    if stage == "recompute":
        dx_ref[:] = y.reshape(bt, s, d).astype(dx_ref.dtype)
        return
    dy = g_ref[:].reshape(rows, d).astype(jnp.float32)
    dh2 = FL._ln_bwd(dy, res["n2"], res["rstd2"], params["ln2_s"])
    df = dh2
    if res["keep3"] is not None:
        df = jnp.where(res["keep3"], df / (1.0 - hidden_rate), 0.0)
    dfm = df.astype(dtype)
    dg = jnp.dot(dfm, params["ffn_out_w"].astype(dtype).T,
                 preferred_element_type=jnp.float32)
    du = dg * FL._gelu_grad(res["u"].astype(jnp.float32), res["erf_u"])
    dum = du.astype(dtype)
    dx1 = dh2 + jnp.dot(dum, params["ffn_in_w"].astype(dtype).T,
                        preferred_element_type=jnp.float32)
    dh1 = FL._ln_bwd(dx1, res["n1"], res["rstd1"], params["ln1_s"])
    da = dh1
    if res["keep2"] is not None:
        da = jnp.where(res["keep2"], da / (1.0 - hidden_rate), 0.0)
    dam = da.astype(dtype)
    dctx = jnp.dot(dam, params["out_w"].astype(dtype).T,
                   preferred_element_type=jnp.float32)
    if stage == "ffn_bwd":
        dx_ref[:] = dctx.reshape(bt, s, d).astype(dx_ref.dtype)
        return
    scale = 1.0 / math.sqrt(d // num_heads)
    dqkv = []
    if FL._pack_group(s, bt) > 1:  # lane-packed residuals (per group)
        g = FL._pack_group(s, bt)
        hmask_f = FL._hmask(num_heads, s, d, dtype).astype(jnp.float32)
        for grp in range(bt // g):
            dqkv.append(FL._attention_wide_packed_bwd(
                dctx[grp * g * s : (grp + 1) * g * s], res["attn"][grp],
                hmask_f, base_elem + grp * g, seeds[0],
                num_heads=num_heads, s=s, d=d, g=g, scale=scale,
                rate=attn_rate, dtype=dtype,
            ))
    else:
        hmask = FL._hmask(num_heads, s, d, dtype)
        hmask_f = hmask.astype(jnp.float32)
        for b in range(bt):
            probs, dropped, qw, k, v, bias = res["attn"][b]
            gctx = dctx[b * s : (b + 1) * s]
            gw = (FL._wide(gctx, num_heads) * hmask_f).astype(dtype)
            dv = jnp.dot(dropped.T.astype(dtype), gw,
                         preferred_element_type=jnp.float32)
            d_dropped = jnp.dot(gw, v.T, preferred_element_type=jnp.float32)
            if attn_rate > 0.0:
                d_probs = jnp.where(
                    dropped != 0.0, d_dropped / (1.0 - attn_rate), 0.0
                )
            else:
                d_probs = d_dropped
            d_scores = probs * (
                d_probs - jnp.sum(d_probs * probs, axis=-1, keepdims=True)
            )
            d_scores = (d_scores * scale).astype(dtype)
            dq_w = jnp.dot(d_scores, k, preferred_element_type=jnp.float32)
            dq = FL._combine(dq_w, hmask_f, s, num_heads)
            dk = jnp.dot(d_scores.T, qw, preferred_element_type=jnp.float32)
            dqkv.append(jnp.concatenate([dq, dk, dv], axis=1))
    dqkv = jnp.concatenate(dqkv, axis=0)
    dx0 = dh1 + jnp.dot(dqkv.astype(dtype), params["qkv_w"].astype(dtype).T,
                        preferred_element_type=jnp.float32)
    if stage == "attn_bwd":
        dx_ref[:] = dx0.reshape(bt, s, d).astype(dx_ref.dtype)
        return
    # full: also the param-grad matmuls (sums folded into dx so the single
    # output keeps them live; the real kernel writes 12 dparam blocks — the
    # store cost difference is ~0)
    xfm = res["xf"].astype(dtype)
    extra = jnp.dot(xfm.T, dqkv.astype(dtype), preferred_element_type=jnp.float32)
    g_m = res["g"].astype(dtype)
    dfm2 = df.astype(dtype)
    pw = jnp.dot(g_m.T, dfm2, preferred_element_type=jnp.float32)
    x1m = res["x1"].astype(dtype)
    piw = jnp.dot(x1m.T, dum, preferred_element_type=jnp.float32)
    ctxm = res["ctx"].astype(dtype)
    pow_ = jnp.dot(ctxm.T, dam, preferred_element_type=jnp.float32)
    live = (jnp.sum(extra) + jnp.sum(pw) + jnp.sum(piw) + jnp.sum(pow_)
            + jnp.sum(dy * res["n2"]) + jnp.sum(dx1 * res["n1"]))
    dx_ref[:] = (dx0 + live * 1e-30).reshape(bt, s, d).astype(dx_ref.dtype)


def _build(shape, stage, direction, interpret):
    cfg = dict(
        num_heads=shape["h"], s=shape["s"], d=shape["d"], causal=True,
        attn_rate=0.1, hidden_rate=0.1, eps=1e-12, dtype=jnp.bfloat16,
    )
    b, s, d = shape["b"], shape["s"], shape["d"]
    bt = FL._pick_block_batch(b, s, d, shape["f"], shape["h"])
    x_spec, mask_spec, seed_spec, const = FL._specs(bt, s, d)

    def call_once(x, mask, seeds, flat_params, g=None):
        with FL._maybe_interpret(interpret):
            if direction == "fwd":
                kern = functools.partial(_stage_fwd_kernel, stage=stage, **cfg)
                return pl.pallas_call(
                    kern, grid=(b // bt,),
                    in_specs=[x_spec, mask_spec, seed_spec]
                    + [const] * len(flat_params),
                    out_specs=x_spec,
                    out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
                )(x, mask, seeds, *flat_params)
            kern = functools.partial(_stage_bwd_kernel, stage=stage, **cfg)
            return pl.pallas_call(
                kern, grid=(b // bt,),
                in_specs=[x_spec, mask_spec, seed_spec, x_spec]
                + [const] * len(flat_params),
                out_specs=x_spec,
                out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
            )(x, mask, seeds, g, *flat_params)

    # chain INNER_ITERS kernel runs inside ONE dispatch via lax.scan:
    # over the tunnel, even pipelined host dispatches floor at ~0.5-1 ms
    # per call, which swamps sub-0.1 ms kernels — a scanned chain makes
    # the per-iteration cost dispatch-free (round-3 fix; the earlier
    # per-call windows measured the dispatch floor, not the kernel)
    def fn(x, mask, seeds, flat_params, g=None):
        def body(carry, _):
            out = call_once(carry, mask, seeds, flat_params, g)
            return out, ()

        y, _ = jax.lax.scan(body, x, None, length=INNER_ITERS)
        return y

    return jax.jit(fn), bt


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--shape", default="flagship", choices=sorted(SHAPES))
    parser.add_argument("--interpret", action="store_true")
    parser.add_argument("--reps", type=int, default=20)
    args = parser.parse_args()
    shape = SHAPES[args.shape]
    b, s, d, h, f = (shape[k] for k in "bsdhf")

    mc = ModelConfig(
        hidden_size=d, num_hidden_layers=1, num_attention_heads=h,
        intermediate_size=f, max_seq_length=s, compute_dtype="bfloat16",
    )
    params = T.init_transformer_params(jax.random.key(0), mc)
    layer = jax.tree.map(lambda a: a[0], params["layers"])
    flat = tuple(
        a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a
        for a in FL._flatten_params(layer)
    )
    rng = np.random.default_rng(0)
    mask = jnp.asarray(np.ones((b, 1, s), np.int32))
    seeds = jnp.asarray([1, 2, 3], jnp.int32)

    def fresh(i):
        return jnp.asarray(
            rng.normal(size=(b, s, d)).astype(np.float32), jnp.bfloat16
        )

    print(f"backend: {jax.default_backend()}  shape: {args.shape} {shape}")
    results = {}
    # timing hygiene (same lessons as scripts/calibrate_vpu.py): inputs are
    # block_until_ready'd BEFORE any window (jnp.asarray transfers lazily —
    # ~80 ms/2 MB over the tunnel), and each window chains CALLS dispatches
    # feeding output into input (same (B,S,D) shape), blocking once — the
    # ~31 ms synchronous round-trip amortizes to ~1.5 ms and the per-call
    # jitter that buried sub-ms stage deltas cancels in the median
    calls = 4  # dispatches per window; each runs INNER_ITERS scanned kernels
    for direction, stages in (("fwd", FWD_STAGES), ("bwd", BWD_STAGES)):
        prev = 0.0
        for stage in stages:
            fn, bt = _build(shape, stage, direction, args.interpret)
            g = fresh(-1).block_until_ready()
            # a DISTINCT start input per window: the axon runtime memoizes
            # (program, args) results, and a window replaying the same
            # chain returns entirely from cache (measured 0.03 ms "layers")
            starts = [
                fresh(i).block_until_ready() for i in range(args.reps + 3)
            ]
            extra = [] if direction == "fwd" else [g]
            warm = fn(starts[0], mask, seeds, flat, *extra)
            float(jax.device_get(warm.ravel()[0]))  # gate: see BASELINE.md
            times = []
            for i in range(args.reps + 3):
                x = starts[i]
                t0 = time.perf_counter()
                for _ in range(calls):
                    x = fn(x, mask, seeds, flat, *extra)
                # block_until_ready can return pre-execution over the
                # tunnel — only a value download provably waits
                float(jax.device_get(x.ravel()[0]))
                if i >= 3:
                    times.append(
                        (time.perf_counter() - t0) / (calls * INNER_ITERS)
                    )
            ms = float(np.median(times)) * 1e3
            key = f"{direction}/{stage}"
            results[key] = {
                "cumulative_ms": round(ms, 4),
                "delta_ms": round(ms - prev, 4),
                "block_batch": bt,
            }
            print(f"{key:16s} cumulative {ms:8.4f} ms   delta {ms - prev:8.4f} ms")
            prev = ms
    pathlib.Path(f"FUSED_SECTIONS_{args.shape}.json").write_text(
        json.dumps({"shape": shape, "results": results}, indent=2)
    )


if __name__ == "__main__":
    main()
