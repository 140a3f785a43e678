"""Measure the chip's achievable VPU element-ops/ms (VERDICT round-2 item #2).

Times ``ops.vpu_calibration.vpu_chain`` at two chain lengths per op mix; the
slope between them cancels fixed dispatch/load/store cost and yields the
marginal per-element-op throughput.  Writes VPU_CALIBRATION.json and prints
a markdown row per mix for BASELINE.md's roofline table.

Benchmark hygiene for the axon tunnel (memory: axon-dispatch-memoization):
fresh input buffer every rep, first timed calls discarded, output consumed.

Usage: python scripts/calibrate_vpu.py [--interpret]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from transformer_recommenders_tpu.ops.vpu_calibration import (  # noqa: E402
    OPS_PER_ITER,
    vpu_chain,
)

INTERPRET = "--interpret" in sys.argv
SHAPE = (1024, 512)  # 2 MB f32, VMEM-resident
# wide K spread: the slope must be several ms so the ~31 ms tunnel
# round-trip (cancelled by differencing) and its jitter don't swamp it.
# K_LO must sit in the linear regime: at K=2048 the loop fully unrolls
# (<=256 trips) and the compiler collapsed the OLD |x*a-b| fma chain
# algebraically (0.02 ms with correct outputs — the abs was
# value-invisible on the positive domain; round-3 advisor finding).
# The fma body is now a genuinely non-affine min-clamp AND main() gates
# every published slope on a physical-plausibility ceiling, so a future
# compiler re-fold fails loudly instead of corrupting the roofline.
K_LO, K_HI = 4096, 16384
REPS = 10
DISCARD = 3


CALLS = 20


def time_chain(mix: str, iters: int) -> float:
    """Median seconds/call over pipelined windows of CALLS chained calls.

    Two axon-tunnel hazards defeated here (first capture of this script
    fell to both): (a) ``jnp.asarray`` is async and the 2 MB upload costs
    ~80 ms, so inputs are block_until_ready'd before any timing; (b) a
    single synchronous dispatch carries a ~31 ms round-trip and per-call
    medians of small kernels time the tunnel, not the VPU — instead each
    window dispatches CALLS calls back-to-back feeding output into input
    (device-side serial, host-side pipelined, and never memoizable) and
    blocks once, so the round-trip amortizes to ~1.5 ms/call and the
    K_HI-K_LO slope cancels even that."""
    rng = np.random.default_rng(iters)
    # a DISTINCT start input per window: the axon runtime memoizes
    # (program, args) results, so a window replaying an already-seen chain
    # returns from cache (the source of the 0.01 ms fma readings)
    starts = [
        jnp.asarray(rng.random(SHAPE, np.float32) + 0.5).block_until_ready()
        for _ in range(REPS + DISCARD)
    ]
    warm = vpu_chain(starts[0], iters=iters, mix=mix, interpret=INTERPRET)
    float(jax.device_get(warm.ravel()[0]))
    times = []
    for r in range(REPS + DISCARD):
        x = starts[r]
        t0 = time.perf_counter()
        for _ in range(CALLS):
            x = vpu_chain(x, iters=iters, mix=mix, interpret=INTERPRET)
        # VALUE-gate every window: block_until_ready can return before
        # execution over the tunnel for some programs (BASELINE.md hygiene
        # lesson #4) — this script's original block_until_ready windows
        # produced the 0.03-ms "K_LO folds" the round-4 per-point gate
        # caught; only a scalar download provably waits
        float(jax.device_get(x.ravel()[0]))
        dt = (time.perf_counter() - t0) / CALLS
        if r >= DISCARD:
            times.append(dt)
    return float(np.median(times))


def main() -> None:
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    elems = SHAPE[0] * SHAPE[1]
    results = {}
    for mix, ops in OPS_PER_ITER.items():
        t_lo = time_chain(mix, K_LO)
        t_hi = time_chain(mix, K_HI)
        marginal_ops = elems * (K_HI - K_LO) * ops
        eops_per_ms = marginal_ops / ((t_hi - t_lo) * 1e3)
        # plausibility gate (round-3 advisor finding, hardened round 4):
        # v5e's VPU peak is ~3.9 G lane-ops/ms (4x (8,128) VPUs @
        # ~0.94 GHz).  Gate EVERY timed point, not just the slope — the
        # min-clamp fma variant folded at K_LO only (0.04 ms for a
        # 6.4 G-op chain = 161 G/ms) while its slope accidentally looked
        # plausible; a single folded endpoint silently biases the fit.
        ceiling = 6.0e9  # ~1.5x theoretical peak, in elemops/ms
        for label, t, k in (("K_LO", t_lo, K_LO), ("K_HI", t_hi, K_HI)):
            implied = elems * k * ops / (t * 1e3)
            if implied > ceiling:
                msg = (
                    f"VPU calibration mix={mix}: the {label} point implies "
                    f"{implied / 1e9:.1f} G elemops/ms (> physical ceiling) "
                    f"— the chain folded at {label}. Refusing to publish."
                )
                raise SystemExit(msg)
        if not (0.0 < eops_per_ms < ceiling):
            msg = (
                f"VPU calibration for mix={mix} is implausible "
                f"({eops_per_ms / 1e9:.2f} G elemops/ms; t_lo={t_lo*1e3:.3f} ms, "
                f"t_hi={t_hi*1e3:.3f} ms): the chain likely folded. "
                "Refusing to publish VPU_CALIBRATION.json."
            )
            raise SystemExit(msg)
        results[mix] = {
            "t_lo_ms": t_lo * 1e3,
            "t_hi_ms": t_hi * 1e3,
            "k_lo": K_LO,
            "k_hi": K_HI,
            "ops_per_iter": ops,
            "elemops_per_ms": eops_per_ms,
        }
        print(
            f"| VPU {mix} | {t_lo*1e3:.3f} ms @K={K_LO} | {t_hi*1e3:.3f} ms "
            f"@K={K_HI} | {eops_per_ms/1e9:.2f} G elemops/ms |"
        )
    out = {
        "shape": SHAPE,
        "backend": jax.default_backend(),
        "results": results,
    }
    pathlib.Path("VPU_CALIBRATION.json").write_text(json.dumps(out, indent=2))
    print("wrote VPU_CALIBRATION.json")


if __name__ == "__main__":
    main()
