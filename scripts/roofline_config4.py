"""Three-resource roofline for the SCALE config (BASELINE.json #4).

Shapes: ML-25M — 6L d=256 ffn=1024 H=8 seq=128, B=64 (R = B*S = 8192
in-batch rows), 62k-item catalog with a learned 384->256 input projection,
ContrastiveLoss over the shared in-batch pool (fused pairwise kernel on
TPU; the table-scored path is VMEM-gated off at 62k rows —
``train_state._table_loss_enabled``).

This is the config-4 counterpart of ``scripts/roofline.py`` (the flagship
roofline): per-component MXU FLOPs and HBM bytes divided by v5e peaks,
plus the VPU elementwise terms that the flagship analysis showed are the
third binding resource (measured ceilings from VPU_CALIBRATION.json).

It prices BOTH projection designs so the crossover is explicit:

(i)  whole-table pre-projection (what ``compute_embeds`` shipped through
     round 4): project all N+1 catalog rows into hidden space each step,
     then gather 3R hidden-space rows.  Backward must form the dense
     d(projected_table) — a SCATTER of 3R row-grads into (N+1, D) f32 —
     and re-read the f32 table for dW.  Wins when N << 3R (flagship:
     4k << 24.5k).
(ii) gather-then-project: gather 3R raw 384-d rows, project only those.
     The item table is FROZEN (never updated, ``xfmr_rec/trainer.py:352``)
     so backward is just dW = gathered^T @ d_out — no scatter, no second
     table read.  Wins when N >> 3R (config 4: 62k >> 24.5k).

v5e peaks: 197 TFLOP/s bf16 MXU, 819 GB/s HBM; measured VPU ceilings
(VPU_CALIBRATION.json): fma-chain 2.07, exp-chain 2.53, select-chain
1.84 G elemops/ms.
"""

from __future__ import annotations

import json

BF16_TFLOPS = 197e12
HBM_GBS = 819e9
VPU_FMA_G_MS = 2.07e9     # generic elementwise (mul/add tree)
VPU_EXP_G_MS = 2.53e9     # transcendental chains (exp/erf)

# config-4 shapes (scripts/bench_config4.py / configs/ml25m_ccl.yaml)
B, S = 64, 128
R = B * S                   # 8192 rows; shared pool Rn = R
N_ITEMS, EMB = 62_000, 384
D, F, L, H = 256, 1024, 6, 8
DH = D // H

BF16, F32 = 2, 4
NP1 = N_ITEMS + 1


def gflop_ms(flops: float) -> float:
    return flops / BF16_TFLOPS * 1e3


def bytes_ms(nbytes: float) -> float:
    return nbytes / HBM_GBS * 1e3


def shared_components() -> list[dict]:
    """Everything except the projection/lookup front-end (identical in both
    designs)."""
    rows = []

    # encoder fwd: qkv + attn (scores + pv bmms) + out + 2 ffn matmuls
    per_layer = (
        2 * R * D * 3 * D               # qkv
        + 2 * B * H * S * S * DH * 2    # scores + pv
        + 2 * R * D * D                 # out proj
        + 2 * R * D * F * 2             # ffn in/out
    )
    enc_fwd = per_layer * L
    # ~6 materialized (R, D) bf16 activation streams per layer, plus the
    # (B, H, S, S) attention probs (saved for backward by XLA)
    enc_bytes = L * (6 * R * D * BF16 + B * H * S * S * BF16)
    rows.append({"component": f"encoder fwd ({L}L d={D} f={F} s={S})",
                 "flops": enc_fwd, "bytes": enc_bytes})
    rows.append({"component": "encoder bwd (2x fwd FLOPs)",
                 "flops": 2 * enc_fwd, "bytes": 2 * enc_bytes})

    # ContrastiveLoss over the shared pool (ops/fused_pairwise.py):
    # logits = q_norm @ pool_norm^T, (R, R) — fwd one matmul; bwd
    # recomputes logits and contracts dQ + dPool
    loss_fwd = 2 * R * R * D
    loss_bwd = 3 * 2 * R * R * D
    loss_io = 3 * R * D * BF16          # q, pos, pool in (logits streamed)
    rows.append({"component": f"pairwise CCL fwd ({R}x{R}x{D})",
                 "flops": loss_fwd, "bytes": loss_io})
    rows.append({"component": "pairwise CCL bwd (recompute + dQ + dPool)",
                 "flops": loss_bwd, "bytes": 2 * loss_io})

    # AdamW (f32 masters): read p+g+m+v, write p+m+v
    n_params = (
        EMB * D + D                     # input projection
        + S * D + 2 * D                 # pos embed + embed LN
        + L * (D * 3 * D + 3 * D + D * D + D + 2 * (2 * D)
               + D * F + F + F * D + D)
    )
    rows.append({"component": f"AdamW ({n_params/1e6:.2f}M params f32)",
                 "flops": 0.0, "bytes": n_params * F32 * 7})
    return rows


def projection_pre() -> list[dict]:
    """Design (i): whole-table pre-projection (shipped through round 4)."""
    rows = []
    rows.append({
        "component": f"pre-proj fwd ({NP1}x{EMB} @ {EMB}x{D})",
        "flops": 2 * NP1 * EMB * D,
        "bytes": NP1 * EMB * F32 + NP1 * D * BF16,
    })
    rows.append({
        "component": f"3R hidden-space gather ({3*R} rows x {D} bf16)",
        "flops": 0.0,
        "bytes": 3 * R * D * BF16 * 2,
    })
    rows.append({
        # d(table_proj): scatter 3R row-grads into (N+1, D) f32, then
        # dW = table^T @ d(table_proj) re-reading the f32 table
        "component": "pre-proj bwd (scatter to 62k rows + dW matmul)",
        "flops": 2 * NP1 * EMB * D,
        "bytes": (NP1 * D * F32 * 2          # d(table_proj) write + read
                  + 3 * R * D * F32          # row-grads in
                  + NP1 * EMB * F32),        # table re-read for dW
    })
    return rows


def projection_gather() -> list[dict]:
    """Design (ii): gather raw rows, project only those (frozen table =>
    no scatter backward)."""
    rows = []
    rows.append({
        "component": f"3R raw gather ({3*R} rows x {EMB} f32)",
        "flops": 0.0,
        "bytes": 3 * R * (EMB * F32 + EMB * BF16),  # read f32, write bf16
    })
    rows.append({
        "component": f"row-proj fwd ({3*R}x{EMB} @ {EMB}x{D})",
        "flops": 2 * 3 * R * EMB * D,
        "bytes": 3 * R * (EMB + D) * BF16,
    })
    rows.append({
        "component": "row-proj bwd (dW = gathered^T @ d_out, no scatter)",
        "flops": 2 * 3 * R * EMB * D,
        "bytes": 3 * R * (EMB + D) * BF16,
    })
    return rows


def vpu_terms() -> list[dict]:
    """Elementwise work on the XLA path; ceilings from VPU_CALIBRATION."""
    probs = B * H * S * S * L
    act = R * D * L
    terms = [
        # softmax: max-sub-exp-sum-div over the (B,H,S,S) score tensor
        {"term": "softmax (fwd+bwd)", "elemops": probs * 6 * 2,
         "peak": VPU_EXP_G_MS},
        # dropout: threefry bits + select, hidden (2 sites) + attn probs
        {"term": "dropout rng+select (train)",
         "elemops": (2 * act + probs) * 8, "peak": VPU_FMA_G_MS},
        # LN: mean/var/rsqrt/scale — ~10 elemops/elem, 2 sites/layer
        {"term": "layernorm x2/layer (fwd+bwd)", "elemops": act * 10 * 2 * 2,
         "peak": VPU_FMA_G_MS},
        # gelu-erf: poly ~15 elemops on the (R, F) ffn activation
        {"term": "gelu-erf on (R,F) (fwd+bwd)",
         "elemops": R * F * L * 15 * 2, "peak": VPU_EXP_G_MS},
        # loss row-normalize + per-element pool hinge on (R, R) logits
        {"term": "CCL elementwise on (R,R) logits (fwd+bwd)",
         "elemops": R * R * 6 * 2, "peak": VPU_FMA_G_MS},
    ]
    for t in terms:
        t["ms"] = t["elemops"] / t["peak"]
    return terms


def table(rows: list[dict]) -> float:
    print("| component | GFLOP | MB moved | FLOP ms | BW ms | SoL ms |")
    print("|---|---|---|---|---|---|")
    total = 0.0
    for r in rows:
        fm, bm = gflop_ms(r["flops"]), bytes_ms(r["bytes"])
        sol = max(fm, bm)
        total += sol
        print(f"| {r['component']} | {r['flops']/1e9:.2f} | "
              f"{r['bytes']/1e6:.1f} | {fm:.3f} | {bm:.3f} | {sol:.3f} |")
    print(f"| **total** | | | | | **{total:.3f}** |")
    return total


def main() -> None:
    shared = shared_components()
    print("## design (i): whole-table pre-projection (round-4 shipped)\n")
    t_pre = table(projection_pre() + shared)
    print("\n## design (ii): gather-then-project (frozen table, no scatter)\n")
    t_gather = table(projection_gather() + shared)

    print("\n## VPU terms (shared; third resource)\n")
    print("| term | G elemops | ms @ measured ceiling |")
    print("|---|---|---|")
    v_total = 0.0
    for t in vpu_terms():
        v_total += t["ms"]
        print(f"| {t['term']} | {t['elemops']/1e9:.2f} | {t['ms']:.3f} |")
    print(f"| **total** | | **{v_total:.3f}** |")

    out = {
        "sol_pre_projection_ms": round(t_pre, 3),
        "sol_gather_project_ms": round(t_gather, 3),
        "vpu_terms_ms": round(v_total, 3),
        "three_resource_bound_pre_ms": round(max(t_pre, v_total), 3),
        "three_resource_bound_gather_ms": round(max(t_gather, v_total), 3),
    }
    print()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
