"""Xplane trace + per-op device-time breakdown for the SCALE config (#4).

Same harness as scripts/trace_step.py but at the ML-25M shape
(6L d=256 ffn=1024 s=128 B=64, 62k catalog, ContrastiveLoss) — the
evidence behind BENCH_CONFIG4.json's attribution.

Usage: python scripts/trace_config4.py [trace_dir]
"""

from __future__ import annotations

import collections
import glob
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from scripts.bench_config4 import B, EMB, K, N, S  # noqa: E402
from __graft_entry__ import _flagship_config  # noqa: E402
from transformer_recommenders_tpu.models.transformer import (  # noqa: E402
    init_transformer_params,
)
from transformer_recommenders_tpu.training.scan_steps import (  # noqa: E402
    make_scanned_train_steps,
)
from transformer_recommenders_tpu.training.train_state import (  # noqa: E402
    init_train_state,
)


def run(trace_dir: str) -> None:
    cfg = _flagship_config(
        hidden_size=256,
        num_hidden_layers=6,
        intermediate_size=1024,
        max_seq_length=S,
        train_loss="ContrastiveLoss",
        use_fused_layer=False,
    )
    params = init_transformer_params(jax.random.key(0), cfg)
    r = np.random.default_rng(0)
    table = jnp.asarray(
        np.concatenate(
            [np.zeros((1, EMB), np.float32), r.normal(size=(N, EMB)).astype(np.float32)]
        )
    )
    stacked = {
        k: jnp.asarray(r.integers(1, N + 1, size=(K, B, S)).astype(np.int32))
        for k in ["history_item_idx", "pos_item_idx", "neg_item_idx"]
    }
    state = init_train_state(cfg, params)
    scan = make_scanned_train_steps(cfg)
    key = jax.random.key(0)
    state, logs = scan(state, table, stacked, key)
    jax.block_until_ready((state, logs))
    state, logs = scan(state, table, stacked, key)  # donated-buffer variant
    jax.block_until_ready((state, logs))

    jax.profiler.start_trace(trace_dir)
    for _ in range(4):
        state, logs = scan(state, table, stacked, key)
    jax.block_until_ready((state, logs))
    jax.profiler.stop_trace()
    print(f"trace written to {trace_dir}", flush=True)


def parse(trace_dir: str, steps: int = 4 * K) -> None:
    """Aggregate device time by op name prefix from the xplane proto."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        print("no xplane found")
        return
    xspace = xplane_pb2.XSpace()
    xspace.ParseFromString(open(sorted(paths)[-1], "rb").read())
    per_op: collections.Counter = collections.Counter()
    total_ps = 0
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for event in line.events:
                meta = plane.event_metadata[event.metadata_id]
                name = meta.name
                key = name.split(".")[0].rstrip("0123456789_")
                per_op[key] += event.duration_ps
                total_ps += event.duration_ps
    print(f"\ntotal device time: {total_ps/1e12/steps*1e3:.3f} ms/step over {steps} steps")
    for name, ps in per_op.most_common(30):
        print(f"  {ps/1e12/steps*1e3:8.4f} ms/step  {name}")
    # second pass: UNbucketed top ops, so the aggregate %fusion bucket
    # decomposes into its largest individual programs
    per_full: collections.Counter = collections.Counter()
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for event in line.events:
                name = plane.event_metadata[event.metadata_id].name
                per_full[name.split(" = ")[0]] += event.duration_ps
    print("\ntop individual ops:")
    for name, ps in per_full.most_common(25):
        print(f"  {ps/1e12/steps*1e3:8.4f} ms/step  {name[:110]}")


if __name__ == "__main__":
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xtrace_c4"
    run(trace_dir)
    parse(trace_dir)
