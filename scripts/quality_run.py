"""ML-1M-scale quality run on synthetic data (no egress -> no real ML-1M).

Trains the reference-equivalent config (1-layer d=384 encoder over frozen
384-d hash embeddings, InfoNCE) on a synthetic dataset with ML-1M's shape
(6040 users / 3700 items / 1M events) and records the retrieval-metric
trajectory — the framework-side half of the quality-parity protocol
(BASELINE.md: reference-vs-TPU parity needs the real dataset, which
requires egress; this demonstrates end-to-end learning at the same scale).

Usage: python scripts/quality_run.py [--epochs 8] [--tpu]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=8)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--data_dir", default="/tmp/xrt_quality_data")
    parser.add_argument("--out", default="QUALITY_RUN.json")
    parser.add_argument(
        "--steps_per_dispatch", type=int, default=8,
        help="scan window K; over a tunneled chip the steady epoch is "
             "RTT-count-bound (~1 round-trip per window), so wider windows "
             "trade compile variants for fewer round trips",
    )
    args = parser.parse_args()

    if args.cpu:
        import os

        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from transformer_recommenders_tpu.configs import SeqDataModuleConfig, TrainConfig
    from transformer_recommenders_tpu.data.module import SeqDataModule
    from transformer_recommenders_tpu.training.trainer import Trainer

    data_config = SeqDataModuleConfig(
        data_dir=args.data_dir,
        dataset="synthetic",
        embedder="hash",
        embedding_dim=384,
        max_seq_length=32,
        batch_size=256,
        synthetic_num_users=6040,
        synthetic_num_items=3706,
        synthetic_num_events=1_000_000,
    )
    config = TrainConfig(
        hidden_size=384,
        num_hidden_layers=1,
        num_attention_heads=12,
        intermediate_size=48,
        max_seq_length=32,
        train_loss="InfoNCELoss",
        learning_rate=1e-3,
        max_epochs=args.epochs,
        early_stopping_patience=3,
        eval_batch_size=256,
        top_k=20,
        log_every_n_steps=50,
        steps_per_dispatch=args.steps_per_dispatch,
        checkpoint_every_epoch=False,
        ckpt_dir="/tmp/xrt_quality_ckpt",
    )
    t0 = time.time()
    trainer = Trainer(config, SeqDataModule(data_config), log_dir="/tmp/xrt_quality_logs")
    trainer.configure()  # ETL + model + compile outside the fit timing
    t_fit = time.time()
    result = trainer.fit()
    fit_wall = time.time() - t_fit
    test = trainer.test()
    trainer.close()
    phases = {k: round(v, 1) for k, v in trainer.phase_seconds.items()}
    ph = trainer.phase_seconds
    # epoch_wall CONTAINS queue_wait/upload/dispatch/log/tail_dispatch;
    # host_sample overlaps the device (producer thread).  The in-epoch gap
    # is async device+tunnel work paying out at unprobed statements.
    in_epoch = sum(
        ph[k] for k in ("queue_wait", "upload", "dispatch", "log", "tail_dispatch")
    )
    phases["epoch_gap"] = round(max(0.0, ph["epoch_wall"] - in_epoch), 1)
    phases["per_epoch_wall"] = trainer.epoch_walls
    # epoch 0 absorbs program bring-up (remote compile or executable
    # cache-load over the tunnel: measured 20-50 s per program variant);
    # the steady-state rate is the honest host-loop throughput
    steady = trainer.epoch_walls[1:]
    if steady:
        import numpy as np

        med_epoch = float(np.median(steady))
        examples_per_epoch = (
            result["train/examples_per_s"] * fit_wall / len(trainer.epoch_walls)
        )
        phases["steady_state_examples_per_s"] = round(
            examples_per_epoch / max(med_epoch, 1e-9), 1
        )
        phases["median_steady_epoch_s"] = round(med_epoch, 2)
        phases["warmup_epoch0_s"] = trainer.epoch_walls[0]
    accounted = (
        ph["epoch_wall"] + ph["validate"] + ph["checkpoint"]
        + ph["final_checkpoint"]
    )

    # -- tunnel vs host split (VERDICT r4 next #4) -------------------------
    # Per main-loop phase: wall = blocked time + host CPU.  thread-CPU
    # deltas (phase_cpu_seconds) are host work that survives co-location;
    # wall - cpu is WAITING (tunnel round-trips or device backpressure).
    import numpy as np

    import jax
    import jax.numpy as jnp

    cpu = trainer.phase_cpu_seconds
    cnt = trainer.phase_counts
    loop_phases = ("queue_wait", "upload", "dispatch", "log", "tail_dispatch")
    split = {
        p: {
            "wall_s": round(ph[p], 2),
            "host_cpu_s": round(cpu[p], 2),
            "waiting_s": round(max(0.0, ph[p] - cpu[p]), 2),
        }
        for p in loop_phases
    }
    split["counts"] = dict(cnt)
    split["per_epoch_loop_cpu_s"] = trainer.epoch_cpu_walls

    # measured tunnel RTT: median of tiny blocking scalar fetches.  Each
    # ping computes a DIFFERENT value (x * i) — identical (program, args)
    # dispatches are memoized by the runtime and a constant zeros() scalar
    # may never even leave the host (the round-4 harness lesson)
    x = jax.device_put(np.float32(1.5))
    ping = jax.jit(lambda x, i: x * i)
    for i in range(3):  # compile + burn
        float(jax.device_get(ping(x, np.float32(i + 1))))
    rtts = []
    for i in range(15):
        t = time.perf_counter()
        float(jax.device_get(ping(x, np.float32(10 + i))))
        rtts.append(time.perf_counter() - t)
    rtt_ms = float(np.median(rtts) * 1e3)

    # in-situ device window time: K steps per scanned dispatch, value-gated
    # (the same program fit() ran; params are converged — timing only)
    k = config.steps_per_dispatch
    dm = trainer.datamodule
    window = None
    for i, batch in enumerate(dm.train_batches(0)):
        if i == k:
            break
        window = [batch] if window is None else window + [batch]
    step_ms = None
    # the scanned driver (and its _scan_step) only exists for k > 1; a
    # --steps_per_dispatch 1 run uses the single-step loop and skips the
    # in-situ window probe rather than crashing after the whole fit
    scan = getattr(trainer, "_scan_step", None)
    if scan is not None and window is not None and len(window) == k:
        from transformer_recommenders_tpu.training.scan_steps import stack_batches

        stacked = {kk: jax.device_put(v) for kk, v in stack_batches(window).items()}
        state = trainer.state
        keys = [jax.random.key(200 + i) for i in range(40)]
        for i in range(3):  # burn (donated-buffer variant + memoization)
            state, _ = scan(state, trainer.model.item_table, stacked, keys[i])
        float(jax.device_get(jax.tree.leaves(state.params)[0].ravel()[0]))
        reps = 30  # long window so the final value-gate RTT amortizes
        t = time.perf_counter()
        for i in range(reps):
            state, _ = scan(state, trainer.model.item_table, stacked, keys[3 + i])
        float(jax.device_get(jax.tree.leaves(state.params)[0].ravel()[0]))
        step_ms = (time.perf_counter() - t) / (reps * k) * 1e3

    # co-located projection for a steady epoch: the tunnel terms vanish,
    # host CPU and device compute remain and overlap (producer thread)
    n_epochs = max(len(trainer.epoch_walls), 1)
    projection = None
    if steady and step_ms is not None:
        steps_per_epoch = (
            cnt.get("windows", 0) * k + cnt.get("tail_steps", 0)
        ) / n_epochs
        device_busy_epoch = steps_per_epoch * step_ms / 1e3
        # STEADY-epoch host CPU: epoch 0's CPU is tracing/bring-up and
        # must not leak into the co-located projection
        host_cpu_epoch = float(np.median(trainer.epoch_cpu_walls[1:]))
        colocated_epoch = max(device_busy_epoch, host_cpu_epoch)
        projection = {
            "steady_epoch_wall_s": round(med_epoch, 2),
            "device_busy_epoch_s": round(device_busy_epoch, 2),
            "host_cpu_epoch_s": round(host_cpu_epoch, 2),
            "tunnel_attributed_epoch_s": round(
                max(0.0, med_epoch - colocated_epoch), 2
            ),
            "colocated_epoch_s": round(colocated_epoch, 2),
            "colocated_examples_per_s": round(
                examples_per_epoch / max(colocated_epoch, 1e-9), 1
            ),
            "measured_step_ms": round(step_ms, 3),
            "tunnel_rtt_ms": round(rtt_ms, 1),
        }
    payload = {
        "config": "reference-equivalent (1L d=384 ffn=48 seq=32, InfoNCE) on synthetic ML-1M shape",
        "epochs": args.epochs,
        "wall_s": round(time.time() - t0, 1),
        "fit_wall_s": round(fit_wall, 1),
        # per-phase attribution of the fit() wall (round-3 verdict #3):
        # host_sample runs on the producer thread (overlaps the device);
        # queue_wait = main loop starved for batches; dispatch = step-call
        # time incl. blocking when the dispatch queue backs up
        "fit_phase_seconds": phases,
        "fit_unattributed_s": round(max(0.0, fit_wall - accounted), 1),
        "tunnel_vs_host_split": split,
        "colocated_projection": projection,
        "val": {k: round(v, 4) for k, v in result.items()},
        "test": {k: round(v, 4) for k, v in test.items()},
    }
    pathlib.Path(args.out).write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload, indent=2))


if __name__ == "__main__":
    main()
