"""Training orchestration: fit / validate / test / predict.

Replaces the Lightning + LightningCLI stack (``xfmr_rec/trainer.py``) with
a plain loop around the jitted train/eval steps:

- one-epoch default, wall-clock budget, early stopping and best-checkpoint
  on ``val/retrieval_normalized_dcg`` (parity: trainer.py:334-341,449-455);
- per-step logging of every loss + batch/logit statistics
  (trainer.py:236-264);
- val/test = batched on-device retrieval metrics (replacing the per-user
  LanceDB loop, trainer.py:266-316);
- artifact save = model dir + items/users stores for serving
  (trainer.py:364-373).
"""

from __future__ import annotations

import pathlib
import time
import warnings

import jax
import numpy as np

from transformer_recommenders_tpu.configs import TrainConfig
from transformer_recommenders_tpu.data.module import SeqDataModule
from transformer_recommenders_tpu.models.recommender import RecommenderModel
from transformer_recommenders_tpu.training import checkpoint as ckpt_lib
from transformer_recommenders_tpu.training.evaluator import Evaluator
from transformer_recommenders_tpu.training.logging import MetricsLogger
from transformer_recommenders_tpu.training.train_state import (
    TrainState,
    init_train_state,
    make_train_step,
)


class Trainer:
    def __init__(
        self,
        config: TrainConfig,
        datamodule: SeqDataModule,
        *,
        log_dir: str | None = None,
    ) -> None:
        self.config = TrainConfig.model_validate(config)
        self.datamodule = datamodule
        self.log_dir = pathlib.Path(log_dir or "runs/default")
        sinks = []
        self.mlflow_run = None
        if self.config.use_mlflow:
            from transformer_recommenders_tpu.training.mlflow_logging import (
                MLflowRun,
            )

            self.mlflow_run = MLflowRun(
                self.config.mlflow_dir or self.log_dir / "mlruns",
                experiment_name=self.config.mlflow_experiment,
            )
            sinks.append(self.mlflow_run)
        self.logger = MetricsLogger(self.log_dir, sinks=sinks)
        self.model: RecommenderModel | None = None
        self.state: TrainState | None = None
        self.mesh = None
        self._placed_table = None
        self._train_step = None
        self._fast_step = None
        self._host_step: int | None = None
        self._midepoch_validate = None
        self._evaluator: Evaluator | None = None
        self._sharded_evaluator = None
        self._placed_items = None
        # per-phase wall-time attribution for the LAST fit() (seconds):
        # host_sample (producer thread), queue_wait (device starved for
        # batches), upload (device_put calls), dispatch (step-call time,
        # includes blocking when the dispatch queue backs up), log
        # (device_get + sink writes), validate, checkpoint.  Round-3
        # verdict #3: the end-to-end-vs-device-rate gap must be a measured
        # table, not prose.
        self.phase_seconds: dict[str, float] = self._fresh_phases()
        # thread-CPU seconds per main-loop phase (time.thread_time deltas):
        # wall - cpu is time the loop WAITED (tunnel round-trips or device
        # backpressure), cpu is host work that would survive co-location —
        # the split the round-4 verdict asked for (next #4)
        self.phase_cpu_seconds: dict[str, float] = self._fresh_phases()
        # event counts behind the phases: windows dispatched, log-fetch
        # events, ragged-tail steps (for count x RTT tunnel attribution)
        self.phase_counts: dict[str, int] = {}
        self.epoch_walls: list[float] = []
        self.epoch_cpu_walls: list[float] = []
        # deferred log events: (host_step, examples, wall_s, device vec of
        # per-key window means) — ONE blocking device_get per epoch at
        # flush time instead of one per logging event
        self._pending_logs: list = []
        self._pending_log_keys: list[str] | None = None

    @staticmethod
    def _fresh_phases() -> dict[str, float]:
        return {
            k: 0.0
            for k in (
                "host_sample", "queue_wait", "upload", "dispatch", "log",
                "tail_dispatch", "epoch_wall", "validate", "checkpoint",
                "final_checkpoint",
            )
        }

    # -- setup ---------------------------------------------------------------

    def configure(self) -> None:
        """Build datamodule artifacts, model, train state and compiled steps.
        Parity: ``RecommenderLightningModule.configure_model``
        (``xfmr_rec/trainer.py:139-161``)."""
        # multi-host bring-up FIRST: jax.distributed.initialize must run
        # before anything (jax.devices, random.key, ...) initializes the
        # local-only backend (env-gated no-op on single host)
        from transformer_recommenders_tpu.parallel.mesh import (
            maybe_initialize_distributed,
        )

        maybe_initialize_distributed()
        dm = self.datamodule
        dm.prepare_data()
        dm.setup()

        emb_dim = dm.item_embeddings.shape[1]
        cfg = self.config
        if cfg.input_dim is None and emb_dim != cfg.hidden_size:
            # infer the projection, like the reference infers dims from the
            # pretrained model (xfmr_rec/models.py:69-91)
            cfg = cfg.model_copy(update={"input_dim": emb_dim})
        self.config = cfg

        if self.model is None:
            self.model = RecommenderModel(cfg, rng=jax.random.key(cfg.seed))
            self.model.configure_embeddings(dm.item_ids, dm.item_embeddings)

        # sharded mode whenever >1 device is visible (or a model axis is
        # requested): DP batch sharding + row-sharded frozen table +
        # distributed-invariant loss (parallel/train.py).  The reference has
        # no working distributed path at all (SURVEY.md §2.3).
        if self.mesh is None and (
            len(jax.devices()) > 1 or cfg.mesh.model_axis_size > 1
        ):
            from transformer_recommenders_tpu.parallel import mesh as pmesh
            from transformer_recommenders_tpu.parallel.embedding import place_table

            pmesh.maybe_initialize_distributed()
            self.mesh = pmesh.create_mesh(cfg.mesh)
            if dm.config.batch_size % self.mesh.shape["data"] != 0:
                msg = (
                    f"batch_size={dm.config.batch_size} must be divisible by "
                    f"the data axis ({self.mesh.shape['data']})"
                )
                raise ValueError(msg)
            self._placed_table = place_table(
                np.asarray(self.model.item_table), self.mesh
            )

        if self.state is None:
            self.state = init_train_state(cfg, self.model.params)
        if self._train_step is None:
            if self.mesh is not None:
                from transformer_recommenders_tpu.parallel.train import (
                    make_sharded_train_step,
                    place_state,
                )

                self._train_step = make_sharded_train_step(cfg, self.mesh)
                self.state = place_state(self.state, self.mesh)
            else:
                self._train_step = make_train_step(cfg)
        if self._evaluator is None:
            self._evaluator = Evaluator(cfg)
        if self.mesh is not None and self._sharded_evaluator is None:
            from transformer_recommenders_tpu.parallel.embedding import place_table
            from transformer_recommenders_tpu.training.evaluator import (
                ShardedEvaluator,
            )

            table_np = np.asarray(self.model.item_table)
            self._placed_items = place_table(table_np[1:], self.mesh)
            self._sharded_evaluator = ShardedEvaluator(
                cfg, self.mesh, num_items=table_np.shape[0] - 1
            )

    def close(self) -> None:
        """Terminate logger sinks (marks the MLflow run FINISHED).
        Idempotent; call when done with fit/validate/test/predict."""
        self.logger.close()

    def restore(self, ckpt_path: str) -> dict:
        """Resume from a checkpoint directory (parity: ``ckpt_path`` CLI
        resume, ``config.yaml:92``)."""
        self.configure()
        self.state, meta = ckpt_lib.load_checkpoint(ckpt_path, self.state)
        self.model.params = self.state.params
        self._host_step = meta.get("step", int(self.state.step))
        return meta

    # -- fit -----------------------------------------------------------------

    def fit(self) -> dict[str, float]:
        self.configure()
        cfg = self.config
        dm = self.datamodule
        assert self.state is not None and self.model is not None

        monitor_best = -np.inf if cfg.monitor_mode == "max" else np.inf
        patience_left = cfg.early_stopping_patience
        best_ckpt = pathlib.Path(cfg.ckpt_dir) / "best"
        # configs sidecar so deploy can rebuild trainer+datamodule from the
        # checkpoint alone (parity: Lightning hparams restore,
        # xfmr_rec/trainer.py:465-475)
        best_ckpt.parent.mkdir(parents=True, exist_ok=True)
        import json

        (best_ckpt.parent / "config.json").write_text(
            json.dumps(
                {"model": cfg.model_dump(), "data": dm.config.model_dump()}, indent=2
            )
        )
        if self.mlflow_run is not None:
            # hyperparameters + full config as a run artifact (parity:
            # LoggerSaveConfigCallback, xfmr_rec/trainer.py:37-82)
            self.mlflow_run.log_params(
                {"model": cfg.model_dump(), "data": dm.config.model_dump()}
            )
            self.mlflow_run.log_artifact(best_ckpt.parent / "config.json")
        last_val: dict[str, float] = {}
        root_key = jax.random.key(cfg.seed)
        t_start = time.time()
        self.phase_seconds = self._fresh_phases()
        self.phase_cpu_seconds = self._fresh_phases()
        self.phase_counts = {}
        self._pending_logs = []
        self._pending_log_keys = None
        self.epoch_walls = []
        self.epoch_cpu_walls = []
        examples = 0
        stop = False
        epoch = 0
        best_device_state = None
        last_validated_step = -1  # dedup: never score the same params twice

        def on_validation(val: dict[str, float], at_epoch: int) -> bool:
            """Monitor/early-stop/best-checkpoint bookkeeping shared by
            epoch-end and mid-epoch (``val_check_interval``) validations.
            Returns True when early stopping fires.  Lightning errors on a
            missing monitor metric; so do we — a silent NaN would make every
            epoch look like an improvement (ADVICE round 1)."""
            nonlocal monitor_best, patience_left, best_device_state, last_val
            last_val = val
            if cfg.monitor not in val:
                msg = (
                    f"monitor metric {cfg.monitor!r} missing from validation "
                    f"results {sorted(val)}; fix TrainConfig.monitor or the "
                    "validation split"
                )
                raise KeyError(msg)
            score = val[cfg.monitor]
            if not np.isfinite(score):
                # Lightning's EarlyStopping(check_finite) stops with an
                # explicit signal; we keep training but shout, so a NaN-only
                # run doesn't silently burn all patience (ADVICE round 2).
                warnings.warn(
                    f"monitor metric {cfg.monitor!r} is non-finite ({score}) "
                    f"at epoch {at_epoch}; counting as not-improved "
                    f"(patience {patience_left - 1} left)",
                    RuntimeWarning,
                    stacklevel=2,
                )
            improved = np.isfinite(score) and (
                score > monitor_best
                if cfg.monitor_mode == "max"
                else score < monitor_best
            )
            if improved:
                monitor_best = score
                patience_left = cfg.early_stopping_patience
                if cfg.checkpoint_every_epoch:
                    ckpt_lib.save_checkpoint(
                        best_ckpt,
                        self.state,
                        epoch=at_epoch,
                        metrics=val,
                        backend=cfg.checkpoint_backend,
                    )
                else:  # device reference only: zero host transfer
                    best_device_state = (self.state, at_epoch, dict(val))
            else:
                patience_left -= 1
                if patience_left <= 0:
                    return True
            return False

        self._midepoch_validate = None
        if cfg.val_check_interval > 0:

            def midepoch_validate(at_epoch: int) -> bool:
                nonlocal last_validated_step
                self.model.params = self.state.params
                t_val = time.time()
                val = self.validate(stage="val")
                self.phase_seconds["validate"] += time.time() - t_val
                last_validated_step = self._host_step or int(self.state.step)
                self.logger.log(val, step=last_validated_step)
                return on_validation(val, at_epoch)

            self._midepoch_validate = midepoch_validate

        profiling = False
        if cfg.profile_dir:
            jax.profiler.start_trace(cfg.profile_dir)
            profiling = True
        try:
            for epoch in range(cfg.max_epochs):
                if cfg.steps_per_dispatch > 1:
                    t_ep = time.perf_counter()
                    val_before = self.phase_seconds["validate"]
                    cpu_before = sum(
                        self.phase_cpu_seconds[k]
                        for k in ("queue_wait", "upload", "dispatch", "log",
                                  "tail_dispatch")
                    )
                    stop, examples = self._run_epoch_scanned(
                        epoch, root_key, t_start, examples
                    )
                    # early-stop/max-steps exits skip the _DONE flush; the
                    # flush is idempotent (no-op on an empty queue)
                    self._flush_pending_logs()
                    dt_ep = time.perf_counter() - t_ep
                    # mid-epoch validation runs INSIDE the epoch wall but is
                    # already attributed to "validate" — subtract it so the
                    # phase table sums to fit_wall instead of double-counting
                    dt_ep -= self.phase_seconds["validate"] - val_before
                    self.phase_seconds["epoch_wall"] += dt_ep
                    # per-epoch walls separate warmup (epoch 0 absorbs the
                    # async compiles / executable cache loads of every
                    # program variant) from the steady state
                    self.epoch_walls.append(round(dt_ep, 2))
                    # per-epoch thread-CPU of the main loop: epoch 0's CPU
                    # is dominated by tracing, so co-located projections
                    # must use the steady-epoch CPU, not total/epochs
                    cpu_now = sum(
                        self.phase_cpu_seconds[k]
                        for k in ("queue_wait", "upload", "dispatch", "log",
                                  "tail_dispatch")
                    )
                    self.epoch_cpu_walls.append(round(cpu_now - cpu_before, 3))
                else:
                    stop, examples = self._run_epoch(
                        epoch, root_key, t_start, examples
                    )

                self.model.params = self.state.params
                cur_step = (
                    self._host_step
                    if self._host_step is not None
                    else int(self.state.step)
                )
                # skip the epoch-end validation when a mid-epoch one
                # (val_check_interval) just scored these exact params —
                # re-scoring ties the monitor and burns early-stopping
                # patience every epoch (round-2 review finding)
                if cur_step != last_validated_step:
                    t_val = time.time()
                    val = self.validate(stage="val")
                    self.phase_seconds["validate"] += time.time() - t_val
                    last_validated_step = cur_step
                    self.logger.log(val, step=cur_step)
                    stop = on_validation(val, epoch) or stop
                if cfg.checkpoint_every_epoch:
                    t_ck = time.time()
                    ckpt_lib.save_checkpoint(
                        pathlib.Path(cfg.ckpt_dir) / "last",
                        self.state,
                        epoch=epoch,
                        metrics=last_val,
                        backend=cfg.checkpoint_backend,
                    )
                    self.phase_seconds["checkpoint"] += time.time() - t_ck
                if stop:
                    break
        finally:
            self._midepoch_validate = None
            if profiling:
                jax.profiler.stop_trace()

        if not cfg.checkpoint_every_epoch:
            t_ck = time.time()
            ckpt_lib.save_checkpoint(
                pathlib.Path(cfg.ckpt_dir) / "last",
                self.state,
                epoch=epoch,
                metrics=last_val,
                backend=cfg.checkpoint_backend,
            )
            self.phase_seconds["final_checkpoint"] += time.time() - t_ck
            if best_device_state is not None:
                state, best_epoch, best_val = best_device_state
                t_ck = time.time()
                ckpt_lib.save_checkpoint(
                    best_ckpt,
                    state,
                    epoch=best_epoch,
                    metrics=best_val,
                    backend=cfg.checkpoint_backend,
                )
                self.phase_seconds["final_checkpoint"] += time.time() - t_ck
                self.state = state

        # restore best weights (parity: Lightning ckpt_path="best")
        if cfg.checkpoint_every_epoch and (
            (best_ckpt / "state.npz").exists() or (best_ckpt / "orbax").exists()
        ):
            self.state, _ = ckpt_lib.load_checkpoint(best_ckpt, self.state)
        self.model.params = self.state.params
        return {**last_val, "train/examples_per_s": examples / max(time.time() - t_start, 1e-9)}

    def _run_epoch(
        self, epoch: int, root_key, t_start: float, examples: int
    ) -> tuple[bool, int]:
        """One epoch of single-step dispatches (sharded or single-device).

        The step counter is tracked HOST-SIDE: ``int(state.step)`` per
        iteration would force a device sync every step (a full network
        round-trip on tunneled TPUs — measured 200+ ms/step).  Non-logging
        steps run the fast objective-only program; the full 7-loss/
        statistics program runs only on logging steps (the reference logs
        everything every step, ``xfmr_rec/trainer.py:288-291``; at TPU
        rates that logging costs more than the training itself).
        """
        cfg = self.config
        if self._host_step is None:
            self._host_step = int(self.state.step)
        if self._fast_step is None:
            if self.mesh is None:
                self._fast_step = make_train_step(cfg, full_logs=False)
            else:
                from transformer_recommenders_tpu.parallel.train import (
                    make_sharded_train_step,
                )

                self._fast_step = make_sharded_train_step(
                    cfg, self.mesh, full_logs=False
                )

        batches = _limit(self.datamodule.train_batches(epoch), cfg.limit_train_batches)
        if self.mesh is not None:
            from transformer_recommenders_tpu.parallel.mesh import shard_batch

            batches = _prefetch(batches, lambda b: shard_batch(b, self.mesh))
        else:
            batches = _prefetch(
                batches, lambda b: {k: jax.device_put(v) for k, v in b.items()}
            )
        for batch in batches:
            step_key = jax.random.fold_in(root_key, self._host_step)
            will_log = (self._host_step + 1) % cfg.log_every_n_steps == 0
            step_fn = self._train_step if will_log else self._fast_step
            table = (
                self._placed_table if self.mesh is not None else self.model.item_table
            )
            self.state, logs = step_fn(self.state, table, batch, step_key)
            examples += batch["history_item_idx"].shape[0]
            self._host_step += 1
            if will_log:
                # ONE stacked download instead of a per-leaf device_get
                # (~25 sequential tunnel round-trips per logging event)
                logs = self._fetch_log_means(logs)
                logs["train/examples_per_s"] = examples / max(
                    time.time() - t_start, 1e-9
                )
                self.logger.log(logs, step=self._host_step)
            if (
                self._midepoch_validate is not None
                and cfg.val_check_interval > 0
                and self._host_step % cfg.val_check_interval == 0
                and self._midepoch_validate(epoch)
            ):
                return True, examples
            if 0 <= cfg.max_steps <= self._host_step:
                return True, examples
            if time.time() - t_start > cfg.max_time_seconds:
                return True, examples
        return False, examples

    def _run_epoch_scanned(
        self, epoch: int, root_key, t_start: float, examples: int
    ) -> tuple[bool, int]:
        """One epoch via multi-step scanned dispatches (K steps/program).

        A producer thread samples and stacks the next windows while the
        device executes the current one, so host sampling and the tunnel
        upload overlap device compute.
        """
        import queue as queue_mod
        import threading

        from transformer_recommenders_tpu.training.scan_steps import (
            make_scanned_train_steps,
            stack_batches,
        )

        cfg = self.config
        if getattr(self, "_scan_step", None) is None:
            self._scan_step = make_scanned_train_steps(cfg, mesh=self.mesh)
        if self._host_step is None:
            self._host_step = int(self.state.step)
        k = cfg.steps_per_dispatch

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from transformer_recommenders_tpu.params import DATA_AXIS

            window_sharding = NamedSharding(self.mesh, P(None, DATA_AXIS))
        else:
            window_sharding = None

        window_queue: queue_mod.Queue = queue_mod.Queue(maxsize=2)
        _DONE = object()

        phases = self.phase_seconds

        def produce() -> None:
            buf: list[dict] = []
            t0 = time.perf_counter()
            for i, batch in enumerate(self.datamodule.train_batches(epoch)):
                if 0 <= cfg.limit_train_batches <= i:
                    break
                buf.append(batch)
                if len(buf) == k:
                    stacked = stack_batches(buf)
                    # sampling+stacking time only — queue.put can block on
                    # a full queue (device-bound, not host-bound)
                    phases["host_sample"] += time.perf_counter() - t0
                    window_queue.put(("full", stacked, k, sum(
                        b["history_item_idx"].shape[0] for b in buf
                    )))
                    buf = []
                    t0 = time.perf_counter()
            phases["host_sample"] += time.perf_counter() - t0
            if buf:  # ragged tail: handled by single-step dispatches
                window_queue.put(("tail", buf, len(buf), sum(
                    b["history_item_idx"].shape[0] for b in buf
                )))
            window_queue.put(_DONE)

        threading.Thread(target=produce, daemon=True).start()

        cpu = self.phase_cpu_seconds
        counts = self.phase_counts

        def _bump(name: str, n: int = 1) -> None:
            counts[name] = counts.get(name, 0) + n

        while True:
            t0, c0 = time.perf_counter(), time.thread_time()
            item = window_queue.get()
            phases["queue_wait"] += time.perf_counter() - t0
            cpu["queue_wait"] += time.thread_time() - c0
            if item is _DONE:
                self._flush_pending_logs()
                return False, examples
            kind, payload, n_steps, n_examples = item
            if kind == "full":
                t0, c0 = time.perf_counter(), time.thread_time()
                if window_sharding is not None:
                    payload = {
                        key: jax.device_put(v, window_sharding)
                        for key, v in payload.items()
                    }
                else:
                    # explicit async staging (device_put returns immediately;
                    # the transfer overlaps the previous window's compute)
                    payload = {
                        key: jax.device_put(v) for key, v in payload.items()
                    }
                phases["upload"] += time.perf_counter() - t0
                cpu["upload"] += time.thread_time() - c0
                table = (
                    self._placed_table
                    if self.mesh is not None
                    else self.model.item_table
                )
                t0, c0 = time.perf_counter(), time.thread_time()
                self.state, logs = self._scan_step(
                    self.state, table, payload, root_key
                )
                phases["dispatch"] += time.perf_counter() - t0
                cpu["dispatch"] += time.thread_time() - c0
                _bump("windows")
                examples += n_examples
                self._host_step += n_steps
                if self._host_step // k % max(cfg.log_every_n_steps // k, 1) == 0:
                    t0, c0 = time.perf_counter(), time.thread_time()
                    # DEFERRED logging: reduce the window's (n_keys, k) logs
                    # to per-key means DEVICE-side (tiny async dispatch, no
                    # download) and queue the handle; ONE blocking
                    # device_get at epoch end fetches every event at once.
                    # The per-event blocking fetch this replaces cost one
                    # tunnel round-trip (~141 ms profiled round 4) per event.
                    self._queue_log_event(logs, examples, time.time() - t_start)
                    phases["log"] += time.perf_counter() - t0
                    cpu["log"] += time.thread_time() - c0
                    _bump("log_events")
            else:  # ragged tail: ONE scanned dispatch at the tail length
                # (compiled once per distinct tail size — stable across
                # epochs), replacing len(payload) single-step dispatches.
                # RNG parity with the single-step path it replaced: the scan
                # body folds root_key with the DEVICE step counter, which
                # equals the host counter the single-step path folded in.
                table = (
                    self._placed_table
                    if self.mesh is not None
                    else self.model.item_table
                )
                t0, c0 = time.perf_counter(), time.thread_time()
                stacked = stack_batches(payload)
                if window_sharding is not None:
                    stacked = {
                        key: jax.device_put(v, window_sharding)
                        for key, v in stacked.items()
                    }
                self.state, _ = self._scan_step(
                    self.state, table, stacked, root_key
                )
                examples += n_examples
                self._host_step += n_steps
                phases["tail_dispatch"] += time.perf_counter() - t0
                cpu["tail_dispatch"] += time.thread_time() - c0
                _bump("tail_steps", n_steps)
            if (
                self._midepoch_validate is not None
                and cfg.val_check_interval > 0
                and self._host_step // cfg.val_check_interval
                > (self._host_step - n_steps) // cfg.val_check_interval
            ):
                # emit queued train rows BEFORE the validation row so the
                # sinks stay step-ordered
                self._flush_pending_logs()
                if self._midepoch_validate(epoch):
                    return True, examples
            if 0 <= cfg.max_steps <= self._host_step:
                return True, examples
            if time.time() - t_start > cfg.max_time_seconds:
                return True, examples

    def _queue_log_event(self, logs: dict, examples: int, wall_s: float) -> None:
        """Reduce a window's logs to a per-key mean VECTOR on device (async,
        no download) and queue it; :meth:`_flush_pending_logs` downloads all
        queued events in one blocking transfer."""
        import jax.numpy as jnp

        keys = sorted(logs)
        if self._pending_log_keys is None:
            self._pending_log_keys = keys
        vec = jnp.stack(
            [jnp.mean(jnp.asarray(logs[key], jnp.float32)) for key in keys]
        )
        self._pending_logs.append((self._host_step, examples, wall_s, vec))
        # bound what a mid-epoch crash can lose (and keep sinks fresh on
        # multi-minute epochs): one amortized download per 16 events still
        # cuts the per-event round-trip cost 16x
        if len(self._pending_logs) >= 16:
            self._flush_pending_logs()

    def _flush_pending_logs(self) -> None:
        """Emit every queued log event with ONE device_get: the (E, n_keys)
        stack downloads in a single tunnel round-trip instead of E."""
        if not self._pending_logs:
            return
        import jax.numpy as jnp

        t0 = time.perf_counter()
        keys = self._pending_log_keys
        vecs = jax.device_get(jnp.stack([v for (_, _, _, v) in self._pending_logs]))
        for (step, examples, wall_s, _), row in zip(self._pending_logs, vecs):
            means = {key: float(x) for key, x in zip(keys, row)}
            means["train/examples_per_s"] = examples / max(wall_s, 1e-9)
            self.logger.log(means, step=step)
        self._pending_logs = []
        self.phase_seconds["log"] += time.perf_counter() - t0
        self.phase_counts["log_flushes"] = (
            self.phase_counts.get("log_flushes", 0) + 1
        )

    @staticmethod
    def _fetch_log_means(logs: dict) -> dict[str, float]:
        """Per-key means of a dict of device arrays with ONE host transfer
        (uniform shapes stack into a single buffer; mixed shapes fall back
        to a per-leaf device_get)."""
        import jax.numpy as jnp

        keys = sorted(logs)
        shapes = {getattr(logs[key], "shape", ()) for key in keys}
        if len(shapes) == 1:
            stacked = jax.device_get(
                jnp.stack([jnp.asarray(logs[key], jnp.float32) for key in keys])
            )
            return {
                key: float(np.mean(row)) for key, row in zip(keys, stacked)
            }
        host = jax.device_get(logs)
        return {key: float(np.mean(host[key])) for key in keys}

    # -- eval ----------------------------------------------------------------

    def validate(self, stage: str = "val") -> dict[str, float]:
        self.configure()
        arrays = self.datamodule.eval_arrays("val" if stage == "val" else stage)
        limit = (
            self.config.limit_val_batches
            if stage == "val"
            else self.config.limit_test_batches
        )
        if limit >= 0:
            arrays = _slice_arrays(arrays, limit * self.config.eval_batch_size)
        if self._sharded_evaluator is not None:
            return self._sharded_evaluator.run(
                self.model.params,
                (self._placed_table, self._placed_items),
                arrays,
                stage=stage,
            )
        return self._evaluator.run(
            self.model.params, self.model.item_table, arrays, stage=stage
        )

    def test(self) -> dict[str, float]:
        return self.validate(stage="test")

    def predict(self, split: str = "predict") -> dict[str, np.ndarray]:
        """Top-k recs for every user of ``split`` (history excluded).
        Parity: ``xfmr_rec/trainer.py:307-316``."""
        self.configure()
        arrays = self.datamodule.eval_arrays(split)
        if self.config.limit_predict_batches >= 0:
            arrays = _slice_arrays(
                arrays, self.config.limit_predict_batches * self.config.eval_batch_size
            )
        if self._sharded_evaluator is not None:
            idx, scores = self._sharded_evaluator.recommend_batch(
                self.model.params, (self._placed_table, self._placed_items), arrays
            )
        else:
            idx, scores = self._evaluator.recommend_batch(
                self.model.params, self.model.item_table, arrays
            )
        item_ids = np.asarray(self.datamodule.item_ids, object)
        return {
            "user_ids": np.asarray(arrays.user_ids, object),
            "item_idx": idx,
            "item_ids": item_ids[idx - 1],
            "scores": scores,
        }

    # -- artifacts -----------------------------------------------------------

    def save(self, path: str | pathlib.Path) -> None:
        """Persist serving artifacts: model + item index + user store +
        manifest.  Parity: ``RecommenderLightningModule.save`` = transformer
        dir + LanceDB copy (``xfmr_rec/trainer.py:364-373``)."""
        import datetime
        import json
        import shutil

        from transformer_recommenders_tpu.configs import IndexConfig
        from transformer_recommenders_tpu.index.device_index import DeviceIndex
        from transformer_recommenders_tpu.params import (
            INDEX_PATH,
            MODEL_NAME,
            TRANSFORMER_PATH,
            USERS_TABLE_NAME,
        )

        path = pathlib.Path(path)
        path.mkdir(parents=True, exist_ok=True)
        assert self.model is not None
        self.model.save(path / TRANSFORMER_PATH)

        dm = self.datamodule
        store = path / INDEX_PATH

        # retrieval index ranks in the QUERY space: projected embeddings
        # when a learned projection exists, raw frozen otherwise
        from transformer_recommenders_tpu.models.recommender import (
            retrieval_item_embeddings,
        )

        index_embeddings = np.asarray(
            retrieval_item_embeddings(
                self.model.params, self.config, self.model.item_table
            )
        )
        items_index = DeviceIndex(
            IndexConfig(
                index_path=str(store),
                table_name="items",
                id_col="item_id",
                text_col="item_text",
                embedding_col="embedding",
                # ship prebuilt BM25 postings: search_item_text routes this
                # table, and a cold serving replica must not pay the corpus
                # build inside its first request
                persist_fts=True,
            )
        )
        items_index.index_data(dm.items, embeddings=index_embeddings)
        items_index.save(store)
        # raw frozen inputs back the serving query-normalization chain
        # (ItemQuery.embedding -> Model.embed inputs; service.py:226-249)
        np.save(store / "items" / "input_embeddings.npy", dm.item_embeddings)

        # users: copy raw parquet (struct-of-list columns) + config sidecar
        users_dir = store / USERS_TABLE_NAME
        users_dir.mkdir(parents=True, exist_ok=True)
        shutil.copy(dm.dataset_dir / "users.parquet", users_dir / "records.parquet")
        users_config = IndexConfig(
            index_path=str(store),
            table_name=USERS_TABLE_NAME,
            id_col="user_id",
            text_col="user_text",
            embedding_col=None,
            backend="host",
        )
        (users_dir / "config.json").write_text(users_config.model_dump_json(indent=2))

        (path / "manifest.json").write_text(
            json.dumps(
                {
                    "name": MODEL_NAME,
                    "version": datetime.datetime.now(datetime.UTC).strftime(
                        "%Y%m%d%H%M%S"
                    ),
                    "step": int(self.state.step) if self.state is not None else 0,
                },
                indent=2,
            )
        )


def _limit(iterator, limit: int):
    for i, item in enumerate(iterator):
        if 0 <= limit <= i:
            return
        yield item


def _prefetch(iterator, put, depth: int = 3):
    """Async host->device staging: keep ``depth`` batches in flight so
    transfer latency (severe on tunneled TPUs) overlaps compute."""
    import collections

    queue = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(depth):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        batch = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield batch


def _slice_arrays(arrays, n: int):
    import dataclasses

    return dataclasses.replace(
        arrays,
        user_ids=arrays.user_ids[:n],
        histories=arrays.histories[:n],
        history_window=arrays.history_window[:n],
        target_lists=arrays.target_lists[:n],
        n_targets=arrays.n_targets[:n],
    )
