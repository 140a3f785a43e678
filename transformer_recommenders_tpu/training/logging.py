"""Experiment logging: JSONL + CSV + stdout.

Parity target: the reference's dual TensorBoard/MLflow loggers with rich
per-step scalars (``xfmr_rec/trainer.py:419-463``, SURVEY.md §5.5).  Here a
dependency-free host logger writes ``metrics.jsonl`` (one record per log
call) and ``metrics.csv``, and mirrors a compact line to stdout.  A
TensorBoard writer can be layered on when the package is present.
"""

from __future__ import annotations

import csv
import json
import pathlib
import time


class MetricsLogger:
    def __init__(
        self,
        log_dir: str | pathlib.Path,
        *,
        echo: bool = True,
        sinks: list | None = None,
    ) -> None:
        """``sinks``: additional logger adapters, each with
        ``log(metrics, *, step)`` and ``close()`` — the seam the reference
        fills with its dual TensorBoard/MLflow loggers
        (``xfmr_rec/trainer.py:419-463``); the Trainer plugs an
        :class:`~..training.mlflow_logging.MLflowRun` in here."""
        self.log_dir = pathlib.Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a", buffering=1)
        self._csv_path = self.log_dir / "metrics.csv"
        self._csv_fields: list[str] | None = None
        self._echo = echo
        self._t0 = time.time()
        self._tb = _maybe_tensorboard(self.log_dir)
        self.sinks = list(sinks or [])

    def log(self, metrics: dict[str, float], *, step: int, prefix: str = "") -> None:
        record = {
            "step": step,
            "time": round(time.time() - self._t0, 3),
            **{f"{prefix}{k}": _to_float(v) for k, v in metrics.items()},
        }
        self._jsonl.write(json.dumps(record) + "\n")
        self._write_csv(record)
        scalars = {k: v for k, v in record.items() if k not in {"step", "time"}}
        for sink in self.sinks:
            sink.log(scalars, step=step)
        if self._tb is not None:
            for k, v in record.items():
                if k not in {"step", "time"}:
                    self._tb.add_scalar(k, v, step)
        if self._echo:
            shown = {
                k: round(v, 4)
                for k, v in record.items()
                if k not in {"time"} and ("loss/" in k or "retrieval" in k or k == "step")
            }
            print(f"[metrics] {shown}", flush=True)

    def _write_csv(self, record: dict) -> None:
        if self._csv_fields is None:
            self._csv_fields = list(record)
            with open(self._csv_path, "a", newline="") as f:
                csv.DictWriter(f, self._csv_fields).writeheader()
        with open(self._csv_path, "a", newline="") as f:
            csv.DictWriter(f, self._csv_fields, extrasaction="ignore").writerow(record)

    def close(self) -> None:
        """Idempotent: flush files and terminate sinks (the MLflow sink
        marks its run FINISHED here — without it every run stays RUNNING,
        ADVICE round 2)."""
        if self._jsonl.closed:
            return
        self._jsonl.close()
        for sink in self.sinks:
            sink.close()
        if self._tb is not None:
            self._tb.close()


def _maybe_tensorboard(log_dir: pathlib.Path):
    """Optional TensorBoard backend (parity: reference TensorBoardLogger,
    ``xfmr_rec/trainer.py:429-437``); silently absent without the package."""
    try:
        from torch.utils.tensorboard import SummaryWriter
    except Exception:  # noqa: BLE001 — any import failure disables TB
        return None
    try:
        # defaults (max_queue=10, flush_secs=120) BLOCK add_scalar when the
        # background writer thread is GIL-starved by the sampling/dispatch
        # threads — profiled at 96 s of a 186 s quality run (round 4).  A
        # deep queue + flush-on-close makes logging non-blocking; events
        # drain opportunistically and at close().
        return SummaryWriter(str(log_dir / "tb"), max_queue=100_000,
                             flush_secs=86_400)
    except Exception:  # noqa: BLE001
        return None


def _to_float(v) -> float:
    try:
        return float(v)
    except (TypeError, ValueError):
        return float("nan")
