"""Metric sinks with the reference's artifact contract (SURVEY §5.5).

Artifacts (names identical to the reference so evaluation harnesses are
drop-in comparable):

* ``training_log.csv``      — per-epoch scalars (CSVLogger parity,
  ``src/trainer.py:168``)
* ``detailed_metrics.json`` — per-epoch wall time / memory / losses
  (``CustomMetricsCallback``, ``src/evaluation.py:107-160``; flushed
  every 2 epochs and at close)
* ``metrics.json``          — final offline eval metrics
  (``src/trainer.py:216-217``)
* ``config.json``           — the run config (``src/trainer.py:233``)

Per-host: only process 0 writes. Sinks: console + CSV + JSON always;
TensorBoard (tensorboardX event files under ``<output_dir>/tensorboard``,
the reference's per-epoch TB callback at ``src/trainer.py:169``) and W&B
(per-epoch ``log`` against the active run, ``src/trainer.py:173-174``)
when the libraries exist — optional-dependency guard parity with
``src/trainer.py:21-32``.
"""

from __future__ import annotations

import csv
import json
import logging
import os
import time
from typing import Any, Dict, List, Optional

import jax

logger = logging.getLogger(__name__)

try:  # optional, parity with the reference's psutil guard
    import psutil

    _PSUTIL = True
except ImportError:  # pragma: no cover
    _PSUTIL = False


class MetricWriter:
    """Collects per-epoch metrics and writes the artifact set."""

    def __init__(self, output_dir: str, flush_every: int = 2,
                 tensorboard: bool = True):
        self.output_dir = output_dir
        self.flush_every = flush_every
        self.history: List[Dict[str, Any]] = []
        self._csv_fields: Optional[List[str]] = None
        self._is_writer = jax.process_index() == 0
        self._epoch_start = 0.0
        self._tb = None
        if self._is_writer:
            os.makedirs(output_dir, exist_ok=True)
            if tensorboard:
                try:
                    from tensorboardX import SummaryWriter

                    self._tb = SummaryWriter(
                        os.path.join(output_dir, "tensorboard")
                    )
                except ImportError:
                    logger.info("tensorboardX not installed; TB sink off")

    @staticmethod
    def _wandb_run():
        """The active W&B run, if the CLI's ``--use_wandb`` created one
        (``wandb.run`` is the library's own process-global)."""
        import sys

        wandb = sys.modules.get("wandb")
        return getattr(wandb, "run", None) if wandb is not None else None

    # ---- epoch lifecycle -------------------------------------------
    def start_epoch(self) -> None:
        self._epoch_start = time.time()

    def end_epoch(self, epoch: int, logs: Dict[str, float]) -> Dict[str, Any]:
        entry: Dict[str, Any] = {"epoch": epoch, **{k: float(v) for k, v in logs.items()}}
        entry["epoch_time_s"] = time.time() - self._epoch_start
        if _PSUTIL:
            p = psutil.Process()
            entry["memory_mb"] = p.memory_info().rss / 1e6
            entry["cpu_percent"] = p.cpu_percent()
        self.history.append(entry)
        if self._is_writer:
            self._write_csv_row(entry)
            if self._tb is not None:
                for k, v in entry.items():
                    if k != "epoch":
                        self._tb.add_scalar(k, v, global_step=epoch)
            run = self._wandb_run()
            if run is not None:
                run.log({k: v for k, v in entry.items() if k != "epoch"},
                        step=epoch)
            if (epoch + 1) % self.flush_every == 0:
                self._flush_detailed()
            logger.info(
                "epoch %d: %s",
                epoch,
                " ".join(f"{k}={v:.4f}" for k, v in entry.items() if k != "epoch"),
            )
        return entry

    def _write_csv_row(self, entry: Dict[str, Any]) -> None:
        path = os.path.join(self.output_dir, "training_log.csv")
        if self._csv_fields is None:
            self._csv_fields = list(entry.keys())
            with open(path, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self._csv_fields)
                w.writeheader()
        with open(path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._csv_fields, extrasaction="ignore")
            w.writerow(entry)

    def _flush_detailed(self) -> None:
        with open(os.path.join(self.output_dir, "detailed_metrics.json"), "w") as f:
            json.dump({"epochs": self.history}, f, indent=2)

    # ---- final artifacts -------------------------------------------
    def write_final_metrics(self, metrics: Dict[str, float]) -> None:
        if self._is_writer:
            with open(os.path.join(self.output_dir, "metrics.json"), "w") as f:
                json.dump({k: float(v) for k, v in metrics.items()}, f, indent=2)
            run = self._wandb_run()
            if run is not None:
                run.log({f"final/{k}": float(v) for k, v in metrics.items()
                         if isinstance(v, (int, float))})

    def write_config(self, config) -> None:
        if self._is_writer:
            config.save(os.path.join(self.output_dir, "config.json"))

    def close(self) -> None:
        if self._is_writer:
            self._flush_detailed()
            if self._tb is not None:
                self._tb.close()
                self._tb = None


def setup_logging(level: int = logging.INFO) -> None:
    """Uniform per-host-prefixed logging (reference format at
    ``scripts/train.py:20-24``, plus the host prefix multi-process needs)."""
    prefix = f"[host {jax.process_index()}] " if jax.process_count() > 1 else ""
    logging.basicConfig(
        level=level,
        format=f"%(asctime)s {prefix}%(name)s %(levelname)s: %(message)s",
        force=True,
    )
