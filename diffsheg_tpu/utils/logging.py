"""Observability: structured metric logging + stdout.

Replaces the reference's wandb + print_current_loss + loguru mix (reference
trainers/ddpm_beat_trainer.py:94-99,459-469, utils/utils.py:36-61): metrics go
to a JSONL file (one record per log step — trivially ingested by any
dashboard) and human-readable lines to stdout.  Wandb is attached optionally
when available and configured, never required.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, workdir: str, name: str = "run",
                 use_wandb: bool = False, wandb_project: Optional[str] = None):
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self.path = os.path.join(workdir, "metrics.jsonl")
        self._f = open(self.path, "a", buffering=1)
        self.name = name
        self._t0 = time.time()
        self._wandb = None
        if use_wandb:
            try:  # pragma: no cover - wandb optional
                import wandb
                self._wandb = wandb
                wandb.init(project=wandb_project or f"diffsheg_tpu",
                           name=name)
            except Exception:
                self._wandb = None

    def log_metrics(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": int(step), "t": round(time.time() - self._t0, 3),
               **{k: (float(v) if isinstance(v, (int, float)) else v)
                  for k, v in metrics.items()}}
        self._f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:  # pragma: no cover
            self._wandb.log(metrics, step=step)

    def log_text(self, msg: str) -> None:
        line = f"[{self.name}] {msg}"
        print(line, file=sys.stdout, flush=True)
        self._f.write(json.dumps({"text": msg,
                                  "t": round(time.time() - self._t0, 3)})
                      + "\n")

    def close(self) -> None:
        self._f.close()
