"""Metric logging: JSONL always, TensorBoard when torch is importable.

The reference logs to TensorBoard `runs/` (pytorch-sandbox/train.py:92-93)
plus raw prints.  JSONL is the primary sink here (machine-readable, no deps);
the TensorBoard writer is attached opportunistically for parity.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: str = "runs", name: Optional[str] = None, stdout: bool = True):
        self.log_dir = log_dir
        self.stdout = stdout
        os.makedirs(log_dir, exist_ok=True)
        stamp = name or time.strftime("%Y%m%d-%H%M%S")
        self.jsonl_path = os.path.join(log_dir, f"metrics-{stamp}.jsonl")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(os.path.join(log_dir, stamp))
        except Exception:
            self._tb = None

    def log_scalars(self, step: int, scalars: Dict[str, float]):
        record = {"step": step, "time": time.time(), **{k: float(v) for k, v in scalars.items()}}
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)
        if self.stdout:
            parts = " ".join(f"{k}={float(v):.4g}" for k, v in scalars.items())
            print(f"[step {step}] {parts}")

    def close(self):
        if self._tb is not None:
            self._tb.close()
