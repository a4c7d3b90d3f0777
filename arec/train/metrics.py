"""Structured metrics / observability.

The reference printed loss/recall to stdout (SURVEY.md §5 "Metrics"); here
every scalar goes to (a) stdout in a compact line and (b) a JSONL stream in
train_dir — the graded counters (examples/s/chip, Recall@30, scaling
efficiency; BASELINE.json:2) all flow through this. With
`train.tensorboard=true` the same scalars additionally stream to a
TensorBoard event file under train_dir/tb (torch's SummaryWriter — no TF
dependency; imported lazily because the import costs ~10 s).
"""

from __future__ import annotations

import json
import os
import time


class MetricLogger:
    def __init__(self, train_dir: str, filename: str = "metrics.jsonl",
                 tensorboard: bool = False, enabled: bool = True):
        """enabled=False → every call is a no-op (non-primary processes of
        a multi-host run share train_dir and must not race on the JSONL)."""
        self.enabled = enabled
        self._t0 = time.time()
        self._tb = None
        self._closed = False
        if not enabled:
            self._f, self._tb_dir = None, None
            return
        os.makedirs(train_dir, exist_ok=True)
        self._f = open(os.path.join(train_dir, filename), "a", buffering=1)
        self._tb_dir = os.path.join(train_dir, "tb") if tensorboard else None

    def _tb_writer(self):
        if self._tb is None and self._tb_dir is not None:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir=self._tb_dir)
        return self._tb

    def log(self, step: int, **scalars) -> None:
        if not self.enabled:
            return
        if self._closed:
            raise ValueError("MetricLogger.log() after close()")
        rec = {"step": int(step), "t": round(time.time() - self._t0, 3)}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        tb = self._tb_writer()
        if tb is not None:
            for k, v in rec.items():
                if k not in ("step", "t") and isinstance(v, (int, float)):
                    tb.add_scalar(k, v, global_step=rec["step"])
        parts = " ".join(
            f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in rec.items() if k not in ("t",))
        print(f"[metrics] {parts}", flush=True)

    def close(self):
        self._closed = True
        if self._f is not None:
            self._f.close()
        if self._tb is not None:
            self._tb.close()
            self._tb = None
        self._tb_dir = None   # a post-close log() must fail loudly, not
                              # spawn a fresh SummaryWriter
