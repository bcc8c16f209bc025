"""Metrics logging: console + JSONL + optional TensorBoard.

Replaces the reference's tensorboardX/wandb plumbing (run.py:344-353,
common_agent.py:186-194 performance counters, utils/logger.py) with a single
dependency-light logger. Per-epoch wall-clock segment timers mirror
play_time/update_time/total_fps (amp_continuous.py:224-306).
"""
from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, out_dir: Optional[str] = None, name: str = "run",
                 print_every: int = 1, use_tensorboard: bool = True):
        self.out_dir = out_dir
        self.print_every = print_every
        self._fh = None
        self._tb = None
        self._t0 = time.perf_counter()
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self._fh = open(os.path.join(out_dir, f"{name}.metrics.jsonl"),
                            "a")
            if use_tensorboard:
                # dependency-free native event writer (utils/tracking.py) —
                # any TensorBoard install can tail out_dir/tb
                from .tracking import TBWriter
                self._tb = TBWriter(os.path.join(out_dir, "tb"),
                                    filename_suffix=f".{name}")

    def log(self, step: int, metrics: dict, prefix: str = ""):
        row = {("%s%s" % (prefix, k)): (float(v) if hasattr(v, "__float__")
                                        else v)
               for k, v in metrics.items()}
        row["step"] = step
        row["wall_s"] = round(time.perf_counter() - self._t0, 2)
        if self._fh:
            self._fh.write(json.dumps(row) + "\n")
            self._fh.flush()
        if self._tb:
            self._tb.scalars(step, {k: v for k, v in row.items()
                                    if isinstance(v, float)})
        if step % self.print_every == 0:
            pretty = " ".join(f"{k}={v:.4g}" for k, v in row.items()
                              if isinstance(v, float) and k not in
                              ("step", "wall_s"))
            print(f"[{step}] {pretty}", file=sys.stderr)

    def close(self):
        if self._fh:
            self._fh.close()
        if self._tb:
            self._tb.close()


class SegmentTimer:
    """play_time/update_time style segment timing (amp_continuous.py:224+)."""

    def __init__(self):
        self.totals = {}
        self._start = {}

    def start(self, name):
        self._start[name] = time.perf_counter()

    def stop(self, name):
        dt = time.perf_counter() - self._start.pop(name)
        self.totals[name] = self.totals.get(name, 0.0) + dt
        return dt
