"""Training observability: timestamped text log + CSV metrics table.

Parity with the reference's hand-rolled ``txt_*.log`` writer and
``Table`` CSV helper (/root/reference/src/agent.py:39-41,
src/utils.py:60-98) with the same metric key names, plus a step-timing
meter (imgs/sec) the reference lacks.
"""

from __future__ import annotations

import csv
import os
import time
from datetime import datetime
from typing import Dict, Optional


class TextLogger:
    def __init__(self, log_dir: str, prefix: str = "txt"):
        os.makedirs(log_dir, exist_ok=True)
        stamp = datetime.now().strftime("%Y%m%d-%H%M%S")
        self.path = os.path.join(log_dir, f"{prefix}_{stamp}.log")
        self._f = open(self.path, "a")

    def log(self, tag: str, step: int, metrics: Dict[str, float]):
        stamp = datetime.now().strftime("%Y-%m-%d %H:%M:%S")
        body = ", ".join(f"{k}:{float(v):.6f}" for k, v in metrics.items())
        self._f.write(f"[{stamp}] {tag} iter:{step} {body}\n")
        self._f.flush()

    def line(self, text: str):
        stamp = datetime.now().strftime("%Y-%m-%d %H:%M:%S")
        self._f.write(f"[{stamp}] {text}\n")
        self._f.flush()


class CsvTable:
    def __init__(self, filename: str):
        assert filename.endswith(".csv")
        self.filename = filename

    def write(self, row: Dict):
        exists = os.path.exists(self.filename)
        prev, headers = [], list(row.keys())
        if exists:
            with open(self.filename) as f:
                reader = csv.DictReader(f)
                old = reader.fieldnames or []
                prev = list(reader)
            headers = old if len(old) >= len(headers) else headers
        with open(self.filename, "w", newline="") as f:
            writer = csv.DictWriter(f, headers, extrasaction="ignore")
            writer.writeheader()
            writer.writerows(prev)
            writer.writerow(row)


class Throughput:
    """imgs/sec meter over a sliding window of steps."""

    def __init__(self, window: int = 50):
        self.window = window
        self._t: Optional[float] = None
        self._count = 0
        self.rate = 0.0

    def tick(self, n_images: int):
        now = time.perf_counter()
        if self._t is None:
            self._t = now
            self._count = 0
            return self.rate
        self._count += n_images
        dt = now - self._t
        if dt > 0 and self._count >= self.window:
            self.rate = self._count / dt
            self._t = now
            self._count = 0
        return self.rate
