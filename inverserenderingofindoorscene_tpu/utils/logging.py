"""Training observability: screen/file loss logging + rolling means.

The reference logs every loss to screen and a per-epoch text file and keeps
rolling-1000-step means (/root/reference/trainBRDF.py:296-331, utils.py:18-61).
``MetricLogger`` replicates that contract (accumulated numpy history,
rolling-window means, error-curve .npy dumps) without torch tensors.
"""

from __future__ import annotations

import os.path as osp
from typing import Dict, Optional

import numpy as np


class MetricLogger:
    def __init__(self, log_path: Optional[str] = None, window: int = 1000):
        self.history: Dict[str, list] = {}
        self.window = window
        self.file = open(log_path, "a") if log_path else None

    def append(self, metrics: Dict[str, float]):
        for k, v in metrics.items():
            self.history.setdefault(k, []).append(float(v))

    def rolling_mean(self, key: str) -> float:
        h = self.history.get(key, [])
        return float(np.mean(h[-self.window :])) if h else float("nan")

    def log(self, epoch: int, step: int, metrics: Dict[str, float]):
        self.append(metrics)
        parts = []
        for k in sorted(metrics):
            parts.append(
                f"{k} {metrics[k]:.6f} (avg {self.rolling_mean(k):.6f})"
            )
        line = f"[{epoch}/{step}] " + " | ".join(parts)
        print(line)
        if self.file:
            self.file.write(line + "\n")
            self.file.flush()

    def save_curves(self, out_dir: str, epoch: int):
        """Full error history as .npy (trainBRDF.py:386-389)."""
        for k, h in self.history.items():
            np.save(osp.join(out_dir, f"{k}Error_{epoch}.npy"), np.array(h))

    def close(self):
        if self.file:
            self.file.close()
