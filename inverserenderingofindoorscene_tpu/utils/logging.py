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
    """``log()`` takes host floats (immediate).  ``log_device()`` takes
    the train step's DEVICE scalars and defers the device->host pull:
    each step's metrics are stacked into one tiny device vector (a
    device-side op — no sync), and every ``flush_steps`` steps ONE
    [flush_steps, K] transfer fetches them all, then the buffered per-step lines
    are written in order.  Rationale: per-step ``float(metrics)`` costs
    len(metrics) blocking pulls per step; on a host-attached link in a
    degraded window (~0.3 s/pull observed on this tunnel,
    scripts/bench_fed_step.py) that DOMINATES the train step.  Content
    is identical either way — flush_steps only batches the wire
    traffic and line writes."""

    def __init__(self, log_path: Optional[str] = None, window: int = 1000,
                 flush_steps: int = 1):
        self.history: Dict[str, list] = {}
        self.window = window
        self.flush_steps = max(1, int(flush_steps))
        self._pend: list = []
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

    _stack = None  # class-level jitted stacker, shared across loggers

    @classmethod
    def _stack_fn(cls):
        # Eager ops pay full per-op dispatch on a host-attached backend
        # (~1 s/op observed on the axon tunnel) — the stack must go
        # through jit.  One variadic jitted fn serves both the per-step
        # scalar stack ([K] vec) and the flush stack ([N, K] matrix);
        # each arity/shape specializes once.
        if cls._stack is None:
            import jax
            import jax.numpy as jnp

            cls._stack = jax.jit(lambda *vs: jnp.stack(
                [jnp.asarray(v, jnp.float32) for v in vs]))
        return cls._stack

    def log_device(self, epoch: int, step: int, metrics: Dict):
        """Buffered ``log()`` of device scalars (see class docstring)."""
        keys = sorted(metrics)
        vec = self._stack_fn()(*[metrics[k] for k in keys])
        self._pend.append((epoch, step, keys, vec))
        if len(self._pend) >= self.flush_steps:
            self.flush()

    def flush(self):
        if not self._pend:
            return
        import jax

        if all(p[2] == self._pend[0][2] for p in self._pend):
            rows = jax.device_get(
                self._stack_fn()(*[v for (_, _, _, v) in self._pend])
            )
        else:  # mixed key sets: fall back to per-step pulls
            rows = [jax.device_get(v) for (_, _, _, v) in self._pend]
        for (epoch, step, keys, _), row in zip(self._pend, rows):
            self.log(epoch, step,
                     dict(zip(keys, np.asarray(row).tolist())))
        self._pend = []

    def save_curves(self, out_dir: str, epoch: int):
        """Full error history as .npy (trainBRDF.py:386-389)."""
        self.flush()
        for k, h in self.history.items():
            np.save(osp.join(out_dir, f"{k}Error_{epoch}.npy"), np.array(h))

    def close(self):
        self.flush()
        if self.file:
            self.file.close()
