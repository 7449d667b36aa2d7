"""Structured solver metrics / logging.

The reference's only observability is the ostream pretty-printer
(include/UserFunctions.h:54-57; SURVEY §5).  Here: a lightweight metrics
recorder for per-iteration solver statistics (cost, step size, KKT residual)
with JSONL export — host-side, fed from device arrays only at sync points so
it never blocks the XLA pipeline.
"""

from __future__ import annotations

import json
import time
from typing import Any, Dict, List, Optional

import numpy as np


class MetricsLogger:
    def __init__(self, name: str = "solver"):
        self.name = name
        self.records: List[Dict[str, Any]] = []
        self._t0 = time.perf_counter()

    def log(self, step: int, **metrics) -> None:
        rec = {"name": self.name, "step": step, "t": time.perf_counter() - self._t0}
        for k, v in metrics.items():
            if hasattr(v, "item"):
                v = np.asarray(v).item() if np.ndim(v) == 0 else np.asarray(v).tolist()
            rec[k] = v
        self.records.append(rec)

    def log_ilqr_result(self, step: int, result) -> None:
        """Record an ILQRResult's convergence trace."""
        trace = np.asarray(result.cost_trace)
        self.log(
            step,
            cost=float(np.min(trace[-1])) if trace.ndim else float(trace),
            cost_trace=trace.tolist() if trace.ndim == 1 else None,
            grad_norm=float(np.max(np.asarray(result.grad_norm))),
        )

    def summary(self) -> Dict[str, Any]:
        if not self.records:
            return {}
        last = self.records[-1]
        return {k: v for k, v in last.items() if k not in ("name", "t")}

    def dump_jsonl(self, path: str) -> None:
        with open(path, "w") as f:
            for rec in self.records:
                f.write(json.dumps(rec) + "\n")

    def __len__(self) -> int:
        return len(self.records)
