"""Observability utilities — parity with the reference's progress accounting
(progress.py:24-32: per-batch %, records/s, elapsed-vs-estimated) and
``human_readable`` duration formatting (utils.py:33-44).

In Spark, per-batch progress is the wrong abstraction (the engine owns task
scheduling); the equivalents are (a) streaming-query progress events and
(b) a simple stage timer for the batch pipeline. Both log records/s like the
reference does.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


def human_readable(seconds: float) -> str:
    """Format a duration as ``1d2h3m4s`` (reference utils.py:33-44 shape)."""
    seconds = int(seconds)
    d, rem = divmod(seconds, 86400)
    h, rem = divmod(rem, 3600)
    m, s = divmod(rem, 60)
    out = ""
    if d:
        out += f"{d}d"
    if h or d:
        out += f"{h}h"
    if m or h or d:
        out += f"{m}m"
    return out + f"{s}s"


@dataclass
class StageTimer:
    """records/s accounting per named pipeline stage."""

    log: callable = print
    _starts: dict = field(default_factory=dict)

    def start(self, stage: str) -> None:
        self._starts[stage] = time.time()

    def finish(self, stage: str, n_records: int | None = None) -> float:
        elapsed = time.time() - self._starts.pop(stage, time.time())
        rate = f", {n_records / max(elapsed, 1e-9):,.0f} records/s" if n_records else ""
        self.log(f"[{stage}] {human_readable(elapsed)}{rate}")
        return elapsed
