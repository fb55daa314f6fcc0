"""Structured metrics logging.

The reference logs with raw print() throughout (SURVEY.md §5). This module
provides a minimal JSONL metrics sink keeping the reference's metric names
(tokens_per_sec, est_kv_cache_mb_avg, rouge1_f, accuracy, ...) so results
stay machine-comparable across runs.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    """Append-only JSONL metrics log with wall-clock stamps."""

    def __init__(self, path: Optional[str] = None, echo: bool = False):
        self.path = path or os.environ.get("ELIT_METRICS_PATH")
        self.echo = echo
        self._records = []

    def log(self, record: dict) -> dict:
        rec = {"ts": time.time(), **record}
        self._records.append(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec, default=str) + "\n")
        if self.echo:
            print(json.dumps(rec, default=str))
        return rec

    @property
    def records(self):
        return list(self._records)


_global_logger: Optional[MetricsLogger] = None


def get_metrics_logger() -> MetricsLogger:
    global _global_logger
    if _global_logger is None:
        _global_logger = MetricsLogger()
    return _global_logger
