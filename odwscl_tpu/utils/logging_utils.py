"""Logger + windowed metric tracking.

Reference: wetectron/utils/logger.py (per-rank stream+file logger) and
utils/metric_logger.py:15-73 (SmoothedValue window-20 median/avg,
MetricLogger) + the tensorboard variant (:76-111), here writing JSONL
scalars instead of tensorboardX events (no TB dependency baked in).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from collections import defaultdict, deque
from typing import Optional


def setup_logger(name: str, save_dir: Optional[str] = None,
                 distributed_rank: int = 0, filename: str = "log.txt"):
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if logger.handlers:
        return logger
    if distributed_rank == 0:
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setLevel(logging.DEBUG)
        formatter = logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s: %(message)s")
        ch.setFormatter(formatter)
        logger.addHandler(ch)
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(save_dir, filename))
            fh.setLevel(logging.DEBUG)
            fh.setFormatter(formatter)
            logger.addHandler(fh)
    return logger


class SmoothedValue:
    """Window median/avg + global avg (metric_logger.py:15-44)."""

    def __init__(self, window_size: int = 20):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0

    def update(self, value):
        self.deque.append(value)
        self.count += 1
        self.total += value

    @property
    def median(self):
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self):
        return sum(self.deque) / max(len(self.deque), 1)

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {m.median:.4f} ({m.global_avg:.4f})"
            for name, m in self.meters.items())


class JsonlLogger(MetricLogger):
    """MetricLogger that also appends scalars to a JSONL file — the
    rebuild's replacement for TensorboardLogger (metric_logger.py:76-111)."""

    def __init__(self, log_dir: str, start_iter: int = 0, delimiter: str = "  "):
        super().__init__(delimiter)
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "scalars.jsonl")
        self.iteration = start_iter

    def update(self, **kwargs):
        super().update(**kwargs)
        self.iteration += 1
        rec = {"iteration": self.iteration, "time": time.time()}
        rec.update({k: float(v) for k, v in kwargs.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
