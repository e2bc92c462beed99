"""Metrics: EventStorage scalar store + console/JSON/TensorBoard writers.

Parity target: detectron2 EventStorage / CommonMetricPrinter / JSONWriter /
TensorboardXWriter (reference: detectron2/detectron2/utils/events.py:50-274).
The JSON writer emits one line per flush into metrics.json with the median of
each scalar over its window, like the reference.
"""
from __future__ import annotations

import datetime
import json
import logging
import os
import time
from collections import defaultdict, deque
from contextlib import contextmanager
from typing import Dict, Optional

logger = logging.getLogger(__name__)

_CURRENT_STORAGE_STACK = []


def get_event_storage() -> "EventStorage":
    assert _CURRENT_STORAGE_STACK, "get_event_storage() called outside a storage context"
    return _CURRENT_STORAGE_STACK[-1]


class HistoryBuffer:
    def __init__(self, window: int = 20):
        self._values = deque(maxlen=window)
        self._global_avg_total = 0.0
        self._count = 0
        self.latest = None

    def update(self, value: float):
        self._values.append(value)
        self._global_avg_total += value
        self._count += 1
        self.latest = value

    def median(self) -> float:
        vals = sorted(self._values)
        return vals[len(vals) // 2] if vals else 0.0

    def avg(self) -> float:
        return sum(self._values) / max(len(self._values), 1)

    def global_avg(self) -> float:
        return self._global_avg_total / max(self._count, 1)


class EventStorage:
    def __init__(self, start_iter: int = 0, window: int = 20):
        self.iter = start_iter
        self._window = window
        self._history: Dict[str, HistoryBuffer] = defaultdict(lambda: HistoryBuffer(window))
        self._smoothing_hints: Dict[str, bool] = {}
        self._latest_iter: Dict[str, int] = {}

    def put_scalar(self, name: str, value, smoothing_hint: bool = True):
        self._history[name].update(float(value))
        self._smoothing_hints[name] = smoothing_hint
        self._latest_iter[name] = self.iter

    def put_scalars(self, *, smoothing_hint: bool = True, **kwargs):
        for k, v in kwargs.items():
            self.put_scalar(k, v, smoothing_hint)

    def histories(self):
        return self._history

    def latest(self):
        return {k: (h.latest, self._latest_iter[k]) for k, h in self._history.items()}

    def latest_with_smoothing(self):
        out = {}
        for k, h in self._history.items():
            v = h.median() if self._smoothing_hints.get(k, True) else h.latest
            out[k] = (v, self._latest_iter[k])
        return out

    def step(self):
        self.iter += 1

    def __enter__(self):
        _CURRENT_STORAGE_STACK.append(self)
        return self

    def __exit__(self, *args):
        assert _CURRENT_STORAGE_STACK[-1] is self
        _CURRENT_STORAGE_STACK.pop()


class EventWriter:
    def write(self, storage: EventStorage):
        raise NotImplementedError

    def close(self):
        pass


class CommonMetricPrinter(EventWriter):
    def __init__(self, max_iter: Optional[int] = None):
        self._max_iter = max_iter
        self._last_write = None

    def write(self, storage: EventStorage):
        it = storage.iter
        latest = storage.latest_with_smoothing()
        data_time = latest.get("data_time", (None,))[0]
        step_time = latest.get("time", (None,))[0]
        lr = latest.get("lr", (None,))[0]
        eta = ""
        if self._max_iter and step_time:
            eta_sec = step_time * (self._max_iter - it)
            eta = f"eta: {datetime.timedelta(seconds=int(eta_sec))}  "
        losses = "  ".join(
            f"{k}: {v:.4g}" for k, (v, _) in latest.items() if "loss" in k
        )
        msg = f"{eta}iter: {it}  {losses}"
        if step_time is not None:
            msg += f"  time: {step_time:.4f}"
        if data_time is not None:
            msg += f"  data_time: {data_time:.4f}"
        if lr is not None:
            msg += f"  lr: {lr:.6g}"
        logger.info(msg)


class JSONWriter(EventWriter):
    def __init__(self, json_file: str, window_size: int = 20):
        os.makedirs(os.path.dirname(json_file) or ".", exist_ok=True)
        self._file = open(json_file, "a")

    def write(self, storage: EventStorage):
        to_save = defaultdict(dict)
        for k, (v, it) in storage.latest_with_smoothing().items():
            to_save[it + 1][k] = v
        for it, scalars in to_save.items():
            scalars["iteration"] = it
            self._file.write(json.dumps(scalars, sort_keys=True) + "\n")
        self._file.flush()

    def close(self):
        self._file.close()


class TensorboardWriter(EventWriter):
    """Lazy tensorboardX/tensorboard writer; no-op if neither is installed."""

    def __init__(self, log_dir: str):
        self._writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # torch cpu is available

            self._writer = SummaryWriter(log_dir)
        except Exception:
            logger.warning("tensorboard unavailable; TensorboardWriter is a no-op")

    def write(self, storage: EventStorage):
        if self._writer is None:
            return
        for k, (v, it) in storage.latest_with_smoothing().items():
            self._writer.add_scalar(k, v, it)

    def close(self):
        if self._writer is not None:
            self._writer.close()
