"""Windowed meters (utils/meter.py:17-92 equivalent)."""

from __future__ import annotations

from collections import defaultdict, deque

__all__ = ["AverageMeter", "MeterBuffer"]


class AverageMeter:
    def __init__(self, window: int = 50):
        self._window = deque(maxlen=window)
        self._total = 0.0
        self._count = 0

    def update(self, value):
        value = float(value)
        self._window.append(value)
        self._total += value
        self._count += 1

    @property
    def latest(self):
        return self._window[-1] if self._window else 0.0

    @property
    def avg(self):
        return sum(self._window) / max(len(self._window), 1)

    @property
    def global_avg(self):
        return self._total / max(self._count, 1)

    def reset(self):
        self._window.clear()
        self._total = 0.0
        self._count = 0


class MeterBuffer(defaultdict):
    def __init__(self, window: int = 50):
        super().__init__(lambda: AverageMeter(window))

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self[k].update(v)

    def get_filtered(self, substr: str):
        return {k: v for k, v in self.items() if substr in k}
