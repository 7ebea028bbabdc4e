"""Task monitoring counters — dt-common/src/monitor/** parity.

The reference logs task status periodically to monitor.log (docs/en/monitor/
monitor.md): TIME-WINDOW counters hold per-event sub-counters inside a
sliding window (``counter_time_window_secs``) and aggregate as sum / avg /
avg_by_sec / max / max_by_sec; NO-WINDOW counters accumulate and report
``latest``. Components mirror the reference's: extractor (record_count,
data_bytes), pipeline (buffer/queue sizes, sink rt), sinker (records,
bytes, rt_per_batch).

These are driver-side task telemetry (metadata altitude, like the
reference's in-process ring buffers) — Spark's own executor metrics cover
the cluster layer; this covers the TASK layer users grep monitor.log for.
Clock is injected for determinism in tests.
"""

from __future__ import annotations

import time as _time
from collections import deque
from dataclasses import dataclass, field


@dataclass
class _Sub:
    ts: float
    value: float
    count: int = 1


class TimeWindowCounter:
    """Sliding-window counter: each ``add`` appends a sub-counter; expired
    sub-counters (older than ``window_secs``) are discarded lazily."""

    def __init__(self, window_secs: int = 60, clock=None):
        self.window_secs = window_secs
        self._clock = clock or _time.time
        self._subs: deque[_Sub] = deque()

    def add(self, value: float, count: int = 1, ts: float | None = None) -> None:
        self._subs.append(_Sub(self._clock() if ts is None else ts, float(value), count))

    def _trim(self) -> list[_Sub]:
        cutoff = self._clock() - self.window_secs
        while self._subs and self._subs[0].ts < cutoff:
            self._subs.popleft()
        return list(self._subs)

    def sum(self) -> float:
        return sum(s.value for s in self._trim())

    def count(self) -> int:
        return sum(s.count for s in self._trim())

    def avg(self) -> float:
        subs = self._trim()
        n = sum(s.count for s in subs)
        return (sum(s.value for s in subs) / n) if n else 0.0

    def avg_by_sec(self) -> float:
        return self.sum() / self.window_secs

    def max(self) -> float:
        subs = self._trim()
        return max((s.value for s in subs), default=0.0)

    def max_by_sec(self) -> float:
        """Largest per-second bucket sum inside the window."""
        buckets: dict[int, float] = {}
        for s in self._trim():
            buckets[int(s.ts)] = buckets.get(int(s.ts), 0.0) + s.value
        return max(buckets.values(), default=0.0)


class NoWindowCounter:
    """Accumulating counter; reports ``latest`` (the running total)."""

    def __init__(self) -> None:
        self._value = 0.0

    def add(self, value: float) -> None:
        self._value += float(value)

    def latest(self) -> float:
        return self._value


# counter name -> (kind, aggregations logged) — the reference's inventory
COUNTERS = {
    "extractor": {
        "record_count": ("window", ("avg_by_sec", "sum", "max_by_sec")),
        "data_bytes": ("window", ("avg_by_sec", "sum", "max_by_sec")),
        "extracted_record_count": ("window", ("avg_by_sec", "sum", "max_by_sec")),
    },
    "pipeline": {
        "buffer_size": ("window", ("avg", "max")),
        "sink_queue_size": ("window", ("avg", "max")),
    },
    "sinker": {
        "record_count": ("window", ("avg_by_sec", "sum", "max_by_sec")),
        "data_bytes": ("window", ("avg_by_sec", "sum", "max_by_sec")),
        "rt_per_batch_us": ("window", ("avg", "max")),
        "synced_record_count": ("no_window", ("latest",)),
    },
}


@dataclass
class Monitor:
    """Registry of task counters + monitor.log-style formatting.

    ``add(component, counter, value)`` auto-creates counters (window kind
    from COUNTERS, defaulting to time-window); ``log_lines()`` renders the
    reference's ``<component> | <counter> | agg=value`` lines.
    """

    window_secs: int = 60
    clock: object = None
    _counters: dict = field(default_factory=dict)

    def _get(self, component: str, counter: str):
        key = (component, counter)
        if key not in self._counters:
            kind, aggs = COUNTERS.get(component, {}).get(
                counter, ("window", ("avg_by_sec", "sum", "max_by_sec"))
            )
            c = (
                NoWindowCounter()
                if kind == "no_window"
                else TimeWindowCounter(self.window_secs, clock=self.clock)
            )
            self._counters[key] = (c, aggs)
        return self._counters[key]

    def add(self, component: str, counter: str, value: float, count: int = 1, ts: float | None = None) -> None:
        c, _ = self._get(component, counter)
        if isinstance(c, NoWindowCounter):
            c.add(value)
        else:
            c.add(value, count, ts)

    def log_lines(self) -> list[str]:
        out = []
        for (component, counter), (c, aggs) in sorted(self._counters.items()):
            rendered = " | ".join(f"{a}={getattr(c, a)():g}" for a in aggs)
            out.append(f"{component} | {counter} | {rendered}")
        return out

    def prometheus_lines(self) -> list[str]:
        """Prometheus exposition format (docs/en/monitor/monitor.md exposes
        the same counters as metrics): one gauge per (component, counter,
        aggregation)."""
        out = []
        for (component, counter), (c, aggs) in sorted(self._counters.items()):
            name = f"ape_dts_{component}_{counter}"
            for a in aggs:
                out.append(f'{name}{{aggregation="{a}"}} {getattr(c, a)():g}')
        return out
