"""Throughput throttling (O5, throttle/throttle.go:21-60).

The reference computes sleep advice from sliding-window IOPS/MBs
measurements because it hand-schedules row pumping.  Spark throttles
declaratively: the knobs below translate a target rate into the source
options that bound each micro-batch / scan task.  The sliding-window
estimator is kept (useful for adaptive jobs that retune triggers from
observed progress — see streaming.monitor)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class ThrottleConfig:
    """Targets, 0 = unlimited (config/config.go:153-154 defaults)."""

    target_mb_per_sec: float = 0.0
    target_iops: float = 0.0  # events/sec for streams, rows/sec for scans


def source_options(cfg: ThrottleConfig, trigger_interval_sec: float = 1.0,
                   avg_event_bytes: int = 512,
                   avg_file_bytes: int = 128 << 20) -> dict:
    """Translate rate targets into Spark source options:

    - Kafka:     maxOffsetsPerTrigger = events per trigger
    - file src:  maxFilesPerTrigger
    - JDBC scan: fetchsize (per round trip)
    """
    out: dict[str, str] = {}
    if cfg.target_iops:
        out["maxOffsetsPerTrigger"] = str(max(1, int(cfg.target_iops * trigger_interval_sec)))
        out["fetchsize"] = str(max(1, min(int(cfg.target_iops), 100_000)))
    if cfg.target_mb_per_sec:
        bytes_per_trigger = cfg.target_mb_per_sec * 1e6 * trigger_interval_sec
        out["maxFilesPerTrigger"] = str(max(1, int(bytes_per_trigger // avg_file_bytes)))
        events = int(bytes_per_trigger // avg_event_bytes)
        prev = int(out.get("maxOffsetsPerTrigger", str(1 << 62)))
        out["maxOffsetsPerTrigger"] = str(max(1, min(prev, events)))
    return out


class SlidingWindowRate:
    """3-sample × 1s sliding-window rate estimator
    (throttle/throttle.go:21-60) — returns sleep advice given observed
    counts; used by adaptive drivers to retune trigger intervals."""

    def __init__(self, target_per_sec: float, samples: int = 3,
                 interval_sec: float = 1.0):
        self.target = target_per_sec
        self.samples = samples
        self.interval = interval_sec
        self._window: list[tuple[float, float]] = []

    def advice(self, observed: float, now: float) -> float:
        """Record an observation (count since last call); return seconds
        to sleep so the windowed average meets the target."""
        self._window.append((now, observed))
        cutoff = now - self.samples * self.interval
        self._window = [(t, c) for (t, c) in self._window if t >= cutoff]
        if not self.target or len(self._window) < 2:
            return 0.0
        span = self._window[-1][0] - self._window[0][0]
        total = sum(c for _, c in self._window[1:])
        if span <= 0:
            return 0.0
        rate = total / span
        if rate <= self.target:
            return 0.0
        # sleep long enough that the window average drops to target
        return min(total / self.target - span, self.samples * self.interval)
