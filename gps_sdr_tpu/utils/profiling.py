"""Profiling and throughput observability.

The reference's only performance surface is a wall-clock print and a
skipped-block counter in the GUI (SURVEY.md section 5: gpsrecv.py:554,
gpsui.py:409-410).  Here throughput is first-class: a RateMeter tracks
samples/s and the real-time factor over a sliding window, and `trace()`
wraps jax.profiler for device timeline captures viewable in
TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import deque
from dataclasses import dataclass, field


@dataclass
class RateMeter:
    """Sliding-window samples/s + real-time-factor meter."""

    sample_rate: float                 # stream samples per stream second
    window_sec: float = 10.0
    _events: deque = field(default_factory=deque)   # (wall_t, n_samples)
    total_samples: int = 0
    t0: float | None = None

    def add(self, n_samples: int) -> None:
        now = time.perf_counter()
        if self.t0 is None:
            self.t0 = now
        self.total_samples += n_samples
        self._events.append((now, n_samples))
        cutoff = now - self.window_sec
        while self._events and self._events[0][0] < cutoff:
            self._events.popleft()

    @property
    def samples_per_sec(self) -> float:
        if len(self._events) < 2:
            return 0.0
        span = self._events[-1][0] - self._events[0][0]
        n = sum(e[1] for e in self._events) - self._events[0][1]
        return n / span if span > 0 else 0.0

    @property
    def realtime_factor(self) -> float:
        """Processing speed relative to the stream's own rate."""
        return self.samples_per_sec / self.sample_rate

    def summary(self) -> dict:
        wall = (time.perf_counter() - self.t0) if self.t0 else 0.0
        return {
            "total_samples": self.total_samples,
            "wall_sec": round(wall, 3),
            "mean_rtf": round(
                self.total_samples / self.sample_rate / wall, 2)
            if wall > 0 else 0.0,
            "window_rtf": round(self.realtime_factor, 2),
            "window_msamples_per_sec": round(
                self.samples_per_sec / 1e6, 2),
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device/host profile into `log_dir` (open with
    TensorBoard's profile plugin or Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_compile_cache(path: str | None = None) -> None:
    """Point JAX's persistent compilation cache at the repo-local
    .jax_cache (compiles through the deployment relay take tens of
    seconds; the cache makes repeat runs start instantly).  Safe to
    call multiple times; tests/conftest.py does the same for pytest."""
    import os

    import jax

    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def device_time_from_trace(log_dir: str) -> dict:
    """Parse the newest jax.profiler trace under `log_dir` and return
    device-side timing that is immune to tunnel/host noise:

      {"busy_s":  sum of device-op durations (device compute time),
       "span_s":  last device-op end - first start (includes gaps),
       "n_ops":   device events counted}

    The Perfetto JSON maps pid -> process name via process_name
    metadata; device lanes are the processes whose name contains
    "TPU"/"GPU"/"/device:".  Wall timings through the deployment tunnel
    swing +-60 ms run to run (CLAUDE.md), so any optimization claim
    below that noise floor must come from here.
    """
    import glob
    import gzip
    import json as _json

    paths = sorted(glob.glob(os.path.join(
        log_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(paths[-1], "rt") as f:
        doc = _json.load(f)
    events = doc["traceEvents"]
    dev_pids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "GPU" in name or "/device:" in name:
                dev_pids.add(ev["pid"])
    backend = "device"
    if not dev_pids:
        # CPU backend: XLA ops land on the /host:CPU lane (no separate
        # device process) — use it so the parser still works in CPU
        # smoke runs, and say so
        backend = "host"
        for ev in events:
            if (ev.get("ph") == "M" and ev.get("name") == "process_name"
                    and "/host:CPU" in ev.get("args", {}).get("name", "")):
                dev_pids.add(ev["pid"])
    # a device pid carries several lanes (tids) and nested events
    # (e.g. a scan's `while` wrapper encloses its per-iteration ops on
    # the same lane) — plain duration sums double-count both ways.
    # Busy time is therefore the INTERVAL UNION per lane, and the
    # busiest lane is reported as the compute time.
    lane_iv: dict = {}
    t0, t1 = None, None
    n = 0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        ts, dur = ev.get("ts"), ev.get("dur")
        if ts is None or dur is None:
            continue
        lane_iv.setdefault((ev.get("pid"), ev.get("tid")),
                           []).append((ts, ts + dur))
        t0 = ts if t0 is None else min(t0, ts)
        t1 = (ts + dur) if t1 is None else max(t1, ts + dur)
        n += 1

    def union(iv):
        iv.sort()
        tot, cur0, cur1 = 0.0, None, None
        for a, b in iv:
            if cur1 is None or a > cur1:
                if cur1 is not None:
                    tot += cur1 - cur0
                cur0, cur1 = a, b
            else:
                cur1 = max(cur1, b)
        if cur1 is not None:
            tot += cur1 - cur0
        return tot

    lane_busy = {k: union(v) for k, v in lane_iv.items()}
    busy = max(lane_busy.values()) if lane_busy else 0.0
    return {"busy_s": busy / 1e6,
            "busy_all_lanes_s": sum(lane_busy.values()) / 1e6,
            "span_s": ((t1 - t0) / 1e6 if t0 is not None else 0.0),
            "n_ops": n, "n_lanes": len(lane_busy), "lane": backend}


def op_breakdown_from_trace(log_dir: str, top: int = 20) -> list:
    """Per-op device-time totals from the busiest device lane of the
    newest trace under `log_dir`: [(op_name, total_s, count), ...]
    sorted by total time.  The op names are XLA/Mosaic fusion labels —
    coarse, but enough to attribute block time to wipeoff / DFT /
    cheap-stage buckets for the roofline."""
    import glob
    import gzip
    import json as _json
    from collections import defaultdict

    paths = sorted(glob.glob(os.path.join(
        log_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(paths[-1], "rt") as f:
        doc = _json.load(f)
    events = doc["traceEvents"]
    dev_pids = set()
    host_pids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "GPU" in name or "/device:" in name:
                dev_pids.add(ev["pid"])
            elif "/host:CPU" in name:
                host_pids.add(ev["pid"])
    if not dev_pids:
        dev_pids = host_pids          # CPU backend fallback only
    lane_busy: dict = {}
    for ev in events:
        if ev.get("ph") == "X" and ev.get("pid") in dev_pids \
                and ev.get("dur") is not None:
            key = (ev["pid"], ev.get("tid"))
            lane_busy[key] = lane_busy.get(key, 0.0) + ev["dur"]
    if not lane_busy:
        return []
    best = max(lane_busy, key=lane_busy.get)
    ops = defaultdict(lambda: [0.0, 0])
    for ev in events:
        if (ev.get("ph") == "X" and (ev.get("pid"), ev.get("tid")) == best
                and ev.get("dur") is not None):
            o = ops[ev.get("name", "?")]
            o[0] += ev["dur"] / 1e6
            o[1] += 1
    out = sorted(((k, v[0], v[1]) for k, v in ops.items()),
                 key=lambda x: -x[1])
    return out[:top]
