"""Named-span profiler with a cumulative timestamp stream.

Reference: profiler/profiler.py — named start/stop timers with optional
device sync, context managers, and a per-run cumulative timestamp stream
(every event name + perf_counter appended, :33-43) pickled to records/*.rec
for pipeline-bubble analysis. Here: same concepts, JSON output, and a hook
into jax.profiler for XLA-level traces (the TPU equivalent of their CUDA
event timing, stage_ea_model.py:469-472).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Optional

import jax


class Profiler:
    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self.stream: list[tuple[str, float]] = []   # (event, t) timestamps
        self.memory: dict[str, dict] = {}           # memory_context results
        self._t0 = time.perf_counter()
        self._open: dict[str, float] = {}

    def _now(self) -> float:
        return time.perf_counter() - self._t0

    def _maybe_sync(self, x=None):
        if self.sync:
            if x is not None:
                jax.block_until_ready(x)
            else:
                # effectively a device fence: a trivial transfer
                jax.device_get(jax.numpy.zeros(()))

    def start(self, name: str, sync_on=None):
        self._maybe_sync(sync_on)
        t = self._now()
        self._open[name] = t
        self.stream.append((f"{name}:start", t))

    def stop(self, name: str, sync_on=None):
        self._maybe_sync(sync_on)
        t = self._now()
        self.stream.append((f"{name}:stop", t))
        if name in self._open:
            self.totals[name] += t - self._open.pop(name)
            self.counts[name] += 1

    @contextlib.contextmanager
    def time_context(self, name: str, sync_on=None):
        """Ref: prof.time_context(...) guards saturating the pipeline code
        (e.g. stage_ea_model.py:1135,1154)."""
        self.start(name)
        try:
            yield
        finally:
            self.stop(name, sync_on=sync_on)

    def mark(self, name: str):
        """Append a bare event to the timestamp stream."""
        self.stream.append((name, self._now()))

    @contextlib.contextmanager
    def trace(self, log_dir: str):
        """XLA-level trace via jax.profiler (TensorBoard-compatible)."""
        jax.profiler.start_trace(log_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    # ---- device memory (ref memory_context/profile_context,
    # profiler/profiler.py:137-194: named sections record allocated/peak
    # deltas; their CUDA counters map to PJRT memory_stats) --------------
    @staticmethod
    def memory_stats(device=None) -> dict:
        """{'bytes_in_use', 'peak_bytes_in_use', 'bytes_limit'} for the
        device (zeros when the backend exposes no stats, e.g. CPU)."""
        d = device or jax.local_devices()[0]
        st = d.memory_stats() or {}
        return {"bytes_in_use": int(st.get("bytes_in_use", 0)),
                "peak_bytes_in_use": int(st.get("peak_bytes_in_use", 0)),
                "bytes_limit": int(st.get("bytes_limit", 0))}

    @contextlib.contextmanager
    def memory_context(self, name: str, device=None, sync_on=None):
        """Record the named section's allocated-bytes delta and the peak
        observed across it (OOM has been this repo's #1 hardware failure
        mode; see ROADMAP r1 #2). Results land in `self.memory[name]` as
        {'alloc_delta', 'peak', 'peak_is_new', 'count'} and the timestamp
        stream gets start/stop events like time_context.

        Caveat (advisor r3): PJRT exposes no per-section peak reset, so
        `peak` is the PROCESS-LIFETIME peak as of section exit (the
        reference's CUDA counters reset per section,
        profiler/profiler.py:137-194 — no PJRT equivalent exists).
        `peak_is_new` disambiguates: True means the peak ROSE during this
        section (so it was reached inside it); False means some earlier
        allocation still holds the high-water mark and the section's own
        peak is unknown, <= the reported value."""
        before = self.memory_stats(device)
        self.start(name)
        try:
            yield
        finally:
            self._maybe_sync(sync_on)
            self.stop(name)
            after = self.memory_stats(device)
            m = self.memory.setdefault(
                name, {"alloc_delta": 0, "peak": 0, "peak_is_new": False,
                       "count": 0})
            m["alloc_delta"] += (after["bytes_in_use"]
                                 - before["bytes_in_use"])
            m["peak"] = max(m["peak"], after["peak_bytes_in_use"])
            m["peak_is_new"] = bool(
                m["peak_is_new"] or after["peak_bytes_in_use"]
                > before["peak_bytes_in_use"])
            m["count"] += 1

    @contextlib.contextmanager
    def profile_context(self, name: str, device=None, sync_on=None):
        """time_context + memory_context in one (ref profile_context,
        profiler/profiler.py:196-220)."""
        with self.memory_context(name, device=device, sync_on=sync_on):
            yield

    def summary(self) -> dict:
        out = {name: {"total_s": round(self.totals[name], 6),
                      "count": self.counts[name],
                      "mean_ms": round(1e3 * self.totals[name]
                                       / max(self.counts[name], 1), 3)}
               for name in sorted(self.totals)}
        for name, m in self.memory.items():
            out.setdefault(name, {}).update(
                {"alloc_delta_mb": round(m["alloc_delta"] / 2 ** 20, 2),
                 "peak_mb": round(m["peak"] / 2 ** 20, 2),
                 # lifetime peak, not per-section (see memory_context)
                 "peak_is_new": m.get("peak_is_new", False)})
        return out

    def save(self, path: str):
        """Ref: save_as -> records/*.rec (profiler/profiler.py:14-16)."""
        with open(path, "w") as f:
            json.dump({"summary": self.summary(), "stream": self.stream}, f)

    def reset(self):
        self.totals.clear()
        self.counts.clear()
        self.stream.clear()
        self.memory.clear()
        self._open.clear()
        self._t0 = time.perf_counter()


# Module singleton mirroring the reference's `prof` (profiler/profiler.py:275)
# but opt-in: callers pass it explicitly; this instance is a convenience.
prof = Profiler(sync=False)
