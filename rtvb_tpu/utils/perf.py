"""Per-frame pipeline-stage timing + run-summary report ledger.

Capability parity with renderer/util/PerformanceTracker.h:36-120 (named
start/end CPU timers around pipeline stages, mean/stddev aggregation, rows
appended to data/perf/performance_report.txt) and Timer.h's frame timer/FPS
limiter.  TPU adaptation: segment ends call jax.block_until_ready on the
stage outputs they wrap, so wall time includes device execution.
"""
from __future__ import annotations

import os
import time
from collections import OrderedDict
from contextlib import contextmanager

import jax

STAGES = ("scenePrep", "rendererUpdate", "pathTracing", "denoiser", "postProcessing")


class PerformanceTracker:
    def __init__(self):
        self._frames: list[OrderedDict] = []
        self._current: OrderedDict | None = None
        self._t0 = 0.0

    def begin_frame(self):
        self._current = OrderedDict()
        self._t0 = time.perf_counter()

    @contextmanager
    def segment(self, name: str, sync=None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self._current[name] = (time.perf_counter() - start) * 1e3

    def timed(self, name: str, fn, *args, **kwargs):
        """Run fn, block on its outputs, record the ms."""
        start = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self._current[name] = (time.perf_counter() - start) * 1e3
        return out

    def end_frame(self):
        self._current["wholeFrame"] = (time.perf_counter() - self._t0) * 1e3
        self._frames.append(self._current)
        self._current = None

    # ---- aggregation ----

    def stats(self, skip_first: int = 1):
        frames = self._frames[skip_first:] if len(self._frames) > skip_first else self._frames
        if not frames:
            return {}
        keys = OrderedDict()
        for f in frames:
            for k in f:
                keys[k] = None
        out = {}
        for k in keys:
            vals = [f[k] for f in frames if k in f]
            mean = sum(vals) / len(vals)
            var = sum((v - mean) ** 2 for v in vals) / len(vals)
            out[k] = (mean, var ** 0.5)
        return out

    def summary_row(self, label: str) -> str:
        st = self.stats()
        whole = st.get("wholeFrame", (0.0, 0.0))
        cols = [f"{label}", f"WholeFrame {whole[0]:8.2f} ms (±{whole[1]:.2f})"]
        for k, (mean, _) in st.items():
            if k != "wholeFrame":
                cols.append(f"{k} {mean:7.2f}")
        return " | ".join(cols)

    def save_report(self, path: str, label: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        stamp = time.strftime("%Y-%m-%d %H:%M")
        with open(path, "a") as f:
            f.write(f"{stamp} {self.summary_row(label)}\n")


class FrameTimer:
    """Frame pacing with optional FPS limiter (Timer.h:14-95)."""

    def __init__(self, target_fps: float | None = None):
        self.target_fps = target_fps
        self._last = time.perf_counter()
        self.dt = 1.0 / 60.0
        self.fps = 60.0

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self._last
        if self.target_fps:
            budget = 1.0 / self.target_fps
            if dt < budget:
                time.sleep(budget - dt)
                now = time.perf_counter()
                dt = now - self._last
        self._last = now
        self.dt = dt
        self.fps = 0.9 * self.fps + 0.1 * (1.0 / max(dt, 1e-6))
        return dt
