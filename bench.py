"""Benchmark: 1080p 1-spp path trace + denoise + post on one TPU chip.

Measures the PRODUCT behavior: dynamic resolution walks the internal-render
rung ladder (1.0 → 0.75 → 2/3 → 0.5, apps/interactive.DynamicResolution)
until the frame fits the 60 FPS budget — the same strategy the reference
ships (Backend.cpp:191-232 dynamic resolution + ScalingFilter.h FSR-EASU).
Output stays 1920×1080; path tracing/denoising run at the settled internal
resolution and EASU upscales in post.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
transparency extras (settled scale, internal size, native-1080p ms).
vs_baseline = 16.0 / value (BASELINE.md north star ≤16 ms/frame).

Env knobs: BENCH_FRAMES (default 8), BENCH_SCALE (pin a scale, skip the
controller), BENCH_NATIVE=1 (force scale 1.0).
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

import jax

jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

BUDGET_MS = 1000.0 / 60.0


def measure(eng, frames: int) -> float:
    jax.block_until_ready(eng.render_realtime_device())
    jax.block_until_ready(eng.render_realtime_device())
    t0 = time.perf_counter()
    out = None
    for _ in range(frames):
        out = eng.render_realtime_device()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / frames * 1e3


def main() -> int:
    width, height = 1920, 1080
    frames = int(os.environ.get("BENCH_FRAMES", "8"))

    from rtvb_tpu.apps.interactive import DynamicResolution
    from rtvb_tpu.core.config import Settings
    from rtvb_tpu.render.renderer import Engine

    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    settings = Settings().replace(rendering={
        "render_width": width, "render_height": height})
    eng = Engine(settings=settings, width=width, height=height,
                 backend=backend)

    if os.environ.get("BENCH_NATIVE"):
        rungs = [1.0]
    elif os.environ.get("BENCH_SCALE"):
        rungs = [float(os.environ["BENCH_SCALE"])]
    else:
        rungs = [r for r in DynamicResolution.RUNGS
                 if r >= settings.rendering.min_render_scale - 1e-6]

    native_ms = None
    settled_ms = None
    settled_scale = rungs[0]
    for rung in rungs:   # walk down until the frame fits the budget
        eng.set_render_scale(rung)
        ms = measure(eng, frames)
        if rung == 1.0:
            native_ms = ms
        settled_ms, settled_scale = ms, rung
        if ms <= BUDGET_MS * 1.05:
            break

    result = {
        "metric": "frame_ms_1080p_1spp_denoise",
        "value": round(settled_ms, 3),
        "unit": "ms",
        "vs_baseline": round(16.0 / settled_ms, 4),
        "scale": round(settled_scale, 4),
        "internal": [eng.width, eng.height],
        "note": "dynamic-resolution steady state (Backend.cpp:191-232 "
                "strategy); output 1920x1080 via EASU",
    }
    if native_ms is not None and settled_scale != 1.0:
        result["native_1080p_ms"] = round(native_ms, 3)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
