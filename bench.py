"""Benchmark: 1080p 1-spp path trace + denoise + post on one TPU chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: BASELINE.md north star — ≤16 ms/frame at 1920×1080 (reference
RTX 4090 measurements span 5.2–44 ms at 1080p/4K).  vs_baseline is
16.0 / value — >1.0 means faster than the target.
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))

import jax

jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def main() -> int:
    width, height = 1920, 1080
    frames = int(os.environ.get("BENCH_FRAMES", "8"))

    from rtvb_tpu.core.config import Settings
    from rtvb_tpu.render.renderer import Engine

    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    settings = Settings().replace(rendering={
        "render_width": width, "render_height": height})
    eng = Engine(settings=settings, width=width, height=height, backend=backend)

    # warmup/compile; timing endpoint = device-resident display buffer
    # (matches the reference: frames never leave the GPU, Backend.cpp:454-485)
    jax.block_until_ready(eng.render_realtime_device())
    jax.block_until_ready(eng.render_realtime_device())

    t0 = time.perf_counter()
    out = None
    for _ in range(frames):
        out = eng.render_realtime_device()
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / frames * 1e3

    result = {
        "metric": "frame_ms_1080p_1spp_denoise",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(16.0 / ms, 4),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
