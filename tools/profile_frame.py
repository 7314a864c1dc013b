"""Per-stage compile-time + run-time profile of the interactive frame.

Usage: python tools/profile_frame.py [scale]
Prints one line per stage: compile seconds + per-frame milliseconds.
Writes nothing; paste results into docs/PROFILE.md.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def bench_fn(fn, args, frames=8):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(frames):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / frames * 1e3
    return compile_s, ms


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0 / 3.0
    from rtvb_tpu.core.config import Settings
    from rtvb_tpu.render.renderer import Engine
    from rtvb_tpu.render import pathtracer, postprocess
    from rtvb_tpu.render.denoiser import _denoise_jit, initial_denoiser_state
    from rtvb_tpu.render import restir as restir_mod
    from rtvb_tpu.ops import trace_kernel

    t0 = time.perf_counter()
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    settings = Settings().replace(rendering={
        "render_width": 1920, "render_height": 1080})
    eng = Engine(settings=settings, width=1920, height=1080, backend=backend)
    eng.set_render_scale(scale)
    print(f"engine init: {time.perf_counter() - t0:.1f}s  "
          f"internal {eng.width}x{eng.height}", flush=True)

    W, H = eng.width, eng.height
    world, tp, cfg = eng.world, eng._tp, eng.cfg

    # --- single trace wave (coherent, with meta) ---
    o = (jnp.full((H, W), 32.0), jnp.full((H, W), 40.0), jnp.full((H, W), 32.0))
    import numpy as np
    yy, xx = jnp.meshgrid(jnp.linspace(-0.4, 0.4, H), jnp.linspace(-0.6, 0.6, W),
                          indexing="ij")
    dn = jnp.sqrt(xx * xx + yy * yy + 1.0)
    d = (xx / dn, -jnp.abs(yy / dn) - 0.1, 1.0 / dn)

    def wave_meta(world, o, d):
        return trace_kernel.trace(o, d, world.colmask, world.df_super[0], tp,
                                  maxh_row=world.maxh_super[0],
                                  schema2d=world.schema,
                                  excmask2d=world.exc_mask)
    c, ms = bench_fn(jax.jit(wave_meta), (world, o, d))
    print(f"trace wave (meta, coherent): compile {c:.1f}s  run {ms:.2f}ms", flush=True)

    def wave_any(world, o, d):
        return trace_kernel.trace(o, d, world.colmask, world.df_super[0], tp,
                                  t_cap=jnp.full((H, W), 30.0), any_hit=True,
                                  maxh_row=world.maxh_super[0])
    c, ms = bench_fn(jax.jit(wave_any), (world, o, d))
    print(f"shadow wave (any-hit): compile {c:.1f}s  run {ms:.2f}ms", flush=True)

    # --- full PT (with ReSTIR) ---
    prev = restir_mod.initial_state(H, W)
    pt = eng._pt_fn()
    args = (eng.world, eng.materials, eng.lights, eng.sky_state, eng.camera,
            eng.history_camera, 0, prev, eng._light_remap, eng.entity_buffers())
    c, ms = bench_fn(pt, args)
    print(f"path trace (restir, full): compile {c:.1f}s  run {ms:.2f}ms", flush=True)
    g, _ = pt(*args)

    # --- denoise ---
    dstate = initial_denoiser_state(H, W)
    dn_cfg = eng.settings.denoising
    c, ms = bench_fn(lambda g, s: _denoise_jit(g, s, dn_cfg), (g, dstate))
    print(f"denoise: compile {c:.1f}s  run {ms:.2f}ms", flush=True)
    rgb, _ = _denoise_jit(g, dstate, dn_cfg)

    # --- post ---
    pstate = postprocess.initial_post_state()
    post = eng._post_fn()
    c, ms = bench_fn(post, (rgb, pstate, jnp.float32(1 / 60)))
    print(f"post (incl EASU to 1080p): compile {c:.1f}s  run {ms:.2f}ms", flush=True)

    # --- whole frame fn (what bench.py measures) ---
    t0 = time.perf_counter()
    jax.block_until_ready(eng.render_realtime_device())
    c = time.perf_counter() - t0
    jax.block_until_ready(eng.render_realtime_device())
    t0 = time.perf_counter()
    out = None
    for _ in range(8):
        out = eng.render_realtime_device()
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / 8 * 1e3
    print(f"WHOLE frame fn: compile {c:.1f}s  run {ms:.2f}ms", flush=True)


if __name__ == "__main__":
    main()
