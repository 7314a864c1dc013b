"""Ablation profile of the path-trace stage: compile PT variants with one
feature removed each and report the per-frame ms delta vs the full config.

Usage: python tools/ablate_pt.py [scale] [variant...]
Variants: full norestir noent b2 b1 notex nosky norng
(default: all). Each variant costs one PT compile (~1-2 min on this host).
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
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(frames):
        out = fn(*args)
    jax.block_until_ready(out)
    return compile_s, (time.perf_counter() - t0) / frames * 1e3


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0 / 3.0
    want = sys.argv[2:] or ["full", "norestir", "noent", "b2", "b1",
                            "notex", "nosky"]
    import dataclasses as dc
    from rtvb_tpu.core.config import Settings
    from rtvb_tpu.render.renderer import Engine
    from rtvb_tpu.render import pathtracer, restir as restir_mod
    from rtvb_tpu.render import sky as sky_mod
    from rtvb_tpu.assets import textures
    from rtvb_tpu.ops import trace_kernel, dda

    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    eng = Engine(settings=Settings().replace(rendering={
        "render_width": 1920, "render_height": 1080}),
        width=1920, height=1080, backend=backend)
    eng.set_render_scale(scale)
    W, H = eng.width, eng.height
    print(f"internal {W}x{H}, lights={eng._n_lights}", flush=True)
    tp, cfg = eng._tp, eng.cfg
    use_pallas = backend == "pallas"

    prev = restir_mod.initial_state(H, W)
    ent = eng.entity_buffers()

    def make_pt(rs_cfg, use_restir=True, use_ent=True):
        def run(world, mats, lights, sky_state, cam, hist_cam, frame_idx,
                prev_restir, light_remap, ent):
            def trace_fn(o, d, t_cap=None, any_hit=False):
                impl = trace_kernel.trace if use_pallas else dda.trace
                kw = {}
                if use_pallas and not any_hit:
                    kw = dict(mat_tables=trace_kernel.build_mat_tables(world, mats))
                return impl(o, d, world.colmask, world.df_super[0], tp,
                            t_cap=t_cap, any_hit=any_hit,
                            maxh_row=world.maxh_super[0], **kw)
            return pathtracer.render_frame(
                cfg, world, mats, lights, sky_state, cam, hist_cam,
                frame_idx, W, H, rs_cfg, trace_fn,
                prev_restir=prev_restir if use_restir else None,
                light_remap=light_remap,
                entities=ent if use_ent else None)
        return jax.jit(run)

    base_cfg = dc.replace(eng.settings.rendering,
                          local_light_candidates=eng._n_local)
    args = (eng.world, eng.materials, eng.lights, eng.sky_state, eng.camera,
            eng.history_camera, 0, prev, eng._light_remap, ent)

    results = {}

    def report(name, c, ms):
        results[name] = ms
        d = f"  (-{results['full'] - ms:.1f} vs full)" if "full" in results \
            and name != "full" else ""
        print(f"{name:10s} compile {c:6.1f}s  run {ms:7.2f}ms{d}", flush=True)

    if "full" in want:
        c, ms = bench_fn(make_pt(base_cfg), args)
        report("full", c, ms)
    if "norestir" in want:
        c, ms = bench_fn(make_pt(base_cfg, use_restir=False), args)
        report("norestir", c, ms)
    if "noent" in want:
        c, ms = bench_fn(make_pt(base_cfg, use_ent=False), args)
        report("noent", c, ms)
    if "nolocal" in want:
        c, ms = bench_fn(make_pt(dc.replace(base_cfg, local_light_candidates=0)), args)
        report("nolocal", c, ms)
    if "loc2" in want:
        c, ms = bench_fn(make_pt(dc.replace(base_cfg, local_light_candidates=2)), args)
        report("loc2", c, ms)
    if "b2" in want:
        c, ms = bench_fn(make_pt(dc.replace(base_cfg, total_bounce_limit=2)), args)
        report("b2", c, ms)
    if "b1" in want:
        c, ms = bench_fn(make_pt(dc.replace(base_cfg, total_bounce_limit=1)), args)
        report("b1", c, ms)
    if "notex" in want:
        saved = (textures.sample_scale, textures.sample_normal_delta)
        textures.sample_scale = lambda tid, u, v, lod: jnp.ones_like(u)
        textures.sample_normal_delta = \
            lambda tid, u, v, lod: (jnp.zeros_like(u), jnp.zeros_like(u))
        try:
            c, ms = bench_fn(make_pt(base_cfg), args)
            report("notex", c, ms)
        finally:
            textures.sample_scale, textures.sample_normal_delta = saved
    if "nosky" in want:
        saved = sky_mod.sky_radiance
        sky_mod.sky_radiance = lambda d, s: (
            jnp.full_like(d[0], 0.3), jnp.full_like(d[0], 0.4),
            jnp.full_like(d[0], 0.6))
        try:
            c, ms = bench_fn(make_pt(base_cfg), args)
            report("nosky", c, ms)
        finally:
            sky_mod.sky_radiance = saved

    print({k: round(v, 2) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
