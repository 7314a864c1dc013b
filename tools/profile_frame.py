"""Per-stage timing of a 1080p frame on the real chip.

Breaks the 883 ms frame into: path trace / denoise / post; then drills into
the path tracer: trace waves alone, NEE-RIS alone, full PT without restir.
Writes docs/PROFILE.md with the numbers.
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rtvb_tpu.core.config import Settings
from rtvb_tpu.render.renderer import Engine
from rtvb_tpu.render import pathtracer, postprocess
from rtvb_tpu.render.denoiser import _denoise_jit, initial_denoiser_state
from rtvb_tpu.ops import dda, trace_kernel


def timeit(fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    W, H = 1920, 1080
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    settings = Settings().replace(rendering={"render_width": W, "render_height": H})
    eng = Engine(settings=settings, width=W, height=H, backend=backend)
    ent = eng.entity_buffers()
    report = []

    def log(name, ms):
        report.append((name, ms))
        print(f"{name:45s} {ms:9.2f} ms", flush=True)

    # --- whole frame ---
    from rtvb_tpu.render import restir as restir_mod
    eng.restir_state = restir_mod.initial_state(H, W)
    eng.denoiser_state = initial_denoiser_state(H, W)
    ff = eng._frame_fn()
    args = lambda: (eng.world, eng.materials, eng.lights, eng.sky_state,
                    eng.camera, eng.history_camera, eng.frame_index,
                    eng.restir_state, eng._light_remap,
                    eng.denoiser_state, eng.post_state, jnp.float32(1 / 60), ent)
    log("whole frame (jit: pt+denoise+post)", timeit(lambda: ff(*args())))

    # --- path trace only ---
    pt = eng._pt_fn()
    log("path trace (restir)", timeit(lambda: pt(
        eng.world, eng.materials, eng.lights, eng.sky_state, eng.camera,
        eng.history_camera, 3, eng.restir_state, eng._light_remap, ent)))

    g, _ = pt(eng.world, eng.materials, eng.lights, eng.sky_state, eng.camera,
              eng.history_camera, 3, eng.restir_state, eng._light_remap, ent)
    jax.block_until_ready(g)

    # --- denoise only ---
    dn = jax.jit(lambda g, s: _denoise_jit(g, s, settings.denoising))
    log("denoise", timeit(lambda: dn(g, eng.denoiser_state)))

    # --- post only ---
    rgb = jnp.stack([g.illum[i] * g.albedo[i] for i in range(3)], -1)
    pp = jax.jit(lambda r, s: postprocess.run(
        r, s, settings.post_processing, settings.tone_mapping, 1 / 60., H, W))
    log("post", timeit(lambda: pp(rgb, eng.post_state)))

    # --- single trace wave (pallas kernel), coherent primaries ---
    import numpy as np
    from rtvb_tpu.core.camera import camera_rays
    tp = eng._tp
    ju = jnp.zeros((H, W)); jv = jnp.zeros((H, W))
    o, d = camera_rays(eng.camera, W, H, ju, jv)
    world = eng.world

    tr = jax.jit(lambda o, d: trace_kernel.trace(
        o, d, world.colmask, world.df_super[0], tp,
        maxh_row=world.maxh_super[0], schema2d=world.schema,
        excmask2d=world.exc_mask))
    log("1 trace wave (pallas, coherent, meta)", timeit(lambda: tr(o, d)))

    tr_any = jax.jit(lambda o, d: trace_kernel.trace(
        o, d, world.colmask, world.df_super[0], tp, any_hit=True,
        t_cap=jnp.full((H, W), 30.0)))
    log("1 shadow wave (pallas, any-hit)", timeit(lambda: tr_any(o, d)))

    # incoherent wave: random dirs
    key = jax.random.PRNGKey(0)
    dr = jax.random.normal(key, (3, H, W))
    dr = dr / jnp.linalg.norm(dr, axis=0)
    di = (dr[0], dr[1], dr[2])
    oi = (jnp.full((H, W), 32.0), jnp.full((H, W), 12.0), jnp.full((H, W), 32.0))
    log("1 trace wave (pallas, incoherent)", timeit(lambda: tr(oi, di)))

    # --- NEE-RIS alone (8 local + sun + sky candidates, no trace) ---
    from rtvb_tpu.ops import rng, bsdf as B
    px = jnp.broadcast_to(jnp.arange(W, dtype=jnp.uint32)[None, :], (H, W))
    py = jnp.broadcast_to(jnp.arange(H, dtype=jnp.uint32)[:, None], (H, W))
    n = (jnp.zeros((H, W)), jnp.ones((H, W)), jnp.zeros((H, W)))
    p = (jnp.full((H, W), 32.0), jnp.full((H, W), 12.0), jnp.full((H, W), 32.0))
    wo = n
    mat = B.Material(albedo_r=jnp.full((H, W), .5), albedo_g=jnp.full((H, W), .5),
                     albedo_b=jnp.full((H, W), .5), roughness=jnp.full((H, W), .5),
                     metallic=jnp.zeros((H, W)), translucency=jnp.zeros((H, W)))

    def nee_only(fi):
        rs = rng.RandState(px, py, fi, 8)
        return pathtracer._nee_ris(rs, eng.lights, eng.sky_state, p, n, wo, mat,
                                   settings.rendering.local_light_candidates,
                                   None, eng.sky_state.cos_sun_radius)
    nee_j = jax.jit(nee_only)
    log("NEE-RIS stream (8 local+sun+sky, no vis)", timeit(lambda: nee_j(jnp.uint32(3))))

    # --- material resolve alone ---
    rec = tr(o, d)
    jax.block_until_ready(rec)
    def resolve(rec):
        bid = pathtracer.resolve_block_id(eng.cfg, world, rec)
        return pathtracer.gather_material(eng.materials, bid, jnp.zeros((H, W)))
    res_j = jax.jit(resolve)
    log("block-id + material resolve", timeit(lambda: res_j(rec)))

    # --- sky radiance alone ---
    from rtvb_tpu.render import sky as sky_mod
    sky_j = jax.jit(lambda d: sky_mod.sky_radiance(d, eng.sky_state))
    log("sky radiance eval", timeit(lambda: sky_j(d)))

    # --- denoiser sub-passes ---
    from rtvb_tpu.ops.denoise import passes
    illum = jnp.stack(g.illum, -1)
    depth = g.depth
    normal = jnp.stack(g.normal, -1)
    at_j = jax.jit(lambda i, v: passes.atrous_pass(
        i, v, depth, normal, g.roughness, 4, 4.0, 128.0, 0.05))
    var = jnp.ones((H, W))
    log("1 atrous pass (25-tap)", timeit(lambda: at_j(illum, var)))

    ff_j = jax.jit(passes.firefly_filter)
    log("firefly filter", timeit(lambda: ff_j(illum)))

    ta_j = jax.jit(lambda i: passes.temporal_accumulate(
        i, jnp.stack([jnp.ones((H, W))]*2, -1), g.motion_u, g.motion_v, depth,
        normal, illum, illum, jnp.stack([jnp.ones((H, W))]*2, -1),
        jnp.ones((H, W)), depth, normal, 30, 6, 0.01))
    log("temporal accumulation", timeit(lambda: ta_j(illum)))

    with open(os.path.join(os.path.dirname(__file__), "..", "docs", "PROFILE.md"), "w") as f:
        f.write("# Frame profile (1080p, v5e, real chip)\n\n")
        f.write("| stage | ms |\n|---|---|\n")
        for name, ms in report:
            f.write(f"| {name} | {ms:.2f} |\n")
    print("wrote docs/PROFILE.md")


if __name__ == "__main__":
    main()
