"""Micro-benchmarks of the path tracer's XLA-side shading pieces at 1080p.

Usage: python tools/micro_pt.py
Each piece is jitted alone over (1080, 1920) arrays; reported ms/frame.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

H, W = 1080, 1920


def bench(name, fn, *args, frames=16):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    c = time.perf_counter() - t0
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(frames):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / frames * 1e3
    print(f"{name:34s} compile {c:5.1f}s  run {ms:7.3f}ms", flush=True)
    return ms


def main():
    from rtvb_tpu.core.config import Settings
    from rtvb_tpu.render.renderer import Engine
    from rtvb_tpu.render import sky as sky_mod
    from rtvb_tpu.ops import bsdf as B
    from rtvb_tpu.ops import rng as rng_mod
    from rtvb_tpu.ops.gatherlib import keyed_lookup, fast_gather_multi, fast_gather
    from rtvb_tpu.assets import textures

    eng = Engine(settings=Settings(), width=W, height=H, backend="pallas")
    world, mats, lights, sky_state = (eng.world, eng.materials, eng.lights,
                                      eng.sky_state)
    print(f"exc_key={world.exc_key.shape}  lights.key={lights.key.shape}  "
          f"mats={mats.roughness.shape}", flush=True)

    key = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) % 90000
    bench("keyed_lookup exc (cap %d)" % world.exc_key.shape[0],
          lambda k: keyed_lookup(world.exc_key, world.exc_id, k)[0], key)
    bench("keyed_lookup lights (cap %d)" % lights.key.shape[0],
          lambda k: keyed_lookup(lights.key,
                                 jnp.arange(lights.key.shape[0],
                                            dtype=jnp.int32), k)[0], key)

    mi = key % 16
    bench("material gather (11 fields)",
          lambda i: fast_gather_multi(
              (mats.albedo[:, 0], mats.albedo[:, 1], mats.albedo[:, 2],
               mats.emissive[:, 0], mats.emissive[:, 1], mats.emissive[:, 2],
               mats.roughness, mats.metallic, mats.translucency,
               mats.texture_id, mats.uv_scale), i), mi)
    bench("block_to_mat gather",
          lambda i: fast_gather(mats.block_to_mat, i), mi)

    one = jnp.ones((H, W))
    dirs = (one * 0.3, one * 0.8, one * 0.52)
    n = (one * 0.0, one, one * 0.0)
    wo = (one * 0.2, one * 0.9, one * 0.4)
    mat = B.Material(albedo_r=one * 0.5, albedo_g=one * 0.5, albedo_b=one * 0.5,
                     roughness=one * 0.6, metallic=one * 0.1,
                     translucency=one * 0.0)
    bench("B.evaluate", lambda wi: B.evaluate(mat, n, wo, wi)[0], dirs)
    bench("B.sample", lambda u: B.sample(mat, n, wo, u, u * 0.7, u * 0.3).wi,
          one * 0.5)
    bench("sky_radiance", lambda d: sky_mod.sky_radiance(d, sky_state), dirs)
    bench("sun_radiance", lambda d: sky_mod.sun_radiance(d, sky_state), dirs)
    bench("sky_env_sample",
          lambda u: sky_mod.sky_env_sample(sky_state, u, u * 0.7, u * 0.3)[0],
          one * 0.5)
    bench("sky_env_pdf", lambda d: sky_mod.sky_env_pdf(sky_state, d), dirs)

    tid = (key % 5).astype(jnp.int32)
    uv = one * 0.37
    bench("texture sample_scale", lambda u: textures.sample_scale(tid, u, u), uv)
    bench("texture sample_normal_delta",
          lambda u: textures.sample_normal_delta(tid, u, u)[0], uv)

    px = jnp.broadcast_to(jnp.arange(W, dtype=jnp.uint32)[None, :], (H, W))
    py = jnp.broadcast_to(jnp.arange(H, dtype=jnp.uint32)[:, None], (H, W))

    def rng_draw(f):
        rs = rng_mod.RandState(px, py, jnp.uint32(f), 0)
        out = []
        for _ in range(8):
            out.append(rs.next())
        return out
    bench("rng 8 draws", rng_draw, jnp.uint32(3))

    from rtvb_tpu.ops import triangles as tri_ops
    ent = eng.entity_buffers()
    if ent is not None:
        o = (one * 32.0, one * 40.0, one * 32.0)
        bench("entity intersect (%d tris)" % ent.tri_packed.shape[0],
              lambda oo: tri_ops.intersect_packed(
                  (oo, o[1], o[2]), dirs, ent.tri_packed).t, o[0])


if __name__ == "__main__":
    main()
