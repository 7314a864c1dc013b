"""Micro-bench: trace-wave cost vs tile row count at a given render scale.

The Pallas trace kernel's while loop runs until ALL rays in a (tile_r, 128)
tile terminate, so cost ~ sum over tiles of the per-tile MAX step count.
At reduced internal resolutions each tile covers a larger angular footprint
(more likely to contain one expensive ray), which is why trace waves barely
scale below native 1080p.  This measures real primary/bounce-like waves at
several tile_r values.

Usage: python tools/bench_tiles.py [scale]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def bench(fn, args, frames=16):
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(frames):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / frames * 1e3


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    from rtvb_tpu.core.config import Settings
    from rtvb_tpu.render.renderer import Engine
    from rtvb_tpu.core.camera import camera_rays
    from rtvb_tpu.ops import trace_kernel, rng

    settings = Settings().replace(rendering={
        "render_width": 1920, "render_height": 1080})
    eng = Engine(settings=settings, width=1920, height=1080, backend="pallas")
    eng.set_render_scale(scale)
    W, H = eng.width, eng.height
    world, tp = eng.world, eng._tp
    print(f"internal {W}x{H}", flush=True)

    px = jnp.broadcast_to(jnp.arange(W, dtype=jnp.uint32)[None, :], (H, W))
    py = jnp.broadcast_to(jnp.arange(H, dtype=jnp.uint32)[:, None], (H, W))
    rs = rng.RandState(px, py, jnp.uint32(0), 0)
    ju, jv = rs.next2()
    o, d = camera_rays(eng.camera, W, H, ju, jv)

    # incoherent wave: diffuse-bounce-like directions from ground points
    rs2 = rng.RandState(px, py, jnp.uint32(1), 8)
    u1, u2 = rs2.next2()
    from rtvb_tpu.ops import mathutil as m
    local = m.cosine_sample_hemisphere(u1, u2)
    t_, bt_ = m.orthonormal_basis((jnp.zeros((H, W)), jnp.ones((H, W)),
                                   jnp.zeros((H, W))))
    d2 = m.from_local(local, t_, bt_, (jnp.zeros((H, W)), jnp.ones((H, W)),
                                       jnp.zeros((H, W))))
    o2 = (o[0] + d[0] * 8.0, jnp.maximum(o[1] + d[1] * 8.0, 9.0),
          o[2] + d[2] * 8.0)

    REP = 10   # waves per jit call: amortizes the ~3.5 ms tunnel dispatch

    def many(world, o, d, tr):
        acc = jnp.float32(0)
        oy = o[1]
        for i in range(REP):
            rec = trace_kernel.trace(
                (o[0], oy + 1e-6 * i, o[2]), d, world.colmask,
                world.df_super[0], tp, maxh_row=world.maxh_super[0],
                schema2d=world.schema, excmask2d=world.exc_mask,
                tile_rows=tr)
            acc = acc + rec.t.mean()
        return acc

    Hp = H + (-H) % 8
    for tile_r in (8, 16, 24, 32):
        if Hp % tile_r:
            continue
        ms_p = bench(jax.jit(lambda w_, o_, d_, tr=tile_r: many(w_, o_, d_, tr)),
                     (world, o, d), frames=4) / REP
        ms_b = bench(jax.jit(lambda w_, o_, d_, tr=tile_r: many(w_, o_, d_, tr)),
                     (world, o2, d2), frames=4) / REP
        print(f"tile_r={tile_r:2d}: primary {ms_p:6.2f} ms   "
              f"incoherent {ms_b:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
