"""Microbench: gather strategies + NEE-RIS before/after on the real chip."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
import jax
import jax.numpy as jnp
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, n=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    H, W = 1080, 1920
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (H, W), 0, 30)
    from rtvb_tpu.ops.gatherlib import fast_gather, fast_gather_multi, keyed_lookup
    table = jnp.arange(30, dtype=jnp.float32)

    print("fast_gather 30-entry     ", timeit(jax.jit(fast_gather), table, idx), "ms")
    tables = tuple(jnp.arange(30, dtype=jnp.float32) + i for i in range(11))
    print("fast_gather_multi 11x30  ", timeit(jax.jit(fast_gather_multi), tables, idx), "ms")
    keys = jnp.sort(jax.random.randint(key, (128,), 0, 1 << 20).astype(jnp.int32))
    vals = jnp.arange(128, dtype=jnp.int32)
    q = jax.random.randint(key, (H, W), 0, 1 << 20)
    print("keyed_lookup 128         ", timeit(jax.jit(lambda k, v, q: keyed_lookup(k, v, q)), keys, vals, q), "ms")

    # NEE-RIS after
    from rtvb_tpu.core.config import Settings
    from rtvb_tpu.render.renderer import Engine
    from rtvb_tpu.render import pathtracer
    from rtvb_tpu.ops import rng, bsdf as B
    settings = Settings()
    eng = Engine(settings=settings, width=W, height=H, backend="pallas")
    px = jnp.broadcast_to(jnp.arange(W, dtype=jnp.uint32)[None, :], (H, W))
    py = jnp.broadcast_to(jnp.arange(H, dtype=jnp.uint32)[:, None], (H, W))
    n = (jnp.zeros((H, W)), jnp.ones((H, W)), jnp.zeros((H, W)))
    p = (jnp.full((H, W), 32.0), jnp.full((H, W), 12.0), jnp.full((H, W), 32.0))
    mat = B.Material(albedo_r=jnp.full((H, W), .5), albedo_g=jnp.full((H, W), .5),
                     albedo_b=jnp.full((H, W), .5), roughness=jnp.full((H, W), .5),
                     metallic=jnp.zeros((H, W)), translucency=jnp.zeros((H, W)))

    def nee_only(fi):
        rs = rng.RandState(px, py, fi, 8)
        return pathtracer._nee_ris(rs, eng.lights, eng.sky_state, p, n, n, mat,
                                   8, None, eng.sky_state.cos_sun_radius)
    print("NEE-RIS (new gathers)    ", timeit(jax.jit(nee_only), jnp.uint32(3), n=5), "ms")

    # block-id + material resolve
    rec_like = None
    from rtvb_tpu.ops import trace_kernel
    from rtvb_tpu.core.camera import camera_rays
    o, d = camera_rays(eng.camera, W, H, jnp.zeros((H, W)), jnp.zeros((H, W)))
    tr = jax.jit(lambda o, d: trace_kernel.trace(
        o, d, eng.world.colmask, eng.world.df_super[0], eng._tp,
        maxh_row=eng.world.maxh_super[0], schema2d=eng.world.schema,
        excmask2d=eng.world.exc_mask))
    rec = tr(o, d); jax.block_until_ready(rec)
    def resolve(rec):
        bid = pathtracer.resolve_block_id(eng.cfg, eng.world, rec)
        return pathtracer.gather_material(eng.materials, bid, jnp.zeros((H, W)))
    print("blockid+mat (new gathers)", timeit(jax.jit(resolve), rec, n=5), "ms")


if __name__ == "__main__":
    main()
