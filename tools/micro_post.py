"""Micro-benchmarks of post sub-stages at internal -> 1080p sizes.

Usage: python tools/micro_post.py [scale]
Each sub-stage is jitted alone; reported ms/frame.  Sum > fused pipeline
(XLA fuses the elementwise chain) but the ranking shows where time goes.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def bench(name, fn, *args, frames=16):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(frames):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / frames * 1e3
    print(f"{name:28s} {ms:7.3f} ms", flush=True)
    return ms


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    from rtvb_tpu.render import postprocess as P
    from rtvb_tpu.core.config import Settings

    out_h, out_w = 1080, 1920
    h = int(out_h * scale) // 4 * 4
    w = int(out_w * scale) // 4 * 4
    print(f"internal {w}x{h} -> {out_w}x{out_h}")
    cfg = Settings().post_processing
    tm = Settings().tone_mapping
    key = jax.random.PRNGKey(0)
    rgb = jax.random.uniform(key, (h, w, 3)) * 2.0
    state = P.initial_post_state()

    bench("auto_exposure", lambda x: P.auto_exposure(x, state, cfg, 0.016), rgb)
    bench("bloom", lambda x: P.bloom(x, cfg), rgb)
    bench("lens_flare", lambda x: P.lens_flare(x, cfg), rgb)
    bench("vignette", lambda x: P.vignette(x, cfg), rgb)
    bench("tone_map", lambda x: P.tone_map(x, tm, 0.0), rgb)
    ldr = jnp.clip(rgb, 0, 1)
    bench("easu", lambda x: P.easu(x, out_h, out_w), ldr)
    big = jnp.clip(jax.random.uniform(key, (out_h, out_w, 3)), 0, 1)
    bench("sharpen", lambda x: P.sharpen(x, cfg.sharpen_strength), big)
    bench("full run()", lambda x: P.run(x, state, cfg, tm, 0.016,
                                        out_h, out_w)[0], rgb)


if __name__ == "__main__":
    main()
