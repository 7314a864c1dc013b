"""Dump the optimized HLO of the fused frame fn for fusion-level analysis.

Usage: python tools/dump_hlo.py [scale] [out_path]
Writes the post-optimization HLO text; grep fusion names from
tools/device_trace.py output against it to see what each hot fusion computes.
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/frame_hlo.txt"

    from rtvb_tpu.core.config import Settings
    from rtvb_tpu.render.renderer import Engine
    from rtvb_tpu.render import restir as restir_mod
    from rtvb_tpu.render.denoiser import initial_denoiser_state
    from rtvb_tpu.render.renderer import _commit

    settings = Settings().replace(rendering={
        "render_width": 1920, "render_height": 1080})
    eng = Engine(settings=settings, width=1920, height=1080,
                 backend="pallas")
    eng.set_render_scale(scale)
    eng.restir_state = _commit(restir_mod.initial_state(eng.height, eng.width))
    eng.denoiser_state = _commit(initial_denoiser_state(eng.height, eng.width))

    fn = eng._frame_fn()
    args = (eng.world, eng.materials, eng.lights, eng.sky_state, eng.camera,
            eng.history_camera, eng.frame_index, eng.restir_state,
            eng._light_remap, eng.denoiser_state, eng.post_state,
            jnp.float32(1 / 60), eng.entity_buffers(), eng.texture_atlas,
            eng._ui_overlay)
    txt = fn.lower(*args).compile().as_text()
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt) / 1e6:.1f} MB to {out}")


if __name__ == "__main__":
    main()
