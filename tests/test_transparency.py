"""Transparent terrain blocks: glass/water must transmit, not occlude.

Reference role: Bsdf.h:94-118 (specular/diffuse translucency) + BlockManager
transparent classification — a glass block over sand shows the sand through
it (VERDICT round-1 item 7).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from rtvb_tpu.assets import blocks as B
from rtvb_tpu.core.config import Settings
from rtvb_tpu.render.renderer import Engine

# whole-frame / multi-frame jit compiles dominate a cold CPU run of this
# file; `pytest -m 'not slow'` is the <5-min default pass (README)
pytestmark = pytest.mark.slow


def _surface_height(eng, x, z):
    col = np.asarray(eng.world.blocks[x, :, z])
    return int(col.nonzero()[0].max())


def _render_rgb(eng):
    g = eng.path_trace()
    rgb = np.stack([np.asarray(g.illum[i] * g.albedo[i]) for i in range(3)], -1)
    return g, rgb


def test_glass_transmits_light_to_ground():
    s = Settings().replace(rendering={"use_restir": False})
    x, z = 40, 40

    eng = Engine(settings=s, width=64, height=64)
    h = _surface_height(eng, x, z)
    # camera straight down at the column
    eng.set_camera(pos=(x + 0.5, h + 8.0, z + 0.5), yaw=0.0, pitch=-1.5707)

    # baseline: no glass — center pixel sees the terrain surface
    gs = []
    accum0 = 0.0
    for f in range(4):
        g, rgb = _render_rgb(eng)
        accum0 = accum0 + rgb
    accum0 /= 4
    base_depth = float(np.asarray(g.depth)[32, 32])

    # with glass floating above the surface
    eng2 = Engine(settings=s, width=64, height=64)
    eng2.set_block(x, h + 3, z, B.GLASS)
    eng2.set_camera(pos=(x + 0.5, h + 8.0, z + 0.5), yaw=0.0, pitch=-1.5707)
    accum1 = 0.0
    for f in range(4):
        g2, rgb2 = _render_rgb(eng2)
        accum1 = accum1 + rgb2
    accum1 /= 4
    glass_depth = float(np.asarray(g2.depth)[32, 32])

    # the primary ray must HIT the glass (depth shortens by ~the gap)
    assert glass_depth < base_depth - 2.0, (glass_depth, base_depth)

    # and the color behind it must still be terrain-lit (glass tint ~0.95),
    # not an opaque glass cube: within 45% of the uncovered ground color
    c0 = accum0[32, 32]
    c1 = accum1[32, 32]
    lum0 = float((c0 * [0.2126, 0.7152, 0.0722]).sum())
    lum1 = float((c1 * [0.2126, 0.7152, 0.0722]).sum())
    assert lum1 > 0.25 * lum0, (lum0, lum1)
    assert abs(lum1 - lum0) < 0.6 * max(lum0, 1e-3), (lum0, lum1)


def test_water_tints_transmission():
    """Water (albedo 0.12/0.25/0.4) over sand: transmitted light is blue-
    shifted relative to open sand."""
    s = Settings().replace(rendering={"use_restir": False})
    x, z = 24, 40
    eng = Engine(settings=s, width=64, height=64)
    h = _surface_height(eng, x, z)
    eng.set_block(x, h + 3, z, B.WATER)
    eng.set_camera(pos=(x + 0.5, h + 8.0, z + 0.5), yaw=0.0, pitch=-1.5707)
    accum = 0.0
    for f in range(6):
        _, rgb = _render_rgb(eng)
        accum = accum + rgb
    accum /= 6
    c = accum[32, 32]
    # blue/red ratio must exceed sand's (sand albedo is warm: r >> b)
    assert c[2] / max(c[0], 1e-4) > 0.45, c
