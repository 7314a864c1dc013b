"""Triangle-light system: emissive sub-meshes, sampling, pairing, remap.

Reference roles: VoxelEngine.cu:386-716 (emissive triangles → LightInfo[]),
Light.h TriangleLight, BlockManager light/base pairing (lantern),
Restir.h:52-79 light-ID remap.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from rtvb_tpu.assets import blocks as B
from rtvb_tpu.core.config import Settings
from rtvb_tpu.render.renderer import Engine
from rtvb_tpu.world import lighting


@pytest.fixture(scope="module")
def night_engine():
    s = Settings().replace(rendering={"use_restir": False},
                           sky={"time_of_day": 0.0})
    eng = Engine(settings=s, width=64, height=64)
    x, z = 40, 40
    col = np.asarray(eng.world.blocks[x, :, z])
    h = int(col.nonzero()[0].max())
    eng.set_block(x, h + 1, z, B.LANTERN)
    return eng, x, h, z


def test_lantern_contributes_glow_box_triangles(night_engine):
    eng, x, h, z = night_engine
    assert int(eng.lights.count) == 12          # inner glow box only
    ent = eng.entity_buffers()
    # base mesh triangles present (material ≠ light material), light slots map
    assert int((np.asarray(ent.light_slot) >= 0).sum()) == 12
    key = np.asarray(eng.lights.key)
    vkey = (x * eng.cfg.z + z) * eng.cfg.y + (h + 1)
    assert (key[:12] == vkey * 16 + np.arange(12)).all()


def test_lantern_lights_ground_at_night(night_engine):
    eng, x, h, z = night_engine
    eng.set_camera(pos=(x + 0.5, h + 4.0, z - 5.0), yaw=np.pi / 2, pitch=-0.4)
    g = eng.path_trace()
    rgb = np.stack([np.asarray(g.illum[i] * g.albedo[i]) for i in range(3)], -1)
    lum = (rgb * [0.2126, 0.7152, 0.0722]).sum(-1)
    assert (lum > 0.01).mean() > 0.05


def test_lantern_base_occludes_downward():
    """Light/base pairing: the bottom plate blocks direct light straight
    below the lantern while the sides stay lit (hanging-lantern shadow)."""
    s = Settings().replace(rendering={"use_restir": False},
                           sky={"time_of_day": 0.0})
    eng = Engine(settings=s, width=64, height=64)
    x, z = 40, 40
    col = np.asarray(eng.world.blocks[x, :, z])
    h = int(col.nonzero()[0].max())
    eng.set_block(x, h + 3, z, B.LANTERN)   # floating above the ground
    eng.set_camera(pos=(x + 0.5, h + 7.5, z + 0.5), yaw=0.0, pitch=-1.5707)
    acc = 0.0
    for _ in range(6):
        g = eng.path_trace()
        rgb = np.stack([np.asarray(g.illum[i] * g.albedo[i]) for i in range(3)], -1)
        acc = acc + rgb
    acc /= 6
    lum = (acc * [0.2126, 0.7152, 0.0722]).sum(-1)
    depth = np.asarray(g.depth)
    ground = depth > 5.0          # looking down past the lantern
    # ring pixels (offset from center) get direct side light; the pixel
    # straight under the lantern only sees the bottom plate → darker
    cy = cx = 32
    under = lum[cy - 1: cy + 2, cx - 1: cx + 2].mean()
    ring = np.concatenate([lum[cy - 12: cy - 8, cx - 2: cx + 2].ravel(),
                           lum[cy + 8: cy + 12, cx - 2: cx + 2].ravel()])
    assert ring.mean() > under * 1.3, (under, float(ring.mean()))


def test_light_id_remap_tracks_edit():
    s = Settings().replace(rendering={"use_restir": False})
    eng = Engine(settings=s, width=32, height=32)
    x, z = 40, 40
    h = int(np.asarray(eng.world.blocks[x, :, z]).nonzero()[0].max())
    eng.set_block(x, h + 1, z, B.LANTERN)
    key0 = np.asarray(eng.lights.key).copy()
    # unrelated edit: lantern slots must survive with identity intact
    remap = eng.set_block(10, 20, 10, B.SAND)
    remap = np.asarray(remap)
    key1 = np.asarray(eng.lights.key)
    for s0 in range(12):
        s1 = remap[s0]
        assert s1 >= 0
        assert key1[s1] == key0[s0]
    # deleting the lantern invalidates its slots
    remap2 = np.asarray(eng.delete_block(x, h + 1, z))
    assert (remap2[:12] == -1).all()


def test_sample_light_point_on_triangle():
    """Sampled points lie on the triangle plane inside the triangle."""
    s = Settings().replace(rendering={"use_restir": False})
    eng = Engine(settings=s, width=16, height=16)
    x, z = 40, 40
    h = int(np.asarray(eng.world.blocks[x, :, z]).nonzero()[0].max())
    eng.set_block(x, h + 1, z, B.LANTERN)
    lt = eng.lights
    rng = np.random.default_rng(0)
    slot = jnp.asarray(rng.integers(0, 12, 64).astype(np.int32))
    u2 = jnp.asarray(rng.random(64).astype(np.float32))
    u3 = jnp.asarray(rng.random(64).astype(np.float32))
    pos, nrm, pdf_area, (fa, fb) = lighting.sample_light_point(
        lt, slot, None, u2, u3)
    fa, fb = np.asarray(fa), np.asarray(fb)
    assert (fa >= 0).all() and (fb >= 0).all() and (fa + fb <= 1.0 + 1e-6).all()
    # on-plane: (pos - v0) · n == 0
    sl = np.asarray(slot)
    v0 = np.stack([np.asarray(lt.v0x)[sl], np.asarray(lt.v0y)[sl],
                   np.asarray(lt.v0z)[sl]], -1)
    n = np.stack([np.asarray(lt.nx)[sl], np.asarray(lt.ny)[sl],
                  np.asarray(lt.nz)[sl]], -1)
    p = np.stack([np.asarray(c) for c in pos], -1)
    dev = np.abs(((p - v0) * n).sum(-1))
    assert dev.max() < 1e-5
    # pdf = 1/area
    np.testing.assert_allclose(np.asarray(pdf_area),
                               1.0 / np.asarray(lt.area)[sl], rtol=1e-5)
