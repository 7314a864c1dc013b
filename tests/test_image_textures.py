"""Authored PBR image textures (assets/image_textures) — the
TextureManager.cu:222-240 + materials.yaml albedo/normal/roughness role:
PNG triples → packed stacked-mip pyramid → adaptive trilinear sampling."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from rtvb_tpu.assets import image_textures as it
from rtvb_tpu.ops.pack import unpack2

TEX_DIR = os.path.join(os.path.dirname(__file__), "..", "data", "textures")


def _atlas():
    atlas, names = it.load_atlas(TEX_DIR, ["grass", "brick", "stone"])
    if atlas is None:
        pytest.skip("no shipped textures")
    return atlas, names


def test_load_atlas_shapes():
    atlas, names = _atlas()
    t = len(names)
    assert atlas.hi.shape == (3, t * it.HI_ROWS, it.S0)
    assert atlas.lo.shape == (3, t * it.LO_ROWS, it.LO_COLS)
    assert it.atlas_count(atlas) == t
    # linear albedo in [0, 1] (plane 0 carries r|g bf16 pairs)
    r, g = unpack2(atlas.hi[0])
    assert float(r.min()) >= 0.0 and float(r.max()) <= 1.0 + 1e-3


def test_sample_matches_texels():
    """Sampling at texel centers (level 0) returns the stored texels for
    every channel — albedo, normal deltas, roughness multiplier.  One
    texture per call: mixing textures inside a demand-tier tile exercises
    the seam fallback (covered by test_seam_texture_falls_back_to_tail)."""
    atlas, names = _atlas()
    t = len(names)
    x, y = 3, 5
    u = jnp.full((1, 2), (x + 0.5) / it.S0)
    v = jnp.full((1, 2), (y + 0.5) / it.S0)
    for ti in (0, t - 1):
        tid = jnp.full((1, 2), ti, jnp.int32)
        out = it.sample_atlas(atlas, tid, u, v)
        row = ti * it.HI_ROWS + y          # level 0 lives in the hi tier
        er, eg = (float(c) for c in unpack2(atlas.hi[0, row, x]))
        eb, erg = (float(c) for c in unpack2(atlas.hi[1, row, x]))
        edu, edv = (float(c) for c in unpack2(atlas.hi[2, row, x]))
        got = [float(out.rgb[0][0, 0]), float(out.rgb[1][0, 0]),
               float(out.rgb[2][0, 0]), float(out.du[0, 0]),
               float(out.dv[0, 0]), float(out.rough_mul[0, 0])]
        np.testing.assert_allclose(got, [er, eg, eb, edu, edv, erg],
                                   atol=1e-5)


def test_seam_texture_falls_back_to_tail():
    """A tile spanning two textures at a demand-tier level samples its
    smallest-id texture from the hi tier and the other from the
    resident-tail pair (levels 3/4) — the documented seam compromise."""
    atlas, names = _atlas()
    if len(names) < 2:
        pytest.skip("needs two textures")
    u = jnp.full((1, 2), 0.37)
    v = jnp.full((1, 2), 0.59)
    mixed = it.sample_atlas(atlas, jnp.asarray([[0, 1]], jnp.int32), u, v)
    # the secondary texture equals a pure level-3 sample of itself
    pure_l3 = it.sample_atlas(atlas, jnp.full((1, 2), 1, jnp.int32), u, v,
                              lod=jnp.full((1, 2), 8.0 / it.S0))   # level 3
    np.testing.assert_allclose(float(mixed.rgb[0][0, 1]),
                               float(pure_l3.rgb[0][0, 1]), atol=1e-5)
    # the primary texture is exact level 0 (bilinear at centers)
    pure_l0 = it.sample_atlas(atlas, jnp.full((1, 2), 0, jnp.int32), u, v)
    np.testing.assert_allclose(float(mixed.rgb[0][0, 0]),
                               float(pure_l0.rgb[0][0, 0]), atol=1e-5)


def test_negative_id_passthrough_and_lod_blend():
    atlas, _ = _atlas()
    tid = jnp.asarray([[-1]], jnp.int32)
    out = it.sample_atlas(atlas, tid, jnp.asarray([[0.3]]),
                          jnp.asarray([[0.7]]), lod=jnp.asarray([[0.5]]))
    assert float(out.rgb[0][0, 0]) == 1.0
    assert float(out.du[0, 0]) == 0.0
    assert float(out.rough_mul[0, 0]) == 1.0
    # far lod → coarse mips, values stay bounded
    tid = jnp.asarray([[0]], jnp.int32)
    out = it.sample_atlas(atlas, tid, jnp.asarray([[0.3]]),
                          jnp.asarray([[0.7]]), lod=jnp.asarray([[10.0]]))
    assert 0.0 <= float(out.rgb[0][0, 0]) <= 1.0


def test_uv_wrap_tiles():
    """u/v outside [0,1) wrap (tiling textures): u and u+3 sample equal."""
    atlas, _ = _atlas()
    rng = np.random.default_rng(3)
    tid = jnp.zeros((4, 8), jnp.int32)
    u = jnp.asarray(rng.uniform(0, 1, (4, 8)).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, 1, (4, 8)).astype(np.float32))
    a = it.sample_atlas(atlas, tid, u, v)
    b = it.sample_atlas(atlas, tid, u + 3.0, v + 2.0)
    np.testing.assert_allclose(np.asarray(a.rgb[0]), np.asarray(b.rgb[0]),
                               atol=1e-4)


def test_tile_level_is_finest_of_tile():
    """A mixed-lod tile samples at the tile's FINEST requested level pair
    (the kernel contract the twin emulates with a block-min)."""
    atlas, _ = _atlas()
    H, W = it.TILE_R, it.LANES
    tid = jnp.zeros((H, W), jnp.int32)
    u = jnp.broadcast_to(jnp.linspace(0.1, 0.9, W)[None, :], (H, W))
    v = jnp.broadcast_to(jnp.linspace(0.1, 0.9, H)[:, None], (H, W))
    lod_fine = jnp.zeros((H, W))
    # one fine pixel inside an otherwise coarse tile drags the whole tile
    # to the fine level pair
    lod_mixed = jnp.full((H, W), 100.0).at[0, 0].set(0.0)
    a = it.sample_atlas(atlas, tid, u, v, lod=lod_fine)
    b = it.sample_atlas(atlas, tid, u, v, lod=lod_mixed)
    # the fine pixel itself samples identically in both
    assert abs(float(a.rgb[0][0, 0]) - float(b.rgb[0][0, 0])) < 1e-5
    # the coarse pixels blend between tile levels 0 and 1 with weight 1
    # (clamped), i.e. they sample level 1 — not level 4
    coarse_pure = it.sample_atlas(atlas, tid, u, v,
                                  lod=jnp.full((H, W), 2.0 / it.S0))
    np.testing.assert_allclose(np.asarray(b.rgb[0])[4:, :],
                               np.asarray(coarse_pure.rgb[0])[4:, :],
                               atol=2e-2)


@pytest.mark.skipif(not os.environ.get("RUN_TPU"),
                    reason="Pallas texture kernel needs hardware (RUN_TPU=1)")
def test_pallas_kernel_matches_twin():
    atlas, names = _atlas()
    rng = np.random.default_rng(5)
    H, W = 16, 256
    tid = jnp.asarray(rng.integers(-1, len(names), (H, W)), jnp.int32)
    u = jnp.asarray(rng.uniform(0, 2, (H, W)).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, 2, (H, W)).astype(np.float32))
    lod = jnp.asarray((rng.uniform(0, 0.3, (H, W)) ** 2).astype(np.float32))
    a = it.sample_atlas(atlas, tid, u, v, lod=lod, backend="xla")
    b = it.sample_atlas(atlas, tid, u, v, lod=lod, backend="pallas")
    for x, y in zip(it._flatten(a) if hasattr(it, "_flatten")
                    else [*a.rgb, a.du, a.dv, a.rough_mul],
                    [*b.rgb, b.du, b.dv, b.rough_mul]):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-4)


def test_engine_authored_textures_end_to_end():
    """rendering.authored_textures=True loads the shipped atlas, resolves
    materials.yaml image: fields, and changes the rendered albedo
    (TextureManager.cu end-to-end role)."""
    import jax
    from rtvb_tpu.core.config import Settings
    from rtvb_tpu.render.renderer import Engine

    imgs = {}
    for flag in (False, True):
        s = Settings().replace(rendering={"authored_textures": flag,
                                          "use_restir": False,
                                          "total_bounce_limit": 1})
        eng = Engine(settings=s, width=64, height=64)
        if flag:
            assert eng.texture_atlas is not None
            assert len(eng.texture_atlas_names) >= 5
            assert int(jax.numpy.sum(eng.materials.image_id >= 0)) >= 5
        g = eng.path_trace()
        imgs[flag] = np.stack([np.asarray(g.albedo[i]) for i in range(3)], -1)
    diff = np.abs(imgs[True] - imgs[False]).mean()
    assert diff > 0.01, diff      # authored albedo actually applied
