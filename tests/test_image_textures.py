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
    assert atlas.planes.shape == (3, t * it.BLOCK_ROWS, it.S0)
    assert it.atlas_count(atlas) == t
    # linear albedo in [0, 1] (plane 0 carries r|g bf16 pairs)
    r, g = unpack2(atlas.planes[0])
    assert float(r.min()) >= 0.0 and float(r.max()) <= 1.0 + 1e-3


def test_sample_matches_texels():
    """Sampling at texel centers (level 0) returns the stored texels for
    every channel — albedo, normal deltas, roughness multiplier."""
    atlas, names = _atlas()
    t = len(names)
    tid = jnp.asarray([[0, t - 1]], jnp.int32)
    x, y = 3, 5
    u = jnp.full((1, 2), (x + 0.5) / it.S0)
    v = jnp.full((1, 2), (y + 0.5) / it.S0)
    out = it.sample_atlas(atlas, tid, u, v)
    for col, ti in enumerate((0, t - 1)):
        row = ti * it.BLOCK_ROWS + y
        er, eg = (float(c) for c in unpack2(atlas.planes[0, row, x]))
        eb, erg = (float(c) for c in unpack2(atlas.planes[1, row, x]))
        edu, edv = (float(c) for c in unpack2(atlas.planes[2, row, x]))
        got = [float(out.rgb[0][0, col]), float(out.rgb[1][0, col]),
               float(out.rgb[2][0, col]), float(out.du[0, col]),
               float(out.dv[0, col]), float(out.rough_mul[0, col])]
        np.testing.assert_allclose(got, [er, eg, eb, edu, edv, erg],
                                   atol=1e-5)


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
