"""Authored image-texture ingestion (assets/image_textures) — the
TextureManager.cu:222-240 role: PNG → mip atlas → trilinear sampling."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from rtvb_tpu.assets import image_textures as it

TEX_DIR = os.path.join(os.path.dirname(__file__), "..", "data", "textures")


def _atlas():
    atlas, names = it.load_atlas(TEX_DIR, ["grass", "brick", "stone"])
    if atlas is None:
        pytest.skip("no shipped textures")
    return atlas, names


def test_load_atlas_shapes():
    atlas, names = _atlas()
    t = len(names)
    assert atlas.rows0.shape == (t * it.S0, it.S0 * 3)
    assert atlas.rows1.shape == (t * it.S0 // 2, it.S0 // 2 * 3)
    assert it.atlas_count(atlas) == t
    # linear albedo in [0, 1]
    assert float(atlas.rows0.min()) >= 0.0
    assert float(atlas.rows0.max()) <= 1.0


def test_sample_matches_texels():
    """Sampling at texel centers (no lod) returns the stored texel."""
    atlas, names = _atlas()
    t = len(names)
    tex = np.asarray(atlas.rows0).reshape(t, it.S0, it.S0, 3)
    tid = jnp.asarray([[0, t - 1]], jnp.int32)
    # texel (3, 5) center: u = (x + 0.5)/S
    u = jnp.full((1, 2), (3 + 0.5) / it.S0)
    v = jnp.full((1, 2), (5 + 0.5) / it.S0)
    r, g, b = it.sample_atlas(atlas, tid, u, v)
    got = np.stack([np.asarray(r)[0], np.asarray(g)[0], np.asarray(b)[0]], -1)
    want = tex[[0, t - 1], 5, 3]          # row=y=5, col=x=3
    assert np.allclose(got, want, atol=1e-5), (got, want)


def test_negative_id_passthrough_and_lod_blend():
    atlas, _ = _atlas()
    tid = jnp.asarray([[-1]], jnp.int32)
    r, g, b = it.sample_atlas(atlas, tid, jnp.asarray([[0.3]]),
                              jnp.asarray([[0.7]]), lod=jnp.asarray([[0.5]]))
    assert float(r[0, 0]) == 1.0 and float(g[0, 0]) == 1.0
    # far lod → level-1 values (bounded by atlas range)
    tid = jnp.asarray([[0]], jnp.int32)
    r, _, _ = it.sample_atlas(atlas, tid, jnp.asarray([[0.3]]),
                              jnp.asarray([[0.7]]), lod=jnp.asarray([[10.0]]))
    assert 0.0 <= float(r[0, 0]) <= 1.0


def test_mxu_and_gather_paths_agree(monkeypatch):
    """The TPU 2-hot-matmul formulation must equal the CPU gather twin."""
    import jax
    atlas, names = _atlas()
    rng = np.random.default_rng(5)
    tid = jnp.asarray(rng.integers(-1, len(names), (8, 16)), jnp.int32)
    u = jnp.asarray(rng.uniform(0, 1, (8, 16)).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, 1, (8, 16)).astype(np.float32))
    ref = it.sample_atlas(atlas, tid, u, v)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = it.sample_atlas(atlas, tid, u, v)
    for a, b in zip(ref, got):
        # bf16 matmul operand rounding: values agree to ~3 decimals
        assert np.allclose(np.asarray(a), np.asarray(b), atol=5e-3)


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
