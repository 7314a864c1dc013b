"""End-to-end rendering regression tests (small frames, CPU).

These guard the estimator math: the sun/sky/local RIS weighting bug class
(sun diluted by candidate count) shows up immediately as a dark ground.
"""
import numpy as np
import jax
import jax.numpy as jnp
import os

import pytest

from rtvb_tpu.core.config import Settings
from rtvb_tpu.render.renderer import Engine
from rtvb_tpu.utils import image, image_diff

# whole-frame / multi-frame jit compiles dominate a cold CPU run of this
# file; `pytest -m 'not slow'` is the <5-min default pass (README)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def engine():
    s = Settings()
    return Engine(settings=s, width=96, height=96)


def _frame_rgb(g):
    return np.stack([np.asarray(g.illum[i] * g.albedo[i]) for i in range(3)], -1)


def test_ground_is_sunlit(engine):
    g = engine.path_trace()
    rgb = _frame_rgb(g)
    depth = np.asarray(g.depth)
    ground = depth < 1e29
    lum = (rgb * [0.2126, 0.7152, 0.0722]).sum(-1)
    # daylight scene: mean ground luminance must be in a sane sunlit band
    # (the RIS M-division bug produced ~0.05 here; correct is ~0.2-0.6)
    assert 0.1 < lum[ground].mean() < 1.5, lum[ground].mean()
    # sky has radiance too
    assert lum[~ground].mean() > 0.1


def test_nee_matches_bruteforce_sun_sky():
    """Direct light on an open flat surface: RIS estimate ≈ analytic
    sun+sky irradiance (Monte Carlo, loose tolerance)."""
    from rtvb_tpu.core.config import SkySettings
    from rtvb_tpu.render import sky as S
    from rtvb_tpu.render import pathtracer as PT
    from rtvb_tpu.world.lighting import LightTable
    from rtvb_tpu.ops import rng as rng_mod
    from rtvb_tpu.ops import bsdf as B
    from rtvb_tpu.ops import alias_table as at
    from rtvb_tpu.ops.dda import HitRecord

    st = S.make_sky_state(SkySettings())
    n_pix = 4096
    shape = (n_pix,)
    # empty light table
    tab = at.build(np.zeros(8))
    z8 = jnp.zeros(8)
    lights = LightTable(
        v0x=z8, v0y=z8, v0z=z8, e1x=z8, e1y=z8, e1z=z8,
        e2x=z8, e2y=z8, e2z=z8, nx=z8, ny=z8, nz=z8, area=z8,
        rad_r=z8, rad_g=z8, rad_b=z8,
        key=jnp.full(8, 1 << 30, jnp.int32),
        ent=jnp.zeros(8, bool),
        active=jnp.zeros(8, bool), count=jnp.int32(0),
        prob=tab.prob, alias=tab.alias, pmf=tab.pmf)

    mat = B.Material(
        albedo_r=jnp.ones(shape), albedo_g=jnp.ones(shape),
        albedo_b=jnp.ones(shape), roughness=jnp.ones(shape),
        metallic=jnp.zeros(shape), translucency=jnp.zeros(shape))
    n = (jnp.zeros(shape), jnp.ones(shape), jnp.zeros(shape))
    wo = (jnp.zeros(shape), jnp.ones(shape), jnp.zeros(shape))
    p = (jnp.full(shape, 32.0), jnp.full(shape, 50.0), jnp.full(shape, 32.0))

    def trace_any(o, d, t_cap):   # open sky: nothing blocks
        z = jnp.zeros(shape)
        return HitRecord(hit=jnp.zeros(shape, bool), t=z, ix=z.astype(int),
                         iy=z.astype(int), iz=z.astype(int), nx=z, ny=z, nz=z)

    px = jnp.arange(n_pix, dtype=jnp.uint32)
    py = jnp.zeros(n_pix, jnp.uint32)

    @jax.jit
    def estimate(frame):
        rs = rng_mod.RandState(px, py, frame, 0)
        res = PT._nee_ris(rs, lights, st, p, n, wo, mat, 4, trace_any,
                          st.cos_sun_radius)
        return jnp.stack(PT.shade_reservoir(res, p, n, wo, mat, trace_any))

    est = np.mean([np.asarray(estimate(jnp.uint32(f))).mean(1) for f in range(16)], 0)

    # brute force: lambertian E = ∫ L cosθ dω / π ... with albedo 1, f=1/π
    rng = np.random.default_rng(0)
    u = rng.random((2, 200000)).astype(np.float32)
    r = np.sqrt(u[0]); phi = 2 * np.pi * u[1]
    d = (jnp.asarray(r * np.cos(phi)), jnp.asarray(np.sqrt(1 - u[0])),
         jnp.asarray(r * np.sin(phi)))
    rad = jax.jit(lambda: jnp.stack(S.sky_plus_sun(d, st)))()
    ref = np.asarray(rad).mean(1)   # cosine-weighted MC of L*cos/pdf*f = mean(L)

    assert np.all(np.abs(est - ref) < 0.35 * np.abs(ref) + 0.05), (est, ref)


def test_realtime_denoiser_smooths(engine):
    # warm up temporal history with a few static frames
    outs = [engine.render_realtime() for _ in range(4)]
    out = outs[-1].astype(np.float32)
    g = engine.path_trace()
    raw = _frame_rgb(g)
    raw_u8 = image.to_u8(np.clip(raw, 0, 1)).astype(np.float32)

    def local_var(img):
        mu = (img[:-1, :-1] + img[1:, :-1] + img[:-1, 1:] + img[1:, 1:]) / 4
        return ((img[:-1, :-1] - mu) ** 2).mean()

    assert local_var(out) < local_var(raw_u8)


def test_golden_canonical():
    """Render the canonical scene fresh and compare against the committed
    golden (regenerate with apps.offline --update-canonical)."""
    import os
    golden_path = os.path.join(os.path.dirname(__file__), "..", "data",
                               "canonical", "canonical_render.png")
    if not os.path.exists(golden_path):
        pytest.skip("no canonical golden committed")
    eng = Engine(settings=Settings(), width=128, height=128)
    out = None
    for _ in range(8):
        out = eng.render_accumulated()
    golden = image.read_png(golden_path)
    res = image_diff.compare(out, golden)
    assert res.verdict in ("identical", "veryClose", "close"), str(res)


def test_golden_canonical_procedural():
    """The canonical scene rendered with the procedural texture stack
    (rendering.authored_textures=False) vs its committed golden.  Since r5
    the AUTHORED look is the shipping default (canonical_render.png);
    this golden keeps the procedural path gated — and the two looks must
    genuinely differ."""
    import os
    golden_path = os.path.join(os.path.dirname(__file__), "..", "data",
                               "canonical", "canonical_procedural.png")
    if not os.path.exists(golden_path):
        pytest.skip("no procedural canonical golden committed")
    s = Settings().replace(rendering={"authored_textures": False})
    eng = Engine(settings=s, width=128, height=128)
    out = None
    for _ in range(8):
        out = eng.render_accumulated()
    golden = image.read_png(golden_path)
    res = image_diff.compare(out, golden)
    assert res.verdict in ("identical", "veryClose", "close"), str(res)
    # and the procedural look must genuinely differ from the authored one
    auth = image.read_png(os.path.join(os.path.dirname(golden_path),
                                       "canonical_render.png"))
    assert image_diff.compare(out, auth).verdict == "different"


def test_golden_character_reflection():
    """Character beside the mirror shader ball: entities must appear in
    SECONDARY rays (entity_in_bounces default, the all-geometry IAS role of
    OptixRenderer.cpp:1369-1529).  Gated on the committed golden, plus a
    direct check that disabling entity_in_bounces changes the mirror."""
    import os
    import numpy as np
    from rtvb_tpu.models.character import Character
    golden_path = os.path.join(os.path.dirname(__file__), "..", "data",
                               "canonical", "scripted",
                               "character_reflection.png")
    if not os.path.exists(golden_path):
        pytest.skip("no reflection golden committed")

    def render(in_bounces: bool):
        s = Settings().replace(rendering={"entity_in_bounces": in_bounces})
        eng = Engine(settings=s, width=128, height=128)
        ch = Character(cfg_world=eng.cfg,
                       move=eng.settings.character_movement)
        ch.position = np.array([31.5, 8.0, 45.0], np.float32)
        ch._update_pose()
        eng.add_entity(ch.entity)
        eng.set_camera(pos=(33.5, 8.6, 46.5), yaw=3.95, pitch=-0.25)
        out = None
        for _ in range(8):
            out = eng.render_accumulated()
        return out

    on = render(True)
    res = image_diff.compare(on, image.read_png(golden_path))
    assert res.verdict in ("identical", "veryClose", "close"), str(res)
    off = render(False)
    # the character's mirror image exists only with entity_in_bounces
    assert np.abs(np.asarray(on) - np.asarray(off)).max() > 0.05


def test_entity_changes_image(engine):
    from rtvb_tpu.models.character import Character
    eng = Engine(settings=Settings(), width=96, height=96)
    g0 = eng.path_trace()
    ch = Character(cfg_world=eng.cfg)
    ch.position = np.array([36.0, 14.0, 20.0], np.float32)
    ch.update(eng.world, 1.0 / 30.0)
    eng.add_entity(ch.entity)
    eng.frame_index = 0   # same RNG as frame 0
    g1 = eng.path_trace()
    d0 = np.asarray(g0.depth)
    d1 = np.asarray(g1.depth)
    changed = (np.abs(d0 - d1) > 0.01).mean()
    assert changed > 0.001, changed   # character occupies some pixels


def test_set_sky_resets_restir_cache():
    """Time-of-day changes must reset the ReSTIR reservoirs: cached sample
    radiance (ReSTIRState.le_*) would replay the OLD sun/sky through
    temporal taps (render/restir.py cache contract)."""
    import numpy as np
    eng = Engine(settings=Settings(), width=64, height=64)
    eng.render_realtime()        # populates restir_state with cached le
    st = eng.restir_state
    assert st is not None
    old_sun = np.asarray(eng.sky_state.sun_dir[1])
    eng.set_sky(time_of_day=18.5)
    assert float(np.asarray(eng.sky_state.sun_dir[1])) != float(old_sun)
    # reservoir state reset: M counts back to zero
    assert float(np.asarray(eng.restir_state.M).max()) == 0.0


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="compiles two 64px frame variants (~15 min CPU)")
def test_light_variant_warmup_prevents_recompile():
    """warm_light_variant_async pre-builds the lights-on frame fn; placing
    the first emissive block must then find the compiled variant (no
    mid-play compile hitch)."""
    eng = Engine(settings=Settings(), width=64, height=64)
    eng.render_realtime()
    t = eng.warm_light_variant_async()
    assert t is not None
    t.join(timeout=600)
    assert not t.is_alive()
    n_local = eng.settings.rendering.local_light_candidates
    key = ("frame", eng.width, eng.height, eng.out_width, eng.out_height,
           True, n_local)
    assert key in eng._compiled
    # place an emissive block: n_local flips and the warmed fn is reused
    emissive_id = eng.block_registry.emissive_ids[0]
    eng.set_block(32, 20, 32, emissive_id)
    assert eng._n_lights > 0
    assert eng._frame_fn() is eng._compiled[key]
    eng.render_realtime()          # must not raise


def test_batched_dispatch_matches_sequential():
    """render_realtime_device_batch(2) advances the same estimator as two
    sequential frames (CUDA-Graphs-role dispatch batching): same RNG
    stream (frame_idx0 + k), same temporal state threading."""
    import jax
    s = Settings()
    eng_a = Engine(settings=s, width=64, height=64)
    eng_b = Engine(settings=s, width=64, height=64)
    seq = [np.asarray(eng_a.render_realtime()) for _ in range(2)]
    outs = np.asarray(jax.device_get(eng_b.render_realtime_device_batch(2)))
    assert outs.shape[0] == 2
    for k in range(2):
        diff = np.abs(outs[k].astype(int) - seq[k].astype(int))
        # same estimator; scan-vs-straightline fusion may flip a few ULPs
        # through the u8 quantizer
        assert float((diff > 2).mean()) < 0.01, (k, float(diff.mean()))
    assert eng_b.frame_index == 2
