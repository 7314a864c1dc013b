"""Multi-device sharding tests on the 8-virtual-CPU-device mesh (conftest).

Covers parallel/mesh.py (halo exchange, psum reductions, sharded_render) and
the driver-facing dryrun_multichip entry point — the TPU-native equivalent of
the reference's single-GPU SIMT launch, mapped onto pixel-band data
parallelism (SURVEY §2.13).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from rtvb_tpu.parallel.mesh import (
    global_mean, halo_exchange_rows, make_mesh, sharded_render)

# whole-frame / multi-frame jit compiles dominate a cold CPU run of this
# file; `pytest -m 'not slow'` is the <5-min default pass (README)
pytestmark = pytest.mark.slow


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
def test_halo_exchange_rows_matches_edge_clamp():
    """Halo rows delivered over ppermute == the rows a monolithic image would
    contribute, with edge clamp at the global border."""
    H, W, halo, n = 32, 16, 2, 8
    mesh = make_mesh(n)
    img = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)

    f = jax.jit(jax.shard_map(
        lambda x: halo_exchange_rows(x, halo),
        mesh=mesh, in_specs=P("dp"), out_specs=P("dp")))
    out = np.asarray(f(img))  # (H + n*2*halo, W) — each band padded

    rows = H // n
    ref = np.asarray(img)
    for b in range(n):
        band = out[b * (rows + 2 * halo):(b + 1) * (rows + 2 * halo)]
        y0 = b * rows
        top = np.clip(np.arange(y0 - halo, y0), 0, H - 1)
        bot = np.clip(np.arange(y0 + rows, y0 + rows + halo), 0, H - 1)
        want = np.concatenate([ref[top], ref[y0:y0 + rows], ref[bot]])
        np.testing.assert_array_equal(band, want)


@needs_8
def test_global_mean_psum_equals_unsharded_mean():
    H, W, n = 32, 16, 8
    mesh = make_mesh(n)
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.uniform(size=(H, W)).astype(np.float32))

    f = jax.jit(jax.shard_map(
        lambda x: global_mean(x)[None],
        mesh=mesh, in_specs=P("dp"), out_specs=P("dp")))
    got = np.asarray(f(img))
    np.testing.assert_allclose(got, float(img.mean()), rtol=1e-6)


@needs_8
def test_sharded_render_band_equals_unsharded():
    """A full path-traced frame rendered as 8 sharded bands must equal the
    single-device render bit-for-bit (per-pixel RNG is keyed by absolute
    pixel coords, so band offsets change nothing)."""
    from rtvb_tpu.core.config import Settings
    from rtvb_tpu.ops import dda
    from rtvb_tpu.render import pathtracer
    from rtvb_tpu.render.renderer import Engine

    H = W = 32
    settings = Settings().replace(rendering={
        "render_width": W, "render_height": H, "use_restir": False})
    eng = Engine(settings=settings, width=W, height=H, backend="xla")
    tp = eng._tp
    cfg = eng.cfg
    rs_cfg = eng.settings.rendering

    def render_rows(y0, rows, world, mats, lights, sky_state, cam, hist_cam):
        def trace_fn(o, d, t_cap=None, any_hit=False):
            return dda.trace(o, d, world.colmask, world.df_super[0], tp,
                             t_cap=t_cap, any_hit=any_hit,
                             maxh_row=world.maxh_super[0])
        g, _ = pathtracer.render_frame(
            cfg, world, mats, lights, sky_state, cam, hist_cam,
            jnp.uint32(0), W, H, rs_cfg, trace_fn, y0=y0, rows=rows)
        return jnp.stack([g.illum[i] * g.albedo[i] for i in range(3)], -1)

    args = (eng.world, eng.materials, eng.lights, eng.sky_state,
            eng.camera, eng.history_camera)
    mono = np.asarray(render_rows(0, H, *args))

    mesh = make_mesh(8)
    banded = np.asarray(sharded_render(mesh, render_rows, H, W, args))

    assert banded.shape == mono.shape
    np.testing.assert_allclose(banded, mono, atol=1e-5)


@needs_8
def test_sharded_full_frame_matches_unsharded_3_frames():
    """The REAL sharded product frame (PT + temporal ReSTIR + denoiser +
    post, parallel/frame.py) vs the unsharded Engine frame fn, across 3
    frames of temporal-state flow — two static, then one with camera motion.

    Asserts the halo-recompute claim (parallel/frame.py docstring): every
    device's OWN rows of the accumulated radiance (denoiser slow history)
    and the reservoir M-planes equal the monolithic frame, and the final
    post-processed u8 image matches exactly (post runs on the gathered
    frame, which is identical if the bands are)."""
    from rtvb_tpu.core.config import Settings
    from rtvb_tpu.core.camera import make_camera
    from rtvb_tpu.ops.pack import unpack2
    from rtvb_tpu.parallel.frame import (band_layout, initial_sharded_state,
                                         sharded_frame_fn)
    from rtvb_tpu.render.denoiser import initial_denoiser_state
    from rtvb_tpu.render.postprocess import initial_post_state
    from rtvb_tpu.render import restir as restir_mod
    from rtvb_tpu.render.renderer import Engine

    H = W = 64
    n = 8
    # smaller à-trous pyramid keeps the halo (and compile time) modest while
    # exercising every pass
    # half_res_gi off: the sharded frame renders full-res GI (band offsets
    # can be odd, so the 2x2 GI quads of parallel/frame.py bands could not
    # align with the monolithic frame's quads; scale-out already multiplies
    # the ray budget, so the single-chip GI knob stays off there)
    settings = Settings().replace(
        rendering={"render_width": W, "render_height": H,
                   "half_res_gi": False,
                   # the authored-atlas twin adds tens of minutes of XLA
                   # CPU compile under shard_map while adding nothing
                   # sharding-specific (it's pixel-local); authored parity
                   # is covered by test_image_textures + the goldens
                   "authored_textures": False},
        denoising={"atrous_iterations": 2})
    eng = Engine(settings=settings, width=W, height=H, backend="xla")
    rows, ext, halo = band_layout(H, n, eng.settings.denoising)
    ent = eng.entity_buffers()
    cam = eng.camera
    cam2 = make_camera(pos=(float(cam.pos_x) + 0.05, float(cam.pos_y),
                            float(cam.pos_z)),
                       yaw=float(cam.yaw) + 0.01, pitch=float(cam.pitch),
                       fov_y_degrees=60.0, aspect=W / H)
    frames = [(cam, cam, 0), (cam, cam, 1), (cam2, cam, 2)]

    # --- monolithic ---
    mono = eng._frame_fn()
    m_restir = restir_mod.initial_state(H, W)
    m_dstate = initial_denoiser_state(H, W)
    m_pstate = initial_post_state()
    for c, hc, fi in frames:
        m_out, m_restir, m_dstate, m_pstate = mono(
            eng.world, eng.materials, eng.lights, eng.sky_state, c, hc,
            jnp.int32(fi), m_restir, eng._light_remap, m_dstate, m_pstate,
            jnp.float32(1 / 60), ent)

    # --- sharded ---
    mesh = make_mesh(n)
    step, _ = sharded_frame_fn(eng, mesh)
    s_restir, s_dstate = initial_sharded_state(eng, n)
    s_pstate = initial_post_state()
    # uncommitted identity remap: the engine's cached one is device_put-
    # committed to device 0, which pins the mesh jit ("incompatible
    # devices") — same fix as __graft_entry__.dryrun_multichip
    remap = jnp.arange(eng._light_remap.shape[0], dtype=jnp.int32)
    for c, hc, fi in frames:
        s_out, s_restir, s_dstate, s_pstate = step(
            eng.world, eng.materials, eng.lights, eng.sky_state, c, hc,
            jnp.int32(fi), s_restir, remap, s_dstate, s_pstate,
            jnp.float32(1 / 60), ent)

    def own_rows(arr_ext, plane_axis):
        """Gather each band's own rows from the (n·ext)-row sharded array."""
        a = np.asarray(arr_ext)
        bands = []
        for b in range(n):
            y0e = min(max(b * rows - halo, 0), H - ext)
            crop = b * rows - y0e
            sl = [slice(None)] * a.ndim
            sl[plane_axis] = slice(b * ext + crop, b * ext + crop + rows)
            bands.append(a[tuple(sl)])
        return np.concatenate(bands, axis=plane_axis)

    # final image: exact match (u8 quantization absorbs float noise)
    np.testing.assert_array_equal(np.asarray(s_out), np.asarray(m_out))
    # accumulated radiance (denoiser slow history): own rows ≈ monolithic
    np.testing.assert_allclose(own_rows(s_dstate.slow, 0),
                               np.asarray(m_dstate.slow),
                               rtol=1e-4, atol=1e-5)
    # reservoir M-plane: own rows == monolithic
    sM, _ = unpack2(jnp.asarray(own_rows(s_restir.data, 1)[4]))
    mM, _ = unpack2(m_restir.data[4])
    np.testing.assert_allclose(np.asarray(sM), np.asarray(mM), atol=1e-3)


@needs_8
def test_dryrun_multichip_entrypoint():
    """The driver-facing entry must run on virtual CPU devices end to end."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..",
                                    "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
