"""Graphical UI overlay: font/raster/screens + device compositor
(ui/GameUIManager.cpp + DeveloperGUIOverlay.cpp + UIBuffer-compose roles)."""
import numpy as np
import pytest
import jax.numpy as jnp

from rtvb_tpu import ui as ui_gfx
from rtvb_tpu.core.config import Settings
from rtvb_tpu.render.postprocess import compose_overlay
from rtvb_tpu.ui.font import GLYPH_H, GLYPH_W, glyph


def test_font_glyphs_distinct_and_shaped():
    a = glyph("A")
    assert a.shape == (GLYPH_H, GLYPH_W)
    assert a.any()
    assert not np.array_equal(glyph("A"), glyph("B"))
    assert not glyph(" ").any()
    # lowercase maps to uppercase
    assert np.array_equal(glyph("a"), glyph("A"))


def test_raster_text_and_panel():
    c = ui_gfx.OverlayCanvas(64, 128)
    c.panel(4, 4, 120, 56, title="TEST")
    end_x = c.text(8, 20, "HELLO 123", (255, 0, 0, 255))
    assert end_x > 8
    buf = c.buf
    # panel fill + border + title + text all landed
    assert (buf[..., 3] > 0).sum() > 500
    red = (buf[..., 0] == 255) & (buf[..., 1] == 0)
    assert red.any()
    # clipping: drawing off-canvas must not raise
    c.text(125, 60, "CLIP")
    c.fill_rect(-10, -10, 5, 5, (1, 2, 3, 4))


def test_menu_and_dev_panel_screens():
    c = ui_gfx.OverlayCanvas(96, 160)
    ui_gfx.render_menu(c, "MainMenu", ["alpha", "beta"])
    assert (c.buf[..., 3] > 0).any()
    ui_gfx.render_menu(c, "Gameplay", [])
    assert not (c.buf[..., 3] > 0).any()      # gameplay draws nothing
    ui_gfx.render_dev_panel(c, Settings(), {
        "fps": 60.0, "frame_ms": 16.6, "internal": (1280, 720),
        "output": (1920, 1080), "cam": (1.0, 2.0, 3.0),
        "yaw": 0.5, "pitch": -0.2})
    assert (c.buf[..., 3] > 0).sum() > 1000


@pytest.mark.slow
def test_picked_block_edge_highlight():
    """The picked block (camera-center ray) draws a white face-edge outline
    in the realtime frame (VoxelEngine.cu:884-903 edgeToHighlight +
    closesthit.cu:146-157 segment draw, shipped working here)."""
    from rtvb_tpu.render.renderer import Engine
    s = Settings().replace(rendering={"block_highlight": True})
    eng = Engine(settings=s, width=96, height=96)
    # plant a solid block ~3 units straight ahead at eye height so the pick
    # is deterministic regardless of terrain.  The +0.45 lifts the eye off
    # the integer y plane so the picked face is centered on the view (an
    # integer-height eye grazes the face's bottom edge exactly)
    eng.set_camera(pos=(float(eng.camera.pos_x),
                        float(eng.camera.pos_y) + 0.45,
                        float(eng.camera.pos_z)), pitch=0.0)
    cam = eng.camera
    d = np.asarray([float(v) for v in cam.uv_to_dir(jnp.float32(0.5),
                                                    jnp.float32(0.5))])
    p = np.asarray([float(cam.pos_x), float(cam.pos_y), float(cam.pos_z)])
    tgt = np.floor(p + 3.0 * d).astype(int)
    eng.set_block(int(tgt[0]), int(tgt[1]), int(tgt[2]), 1)
    out = eng.render_realtime()
    h, w = out.shape[:2]
    c = out[h // 2 - 24: h // 2 + 24, w // 2 - 24: w // 2 + 24]
    white = (c >= 250).all(axis=-1)
    n_white = int(white.sum())
    # a thin outline: present but nowhere near filling the window
    assert n_white >= 8, f"no highlight pixels near center ({n_white})"
    assert n_white < 24 * 24, f"highlight flood-filled ({n_white})"


def test_compose_overlay_alpha():
    rgb = jnp.full((8, 8, 3), 0.5, jnp.float32)
    ov = np.zeros((8, 8, 4), np.uint8)
    ov[2, 2] = (255, 0, 0, 255)      # opaque red
    ov[3, 3] = (0, 255, 0, 127)      # half green
    out = np.asarray(compose_overlay(rgb, jnp.asarray(ov)))
    np.testing.assert_allclose(out[0, 0], [0.5, 0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(out[2, 2], [1.0, 0.0, 0.0], atol=1e-2)
    assert 0.2 < out[3, 3][0] < 0.3 and 0.6 < out[3, 3][1] < 0.8
