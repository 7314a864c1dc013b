"""Graphical UI overlay: font/raster/screens + device compositor
(ui/GameUIManager.cpp + DeveloperGUIOverlay.cpp + UIBuffer-compose roles)."""
import numpy as np
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


def test_compose_overlay_alpha():
    rgb = jnp.full((8, 8, 3), 0.5, jnp.float32)
    ov = np.zeros((8, 8, 4), np.uint8)
    ov[2, 2] = (255, 0, 0, 255)      # opaque red
    ov[3, 3] = (0, 255, 0, 127)      # half green
    out = np.asarray(compose_overlay(rgb, jnp.asarray(ov)))
    np.testing.assert_allclose(out[0, 0], [0.5, 0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(out[2, 2], [1.0, 0.0, 0.0], atol=1e-2)
    assert 0.2 < out[3, 3][0] < 0.3 and 0.6 < out[3, 3][1] < 0.8
