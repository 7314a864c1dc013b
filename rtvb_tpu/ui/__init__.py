"""Graphical UI: bitmap font, RGBA overlay raster, menu + dev-panel screens
(ui/GameUIManager.cpp + DeveloperGUIOverlay.cpp roles, TPU split: host
raster on UI events, device alpha-composite per frame)."""
from .raster import OverlayCanvas                            # noqa: F401
from .overlay import render_menu, render_dev_panel, render_hud  # noqa: F401
