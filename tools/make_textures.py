"""Synthesize the shipped authored block textures (data/textures/*.png).

The reference ships ~60 hand-authored PNG block textures
(/root/reference/data/textures, loaded by TextureManager.cu:222-240).  This
repo cannot copy them, so this tool *authors* a compact set in their style —
512x512 sRGB tiling albedo maps (assets/image_textures S0 base) plus
derived `_n` (tangent normal) and
`_r` (roughness-multiplier) planes — and commits the PNGs as data assets
(materials.yaml:10-13 albedo/normal/roughness triple role).  The
engine ingests them through assets/image_textures.load_atlas exactly as it
would ingest any external texture pack dropped into data/textures/.

Usage: python tools/make_textures.py [out_dir]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

S = 512
F = S // 128     # pixel-constant scale vs the r4 128-px recipes


def _hash01(ix, iy, seed):
    h = (ix * 374761393 + iy * 668265263 + seed * 962287) & 0xFFFFFFFF
    h = (h ^ (h >> 13)) * 1274126177 & 0xFFFFFFFF
    return ((h ^ (h >> 16)) & 0xFFFF) / 65535.0


def _noise(freq, seed):
    """Tiling bilinear value noise at integer frequency `freq`."""
    gx, gy = np.meshgrid(np.arange(S), np.arange(S), indexing="xy")
    x = gx * freq / S
    y = gy * freq / S
    xi = np.floor(x).astype(int)
    yi = np.floor(y).astype(int)
    xf = x - xi
    yf = y - yi
    xf = xf * xf * (3 - 2 * xf)
    yf = yf * yf * (3 - 2 * yf)
    n00 = _hash01(xi % freq, yi % freq, seed)
    n10 = _hash01((xi + 1) % freq, yi % freq, seed)
    n01 = _hash01(xi % freq, (yi + 1) % freq, seed)
    n11 = _hash01((xi + 1) % freq, (yi + 1) % freq, seed)
    return (n00 * (1 - xf) + n10 * xf) * (1 - yf) + (n01 * (1 - xf) + n11 * xf) * yf


def _fbm(freq, seed, octaves=5):
    out = np.zeros((S, S))
    amp, f, norm = 1.0, freq, 0.0
    for o in range(octaves):
        out += amp * _noise(f, seed + 31 * o)
        norm += amp
        amp *= 0.55
        f *= 2
    return out / norm


def _mix(a, b, t):
    t = np.clip(t, 0, 1)[..., None]
    return np.asarray(a) * (1 - t) + np.asarray(b) * t


def make_grass():
    base = _mix((0.13, 0.32, 0.07), (0.32, 0.52, 0.14), _fbm(8, 1))
    blades = _noise(32, 7)
    return _mix(base, (0.42, 0.58, 0.18), (blades > 0.82) * 0.7)


def make_stone():
    base = _mix((0.38, 0.38, 0.40), (0.55, 0.54, 0.52), _fbm(6, 11))
    cracks = np.abs(_fbm(5, 13) - 0.5) < 0.02
    return _mix(base, (0.22, 0.22, 0.24), cracks * 0.8)


def make_brick():
    gx, gy = np.meshgrid(np.arange(S), np.arange(S), indexing="xy")
    row = gy // (16 * F)
    bx = (gx + (row % 2) * 16 * F) % (32 * F)
    by = gy % (16 * F)
    mortar = (bx < 2 * F) | (by < 2 * F)
    shade = _hash01((gx + (row % 2) * 16 * F) // (32 * F), row, 17)[..., None]
    brick = np.asarray((0.52, 0.19, 0.13)) * (0.8 + 0.4 * shade)
    out = np.where(mortar[..., None], np.asarray((0.62, 0.58, 0.54)), brick)
    return out * (0.85 + 0.3 * _fbm(16, 19)[..., None])


def make_planks():
    gx, gy = np.meshgrid(np.arange(S), np.arange(S), indexing="xy")
    plank = gy // (16 * F)
    grain = np.sin((gx / S + _fbm(4, 23) * 0.4 + plank * 0.37) * 28.0)
    base = _mix((0.42, 0.28, 0.13), (0.60, 0.42, 0.21), 0.5 + 0.5 * grain)
    gap = (gy % (16 * F)) < F
    return _mix(base, (0.25, 0.16, 0.08), gap * 0.9)


def make_sand():
    base = _mix((0.76, 0.66, 0.44), (0.88, 0.80, 0.58), _fbm(10, 29))
    speck = _noise(32, 31) > 0.93
    return _mix(base, (0.95, 0.91, 0.75), speck * 0.6)


def make_soil():
    base = _mix((0.28, 0.18, 0.10), (0.45, 0.31, 0.18), _fbm(9, 37))
    pebbles = _noise(16, 41) > 0.88
    return _mix(base, (0.52, 0.46, 0.40), pebbles * 0.5)


def make_bark():
    gx, gy = np.meshgrid(np.arange(S), np.arange(S), indexing="xy")
    ridges = np.sin((gx / S + _fbm(6, 43) * 0.5) * 22.0)
    base = _mix((0.24, 0.16, 0.08), (0.42, 0.30, 0.16), 0.5 + 0.5 * ridges)
    return base * (0.8 + 0.4 * _fbm(12, 47)[..., None])


def make_leaves():
    base = _mix((0.08, 0.25, 0.05), (0.22, 0.45, 0.10), _fbm(12, 53))
    glint = _noise(24, 59) > 0.85
    return _mix(base, (0.40, 0.62, 0.20), glint * 0.8)


RECIPES = {
    "grass": make_grass, "stone": make_stone, "brick": make_brick,
    "planks": make_planks, "sand": make_sand, "soil": make_soil,
    "bark": make_bark, "leaves": make_leaves,
}


def _derived_maps(linear):
    """Normal + roughness planes derived from the albedo's height proxy
    (luminance): wrapped central-difference gradient -> RG tangent normal;
    height deviation -> roughness multiplier (recesses rougher)."""
    lum = linear @ np.asarray((0.2126, 0.7152, 0.0722))
    du = (np.roll(lum, -1, axis=1) - np.roll(lum, 1, axis=1)) * 0.5
    dv = (np.roll(lum, -1, axis=0) - np.roll(lum, 1, axis=0)) * 0.5
    k = 6.0
    nrm = np.stack([0.5 + np.clip(du * k, -0.5, 0.5),
                    0.5 + np.clip(dv * k, -0.5, 0.5),
                    np.ones_like(lum)], -1)
    rough = np.clip(0.85 - 0.6 * (lum - lum.mean()), 0.45, 1.0)
    return nrm, np.repeat(rough[..., None], 3, -1)


def main(out_dir=None):
    out_dir = out_dir or os.path.join(
        os.path.dirname(__file__), "..", "data", "textures")
    os.makedirs(out_dir, exist_ok=True)
    from rtvb_tpu.utils.image import write_png

    def emit(fname, img01):
        write_png(os.path.join(out_dir, fname),
                  (np.clip(img01, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8))

    for name, fn in RECIPES.items():
        linear = np.clip(fn(), 0.0, 1.0)
        emit(f"{name}.png", linear ** (1.0 / 2.2))
        nrm, rough = _derived_maps(linear)
        emit(f"{name}_n.png", nrm)
        emit(f"{name}_r.png", rough)
        print(f"wrote {name}.png (+_n, +_r)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
