#!/usr/bin/env python3
"""Semantic texture upscaler: low-res skin texels → material texture patches.

Role parity with the reference's meshlab/texturelab/texture_upscaler.py
(337 LoC): every texel of an N×N character texture becomes an F×F patch of
the material texture its semantic label maps to, cropped with positional
continuity (adjacent same-material texels read adjacent texture regions),
hue/saturation transplanted from the source texel and value scaled by the
patch's relative value — so the upscale keeps the author's painted colors
while gaining material detail.  Unlabeled/unmapped texels become flat
color patches.

The reference iterates pixels in Python; this version is vectorized numpy
(the whole output assembles in a handful of array ops per material).

Usage:
  python tools/texture_upscaler.py --input skin.png --semantic map.json \
      --mapping mapping.json --textures data/textures --factor 16 \
      --out skin_hi.png

mapping.json: {"Clothing": "brick", "Skin": null, ...} — label NAME →
texture base name in --textures (null = flat color).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def rgb_to_hsv(rgb: np.ndarray) -> np.ndarray:
    """Vectorized RGB[0,1] → HSV[0,1] over trailing channel axis."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = rgb.max(-1)
    mn = rgb.min(-1)
    d = mx - mn
    h = np.zeros_like(mx)
    nz = d > 1e-12
    rmax = nz & (mx == r)
    gmax = nz & (mx == g) & ~rmax
    bmax = nz & ~rmax & ~gmax
    h[rmax] = (((g - b) / np.maximum(d, 1e-12))[rmax] % 6.0)
    h[gmax] = (((b - r) / np.maximum(d, 1e-12))[gmax] + 2.0)
    h[bmax] = (((r - g) / np.maximum(d, 1e-12))[bmax] + 4.0)
    h = h / 6.0
    s = np.where(mx > 1e-12, d / np.maximum(mx, 1e-12), 0.0)
    return np.stack([h, s, mx], -1)


def hsv_to_rgb(hsv: np.ndarray) -> np.ndarray:
    h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
    c = v * s
    x = c * (1.0 - np.abs(h % 2.0 - 1.0))
    m = v - c
    z = np.zeros_like(c)
    idx = np.floor(h).astype(int) % 6
    r = np.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4],
                  [c, x, z, z, x], c)
    g = np.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4],
                  [x, c, c, x, z], z)
    b = np.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4],
                  [z, z, x, c, c], x)
    return np.stack([r, g, b], -1) + m[..., None]


def upscale(skin: np.ndarray, sem_map: np.ndarray, labels: dict,
            mapping: dict, textures: dict, factor: int) -> np.ndarray:
    """(N,N,3) u8 skin + (N,N) labels → (N·F, N·F, 3) u8."""
    n = skin.shape[0]
    big = n * factor
    # start flat: every texel's color replicated (the None-material path)
    out = np.repeat(np.repeat(skin[..., :3], factor, 0), factor, 1)
    out = out.astype(np.float64) / 255.0
    target = skin[..., :3].astype(np.float64) / 255.0
    t_hsv = rgb_to_hsv(target)                                    # (N,N,3)

    for lid, meta in labels.items():
        mat = mapping.get(meta["name"])
        if mat is None or mat not in textures:
            continue
        mask = sem_map == int(lid)
        if not mask.any():
            continue
        tex = textures[mat].astype(np.float64) / 255.0            # (S,S,3)
        s = tex.shape[0]
        # positional-continuity tiling: output pixel (Y, X) reads
        # tex[(Y) % s, (X) % s] — adjacent same-material texels continue
        yy = np.arange(big) % s
        xx = np.arange(big) % s
        tiled = tex[np.ix_(yy, xx)]                               # (big,big,3)
        # per-texel patch value mean (crop average, reference semantics)
        pv = rgb_to_hsv(tiled)[..., 2]
        crop_v = pv.reshape(n, factor, n, factor).mean((1, 3))    # (N,N)
        # transplant hue/sat from the texel; scale value relatively
        phsv = rgb_to_hsv(tiled)
        th = np.repeat(np.repeat(t_hsv[..., 0], factor, 0), factor, 1)
        ts = np.repeat(np.repeat(t_hsv[..., 1], factor, 0), factor, 1)
        tv = np.repeat(np.repeat(t_hsv[..., 2], factor, 0), factor, 1)
        cv = np.repeat(np.repeat(np.maximum(crop_v, 1e-3), factor, 0),
                       factor, 1)
        adj = np.stack([th, ts, np.clip(tv * phsv[..., 2] / cv, 0, 1)], -1)
        patch_rgb = hsv_to_rgb(adj)
        mbig = np.repeat(np.repeat(mask, factor, 0), factor, 1)
        out[mbig] = patch_rgb[mbig]
    return np.clip(out * 255.0 + 0.5, 0, 255).astype(np.uint8)


def main(argv=None):
    ap = argparse.ArgumentParser("texture_upscaler")
    ap.add_argument("--input", required=True)
    ap.add_argument("--semantic", required=True)
    ap.add_argument("--mapping", required=True)
    ap.add_argument("--textures", default="data/textures")
    ap.add_argument("--factor", type=int, default=16)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    from rtvb_tpu.utils.image import read_png, write_png
    with open(args.semantic) as f:
        sem = json.load(f)
    labels = {int(k): v for k, v in sem["labels"].items()}
    sem_map = np.array(sem["semantic_map"], dtype=int)
    with open(args.mapping) as f:
        mapping = json.load(f)
    textures = {}
    for matname in set(v for v in mapping.values() if v):
        p = os.path.join(args.textures, f"{matname}.png")
        if os.path.exists(p):
            textures[matname] = read_png(p)
    skin = read_png(args.input)
    out = upscale(skin, sem_map, labels, mapping, textures, args.factor)
    write_png(args.out, out)
    print(f"wrote {args.out} ({out.shape[0]}x{out.shape[1]})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
