#!/usr/bin/env python3
"""Headless semantic texel labeler for character-skin textures.

Role parity with the reference's Tkinter GUI tool
(meshlab/semantic_labeler/semantic_texel_labeler.py, 795 LoC): paint
semantic labels (skin / hair / clothing / metal / leather / …) onto an
N×N character texture, grow a label region by color similarity, and
round-trip the same JSON format ({"labels": {...}, "semantic_map": [[...]]}).
A GUI cannot run in this environment, so the tool is a LIBRARY + CLI: the
data model and every mutation op (rectangle paint, freehand point paint,
color-similarity region expansion with undo) are importable and tested,
and the CLI scripts them over files.

Usage:
  python tools/semantic_labeler.py init  --size 64 --out map.json
  python tools/semantic_labeler.py rect  --map map.json --label 3 \
      --x0 8 --y0 0 --x1 24 --y1 8
  python tools/semantic_labeler.py expand --map map.json --label 3 \
      --texture skin.png --threshold 20
  python tools/semantic_labeler.py overlay --map map.json \
      --texture skin.png --out overlay.png
  python tools/semantic_labeler.py stats --map map.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT_LABELS = {
    0: {"name": "None", "color": "#FFFFFF", "description": "No label"},
    1: {"name": "Skin", "color": "#FFDBAC", "description": "Character skin texture"},
    2: {"name": "Hair", "color": "#8B4513", "description": "Hair/fur texture"},
    3: {"name": "Clothing", "color": "#4169E1", "description": "Clothing fabric"},
    4: {"name": "Metal", "color": "#C0C0C0", "description": "Metal materials"},
    5: {"name": "Leather", "color": "#8B4513", "description": "Leather materials"},
}


class SemanticMap:
    """Label raster + palette with the reference tool's operations."""

    def __init__(self, size: int = 64, labels: dict | None = None):
        self.size = size
        self.map = np.zeros((size, size), dtype=int)
        self.labels = {int(k): dict(v) for k, v in
                       (labels or DEFAULT_LABELS).items()}
        self._pre_expansion = None

    # ---- mutation ops (GUI button / drag equivalents) -------------------

    def paint_points(self, points, label_id: int):
        for y, x in points:
            if 0 <= y < self.size and 0 <= x < self.size:
                self.map[y, x] = label_id

    def paint_rect(self, x0: int, y0: int, x1: int, y1: int, label_id: int):
        x0, x1 = sorted((max(x0, 0), min(x1, self.size)))
        y0, y1 = sorted((max(y0, 0), min(y1, self.size)))
        self.map[y0:y1, x0:x1] = label_id

    @staticmethod
    def _threshold_distance(threshold_0_100: float) -> float:
        """The reference's exponential 0-100 → RGB-distance mapping (finer
        control at low thresholds)."""
        if threshold_0_100 <= 0:
            return 0.0
        return (threshold_0_100 / 100.0) ** 1.5 * 50.0

    def expand_label(self, rgb: np.ndarray, label_id: int,
                     threshold: float = 20.0) -> int:
        """Flood-grow `label_id` into UNLABELED texels whose color sits
        within the similarity threshold of an adjacent already-labeled
        texel (8-neighborhood) — the reference's region expansion.
        Returns the number of texels added; undoable."""
        assert rgb.shape[:2] == (self.size, self.size)
        if label_id == 0:
            raise ValueError("cannot expand the 'None' label")
        self._pre_expansion = self.map.copy()
        thr = self._threshold_distance(threshold)
        rgbf = rgb[..., :3].astype(np.float64)

        ys, xs = np.where(self.map == label_id)
        to_check = set()

        def neighbors(y, x):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy == dx == 0:
                        continue
                    ny, nx = y + dy, x + dx
                    if 0 <= ny < self.size and 0 <= nx < self.size:
                        yield ny, nx

        for y, x in zip(ys, xs):
            for ny, nx in neighbors(y, x):
                if self.map[ny, nx] == 0:
                    to_check.add((ny, nx))

        expanded = 0
        processed = set()
        while to_check:
            y, x = to_check.pop()
            if (y, x) in processed:
                continue
            processed.add((y, x))
            if self.map[y, x] != 0:
                continue
            c = rgbf[y, x]
            similar = any(
                self.map[ny, nx] == label_id
                and float(np.linalg.norm(c - rgbf[ny, nx])) <= thr
                for ny, nx in neighbors(y, x))
            if similar:
                self.map[y, x] = label_id
                expanded += 1
                for ny, nx in neighbors(y, x):
                    if self.map[ny, nx] == 0 and (ny, nx) not in processed:
                        to_check.add((ny, nx))
        return expanded

    def undo_expansion(self) -> bool:
        if self._pre_expansion is None:
            return False
        self.map = self._pre_expansion
        self._pre_expansion = None
        return True

    # ---- JSON round-trip (reference export/import format) ---------------

    def to_dict(self) -> dict:
        return {"labels": {str(k): v for k, v in self.labels.items()},
                "semantic_map": self.map.tolist()}

    @classmethod
    def from_dict(cls, data: dict) -> "SemanticMap":
        if "labels" not in data or "semantic_map" not in data:
            raise ValueError("Invalid semantic map file format")
        m = np.array(data["semantic_map"], dtype=int)
        if m.ndim != 2 or m.shape[0] != m.shape[1]:
            raise ValueError(f"Invalid semantic map size: {m.shape}")
        labels = {int(k): {"name": v["name"], "color": v["color"],
                           "description": v.get("description", "No description")}
                  for k, v in data["labels"].items()}
        out = cls(size=m.shape[0], labels=labels)
        out.map = m
        return out

    def save(self, path: str):
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def load(cls, path: str) -> "SemanticMap":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    # ---- visualization (GUI canvas equivalent) ---------------------------

    def overlay(self, rgb: np.ndarray, alpha: float = 0.5) -> np.ndarray:
        """Blend each label's palette color over the texture (u8 out)."""
        out = rgb[..., :3].astype(np.float64).copy()
        for lid, meta in self.labels.items():
            if lid == 0:
                continue
            c = meta["color"].lstrip("#")
            col = np.array([int(c[i:i + 2], 16) for i in (0, 2, 4)], float)
            mask = self.map == lid
            out[mask] = out[mask] * (1 - alpha) + col * alpha
        return np.clip(out, 0, 255).astype(np.uint8)

    def stats(self) -> dict:
        counts = {int(lid): int((self.map == lid).sum())
                  for lid in self.labels}
        return {"size": self.size, "counts": counts}


def main(argv=None):
    ap = argparse.ArgumentParser("semantic_labeler")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("init")
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--out", required=True)
    p = sub.add_parser("rect")
    p.add_argument("--map", required=True)
    p.add_argument("--label", type=int, required=True)
    for k in ("x0", "y0", "x1", "y1"):
        p.add_argument(f"--{k}", type=int, required=True)
    p = sub.add_parser("expand")
    p.add_argument("--map", required=True)
    p.add_argument("--label", type=int, required=True)
    p.add_argument("--texture", required=True)
    p.add_argument("--threshold", type=float, default=20.0)
    p = sub.add_parser("overlay")
    p.add_argument("--map", required=True)
    p.add_argument("--texture", required=True)
    p.add_argument("--out", required=True)
    p = sub.add_parser("stats")
    p.add_argument("--map", required=True)
    args = ap.parse_args(argv)

    if args.cmd == "init":
        SemanticMap(size=args.size).save(args.out)
        print(f"wrote {args.out} ({args.size}x{args.size})")
        return 0
    sm = SemanticMap.load(args.map)
    if args.cmd == "rect":
        sm.paint_rect(args.x0, args.y0, args.x1, args.y1, args.label)
        sm.save(args.map)
        print(f"painted rect -> label {args.label}")
    elif args.cmd == "expand":
        from rtvb_tpu.utils.image import read_png
        n = sm.expand_label(read_png(args.texture), args.label,
                            args.threshold)
        sm.save(args.map)
        print(f"expanded {n} texels into label {args.label}")
    elif args.cmd == "overlay":
        from rtvb_tpu.utils.image import read_png, write_png
        write_png(args.out, sm.overlay(read_png(args.texture)))
        print(f"wrote {args.out}")
    elif args.cmd == "stats":
        print(json.dumps(sm.stats()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
