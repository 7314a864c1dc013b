"""Image IO: PNG read/write for frames and goldens.

Replaces the reference's stb_image(_write) usage (OfflineBackend.cpp:191-221
clamp+8-bit PNG writer).  Uses PIL when present, with a dependency-free
zlib/struct fallback writer so headless environments always work.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

try:
    from PIL import Image as _PIL
except Exception:  # pragma: no cover
    _PIL = None


def to_u8(img: np.ndarray) -> np.ndarray:
    """Linear float RGB (H, W, 3) in [0, ~] → clamped 8-bit (no tone map —
    tone mapping is a pipeline stage, OfflineBackend.cpp:191-221 semantics)."""
    img = np.asarray(img, np.float32)
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, img: np.ndarray) -> None:
    """img: (H, W, 3) uint8 or float (floats are clamped to [0,1]).
    Prefers the native C encoder (native/rtvb_native.c, the stb_image_write
    role); falls back to PIL, then the pure-Python writer."""
    if img.dtype != np.uint8:
        img = to_u8(img)
    from . import native
    if native.write_png(path, img):
        return
    if _PIL is not None:
        _PIL.fromarray(img, "RGB").save(path)
        return
    _write_png_raw(path, img)


def write_pngs(paths: list[str], imgs) -> None:
    """Batch write (OfflineBackend.cpp:133-184 std::execution::par role):
    parallel native encode when available, else sequential."""
    imgs = [to_u8(i) if i.dtype != np.uint8 else i for i in imgs]
    from . import native
    if native.write_pngs(paths, imgs):
        return
    for p, i in zip(paths, imgs):
        write_png(p, i)


def read_png(path: str) -> np.ndarray:
    """Returns (H, W, 3) uint8."""
    if _PIL is not None:
        return np.asarray(_PIL.open(path).convert("RGB"))
    raise RuntimeError("PNG reading requires PIL")


def _write_png_raw(path: str, img: np.ndarray) -> None:  # pragma: no cover
    h, w, _ = img.shape
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)
