"""Authored image-texture ingestion: PNG files → device mip atlas → trilinear
sampling in the triplanar shading frame.

Role parity with renderer/assets/TextureManager.cu:222-240 (stb_image loads +
NVTT mip chains + CUDA texture objects, sampled with ray-cone LOD in
closesthit.cu:195-200), scoped to the TPU-viable budget: a small set of
authored albedo textures (≤16), pow2-square, 2 mip levels, sampled only where
a material opts in (`MaterialDef.image`), with the procedural stack
(assets/textures.py) as the default for everything else.

TPU formulation — there is no texture unit and no fast gather, so bilinear
lookup is expressed as ONE matmul plus a fused weighted reduce:

  * the atlas level is packed as a row matrix  A: (T·S, S·3)
    (texture-major rows; each row is one texel row, channels interleaved)
  * each shading point builds a 2-hot ROW weight vector over T·S
    (rows y0/y1 of its texture block, weighted (1-wy)/wy)
  * M = R @ A : (N, S·3) — the vertically-interpolated texel rows, on the MXU
  * the horizontal lerp is a fused elementwise weighted reduce over x

Two levels give trilinear; the ray-cone `lod` picks the blend.  Cost at
1080p/level-32 is a (N, T·S)×(T·S, S·3) bf16 matmul — MXU work, not gathers.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

# atlas layout constants: S0 = level-0 resolution (downsampled on load)
S0 = 32
MAX_TEXTURES = 16


class TextureAtlas(NamedTuple):
    """Two-level mip atlas in matmul-row layout (see module docstring).

    Arrays only — this rides through jit as a pytree argument.  The texture
    count is rows0.shape[0] // S0; name→slot mapping lives with the loader's
    caller (Engine keeps `texture_atlas_names`)."""
    rows0: jnp.ndarray    # (T*S0,   S0*3) f32 level 0
    rows1: jnp.ndarray    # (T*S0/2, S0/2*3) f32 level 1 (2x2 box)


def atlas_count(atlas: TextureAtlas) -> int:
    return atlas.rows0.shape[0] // S0


def _box_down(img: np.ndarray, size: int) -> np.ndarray:
    """Box-filter a square pow2 RGB image down to (size, size, 3)."""
    h = img.shape[0]
    assert img.shape[0] == img.shape[1], "authored textures must be square"
    assert h & (h - 1) == 0 and size & (size - 1) == 0, "pow2 sizes only"
    while h > size:
        img = 0.25 * (img[0::2, 0::2] + img[1::2, 0::2]
                      + img[0::2, 1::2] + img[1::2, 1::2])
        h //= 2
    return img.astype(np.float32)


def load_atlas(tex_dir: str, names: list[str]):
    """Read `<tex_dir>/<name>.png` for each name into a device atlas.

    Returns (TextureAtlas, kept_names) or (None, ()) when the directory or
    every file is missing (caller falls back to procedural-only shading).
    Images are sRGB-decoded (gamma 2.2 → linear albedo, TextureManager.cu's
    sRGB texture objects role) and box-filtered to S0."""
    from ..utils.image import read_png
    if not names or not os.path.isdir(tex_dir):
        return None, ()
    lvl0 = []
    kept = []
    for name in names[:MAX_TEXTURES]:
        path = os.path.join(tex_dir, f"{name}.png")
        if not os.path.exists(path):
            continue
        img = read_png(path).astype(np.float32) / 255.0
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, -1)
        img = img[..., :3] ** 2.2          # sRGB → linear
        lvl0.append(_box_down(img, S0))
        kept.append(name)
    if not lvl0:
        return None, ()
    a0 = np.stack(lvl0)                                   # (T, S0, S0, 3)
    a1 = 0.25 * (a0[:, 0::2, 0::2] + a0[:, 1::2, 0::2]
                 + a0[:, 0::2, 1::2] + a0[:, 1::2, 1::2])  # (T, S1, S1, 3)
    t = a0.shape[0]
    rows0 = a0.reshape(t * S0, S0 * 3)
    rows1 = a1.reshape(t * (S0 // 2), (S0 // 2) * 3)
    return (TextureAtlas(rows0=jnp.asarray(rows0), rows1=jnp.asarray(rows1)),
            tuple(kept))


def _sample_level(rows: jnp.ndarray, t_count: int, size: int, tid, u, v):
    """Bilinear sample of one mip level for every shading point.

    rows: (t_count*size, size*3); tid (N,) i32 clamped by caller;
    u, v in [0, 1).  Returns (r, g, b) each with tid's shape."""
    shape = u.shape
    uf = u.reshape(-1)
    vf = v.reshape(-1)
    tf = tid.reshape(-1)

    x = uf * size - 0.5
    y = vf * size - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    # wrap (tiling textures)
    x0i = jnp.mod(x0.astype(jnp.int32), size)
    x1i = jnp.mod(x0i + 1, size)
    y0i = jnp.mod(y0.astype(jnp.int32), size)
    y1i = jnp.mod(y0i + 1, size)

    n_rows = t_count * size
    r0 = tf * size + y0i
    r1 = tf * size + y1i
    if jax.default_backend() == "tpu":
        # 2-hot row-weight matrix → MXU matmul (no gathers on TPU)
        ids = jax.lax.broadcasted_iota(jnp.int32, (uf.shape[0], n_rows), 1)
        rw = (jnp.where(ids == r0[:, None], 1.0 - wy[:, None], 0.0)
              + jnp.where(ids == r1[:, None], wy[:, None], 0.0))
        m = jax.lax.dot(rw.astype(jnp.bfloat16), rows.astype(jnp.bfloat16),
                        precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)  # (N, size*3)
        mt = m.reshape(-1, size, 3)
        cols = jax.lax.broadcasted_iota(jnp.int32, (uf.shape[0], size), 1)
        cw = (jnp.where(cols == x0i[:, None], 1.0 - wx[:, None], 0.0)
              + jnp.where(cols == x1i[:, None], wx[:, None], 0.0))
        out = (mt * cw[:, :, None]).sum(1)                 # (N, 3)
    else:
        tex = rows.reshape(t_count * size, size, 3)
        v00 = tex[r0, x0i]
        v01 = tex[r0, x1i]
        v10 = tex[r1, x0i]
        v11 = tex[r1, x1i]
        out = ((v00 * (1 - wx[:, None]) + v01 * wx[:, None]) * (1 - wy[:, None])
               + (v10 * (1 - wx[:, None]) + v11 * wx[:, None]) * wy[:, None])
    return (out[:, 0].reshape(shape), out[:, 1].reshape(shape),
            out[:, 2].reshape(shape))


def sample_atlas(atlas: TextureAtlas, image_id, u, v, lod=None):
    """Trilinear albedo sample: (r, g, b) in linear space; (1,1,1) where
    image_id < 0.  `lod` is the engine's ray-cone width proxy (pathtracer
    passes rec.t * pixel_cone_spread * 8); level blend saturates one mip
    step per doubling, matching the analytic roll-off the procedural
    textures use."""
    n = atlas_count(atlas)
    tid = jnp.clip(image_id, 0, n - 1)
    c0 = _sample_level(atlas.rows0, n, S0, tid, u, v)
    c1 = _sample_level(atlas.rows1, n, S0 // 2, tid, u, v)
    if lod is None:
        w1 = 0.0
    else:
        w1 = jnp.clip(jnp.asarray(lod, jnp.float32) * float(S0) * 0.5, 0.0, 1.0)
    use = image_id >= 0
    out = []
    for i in range(3):
        c = c0[i] * (1.0 - w1) + c1[i] * w1
        out.append(jnp.where(use, c, 1.0))
    return tuple(out)
