"""Procedural surface textures, evaluated arithmetically per shading point.

Replaces the reference's image-texture stack (renderer/assets/TextureManager.cu
— stb_image + NVTT mipmapped CUDA texture objects, sampled with ray-cone LOD
in closesthit.cu:195-200).  On TPU, per-pixel gathers from megabyte texture
atlases are the single most expensive operation in the machine, while VPU
arithmetic is effectively free — so block surface detail is *computed*:
hash-based value noise, stripes and brick patterns in the same world-grid
triplanar UV space the reference uses (closesthit.cu:169-186).  Ray-cone LOD
maps to analytic smoothing of the noise amplitude with distance (no mip
chain needed — the pattern amplitude rolls off where a mip lookup would
have blurred it).

Texture ids index the registry below; materials reference them by name.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.rng import pcg_hash, to_unit_float

TEXTURE_NAMES = ["noise_fine", "noise_mid", "noise_coarse", "stripes", "bricks"]
TEXTURE_IDS = {n: i for i, n in enumerate(TEXTURE_NAMES)}


def _value_noise(u, v, freq, seed):
    """Bilinear value noise on an integer lattice, u/v in texture units."""
    x = u * freq
    y = v * freq
    xi = jnp.floor(x)
    yi = jnp.floor(y)
    xf = x - xi
    yf = y - yi
    xf = xf * xf * (3.0 - 2.0 * xf)
    yf = yf * yf * (3.0 - 2.0 * yf)
    xi = xi.astype(jnp.int32)
    yi = yi.astype(jnp.int32)

    def lattice(ix, iy):
        h = pcg_hash((ix * jnp.int32(374761393) + iy * jnp.int32(668265263)
                      + jnp.int32(seed)).astype(jnp.uint32))
        return to_unit_float(h)

    n00 = lattice(xi, yi)
    n10 = lattice(xi + 1, yi)
    n01 = lattice(xi, yi + 1)
    n11 = lattice(xi + 1, yi + 1)
    nx0 = n00 + xf * (n10 - n00)
    nx1 = n01 + xf * (n11 - n01)
    return nx0 + yf * (nx1 - nx0)


def _fbm(u, v, freq, seed, octaves=2):
    total = jnp.zeros_like(jnp.asarray(u, jnp.float32))
    amp, f, norm = 1.0, freq, 0.0
    for o in range(octaves):
        total = total + amp * _value_noise(u, v, f, seed + 131 * o)
        norm += amp
        amp *= 0.5
        f *= 2.0
    return total / norm


def sample_scale(tex_id, u, v, lod=None):
    """Albedo multiplier in ~[0.7, 1.3] for each texture id (vectorized).

    tex_id: int32 array (-1 = none → 1.0); u, v: face-local [0,1) coords;
    lod: optional cone-width proxy in [0,∞) — rolls pattern contrast off
    with distance (analytic mip).
    """
    u = jnp.asarray(u, jnp.float32)
    v = jnp.asarray(v, jnp.float32)

    fine = _fbm(u, v, 9.0, 11)
    mid = _fbm(u, v, 5.0, 23)
    coarse = _fbm(u, v, 3.0, 47)

    # wood stripes: bands along v with jitter
    band = jnp.sin((v + 0.35 * _value_noise(u, v, 2.0, 61)) * 18.0)
    stripes = 0.5 + 0.5 * band * band

    # bricks: staggered grid with mortar lines
    bu = u * 3.0
    bv = v * 6.0
    row = jnp.floor(bv)
    bu = bu + jnp.where((row.astype(jnp.int32) & 1) == 1, 0.5, 0.0)
    fu = bu - jnp.floor(bu)
    fv = bv - jnp.floor(bv)
    mortar = (fu < 0.06) | (fu > 0.94) | (fv < 0.1) | (fv > 0.9)
    bricks = jnp.where(mortar, 0.35, 0.9 + 0.2 * _value_noise(jnp.floor(bu), row, 1.0, 77))

    pattern = jnp.select(
        [tex_id == 0, tex_id == 1, tex_id == 2, tex_id == 3, tex_id == 4],
        [fine, mid, coarse, stripes, bricks],
        default=jnp.full_like(u, 0.5),
    )
    contrast = jnp.float32(0.6)
    if lod is not None:
        contrast = contrast / (1.0 + 2.0 * jnp.asarray(lod, jnp.float32))
    scale = 1.0 + contrast * (pattern - 0.5)
    return jnp.where(tex_id < 0, 1.0, scale)


def sample_normal_delta(tex_id, u, v, lod=None, eps: float = 0.004):
    """Procedural height-field gradient (du, dv) for normal perturbation —
    the TPU-native normal map (closesthit.cu:241-254 role).  Central
    differences of the same pattern `sample_scale` uses, so shading detail
    and normal detail stay registered; the ray-cone LOD rolls the gradient
    off with distance exactly like a sampled normal mip chain would."""
    s_up = sample_scale(tex_id, u + eps, v, lod)
    s_un = sample_scale(tex_id, u - eps, v, lod)
    s_vp = sample_scale(tex_id, u, v + eps, lod)
    s_vn = sample_scale(tex_id, u, v - eps, lod)
    du = (s_up - s_un) / (2.0 * eps)
    dv = (s_vp - s_vn) / (2.0 * eps)
    return du, dv


def perturb_normal(n, du, dv, strength: float = 0.06):
    """Bend an axis-aligned face normal by the height gradient in its
    triplanar tangent frame.  The tangent/bitangent of the dominant axis
    match triplanar_uv's (u, v) projection."""
    import jax.numpy as _jnp
    from ..ops import mathutil as _m
    nx, ny, nz = n
    ax = _jnp.abs(nx)
    ay = _jnp.abs(ny)
    on_x = ax > 0.5
    on_y = (~on_x) & (ay > 0.5)
    # u axis: x-face → z, y-face → x, z-face → x (matches triplanar_uv)
    tu = (_jnp.where(on_x, 0.0, 1.0),
          _jnp.zeros_like(nx),
          _jnp.where(on_x, 1.0, 0.0))
    # v axis: x-face → y, y-face → z, z-face → y
    tv = (_jnp.zeros_like(nx),
          _jnp.where(on_y, 0.0, 1.0),
          _jnp.where(on_y, 1.0, 0.0))
    bent = (nx - strength * (du * tu[0] + dv * tv[0]),
            ny - strength * (du * tu[1] + dv * tv[1]),
            nz - strength * (du * tu[2] + dv * tv[2]))
    return _m.normalize(bent)


def triplanar_uv(px, py, pz, nx, ny, nz):
    """World-grid triplanar UVs from hit position + axis face normal
    (closesthit.cu:169-186 equivalent: project onto the dominant axis)."""
    ax = jnp.abs(nx)
    ay = jnp.abs(ny)
    u = jnp.where(ax > 0.5, pz, jnp.where(ay > 0.5, px, px))
    v = jnp.where(ax > 0.5, py, jnp.where(ay > 0.5, pz, py))
    return u - jnp.floor(u), v - jnp.floor(v)
