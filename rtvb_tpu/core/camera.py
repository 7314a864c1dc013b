"""Pinhole camera: uv↔world mappings, ray generation, reprojection.

Capability parity with renderer/shaders/Camera.h:6-150 (uvToWorldDirection /
worldDirectionToUV matrix pairs, yaw/pitch basis, per-pixel ray-cone width)
and renderer/core/RenderCamera.h (current + history camera pair).

The camera is a small pytree of scalars so it can be passed into jitted frame
functions without recompilation; resolution is static and lives in Settings.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import mathutil as m


class Camera(NamedTuple):
    """All fields are scalar jnp arrays (f32) — a pytree leaf bundle."""
    pos_x: jnp.ndarray
    pos_y: jnp.ndarray
    pos_z: jnp.ndarray
    yaw: jnp.ndarray        # radians, 0 = +x, increases toward +z
    pitch: jnp.ndarray      # radians, positive looks up
    tan_half_fov_y: jnp.ndarray
    aspect: jnp.ndarray     # width / height

    @property
    def pos(self):
        return (self.pos_x, self.pos_y, self.pos_z)

    def basis(self):
        """Returns (front, right, up) orthonormal camera basis (y-up world)."""
        cp, sp = jnp.cos(self.pitch), jnp.sin(self.pitch)
        cy, sy = jnp.cos(self.yaw), jnp.sin(self.yaw)
        front = (cp * cy, sp, cp * sy)
        # world up (0,1,0); right = front × up  (so +u moves right on screen)
        right = m.normalize(m.cross(front, (jnp.float32(0), jnp.float32(1), jnp.float32(0))))
        up = m.cross(right, front)
        return front, right, up

    def uv_to_dir(self, u, v):
        """uv in [0,1]² (u→right, v→up) to world-space unit direction.
        Camera.h uvToWorldDirection equivalent."""
        front, right, up = self.basis()
        tx = self.tan_half_fov_y * self.aspect
        ty = self.tan_half_fov_y
        d = m.add(
            front,
            m.add(
                m.scale(right, (u - 0.5) * 2.0 * tx),
                m.scale(up, (v - 0.5) * 2.0 * ty),
            ),
        )
        return m.normalize(d)

    def dir_to_uv(self, d):
        """World direction → (u, v, valid). valid=False behind the camera.
        Camera.h worldDirectionToUV equivalent (used for reprojection)."""
        front, right, up = self.basis()
        df = m.dot(d, front)
        valid = df > 1e-6
        inv = 1.0 / jnp.where(valid, df, 1.0)
        tx = self.tan_half_fov_y * self.aspect
        ty = self.tan_half_fov_y
        u = 0.5 + m.dot(d, right) * inv / (2.0 * tx)
        v = 0.5 + m.dot(d, up) * inv / (2.0 * ty)
        return u, v, valid

    def point_to_uv(self, p):
        """World position → screen uv of the camera at this pose."""
        return self.dir_to_uv(m.sub(p, self.pos))

    def pixel_cone_spread(self, height: int):
        """Ray cone spread angle per pixel (for texture LOD, closesthit.cu:195-200)."""
        return 2.0 * self.tan_half_fov_y / jnp.float32(height)


def make_camera(pos=(0.0, 0.0, 0.0), yaw=0.0, pitch=0.0,
                fov_y_degrees=60.0, aspect=16.0 / 9.0) -> Camera:
    """Camera leaves are HOST numpy scalars, not device arrays: the
    interactive/flythrough paths rebuild the camera every frame, and each
    jnp scalar would be its own tiny device transfer (~10 round-trips per
    frame over the TPU tunnel — measured 29 → 124 ms/frame).  As jit
    arguments numpy scalars batch into the single call transfer."""
    import numpy as _np
    f32 = _np.float32
    return Camera(
        pos_x=f32(pos[0]), pos_y=f32(pos[1]), pos_z=f32(pos[2]),
        yaw=f32(yaw), pitch=f32(pitch),
        tan_half_fov_y=f32(_np.tan(_np.deg2rad(fov_y_degrees) * 0.5)),
        aspect=f32(aspect),
    )


def pixel_uv(width: int, height: int, jitter_u=0.5, jitter_v=0.5,
             y0=0, rows: int | None = None):
    """uv grids for pixels, row 0 = top of image. jitter in [0,1) per pixel
    (scalar or arrays — blue-noise jitter plugs in here, RayGen.cu:113-117).
    y0/rows select a horizontal band of a `height`-tall image (multi-chip
    pixel-tile sharding renders bands)."""
    rows = height if rows is None else rows
    x = jnp.arange(width, dtype=jnp.float32)[None, :]
    y = (jnp.arange(rows, dtype=jnp.float32) + jnp.asarray(y0, jnp.float32))[:, None]
    u = (x + jitter_u) / jnp.float32(width)
    v = 1.0 - (y + jitter_v) / jnp.float32(height)
    u = jnp.broadcast_to(u, (rows, width))
    v = jnp.broadcast_to(v, (rows, width))
    return u, v


def camera_rays(cam: Camera, width: int, height: int, jitter_u=0.5, jitter_v=0.5,
                y0=0, rows: int | None = None):
    """Primary rays: origin (splatted) + unit directions (SoA (rows, W))."""
    rows = height if rows is None else rows
    u, v = pixel_uv(width, height, jitter_u, jitter_v, y0, rows)
    d = cam.uv_to_dir(u, v)
    o = (
        jnp.broadcast_to(cam.pos_x, (rows, width)),
        jnp.broadcast_to(cam.pos_y, (rows, width)),
        jnp.broadcast_to(cam.pos_z, (rows, width)),
    )
    return o, d
