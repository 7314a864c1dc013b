"""Skeleton: joint hierarchy, bind pose, global matrices.

Capability parity with renderer/animation/Skeleton.{h,cpp} + Animation.h:7-26
(joint parent indices, TRS locals, inverse-bind matrices, MAX_JOINTS=128,
hierarchical global-matrix update uploaded for skinning).

The hierarchy walk is a host-side topological order baked at load time; the
per-frame math (quat→matrix, parent chain multiply, skinning-matrix compose)
is jitted jnp — a (J, 4, 4) matmul chain, trivially small next to rendering.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

MAX_JOINTS = 128


def _xp(a):
    """numpy for host arrays, jnp otherwise (see animation._xp): per-frame
    pose math runs on the host; only joint matrices reach the device."""
    return np if isinstance(a, np.ndarray) else jnp


def quat_to_mat3(q):
    """(..., 4) xyzw quaternion → (..., 3, 3) rotation matrix."""
    xp = _xp(q)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = xp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def trs_to_mat4(t, r, s):
    """translation (..., 3), rotation quat (..., 4), scale (..., 3) → (..., 4, 4)."""
    xp = _xp(t)
    rot = quat_to_mat3(r) * s[..., None, :]
    top = xp.concatenate([rot, t[..., :, None]], axis=-1)          # (..., 3, 4)
    bottom = xp.broadcast_to(
        xp.asarray([0.0, 0.0, 0.0, 1.0], top.dtype),
        t.shape[:-1] + (1, 4))
    return xp.concatenate([top, bottom], axis=-2)


@dataclass
class Skeleton:
    """Static skeleton description (host); per-frame pose is arrays."""
    names: list
    parents: np.ndarray          # (J,) int, -1 = root
    bind_t: np.ndarray           # (J, 3)
    bind_r: np.ndarray           # (J, 4) xyzw
    bind_s: np.ndarray           # (J, 3)
    inverse_bind: np.ndarray     # (J, 4, 4)
    order: np.ndarray = field(init=False)   # topological order

    def __post_init__(self):
        j = len(self.parents)
        assert j <= MAX_JOINTS
        order = []
        remaining = set(range(j))
        placed = set()
        while remaining:
            for i in sorted(remaining):
                if self.parents[i] < 0 or self.parents[i] in placed:
                    order.append(i)
                    placed.add(i)
                    remaining.discard(i)
                    break
            else:
                raise ValueError("cyclic skeleton")
        self.order = np.array(order, np.int32)

    @property
    def n_joints(self) -> int:
        return len(self.parents)

    def global_matrices(self, local_t, local_r, local_s):
        """Hierarchical local→global compose (Skeleton.h:96-105).
        Inputs (J, 3/4/3) jnp; returns (J, 4, 4)."""
        locals_m = trs_to_mat4(local_t, local_r, local_s)
        mats = [None] * self.n_joints
        for i in self.order:
            i = int(i)
            p = int(self.parents[i])
            mats[i] = locals_m[i] if p < 0 else mats[p] @ locals_m[i]
        return _xp(locals_m).stack(mats)

    def skinning_matrices(self, local_t, local_r, local_s, model=None):
        """Global ∘ inverseBind per joint — the d_jointMatrices upload."""
        g = self.global_matrices(local_t, local_r, local_s)
        inv = self.inverse_bind if _xp(g) is np else jnp.asarray(self.inverse_bind)
        skin = g @ inv
        if model is not None:
            skin = model[None] @ skin
        return skin

    def bind_pose(self):
        return (jnp.asarray(self.bind_t), jnp.asarray(self.bind_r),
                jnp.asarray(self.bind_s))

    def bind_pose_np(self):
        return self.bind_t, self.bind_r, self.bind_s
