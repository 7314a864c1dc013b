"""Linear-blend skinning — MXU-shaped vertex transform.

Capability parity with renderer/animation/VertexSkinning.{h,cu} (4-joint
weighted LBS CUDA kernel whose output feeds per-frame BLAS refits).  Here the
skinned vertices feed the entity ray-intersector directly (no BVH to refit);
previous-frame positions are kept by the caller for motion vectors
(Entity.h prevAttributes role).

The transform is expressed as one (N, 4) × (N, 4, 4) weighted-matrix batch —
XLA maps it onto the MXU.
"""
from __future__ import annotations

import jax.numpy as jnp


def skin_vertices(positions, normals, joints, weights, joint_mats):
    """positions (N, 3), normals (N, 3), joints (N, 4) int, weights (N, 4),
    joint_mats (J, 4, 4) → (skinned positions (N, 3), normals (N, 3)).
    applyVertexSkinning (VertexSkinning.cu:46-73) equivalent."""
    m = jnp.take(joint_mats, joints, axis=0)          # (N, 4, 4, 4)
    blended = (m * weights[..., None, None]).sum(axis=1)   # (N, 4, 4)
    p = jnp.concatenate([positions, jnp.ones_like(positions[:, :1])], axis=-1)
    sp = jnp.einsum("nij,nj->ni", blended, p)[:, :3]
    # normals: rotate by the 3x3 part (uniform-scale assumption, as reference)
    sn = jnp.einsum("nij,nj->ni", blended[:, :3, :3], normals)
    sn = sn / jnp.maximum(jnp.linalg.norm(sn, axis=-1, keepdims=True), 1e-8)
    return sp, sn
