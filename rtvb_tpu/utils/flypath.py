"""Scripted flythrough camera path shared by bench.py, tests and goldens.

The reference's offline harness scripts camera motion for its perf/golden
runs (mainOffline.cpp:273-408); a static camera flatters temporal ReSTIR
and the denoiser (perfect reprojection), so both the moving-camera bench
number and the mid-flight golden ride this exact path."""
from __future__ import annotations

import math


def flythrough_pose(pos0, yaw0: float, i: int, frames: int):
    """Camera pose at step i of a `frames`-step sweep: forward glide +
    sideways weave + yaw pan — exercises disocclusion on both screen
    edges and depth-parallax reprojection."""
    t = i / max(frames - 1, 1)
    pos = (pos0[0] + 3.0 * t,
           pos0[1],
           pos0[2] + 1.5 * math.sin(2.0 * t))
    return pos, yaw0 + 0.5 * t


def apply_flythrough(eng, i: int, frames: int, pos0=None, yaw0=None):
    base = eng.camera
    if pos0 is None:
        pos0 = (float(base.pos_x), float(base.pos_y), float(base.pos_z))
    if yaw0 is None:
        yaw0 = float(base.yaw)
    pos, yaw = flythrough_pose(pos0, yaw0, i, frames)
    eng.set_camera(pos=pos, yaw=yaw)
    return pos0, yaw0
