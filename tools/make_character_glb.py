"""Generate data/models/character.glb: the shipped rigged blocky character.

Plays the role of the reference's meshlab/minecraft_character_generator.py
(procedurally authored cuboid body parts on a small skeleton, exported as a
skinned glTF with locomotion clips, consumed by GLTFUtils.cpp at runtime).
Here the output is a self-contained .glb consumed by assets/models.load_gltf:
one skinned mesh (rigid per-part weights), a 7-joint skeleton, and
idle/walk/run/place animation clips.

Run: python tools/make_character_glb.py  (writes data/models/character.glb)
"""
from __future__ import annotations

import json
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

JOINT_NAMES = ["root", "torso", "head", "arm_l", "arm_r", "leg_l", "leg_r"]
PARENTS = [-1, 0, 1, 1, 1, 0, 0]
PIVOTS = np.array([
    [0, 0.8, 0], [0, 1.05, 0], [0, 1.4, 0],
    [-0.35, 1.25, 0], [0.35, 1.25, 0],
    [-0.12, 0.75, 0], [0.12, 0.75, 0],
], np.float32)
# (center, size, joint)
PARTS = [
    ((0.0, 1.05, 0.0), (0.5, 0.6, 0.28), 1),    # torso
    ((0.0, 1.55, 0.0), (0.4, 0.4, 0.4), 2),     # head
    ((-0.35, 1.0, 0.0), (0.18, 0.6, 0.18), 3),  # arm L
    ((0.35, 1.0, 0.0), (0.18, 0.6, 0.18), 4),   # arm R
    ((-0.12, 0.4, 0.0), (0.2, 0.75, 0.2), 5),   # leg L
    ((0.12, 0.4, 0.0), (0.2, 0.75, 0.2), 6),    # leg R
]


# UV atlas: cell (row = part index, col = face index) of a 6×6 grid over
# data/textures/character_albedo.png — every (part, face) owns a distinct
# texture region, so the head's front face can carry the painted face while
# its sides stay plain skin (the per-part atlas role of the reference's
# authored character textures, character-frozen-roses.gltf)
N_CELLS = 6
_INSET = 0.06    # keep bilinear taps inside the cell (no cross-cell bleed)


def cuboid(center, size, part_idx=0):
    cx, cy, cz = center
    sx, sy, sz = (s * 0.5 for s in size)
    corners = np.array([
        [cx - sx, cy - sy, cz - sz], [cx + sx, cy - sy, cz - sz],
        [cx + sx, cy + sy, cz - sz], [cx - sx, cy + sy, cz - sz],
        [cx - sx, cy - sy, cz + sz], [cx + sx, cy - sy, cz + sz],
        [cx + sx, cy + sy, cz + sz], [cx - sx, cy + sy, cz + sz],
    ], np.float32)
    faces = [((0, 1, 2, 3), (0, 0, -1)), ((5, 4, 7, 6), (0, 0, 1)),
             ((4, 0, 3, 7), (-1, 0, 0)), ((1, 5, 6, 2), (1, 0, 0)),
             ((3, 2, 6, 7), (0, 1, 0)), ((4, 5, 1, 0), (0, -1, 0))]
    pos, norm, uv, idx = [], [], [], []
    for f, (quad, n) in enumerate(faces):
        base = len(pos)
        for j, ci in enumerate(quad):
            pos.append(corners[ci])
            norm.append(n)
            fu = float(j in (1, 2))
            fv = float(j in (2, 3))
            fu = _INSET + fu * (1.0 - 2 * _INSET)
            fv = _INSET + fv * (1.0 - 2 * _INSET)
            uv.append([(f + fu) / N_CELLS, (part_idx + fv) / N_CELLS])
        idx += [[base, base + 1, base + 2], [base, base + 2, base + 3]]
    return (np.array(pos, np.float32), np.array(norm, np.float32),
            np.array(uv, np.float32), np.array(idx, np.uint32))


def build_mesh():
    pos, norm, uv, idx, joints = [], [], [], [], []
    for k, (center, size, joint) in enumerate(PARTS):
        p, n, u, i = cuboid(center, size, part_idx=k)
        idx.append(i + sum(len(x) for x in pos))
        pos.append(p)
        norm.append(n)
        uv.append(u)
        joints.append(np.full(len(p), joint, np.uint16))
    pos = np.concatenate(pos)
    joints4 = np.zeros((len(pos), 4), np.uint16)
    joints4[:, 0] = np.concatenate(joints)
    weights4 = np.zeros((len(pos), 4), np.float32)
    weights4[:, 0] = 1.0
    return (pos, np.concatenate(norm), np.concatenate(uv),
            np.concatenate(idx), joints4, weights4)


def swing_clip(period, arm_amp, leg_amp, bob, frames=16):
    """Counter-phase limb swing about x; root bob.  Returns per-joint
    (times, translation (F,3), rotation quat (F,4))."""
    times = np.linspace(0.0, period, frames).astype(np.float32)
    phase = 2 * np.pi * times / period
    bind_t = PIVOTS.copy()
    for i, p in enumerate(PARENTS):
        if p >= 0:
            bind_t[i] = PIVOTS[i] - PIVOTS[p]
    out = {}
    for j, name in enumerate(JOINT_NAMES):
        tt = np.tile(bind_t[j], (frames, 1)).astype(np.float32)
        if name in ("arm_l", "leg_r"):
            ang = np.sin(phase) * (arm_amp if name.startswith("arm") else leg_amp)
        elif name in ("arm_r", "leg_l"):
            ang = -np.sin(phase) * (arm_amp if name.startswith("arm") else leg_amp)
        else:
            ang = np.zeros(frames)
        if name == "root":
            tt[:, 1] += np.abs(np.sin(phase)) * bob
        rr = np.zeros((frames, 4), np.float32)
        rr[:, 0] = np.sin(ang / 2)
        rr[:, 3] = np.cos(ang / 2)
        out[j] = (times, tt, rr)
    return out


CLIPS = {
    "idle": swing_clip(3.0, 0.06, 0.0, 0.01),
    "walk": swing_clip(1.0, 0.5, 0.6, 0.03),
    "run": swing_clip(0.6, 0.9, 0.9, 0.06),
    "place": swing_clip(0.4, 1.2, 0.0, 0.0),
}


def author_albedo(tex_path, size=128):
    """Paint data/textures/character_albedo.png: one 6×6 cell grid indexed
    (part row, face col) matching cuboid()'s UV layout.  Ingested by
    assets/image_textures.load_atlas and sampled at entity hits — the role
    of the reference's authored character texture (GLTFUtils.cpp texture
    loading + character-frozen-roses.gltf)."""
    from rtvb_tpu.utils.image import write_png
    cell = size // N_CELLS
    img = np.zeros((size, size, 3), np.float32)
    SHIRT = (0.18, 0.33, 0.62)
    SHIRT_D = (0.13, 0.25, 0.50)
    SKIN = (0.85, 0.64, 0.46)
    HAIR = (0.22, 0.14, 0.08)
    PANTS = (0.25, 0.26, 0.30)
    PANTS_D = (0.18, 0.19, 0.23)
    SHOE = (0.12, 0.10, 0.09)
    # base color per part row (faces: -z front, +z back, -x, +x, top, bottom)
    rows = [
        [SHIRT] * 6,                                 # torso
        [SKIN] * 4 + [HAIR, SKIN],                   # head (hair on top)
        [SHIRT] * 4 + [SHIRT, SKIN],                 # arm L (skin hand)
        [SHIRT] * 4 + [SHIRT, SKIN],                 # arm R
        [PANTS] * 4 + [PANTS, SHOE],                 # leg L (shoe sole)
        [PANTS] * 4 + [PANTS, SHOE],                 # leg R
    ]
    for r, face_cols in enumerate(rows):
        for c, col in enumerate(face_cols):
            img[r * cell:(r + 1) * cell, c * cell:(c + 1) * cell] = col
    # deterministic per-texel weave/noise so flat regions read as cloth
    gy, gx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    h = ((gx * 374761393 + gy * 668265263) & 0xFFFF) / 65535.0
    img *= (0.92 + 0.16 * h)[..., None]

    def px(r, c, y0, y1, x0, x1, col):
        img[r * cell + int(y0 * cell):r * cell + max(int(y1 * cell), 1),
            c * cell + int(x0 * cell):c * cell + max(int(x1 * cell), 1)] = col

    # head front face (row 1, col 0): hair fringe, eyes, mouth
    px(1, 0, 0.0, 0.22, 0.0, 1.0, HAIR)
    px(1, 0, 0.38, 0.52, 0.18, 0.38, (0.08, 0.08, 0.10))
    px(1, 0, 0.38, 0.52, 0.62, 0.82, (0.08, 0.08, 0.10))
    px(1, 0, 0.70, 0.80, 0.35, 0.65, (0.55, 0.30, 0.25))
    # torso front: darker placket + 3 buttons
    px(0, 0, 0.05, 0.95, 0.46, 0.54, SHIRT_D)
    for b in (0.25, 0.5, 0.75):
        px(0, 0, b, b + 0.07, 0.47, 0.53, (0.9, 0.85, 0.6))
    # pants: side seam on ±x faces
    for leg in (4, 5):
        px(leg, 2, 0.0, 1.0, 0.45, 0.55, PANTS_D)
        px(leg, 3, 0.0, 1.0, 0.45, 0.55, PANTS_D)
    srgb = np.clip(img, 0.0, 1.0) ** (1.0 / 2.2)
    write_png(tex_path, (srgb * 255.0 + 0.5).astype(np.uint8))
    print(f"wrote {tex_path}")


def main(out_path=None):
    out_path = out_path or os.path.join(
        os.path.dirname(__file__), "..", "data", "models", "character.glb")
    pos, norm, uv, idx, joints4, weights4 = build_mesh()

    bin_parts = []
    buffer_views = []
    accessors = []

    def push(arr, target=None, type_=None, comp=None, minmax=False):
        data = arr.tobytes()
        off = sum(len(b) for b in bin_parts)
        pad = (-off) % 4
        if pad:
            bin_parts.append(b"\0" * pad)
            off += pad
        bin_parts.append(data)
        bv = {"buffer": 0, "byteOffset": off, "byteLength": len(data)}
        if target:
            bv["target"] = target
        buffer_views.append(bv)
        acc = {"bufferView": len(buffer_views) - 1, "componentType": comp,
               "count": len(arr) if arr.ndim > 1 else arr.shape[0],
               "type": type_}
        if minmax:
            a2 = arr.reshape(acc["count"], -1)
            acc["min"] = [float(v) for v in a2.min(axis=0)]
            acc["max"] = [float(v) for v in a2.max(axis=0)]
        accessors.append(acc)
        return len(accessors) - 1

    a_pos = push(pos, 34962, "VEC3", 5126, minmax=True)
    a_norm = push(norm, 34962, "VEC3", 5126)
    a_uv = push(uv, 34962, "VEC2", 5126)
    a_j = push(joints4, 34962, "VEC4", 5123)
    a_w = push(weights4, 34962, "VEC4", 5126)
    a_idx = push(idx.reshape(-1), 34963, "SCALAR", 5125)

    # inverse bind matrices: global bind transform is a pure translation by
    # the pivot -> inverse is translation by -pivot.  glTF is column-major:
    # serialize M.T per matrix.
    inv_bind = np.tile(np.eye(4, dtype=np.float32), (len(JOINT_NAMES), 1, 1))
    inv_bind[:, :3, 3] = -PIVOTS
    a_ibm = push(inv_bind.transpose(0, 2, 1).reshape(len(JOINT_NAMES), 16),
                 None, "MAT4", 5126)

    # nodes: 0 = skinned mesh node, 1.. = joints (node i+1 = joint i)
    bind_t = PIVOTS.copy()
    for i, p in enumerate(PARENTS):
        if p >= 0:
            bind_t[i] = PIVOTS[i] - PIVOTS[p]
    nodes = [{"name": "character", "mesh": 0, "skin": 0}]
    for j, name in enumerate(JOINT_NAMES):
        nodes.append({"name": name, "translation": [float(v) for v in bind_t[j]]})
    for j, p in enumerate(PARENTS):
        if p >= 0:
            nodes[p + 1].setdefault("children", []).append(j + 1)

    animations = []
    for cname, tracks in CLIPS.items():
        samplers, channels = [], []
        for j, (times, tt, rr) in tracks.items():
            a_t = push(times, None, "SCALAR", 5126, minmax=True)
            a_tr = push(tt, None, "VEC3", 5126)
            a_rot = push(rr, None, "VEC4", 5126)
            samplers.append({"input": a_t, "output": a_tr,
                             "interpolation": "LINEAR"})
            channels.append({"sampler": len(samplers) - 1,
                             "target": {"node": j + 1, "path": "translation"}})
            samplers.append({"input": a_t, "output": a_rot,
                             "interpolation": "LINEAR"})
            channels.append({"sampler": len(samplers) - 1,
                             "target": {"node": j + 1, "path": "rotation"}})
        animations.append({"name": cname, "samplers": samplers,
                           "channels": channels})

    bin_blob = b"".join(bin_parts)
    bin_blob += b"\0" * ((-len(bin_blob)) % 4)

    doc = {
        "asset": {"version": "2.0", "generator": "rtvb_tpu character gen"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": nodes,
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": a_pos, "NORMAL": a_norm,
                           "TEXCOORD_0": a_uv, "JOINTS_0": a_j,
                           "WEIGHTS_0": a_w},
            "indices": a_idx}]}],
        "skins": [{"joints": list(range(1, len(JOINT_NAMES) + 1)),
                   "inverseBindMatrices": a_ibm, "skeleton": 1}],
        "animations": animations,
        "buffers": [{"byteLength": len(bin_blob)}],
        "bufferViews": buffer_views,
        "accessors": accessors,
    }

    js = json.dumps(doc, separators=(",", ":")).encode()
    js += b" " * ((-len(js)) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_blob)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A))
        f.write(js)
        f.write(struct.pack("<II", len(bin_blob), 0x004E4942))
        f.write(bin_blob)
    print(f"wrote {out_path} ({total} bytes)")
    author_albedo(os.path.join(os.path.dirname(out_path), "..", "textures",
                               "character_albedo.png"))


if __name__ == "__main__":
    main()
