"""Skeleton / animation / skinning / entity / model-loading tests."""
import json
import struct

import numpy as np
import jax.numpy as jnp

from rtvb_tpu.models import animation as anim
from rtvb_tpu.models import skinning
from rtvb_tpu.models.character import Character, build_character_mesh
from rtvb_tpu.models.entity import Entity, make_cuboid
from rtvb_tpu.models.skeleton import Skeleton, trs_to_mat4
from rtvb_tpu.assets import models as model_io
from rtvb_tpu.ops import triangles
from rtvb_tpu.world import gen


def test_skeleton_global_matrices_chain():
    parents = np.array([-1, 0, 1], np.int32)
    bt = np.array([[0, 0, 0], [0, 1, 0], [0, 1, 0]], np.float32)
    br = np.tile(np.array([[0, 0, 0, 1.0]], np.float32), (3, 1))
    bs = np.ones((3, 3), np.float32)
    inv = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    sk = Skeleton(["a", "b", "c"], parents, bt, br, bs, inv)
    g = sk.global_matrices(jnp.asarray(bt), jnp.asarray(br), jnp.asarray(bs))
    assert np.allclose(np.asarray(g)[2, :3, 3], [0, 2, 0], atol=1e-6)


def test_skinning_rigid_translation():
    pos = jnp.asarray(np.array([[1.0, 0, 0], [0, 1, 0]], np.float32))
    norm = jnp.asarray(np.array([[0, 1.0, 0], [1, 0, 0]], np.float32))
    joints = jnp.zeros((2, 4), jnp.int32)
    weights = jnp.asarray(np.array([[1, 0, 0, 0]] * 2, np.float32))
    mats = jnp.eye(4)[None].at[0, 1, 3].set(5.0)   # translate +5 in y
    sp, sn = skinning.skin_vertices(pos, norm, joints, weights, mats)
    assert np.allclose(np.asarray(sp), [[1, 5, 0], [0, 6, 0]], atol=1e-6)
    assert np.allclose(np.asarray(sn), np.asarray(norm), atol=1e-6)


def test_animation_evaluate_and_blend():
    mesh = build_character_mesh()
    clip = mesh.clips["walk"]
    tracks = clip.device_tracks()
    p0 = anim.evaluate(tracks, 0.0, clip.duration)
    p1 = anim.evaluate(tracks, clip.duration / 4, clip.duration)
    assert not np.allclose(np.asarray(p0[1]), np.asarray(p1[1]))
    pb = anim.blend(p0, p1, 0.5)
    # blend stays normalized
    assert np.allclose(np.linalg.norm(np.asarray(pb[1]), axis=-1), 1.0, atol=1e-4)


def test_character_falls_and_lands():
    cfg, w = gen.generate_world()
    ch = Character(cfg_world=cfg)
    ch.position = np.array([32.0, 25.0, 32.0], np.float32)
    for _ in range(200):
        ch.update(w, 1.0 / 30.0)
        if ch.on_ground:
            break
    assert ch.on_ground
    # standing on terrain: feet y == integer surface height, inside world
    assert 1.0 <= ch.position[1] <= 20.0
    assert ch.state == "idle"


def test_character_walks():
    cfg, w = gen.generate_world()
    ch = Character(cfg_world=cfg)
    ch.position = np.array([32.0, 16.0, 32.0], np.float32)
    for _ in range(30):
        ch.update(w, 1.0 / 30.0)
    x0 = ch.position.copy()
    for _ in range(30):
        ch.update(w, 1.0 / 30.0, move_input=(1.0, 0.0))
    moved = np.linalg.norm((ch.position - x0)[[0, 2]])
    assert moved > 0.5
    assert ch.state in ("walk", "run")


def test_entity_triangles_and_intersect():
    e = Entity(mesh=build_character_mesh())
    e.position = np.array([5.0, 0.0, 5.0], np.float32)
    e.update_vertices()
    v0, v1, v2 = e.triangles()
    # ray from above straight down through the head
    o = (jnp.asarray([5.0]), jnp.asarray([10.0]), jnp.asarray([5.0]))
    d = (jnp.asarray([0.0]), jnp.asarray([-1.0]), jnp.asarray([0.0]))
    hit = triangles.intersect(o, d, v0, v1, v2)
    assert bool(hit.hit[0])
    # head top is ~1.75 → t ≈ 8.25
    assert abs(float(hit.t[0]) - (10.0 - 1.75)) < 0.1


def test_obj_roundtrip(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text("""
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vn 0 0 1
vt 0 0
f 1/1/1 2/1/1 3/1/1
f 2/1/1 4/1/1 3/1/1
""")
    mesh = model_io.load_obj(str(p))
    assert mesh.positions.shape[0] == 4
    assert mesh.indices.shape == (2, 3)


def _make_test_glb(path):
    """Minimal skinned triangle GLB with one rotation animation."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    norm = np.array([[0, 0, 1]] * 3, np.float32)
    joints = np.array([[0, 0, 0, 0]] * 3, np.uint16)
    weights = np.array([[1, 0, 0, 0]] * 3, np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    ibm = np.eye(4, dtype=np.float32).T.reshape(1, 16)
    times = np.array([0.0, 1.0], np.float32)
    rots = np.array([[0, 0, 0, 1], [0, 0.7071, 0, 0.7071]], np.float32)

    blobs = [pos, norm, joints, weights, idx, ibm, times, rots]
    offsets, bin_data = [], b""
    for b in blobs:
        offsets.append(len(bin_data))
        bin_data += b.tobytes()
        bin_data += b"\0" * ((4 - len(bin_data) % 4) % 4)

    def bv(i, blob):
        return {"buffer": 0, "byteOffset": offsets[i], "byteLength": blob.nbytes}

    doc = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}], "scene": 0,
        "nodes": [
            {"mesh": 0, "skin": 0},
            {"name": "root", "translation": [0, 0, 0]},
        ],
        "skins": [{"joints": [1], "inverseBindMatrices": 5}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "JOINTS_0": 2,
                           "WEIGHTS_0": 3},
            "indices": 4}]}],
        "animations": [{
            "name": "spin",
            "channels": [{"sampler": 0,
                          "target": {"node": 1, "path": "rotation"}}],
            "samplers": [{"input": 6, "output": 7,
                          "interpolation": "LINEAR"}],
        }],
        "bufferViews": [bv(i, b) for i, b in enumerate(blobs)],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 3, "type": "VEC4"},
            {"bufferView": 3, "componentType": 5126, "count": 3, "type": "VEC4"},
            {"bufferView": 4, "componentType": 5123, "count": 3, "type": "SCALAR"},
            {"bufferView": 5, "componentType": 5126, "count": 1, "type": "MAT4"},
            {"bufferView": 6, "componentType": 5126, "count": 2, "type": "SCALAR"},
            {"bufferView": 7, "componentType": 5126, "count": 2, "type": "VEC4"},
        ],
        "buffers": [{"byteLength": len(bin_data)}],
    }
    js = json.dumps(doc).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    out = struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(js) + 8 + len(bin_data))
    out += struct.pack("<II", len(js), 0x4E4F534A) + js
    out += struct.pack("<II", len(bin_data), 0x004E4942) + bin_data
    with open(path, "wb") as f:
        f.write(out)


def test_shipped_glb_character():
    """The engine character comes from the shipped data/models/character.glb
    (GLTFUtils.cpp + minecraft_character_generator.py role) — not the
    procedural fallback."""
    from rtvb_tpu.models.character import load_character_mesh
    mesh = load_character_mesh()
    assert mesh.skeleton is not None and mesh.skeleton.n_joints == 7
    for clip in ("idle", "walk", "run", "place"):
        assert clip in mesh.clips
    assert mesh.n_triangles >= 36


def test_character_pose_math_is_host_numpy():
    """Per-frame pose evaluation must stay on the host (reference:
    AnimationManager on CPU; only joint matrices are uploaded)."""
    cfg, w = gen.generate_world()
    ch = Character(cfg_world=cfg)
    ch.update(w, 1.0 / 30.0, move_input=(1.0, 0.0))
    assert isinstance(ch.entity.joint_mats, np.ndarray)
    assert ch.entity.joint_mats.shape == \
        (ch.entity.mesh.skeleton.n_joints, 4, 4)
    assert isinstance(ch.entity.prev_joint_mats, np.ndarray)


def test_device_entity_pack_matches_legacy():
    """The jitted device packer (renderer._pack_entity_tris) must reproduce
    the legacy eager update_vertices → triangles path exactly."""
    from rtvb_tpu.render.renderer import _pack_entity_tris
    mesh = build_character_mesh()
    skel, clip = mesh.skeleton, mesh.clips["walk"]
    e = Entity(mesh=mesh)
    e.position = np.array([3.0, 1.0, 2.0], np.float32)
    e.yaw = 0.7
    pose = anim.evaluate(clip.host_tracks(), 0.3, clip.duration)
    mats = skel.skinning_matrices(*pose, model=e.model_matrix_np())
    assert isinstance(mats, np.ndarray)

    # legacy path: skin with device mats, model applied inside update_vertices
    e2 = Entity(mesh=mesh)
    e2.position, e2.yaw = e.position, e.yaw
    skin = skel.skinning_matrices(*[jnp.asarray(x) for x in pose])
    e2.update_vertices(skin)
    v0l, v1l, v2l = (np.asarray(v) for v in e2.triangles())

    statics = [{
        "pos": jnp.asarray(mesh.positions),
        "joints": jnp.asarray(mesh.joints),
        "weights": jnp.asarray(mesh.weights),
        "i0": jnp.asarray(mesh.indices[:, 0]),
        "i1": jnp.asarray(mesh.indices[:, 1]),
        "i2": jnp.asarray(mesh.indices[:, 2]),
    }]
    z3 = jnp.zeros((0, 3), jnp.float32)
    decor = {"packed": jnp.zeros((0, 9), jnp.float32),
             "normals": z3, "v0": z3, "v1": z3, "v2": z3}
    m = jnp.asarray(mats)
    packed, nrm, pv0, pv1, pv2 = _pack_entity_tris(
        statics, [m], [m], decor, 0)
    packed = np.asarray(packed)
    assert np.allclose(packed[:, 0:3], v0l, atol=1e-4)
    assert np.allclose(packed[:, 0:3] + packed[:, 3:6], v1l, atol=1e-4)
    assert np.allclose(packed[:, 0:3] + packed[:, 6:9], v2l, atol=1e-4)
    assert np.allclose(np.asarray(pv0), v0l, atol=1e-4)


def test_glb_load(tmp_path):
    p = tmp_path / "t.glb"
    _make_test_glb(str(p))
    mesh = model_io.load_gltf(str(p))
    assert mesh.positions.shape == (3, 3)
    assert mesh.skeleton is not None and mesh.skeleton.n_joints == 1
    assert "spin" in mesh.clips
    clip = mesh.clips["spin"]
    # (time==duration wraps to 0 for looped clips; sample just before the end)
    t, r, s = anim.evaluate(clip.device_tracks(), 0.999, clip.duration)
    # ~quarter-turn about y near t=1
    assert abs(abs(float(r[0, 1])) - 0.7071) < 0.03


def test_model_registry_yaml_roundtrip(tmp_path):
    """data/assets/models.yaml drives decoration meshes (AssetRegistry's
    third asset YAML, ModelDefinition role): shipped file parses, entries
    resolve meshes/light-meshes/base materials, builtin fallback matches."""
    from rtvb_tpu.assets import decorations as deco

    reg = deco.ModelRegistry.load_default()
    assert "lantern" in reg.entries and "flower" in reg.entries
    v0, v1, v2 = reg.mesh("lantern")
    assert len(v0) == len(v1) == len(v2) > 0
    assert reg.light_mesh("lantern") is not None
    assert reg.base_material("lantern") == "trunk"
    assert reg.base_material("flower", "x") == "x"
    # a custom registry entry maps a new name onto a procedural mesh
    custom = deco.ModelRegistry({"my_torch": {"mesh": "torch"}})
    assert custom.mesh("my_torch")[0].shape[1] == 3
    assert custom.light_mesh("my_torch") is None
    # builtin fallback (no YAML) still serves every shipped decoration
    fallback = deco.ModelRegistry()
    for name in ("flower", "torch", "lantern"):
        assert fallback.mesh(name) is not None


def test_character_textured_albedo():
    """The character entity samples its authored albedo atlas
    (data/textures/character_albedo.png via models.yaml image:): entity
    pixels carry multiple distinct clothing colors, not one flat material
    (GLTFUtils texture loading / character-frozen-roses.gltf role)."""
    import numpy as np
    from rtvb_tpu.core.config import Settings
    from rtvb_tpu.models.character import Character
    from rtvb_tpu.render.renderer import Engine

    s = Settings().replace(rendering={"use_restir": False,
                                      "total_bounce_limit": 1})
    eng = Engine(settings=s, width=96, height=96)
    assert "character_albedo" in eng.texture_atlas_names
    ch = Character(cfg_world=eng.cfg, move=eng.settings.character_movement)
    assert ch.entity.image == "character_albedo"
    ch.position = np.array([31.5, 8.0, 45.0], np.float32)
    ch._update_pose()
    eng.add_entity(ch.entity)
    ent = eng.entity_buffers()
    assert int((np.asarray(ent.image_id) >= 0).sum()) == \
        ch.entity.mesh.n_triangles
    # camera close-up on the character
    eng.set_camera(pos=(33.0, 9.0, 46.0), yaw=3.8, pitch=-0.3)
    g = eng.path_trace()
    alb = np.stack([np.asarray(g.albedo[i]) for i in range(3)], -1)
    depth = np.asarray(g.depth)
    body = (depth > 0.5) & (depth < 4.0)      # character fills the close field
    assert body.sum() > 200, body.sum()
    cols = np.round(alb[body] * 8) / 8.0
    uniq = np.unique(cols.reshape(-1, 3), axis=0)
    assert len(uniq) >= 3, uniq                # shirt / skin / pants at least


def test_semantic_labeler_roundtrip_and_expand():
    """Headless semantic texel labeler (tools/semantic_labeler.py — the
    reference's meshlab/semantic_labeler GUI re-shaped as a library + CLI):
    rect paint, JSON round-trip, color-similarity region expansion + undo."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import importlib
    sl = importlib.import_module("semantic_labeler")

    sm = sl.SemanticMap(size=16)
    sm.paint_rect(2, 2, 6, 6, 3)
    assert int((sm.map == 3).sum()) == 16

    # texture: uniform patch around the seed, a distinct region elsewhere
    rgb = np.zeros((16, 16, 3), np.uint8)
    rgb[:8, :8] = (100, 60, 40)
    rgb[8:, 8:] = (10, 200, 10)
    n = sm.expand_label(rgb, 3, threshold=25.0)
    assert n > 0
    # expansion filled the similar-color quadrant but not the green region
    assert int(sm.map[:8, :8].sum()) == 3 * 64
    assert int((sm.map[8:, 8:] == 3).sum()) == 0
    assert sm.undo_expansion()
    assert int((sm.map == 3).sum()) == 16

    # JSON round-trip matches the reference format
    d = sm.to_dict()
    assert "labels" in d and "semantic_map" in d
    back = sl.SemanticMap.from_dict(d)
    np.testing.assert_array_equal(back.map, sm.map)
    assert back.labels[1]["name"] == "Skin"


def test_texture_upscaler_semantics():
    """Semantic texture upscaler (tools/texture_upscaler.py): mapped labels
    become material patches with the texel's hue transplanted; unmapped
    labels stay flat color; output is F x the input resolution."""
    import sys, os, importlib
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    tu = importlib.import_module("texture_upscaler")

    n, f = 8, 8
    skin = np.zeros((n, n, 3), np.uint8)
    skin[:, :4] = (200, 40, 40)     # red cloth
    skin[:, 4:] = (40, 40, 200)     # blue region, unmapped
    sem = np.zeros((n, n), int)
    sem[:, :4] = 3                  # Clothing
    labels = {3: {"name": "Clothing", "color": "#4169E1"}}
    rng = np.random.default_rng(0)
    tex = (rng.uniform(80, 180, (16, 16, 3))).astype(np.uint8)
    out = tu.upscale(skin, sem, labels, {"Clothing": "cloth"},
                     {"cloth": tex}, f)
    assert out.shape == (n * f, n * f, 3)
    left = out[:, : 4 * f].astype(float)
    right = out[:, 4 * f:].astype(float)
    # unmapped region is the flat replicated texel color
    assert np.ptp(right.reshape(-1, 3), axis=0).max() == 0
    np.testing.assert_array_equal(right[0, 0], [40, 40, 200])
    # mapped region: red-dominant (hue transplanted) but textured (varying)
    assert left[..., 0].mean() > left[..., 2].mean() + 20
    assert np.ptp(left[..., 0]) > 10
