"""World save/load: content-addressed chunk store round-trip."""
import os

import numpy as np

from rtvb_tpu.world import gen, voxel
from rtvb_tpu.world.persistence import WorldStore, fnv1a64


def test_fnv1a64_known_vector():
    # FNV-1a 64 of empty input is the offset basis
    assert fnv1a64(b"") == 0xCBF29CE484222325
    assert fnv1a64(b"a") == 0xAF63DC4C8601EC8C


def test_save_load_roundtrip(tmp_path):
    cfg, w = gen.generate_world()
    store = WorldStore(str(tmp_path))
    store.save("alpha", cfg, w, camera={"yaw": 1.25})
    cfg2, w2, cam, _ = store.load("alpha")
    assert np.array_equal(np.asarray(w2.blocks), np.asarray(w.blocks))
    assert np.array_equal(np.asarray(w2.colmask), np.asarray(w.colmask))
    assert np.array_equal(np.asarray(w2.exc_key), np.asarray(w.exc_key))
    assert cam["yaw"] == 1.25
    assert store.last_world() == "alpha"
    assert store.list_worlds() == ["alpha"]


def test_chunk_dedup(tmp_path):
    cfg, w = gen.generate_world()
    store = WorldStore(str(tmp_path))
    store.save("a", cfg, w)
    store.save("b", cfg, w)
    # identical chunks across worlds are separate dirs; dedup happens within
    # a world dir — edit one voxel and re-save: only changed chunk re-written
    blobs_before = set(os.listdir(tmp_path / "a" / "chunks"))
    w2 = voxel.set_block(cfg, w, 5, 20, 5, 9)
    store.save("a", cfg, w2)
    blobs_after = set(os.listdir(tmp_path / "a" / "chunks"))
    new = blobs_after - blobs_before
    assert len(new) == 1   # exactly one chunk changed content


def test_load_validates_hash(tmp_path):
    cfg, w = gen.generate_world()
    store = WorldStore(str(tmp_path))
    store.save("x", cfg, w)
    # corrupt a blob
    cdir = tmp_path / "x" / "chunks"
    blob = sorted(os.listdir(cdir))[0]
    with open(cdir / blob, "r+b") as f:
        f.seek(100)
        f.write(b"\xff\xff")
    try:
        store.load("x")
        assert False, "expected corruption to be detected"
    except AssertionError as e:
        assert "corrupt" in str(e)
