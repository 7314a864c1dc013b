"""Math, gather, config, camera unit tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from rtvb_tpu.ops import mathutil as m
from rtvb_tpu.ops import gatherlib as g
from rtvb_tpu.core.config import Settings
from rtvb_tpu.core.camera import make_camera, camera_rays


def test_normalize_and_basis():
    n = m.normalize((jnp.array([0.3]), jnp.array([0.9]), jnp.array([-0.1])))
    assert abs(float(m.length(n)[0]) - 1.0) < 1e-6
    t, bt = m.orthonormal_basis(n)
    assert abs(float(m.dot(t, n)[0])) < 1e-6
    assert abs(float(m.dot(bt, n)[0])) < 1e-6
    assert abs(float(m.dot(t, bt)[0])) < 1e-6


def test_oct_roundtrip():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(3, 100)).astype(np.float32)
    v /= np.linalg.norm(v, axis=0, keepdims=True)
    n = (jnp.asarray(v[0]), jnp.asarray(v[1]), jnp.asarray(v[2]))
    u, vv = m.oct_encode(n)
    n2 = m.oct_decode(u, vv)
    for a, b in zip(n, n2):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_reflect():
    i = m.normalize((jnp.array([1.0]), jnp.array([-1.0]), jnp.array([0.0])))
    n = (jnp.array([0.0]), jnp.array([1.0]), jnp.array([0.0]))
    r = m.reflect(i, n)
    assert np.allclose([float(r[0][0]), float(r[1][0]), float(r[2][0])],
                       [1 / np.sqrt(2), 1 / np.sqrt(2), 0.0], atol=1e-6)


def test_table_gather_matches_take():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.integers(0, 2**31 - 1, 4096, dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, 4096, (16, 128), dtype=np.int32))
    got = g.table_gather(table.reshape(32, 128), idx)
    expect = jnp.take(table, idx)
    assert np.array_equal(np.asarray(got), np.asarray(expect))


def test_table_gather_multi():
    rng = np.random.default_rng(2)
    t1 = jnp.asarray(rng.integers(0, 1000, 512, dtype=np.int32)).reshape(4, 128)
    t2 = jnp.asarray(rng.integers(0, 1000, 512, dtype=np.int32)).reshape(4, 128)
    idx = jnp.asarray(rng.integers(0, 512, (8, 128), dtype=np.int32))
    a, b = g.table_gather_multi((t1, t2), idx)
    assert np.array_equal(np.asarray(a), np.asarray(jnp.take(t1.reshape(-1), idx)))
    assert np.array_equal(np.asarray(b), np.asarray(jnp.take(t2.reshape(-1), idx)))


def test_fast_gather_onehot_paths_match_take(monkeypatch):
    """Force the TPU one-hot/matmul code paths on CPU and check exactness:
    lane padding (n<128), the >=3-field MXU matmul route (ints must
    round-trip), and keyed_lookup's padded key axis."""
    monkeypatch.setattr(g, "_use_onehot", lambda: True)
    rng = np.random.default_rng(3)
    for n in (5, 25, 128, 200):
        tab_f = jnp.asarray(rng.normal(size=n).astype(np.float32))
        tab_i = jnp.asarray(rng.integers(0, 2**23, n, dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, n, (7, 13), dtype=np.int32))
        assert np.allclose(np.asarray(g.fast_gather(tab_f, idx)),
                           np.asarray(jnp.take(tab_f, idx)))
        assert np.array_equal(np.asarray(g.fast_gather(tab_i, idx)),
                              np.asarray(jnp.take(tab_i, idx)))
        # 2-field (select-sum) and 4-field (matmul) multi routes
        got2 = g.fast_gather_multi((tab_f, tab_i), idx)
        got4 = g.fast_gather_multi((tab_f, tab_i, tab_f * 2.0, tab_i + 7), idx)
        assert np.allclose(np.asarray(got2[0]), np.asarray(jnp.take(tab_f, idx)))
        assert np.array_equal(np.asarray(got2[1]), np.asarray(jnp.take(tab_i, idx)))
        assert np.allclose(np.asarray(got4[2]), np.asarray(jnp.take(tab_f * 2.0, idx)))
        assert np.array_equal(np.asarray(got4[3]), np.asarray(jnp.take(tab_i + 7, idx)))
    # keyed_lookup with a non-multiple-of-128 key table
    keys = jnp.asarray(np.sort(rng.choice(10**6, 60, replace=False)).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 1000, 60, dtype=np.int32))
    q = jnp.concatenate([keys[12:20], jnp.asarray([999999, 3], np.int32)])
    got, found = g.keyed_lookup(keys, vals, q)
    expect_found = np.isin(np.asarray(q), np.asarray(keys))
    assert np.array_equal(np.asarray(found), expect_found)
    assert np.array_equal(np.asarray(got)[:8], np.asarray(vals[12:20]))


def test_settings_yaml_roundtrip(tmp_path):
    s = Settings().replace(rendering={"render_width": 1280, "render_height": 720})
    p = tmp_path / "settings.yaml"
    s.save(str(p))
    s2 = Settings.load(str(p))
    assert s2 == s
    assert s2.rendering.render_width == 1280


def test_settings_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("rendering:\n  not_a_field: 3\n")
    with pytest.raises(ValueError):
        Settings.load(str(p))


def test_camera_uv_roundtrip():
    cam = make_camera(pos=(1.0, 2.0, 3.0), yaw=0.7, pitch=-0.2)
    u = jnp.asarray(np.linspace(0.1, 0.9, 5, dtype=np.float32))
    v = jnp.asarray(np.linspace(0.2, 0.8, 5, dtype=np.float32))
    d = cam.uv_to_dir(u, v)
    u2, v2, ok = cam.dir_to_uv(d)
    assert np.all(np.asarray(ok))
    assert np.allclose(np.asarray(u2), np.asarray(u), atol=1e-5)
    assert np.allclose(np.asarray(v2), np.asarray(v), atol=1e-5)


def test_camera_rays_shape_and_center():
    cam = make_camera(pos=(0.0, 0.0, 0.0), yaw=0.0, pitch=0.0, aspect=1.0)
    o, d = camera_rays(cam, 4, 4)
    assert o[0].shape == (4, 4)
    # center-ish ray points along +x (yaw 0)
    dc = [float(x[2, 2]) for x in d]
    assert dc[0] > 0.9
