"""DDA trace vs. a classic NumPy voxel-stepping reference.

The reference implements textbook 3-D Amanatides & Woo traversal per ray in
Python; ours is the TPU column-DDA (ops/dda.py). They must agree on hit voxel,
face, and t (modulo rays that graze voxel edges, which are measure-zero for
the random direction set used here)."""
import numpy as np
import jax.numpy as jnp
import pytest

from rtvb_tpu.ops import dda
from rtvb_tpu.world import gen, voxel


def np_trace(blocks, o, d, t_cap=np.inf):
    """Scalar 3-D DDA reference. Returns (hit, t, (ix,iy,iz), axis)."""
    X, Y, Z = blocks.shape
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    inv = np.where(np.abs(d) < 1e-12, np.inf * np.sign(d + 1e-300), 1.0 / d)

    t_in, t_out, ax_in = 0.0, t_cap, -1
    for a, size in ((0, X), (1, Y), (2, Z)):
        if abs(d[a]) < 1e-12:
            if not (0 <= o[a] < size):
                return False, np.inf, None, -1
            continue
        ta = (0 - o[a]) * inv[a]
        tb = (size - o[a]) * inv[a]
        lo, hi = min(ta, tb), max(ta, tb)
        if lo > t_in:
            t_in, ax_in = lo, a
        t_out = min(t_out, hi)
    if t_in >= t_out:
        return False, np.inf, None, -1

    t = max(t_in, 0.0) + 1e-9
    p = o + d * t
    iv = np.clip(np.floor(p).astype(int), 0, [X - 1, Y - 1, Z - 1])
    step = np.where(d >= 0, 1, -1)
    tmax = np.where(
        np.abs(d) < 1e-12, np.inf,
        ((iv + (step > 0)) - o) * inv)
    tdelta = np.where(np.abs(d) < 1e-12, np.inf, np.abs(inv))
    last_axis = ax_in if ax_in >= 0 else 0

    for _ in range(4 * (X + Y + Z)):
        if not (0 <= iv[0] < X and 0 <= iv[1] < Y and 0 <= iv[2] < Z):
            return False, np.inf, None, -1
        if blocks[iv[0], iv[1], iv[2]] != 0:
            return True, t, tuple(iv), last_axis
        a = int(np.argmin(tmax))
        t = tmax[a]
        if t >= t_out:
            return False, np.inf, None, -1
        iv[a] += step[a]
        tmax[a] += tdelta[a]
        last_axis = a
    return False, np.inf, None, -1


@pytest.fixture(scope="module")
def world():
    cfg, w = gen.generate_world()
    return cfg, w


def trace_params(cfg):
    return dda.TraceParams(
        x=cfg.x, y=cfg.y, z=cfg.z,
        super_size=cfg.super_size, super_z=cfg.super_z,
        max_steps=cfg.x + cfg.z + 8,
    )


import functools
import jax


@functools.lru_cache(maxsize=None)
def _traced(p, capped):
    def f(o, d, cm, df, mh, tc):
        return dda.trace(o, d, cm, df, p, t_cap=tc if capped else None,
                         maxh_row=mh)
    return jax.jit(f)


def run_ours(cfg, w, o, d, t_cap=None):
    f = _traced(trace_params(cfg), t_cap is not None)
    tc = jnp.zeros(o.shape[0], jnp.float32) if t_cap is None else jnp.asarray(t_cap)
    return f(
        (jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2])),
        (jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])),
        w.colmask, w.df_super[0], w.maxh_super[0], tc,
    )


def test_random_rays_match_reference(world):
    cfg, w = world
    blocks = np.asarray(w.blocks)
    rng = np.random.default_rng(7)
    n = 400
    o = np.stack([
        rng.uniform(-10, cfg.x + 10, n),
        rng.uniform(5, cfg.y + 20, n),
        rng.uniform(-10, cfg.z + 10, n),
    ], axis=1)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    rec = run_ours(cfg, w, o.astype(np.float32), d.astype(np.float32))
    hits = np.asarray(rec.hit)
    ts = np.asarray(rec.t)
    ivs = np.stack([np.asarray(rec.ix), np.asarray(rec.iy), np.asarray(rec.iz)], 1)

    mismatch = 0
    for i in range(n):
        h, t, iv, _ = np_trace(blocks, o[i], d[i])
        if h != hits[i]:
            mismatch += 1
            continue
        if h:
            if tuple(ivs[i]) != iv or abs(ts[i] - t) > 1e-2:
                mismatch += 1
    # allow a tiny number of edge-grazing disagreements
    assert mismatch <= n * 0.02, f"{mismatch}/{n} rays disagree"


def test_axis_aligned_rays(world):
    cfg, w = world
    blocks = np.asarray(w.blocks)

    cases = []
    # straight down onto terrain
    cases.append(((20.5, 30.0, 20.5), (0.0, -1.0, 0.0)))
    # straight up from below the world
    cases.append(((20.5, -5.0, 20.5), (0.0, 1.0, 0.0)))
    # horizontal +x at ground level
    cases.append(((-5.0, 2.5, 33.5), (1.0, 0.0, 0.0)))
    # horizontal +z
    cases.append(((10.5, 2.5, -5.0), (0.0, 0.0, 1.0)))
    # miss: horizontal above everything
    cases.append(((-5.0, 31.5, 10.5), (1.0, 0.0, 0.0)))

    o = np.array([c[0] for c in cases], np.float32)
    d = np.array([c[1] for c in cases], np.float32)
    rec = run_ours(cfg, w, o, d)
    for i, (oo, dd) in enumerate(cases):
        h, t, iv, _ = np_trace(blocks, oo, dd)
        assert bool(rec.hit[i]) == h, f"case {i}"
        if h:
            got = (int(rec.ix[i]), int(rec.iy[i]), int(rec.iz[i]))
            assert got == iv, f"case {i}: {got} != {iv}"
            assert abs(float(rec.t[i]) - t) < 1e-2


def test_face_normals_point_against_ray(world):
    cfg, w = world
    rng = np.random.default_rng(3)
    n = 200
    # interior origins: steep downward rays can't escape the world sides
    o = np.stack([
        rng.uniform(16, cfg.x - 16, n),
        rng.uniform(20, 30, n),
        rng.uniform(16, cfg.z - 16, n),
    ], 1).astype(np.float32)
    d = rng.normal(size=(n, 3)) * 0.4
    d[:, 1] = -np.abs(d[:, 1]) - 1.0   # steeply downward → guaranteed hits
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rec = run_ours(cfg, w, o, d.astype(np.float32))
    hit = np.asarray(rec.hit)
    ndot = (np.asarray(rec.nx) * d[:, 0] + np.asarray(rec.ny) * d[:, 1]
            + np.asarray(rec.nz) * d[:, 2])
    assert hit.mean() > 0.9
    assert np.all(ndot[hit] < 0)


def test_shadow_t_cap(world):
    cfg, w = world
    # ray that hits terrain at some t; capping below that t must report miss
    o = np.array([[20.5, 30.0, 20.5]], np.float32)
    d = np.array([[0.0, -1.0, 0.0]], np.float32)
    rec = run_ours(cfg, w, o, d)
    assert bool(rec.hit[0])
    t_hit = float(rec.t[0])
    rec2 = run_ours(cfg, w, o, d, t_cap=np.array([t_hit - 1.0], np.float32))
    assert not bool(rec2.hit[0])


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas kernel needs TPU")
def test_tri_kernel_matches_xla_twin():
    """ops/tri_kernel (SMEM triangles + AABB tile cull) must produce the
    exact hits of the XLA blocked intersector on a mixed scene."""
    import numpy as np
    from rtvb_tpu.ops import triangles as tri_ops
    from rtvb_tpu.ops import tri_kernel
    rng = np.random.default_rng(4)
    H, W = 240, 256
    one = jnp.ones((H, W))
    o = (one * 32.0, one * 40.0, one * 32.0)
    yy, xx = jnp.meshgrid(jnp.linspace(-0.5, 0.5, H),
                          jnp.linspace(-0.7, 0.7, W), indexing="ij")
    dn = jnp.sqrt(xx * xx + yy * yy + 1.0)
    d = (xx / dn, -jnp.abs(yy / dn) - 0.05, 1.0 / dn)
    T = 37   # odd count: exercises SMEM padding
    v0 = rng.uniform(24, 40, (T, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-2, 2, (T, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-2, 2, (T, 3)).astype(np.float32)
    packed = tri_ops.pack_triangles(jnp.asarray(v0), jnp.asarray(v1),
                                    jnp.asarray(v2))
    # zero-row padding rows must never hit
    packed = jnp.concatenate([packed, jnp.zeros((11, 9), jnp.float32)])
    # bypass the dispatch to compare both implementations directly
    ref = tri_ops.intersect_packed_xla(o, d, packed)
    got = tri_kernel.intersect_packed_tpu(o, d, packed)
    assert np.array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    hit = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(got.t)[hit],
                               np.asarray(ref.t)[hit], rtol=1e-5)


def test_any_hit_agrees_with_closest_hit(world):
    """The slim occlusion-only loop (any_hit=True) must report the same hit
    bit as the full closest-hit trace, and its t must be a lower bound on
    the exact voxel-entry t (callers use it only to bound the follow-up
    entity any-hit test)."""
    cfg, w = world
    rng = np.random.default_rng(11)
    n = 400
    o = np.stack([
        rng.uniform(-5, cfg.x + 5, n),
        rng.uniform(5, cfg.y + 10, n),
        rng.uniform(-5, cfg.z + 5, n),
    ], axis=1).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    p = trace_params(cfg)
    so = tuple(jnp.asarray(o[:, i]) for i in range(3))
    sd = tuple(jnp.asarray(d[:, i]) for i in range(3))
    full = dda.trace(so, sd, w.colmask, w.df_super[0], p,
                     maxh_row=w.maxh_super[0])
    anyh = dda.trace(so, sd, w.colmask, w.df_super[0], p,
                     maxh_row=w.maxh_super[0], any_hit=True)
    np.testing.assert_array_equal(np.asarray(anyh.hit), np.asarray(full.hit))
    hits = np.asarray(full.hit)
    assert np.all(np.asarray(anyh.t)[hits] <= np.asarray(full.t)[hits] + 1e-4)


def test_horizontal_ray_on_integer_y_plane(world):
    """A ray with dy == 0 travelling exactly on an integer y plane must still
    hit blocks in the y = floor(oy) layer (the gameplay pick ray is exactly
    horizontal at pitch 0, and spawn heights are integers).  Regression for
    the empty [ylo, yhi] range the EPS pull-back produced in this case."""
    cfg, w = world
    y = 18                      # above the terrain: only the placed block
    w2 = voxel.set_block(cfg, w, 33, y, 10, 1)
    p = trace_params(cfg)
    o = tuple(jnp.asarray([v], jnp.float32) for v in (32.0, float(y), 8.0))
    dn = np.array([0.45359609, 0.0, 0.8912074], np.float32)
    d = tuple(jnp.asarray([v]) for v in dn)
    rec = dda.trace(o, d, w2.colmask, w2.df_super[0], p,
                    maxh_row=w2.maxh_super[0])
    assert bool(rec.hit[0])
    assert (int(rec.ix[0]), int(rec.iy[0]), int(rec.iz[0])) == (33, y, 10)
