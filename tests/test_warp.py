"""Warped-gather (reprojection) kernel: XLA twins + Pallas kernel parity.

The Pallas kernel runs only on TPU; CPU tests cover the twins and the
temporal-accumulation path that consumes them.  On TPU (manual run /
driver bench), test_kernel_matches_ref_* verify kernel == twin on every
kernel-valid pixel.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtvb_tpu.ops.warp_kernel import (
    warp_bilinear_ref, warp_nearest_ref, dispatch_bilinear, dispatch_nearest)

on_tpu = jax.default_backend() == "tpu"


def _field(H, W, seed=0, amp=2.0):
    # smooth warp + mild per-pixel jitter — the shape of real camera motion
    # (violent per-pixel scatter is covered by the fallback test below)
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    sy = yy + amp * np.sin(xx / 137.0) + rng.normal(0, 0.15, (H, W)).astype(np.float32)
    sx = xx + amp * np.cos(yy / 97.0) + rng.normal(0, 0.15, (H, W)).astype(np.float32)
    return jnp.asarray(sy), jnp.asarray(sx)


def test_nearest_ref_exact():
    H, W, C = 24, 40, 3
    rng = np.random.default_rng(1)
    hist = jnp.asarray(rng.normal(size=(C, H, W)).astype(np.float32))
    sy, sx = _field(H, W)
    out, valid = warp_nearest_ref(hist, sy, sx)
    out = np.asarray(out)
    v = np.asarray(valid)
    h = np.asarray(hist)
    ys = np.floor(np.asarray(sy) + 0.5).astype(int)
    xs = np.floor(np.asarray(sx) + 0.5).astype(int)
    for i in range(H):
        for j in range(0, W, 7):
            if v[i, j]:
                assert (out[:, i, j] == h[:, ys[i, j], xs[i, j]]).all()
            else:
                assert not (0 <= ys[i, j] < H and 0 <= xs[i, j] < W)


def test_bilinear_ref_identity_warp():
    H, W, C = 16, 32, 2
    rng = np.random.default_rng(2)
    hist = jnp.asarray(rng.normal(size=(C, H, W)).astype(np.float32))
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    out, valid = warp_bilinear_ref(hist, jnp.asarray(yy), jnp.asarray(xx))
    v = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(out)[:, v], np.asarray(hist)[:, v],
                               rtol=1e-6)


def test_bilinear_ref_blends():
    H, W = 8, 16
    hist = jnp.arange(H * W, dtype=jnp.float32).reshape(1, H, W)
    sy = jnp.full((H, W), 2.5)
    sx = jnp.full((H, W), 3.5)
    out, valid = warp_bilinear_ref(hist, sy, sx)
    want = (hist[0, 2, 3] + hist[0, 2, 4] + hist[0, 3, 3] + hist[0, 3, 4]) / 4
    assert np.allclose(np.asarray(out)[0][np.asarray(valid)], float(want))


@pytest.mark.skipif(not on_tpu, reason="Pallas kernel needs TPU")
@pytest.mark.parametrize("mode", ["nearest", "bilinear"])
def test_kernel_matches_ref(mode):
    H, W, C = 128, 256, 5
    rng = np.random.default_rng(3)
    hist = jnp.asarray(rng.normal(size=(C, H, W)).astype(np.float32))
    sy, sx = _field(H, W, seed=4)
    disp = dispatch_nearest if mode == "nearest" else dispatch_bilinear
    ref = warp_nearest_ref if mode == "nearest" else warp_bilinear_ref
    out, valid = jax.jit(disp)(hist, sy, sx)
    rout, rvalid = ref(hist, sy, sx)
    v = np.asarray(valid)
    rv = np.asarray(rvalid)
    # kernel validity is a subset of image validity (window fallback)
    assert (v <= rv).all()
    # smooth small warps: nearly everything stays in-window
    assert v.mean() > 0.9 * rv.mean()
    np.testing.assert_allclose(np.asarray(out)[:, v], np.asarray(rout)[:, v],
                               rtol=1e-6, atol=1e-6)


@pytest.mark.skipif(not on_tpu, reason="Pallas kernel needs TPU")
def test_kernel_large_motion_falls_back_invalid():
    """Violent per-pixel scatter (beyond the tile window) must flag invalid,
    never fetch wrong data."""
    H, W, C = 64, 128, 2
    rng = np.random.default_rng(5)
    hist = jnp.asarray(rng.normal(size=(C, H, W)).astype(np.float32))
    sy = jnp.asarray(rng.uniform(0, H, (H, W)).astype(np.float32))
    sx = jnp.asarray(rng.uniform(0, W, (H, W)).astype(np.float32))
    out, valid = jax.jit(dispatch_nearest)(hist, sy, sx)
    rout, _ = warp_nearest_ref(hist, sy, sx)
    v = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(out)[:, v], np.asarray(rout)[:, v],
                               rtol=1e-6)
