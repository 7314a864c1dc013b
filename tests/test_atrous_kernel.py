"""Pallas à-trous kernel == XLA twin (TPU-only; CPU runs are skipped —
the twin itself is covered by the denoiser tests)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtvb_tpu.ops.denoise import passes

on_tpu = jax.default_backend() == "tpu"


@pytest.mark.skipif(not on_tpu, reason="Pallas kernel needs TPU")
@pytest.mark.parametrize("step", [1, 2, 4, 8])
def test_atrous_kernel_matches_twin(step):
    from rtvb_tpu.ops.denoise import atrous_kernel as AK
    H, W = 64, 256
    rng = np.random.default_rng(7)
    illum = jnp.asarray(rng.uniform(0, 4, (H, W, 3)).astype(np.float32))
    var = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1, 50, (H, W)).astype(np.float32))
    # some sky pixels
    depth = depth.at[:8, :32].set(1e30)
    n = rng.normal(size=(H, W, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    normal = jnp.asarray(n)
    rough = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

    ref_i, ref_v = jax.jit(lambda a, b: passes.atrous_pass(
        a, b, depth, normal, rough, step, 2.0, 64.0, 0.05))(illum, var)

    guide_p = AK.pad_guides(depth, normal, rough)
    got_i, got_v = jax.jit(lambda a, b: AK.atrous_pass_tpu(
        a, b, guide_p, H, W, step, 2.0, 64.0, 0.05))(illum, var)

    np.testing.assert_allclose(np.asarray(got_i), np.asarray(ref_i),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v),
                               rtol=2e-4, atol=2e-5)
