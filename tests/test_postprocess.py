"""Post-processing unit tests (PostProcessingPipeline.cu / ScalingFilter.h
roles)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtvb_tpu.render import postprocess as pp

on_tpu = jax.default_backend() == "tpu"


@pytest.mark.skipif(not on_tpu, reason="Pallas kernel needs TPU")
@pytest.mark.parametrize("h,w,oh,ow", [(720, 1280, 1080, 1920),   # 3:2
                                       (810, 1440, 1080, 1920),   # 4:3
                                       (540, 960, 1080, 1920)])   # 2:1
def test_easu_kernel_matches_generic(h, w, oh, ow):
    """ops/easu_kernel vs the XLA generic path at every dynres rung ratio.
    Tolerances absorb the generic path's f32 source-frac rounding (the
    kernel's iota fracs are exact rationals — see easu_kernel docstring)."""
    from rtvb_tpu.ops.easu_kernel import easu_tpu
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((h, w, 3), dtype=np.float32))
    a = np.asarray(easu_tpu(img, oh, ow))
    b = np.asarray(pp.easu(img, oh, ow, force_generic=True))
    d = np.abs(a - b)
    assert a.shape == (oh, ow, 3)
    assert d.mean() < 2e-3 and np.quantile(d, 0.999) < 5e-2, \
        f"easu kernel diverged: mean {d.mean():.2e} p99.9 {np.quantile(d, 0.999):.2e}"


def test_easu_2x_matches_generic():
    """The exact-2x EASU specialization must stay bit-compatible with the
    generic rational-ratio path it shortcuts (ADVICE r3: the force_generic
    flag exists exactly for this comparison)."""
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((36, 48, 3), dtype=np.float32))
    fast = pp.easu(img, 72, 96)
    generic = pp.easu(img, 72, 96, force_generic=True)
    assert fast.shape == generic.shape == (72, 96, 3)
    diff = float(jnp.max(jnp.abs(fast - generic)))
    assert diff <= 1e-5, f"2x EASU diverged from generic path: {diff}"
