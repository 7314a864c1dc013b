"""Post-processing unit tests (PostProcessingPipeline.cu / ScalingFilter.h
roles)."""
import jax.numpy as jnp
import numpy as np

from rtvb_tpu.render import postprocess as pp


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
