"""Fused shading kernel (render/ris_kernel.py) — parity gates.

1. The fused XLA twin matches the in-line estimator composition
   (_nee_ris + restir.temporal_combine + B.sample) that it replaces:
   same RNG stream, same candidate math, same reservoir algebra — a full
   rendered frame must agree except for isolated reservoir tie-break flips.
2. The Pallas binding matches the XLA twin exactly (the ops/dda.py
   exact-twin contract) — runs on TPU only (RUN_TPU=1).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtvb_tpu.core.config import Settings
from rtvb_tpu.render.renderer import Engine


def _frame_rgb(g):
    return np.stack([np.asarray(g.illum[i] * g.albedo[i])
                     for i in range(3)], -1)


def _render(fused: bool, n=3, w=96, h=96):
    s = Settings().replace(rendering={"fused_shading": fused})
    e = Engine(settings=s, width=w, height=h)
    return [_frame_rgb(e.path_trace()) for _ in range(n)]


def test_fused_xla_matches_inline_composition():
    legacy = _render(False)
    fused = _render(True)
    for i, (a, b) in enumerate(zip(legacy, fused)):
        d = np.abs(a - b)
        # identical RNG + algebra: mean must agree tightly; max tolerates a
        # handful of reservoir-selection flips from ~1e-7 float reassociation
        # (a flipped `take` picks a different — equally valid — light sample)
        assert d.mean() < 1e-4, (i, d.mean())
        flipped = (d.max(-1) > 1e-3).mean()
        assert flipped < 0.005, (i, flipped)


def test_fused_shade_runs_with_lights_and_entities():
    """A scene with local lights + entity flags exercises the local-candidate
    and remap rows of the packed tables end-to-end (shape/segfault guard +
    radiance sanity + legacy agreement at night where lanterns dominate)."""
    from rtvb_tpu.assets import blocks as B

    def night(fused):
        s = Settings().replace(rendering={"fused_shading": fused},
                               sky={"time_of_day": 0.0})
        e = Engine(settings=s, width=64, height=64)
        x, z = 40, 40
        col = np.asarray(e.world.blocks[x, :, z])
        h = int(col.nonzero()[0].max())
        e.set_block(x, h + 1, z, B.LANTERN)
        return [_frame_rgb(e.path_trace()) for _ in range(2)]

    legacy = night(False)
    fused = night(True)
    for a, b in zip(legacy, fused):
        assert np.isfinite(b).all()
        d = np.abs(a - b)
        assert d.mean() < 1e-3, d.mean()


@pytest.mark.skipif(not os.environ.get("RUN_TPU"),
                    reason="Pallas TPU binding needs hardware (RUN_TPU=1)")
def test_pallas_matches_xla_twin():
    """backend='pallas' vs backend='xla' on identical inputs: the same body
    traced two ways must agree to float tolerance (approx reciprocals off)."""
    from rtvb_tpu.render import ris_kernel as RK
    from rtvb_tpu.render import sky as S
    from rtvb_tpu.render import restir as restir_mod
    from rtvb_tpu.assets import blocks as B

    H, W = 48, 256
    rng_np = np.random.default_rng(7)

    s = Settings().replace(sky={"time_of_day": 9.0})
    e = Engine(settings=s, width=32, height=32)
    x, z = 40, 40
    col = np.asarray(e.world.blocks[x, :, z])
    e.set_block(x, int(col.nonzero()[0].max()) + 1, z, B.LANTERN)
    lights, sky = e.lights, e.sky_state

    sf = S.sky_scalar_pack(sky, lights.count > 0)
    lf, li = RK.pack_light_tables(lights, None)
    envf, envi = RK.pack_env_tables(sky)

    def r(*shape):
        return jnp.asarray(rng_np.random(shape), jnp.float32)

    p = (r(H, W) * 60, r(H, W) * 20 + 2, r(H, W) * 60)
    nz = (r(H, W) - 0.5, r(H, W) + 0.5, r(H, W) - 0.5)
    nlen = jnp.sqrt(nz[0] ** 2 + nz[1] ** 2 + nz[2] ** 2)
    n = tuple(c / nlen for c in nz)
    woz = (r(H, W) - 0.5, r(H, W) + 0.2, r(H, W) - 0.5)
    wlen = jnp.sqrt(woz[0] ** 2 + woz[1] ** 2 + woz[2] ** 2)
    wo = tuple(c / wlen for c in woz)
    alb = (r(H, W), r(H, W), r(H, W))
    rough, metal, trans = r(H, W), r(H, W) * 0.5, jnp.zeros((H, W))
    depth = r(H, W) * 30 + 1

    # packed taps: a random valid ReSTIRState-like plane stack
    prev = restir_mod.pack_state(
        kind=jnp.asarray(rng_np.integers(0, 4, (H, W)), jnp.int32),
        slot=jnp.asarray(
            rng_np.integers(0, int(lights.prob.shape[0]), (H, W)), jnp.int32),
        fa=r(H, W) * 0.5, fb=r(H, W) * 0.5,
        dir3=n, W=r(H, W), M=r(H, W) * 20,
        depth=depth, n3=n, le=(r(H, W), r(H, W), r(H, W)))
    taps = [([prev.data[c] for c in range(8)],
             jnp.asarray(rng_np.integers(0, 2, (H, W)), jnp.int32))]

    cfgk = RK.ShadeConfig(n_local=4, n_taps=1,
                          k_slots=int(lights.prob.shape[0]),
                          base_dim=8, ent_unreachable=True,
                          m_cap=20.0, dis_thr=0.2, approx=False)
    args = (cfgk, 5, 0, sf, lf, li, envf, envi, p, n, wo, alb,
            rough, metal, trans)
    o_x = RK.fused_shade(*args, depth=depth, taps=taps, backend="xla")
    o_p = RK.fused_shade(*args, depth=depth, taps=taps, backend="pallas")
    for k, (a, b) in enumerate(zip(RK._flatten_out(o_x),
                                   RK._flatten_out(o_p))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"output #{k}")
