"""Multi-chip execution of the REAL product frame.

Runs the exact same stage functions as Engine._frame_fn —
`pathtracer.render_frame` (with temporal ReSTIR state), the full
`denoiser._denoise_jit` chain, and `postprocess.run` — under a
`shard_map` over horizontal pixel bands:

* **Path trace + denoise**: each device renders an *extended* band (its own
  rows plus `halo` overlap rows on each side) and runs the full denoiser on
  it.  The halo covers the denoiser's total stencil reach (firefly + pre-pass
  + à-trous pyramid), so every device's own rows are bit-identical to the
  unsharded frame — overlap *recompute* instead of per-pass ppermute
  exchanges, the right trade on TPU for a ≤40-row reach (ICI latency ≫ the
  recomputed FLOPs; see parallel/mesh.py for the exchange-based primitives).
* **Temporal state** (ReSTIR reservoirs, denoiser history) lives sharded in
  extended-band form, `(n_devices · ext_rows, W)`, so reuse never crosses a
  device boundary; with camera motion the band-edge halo rows reproject
  approximately (M-capped, exactly like the screen border).
* **GI ray budget**: bands render FULL-res GI (`half_res_gi` stays off
  here): band offsets can be odd, so band-local 2x2 GI quads could not
  align with the monolithic frame's quads — and scale-out already
  multiplies the per-pixel ray budget, which is the whole point.
* **Post-processing**: bands are `all_gather`ed (tiled, ICI) and the full
  post chain (auto-exposure histogram, bloom pyramid, lens flare — all
  screen-global effects) runs replicated on every device.  Post is ~3% of
  the frame; replication costs less than threading axis_names through a
  histogram/percentile/pyramid chain.

Reference analog: single-GPU (SURVEY §2.13) — this is the TPU-native scaling
design the reference never had.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stencil_reach(dn_cfg) -> int:
    """Total row reach of the denoiser's spatial stencils."""
    r = 2  # history clamp / compose margins
    if dn_cfg.firefly_filter:
        r += 1
    if dn_cfg.pre_pass:
        r += 2
    if dn_cfg.history_fix:
        r += 4
    # à-trous: radius-2 kernel at steps 1, 2, 4, ...
    r += sum(2 * (1 << i) for i in range(dn_cfg.atrous_iterations))
    return r


def band_layout(height: int, n_devices: int, dn_cfg):
    """(rows_per_device, ext_rows, halo) for the extended-band sharding."""
    assert height % n_devices == 0, \
        f"height {height} not divisible by {n_devices} devices"
    rows = height // n_devices
    halo = min(stencil_reach(dn_cfg), (height - rows) // 2)
    return rows, rows + 2 * halo, halo


def initial_sharded_state(eng, n_devices: int):
    """(restir_state, denoiser_state) in extended-band layout."""
    from ..render import restir as restir_mod
    from ..render.denoiser import initial_denoiser_state

    _, ext, _ = band_layout(eng.height, n_devices, eng.settings.denoising)
    rs = restir_mod.initial_state(n_devices * ext, eng.width) \
        if eng.settings.rendering.use_restir else None
    return rs, initial_denoiser_state(n_devices * ext, eng.width)


def sharded_frame_fn(eng, mesh: Mesh, axis: str = "dp"):
    """Build the jitted sharded full-frame step for Engine `eng`.

    Returns (step, in_specs_doc).  step(world, mats, lights, sky_state, cam,
    hist_cam, frame_idx, prev_restir, light_remap, dstate, post_state, dt,
    ent) → (out_u8 replicated, new_restir sharded, new_dstate sharded,
    new_post_state replicated) — the same signature as Engine._frame_fn's
    compiled `run` (renderer.py)."""
    from ..ops import dda
    from ..render import pathtracer, postprocess
    from ..render.denoiser import DenoiserState, _denoise_jit
    from ..render.restir import ReSTIRState

    n = mesh.devices.size
    H, W = eng.height, eng.width
    rows, ext, halo = band_layout(H, n, eng.settings.denoising)
    use_restir = eng.settings.rendering.use_restir
    rs_cfg = dataclasses.replace(eng.settings.rendering,
                                 local_light_candidates=eng._n_local)
    dn_cfg = eng.settings.denoising
    pp = eng.settings.post_processing
    tm = eng.settings.tone_mapping
    cfg, tp = eng.cfg, eng._tp
    out_h, out_w = eng.out_height, eng.out_width
    use_pallas = eng.backend == "pallas" or (
        eng.backend == "auto" and jax.default_backend() == "tpu")
    # same estimator selection as Engine._frame_fn: band parity vs the
    # unsharded frame requires the identical shading path
    shade_backend = (("pallas" if use_pallas else "xla")
                     if rs_cfg.fused_shading else None)
    if use_pallas:
        from ..ops import trace_kernel

    def band_step(world, mats, lights, sky_state, cam, hist_cam, frame_idx,
                  prev_restir, light_remap, dstate, post_state, dt, ent):
        idx = jax.lax.axis_index(axis)
        y0e = jnp.clip(idx * rows - halo, 0, H - ext)

        def trace_fn(o, d, t_cap=None, any_hit=False):
            impl = trace_kernel.trace if use_pallas else dda.trace
            kw = {}
            if use_pallas and not any_hit:
                kw = dict(mat_tables=trace_kernel.build_mat_tables(world, mats))
            return impl(o, d, world.colmask, world.df_super[0], tp,
                        t_cap=t_cap, any_hit=any_hit,
                        maxh_row=world.maxh_super[0], **kw)

        g, new_restir = pathtracer.render_frame(
            cfg, world, mats, lights, sky_state, cam, hist_cam,
            frame_idx, W, H, rs_cfg, trace_fn, y0=y0e, rows=ext,
            prev_restir=prev_restir if use_restir else None,
            light_remap=light_remap, entities=ent,
            shade_backend=shade_backend)
        rgb_ext, new_dstate = _denoise_jit(g, dstate, dn_cfg)

        crop = idx * rows - y0e
        band = jax.lax.dynamic_slice_in_dim(rgb_ext, crop, rows, axis=0)
        full = jax.lax.all_gather(band, axis, axis=0, tiled=True)
        out, new_pstate = postprocess.run(full, post_state, pp, tm, dt,
                                          out_h, out_w)
        out_u8 = (jnp.clip(out, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
        return out_u8, new_restir, new_dstate, new_pstate

    sh = P(axis)
    rep = P()
    # packed state is (8, H, W): bands shard the H axis (dim 1)
    restir_spec = ReSTIRState(data=P(None, axis)) if use_restir else rep
    dstate_spec = DenoiserState(
        slow=sh, fast=sh, moments=sh, hist_len=sh,
        prev_depth=sh, prev_normal=sh, bootstrapped=rep)
    in_specs = (rep, rep, rep, rep, rep, rep, rep,
                restir_spec, rep, dstate_spec, rep, rep, rep)
    out_specs = (rep, restir_spec, dstate_spec, rep)
    # check_vma=False: the replication checker can't statically prove the
    # post-processed output (derived from an all_gather'ed image) is
    # device-invariant, though it is by construction — every device runs the
    # identical post chain on the identical gathered frame.
    step = jax.jit(jax.shard_map(band_step, mesh=mesh, check_vma=False,
                                 in_specs=in_specs, out_specs=out_specs))
    return step, (rows, ext, halo)
