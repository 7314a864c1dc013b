"""Denoiser orchestration: the RELAX-style pass chain over G-buffers.

Parity with renderer/denoising/Denoiser.cu:24-408 (pass order: firefly →
[hit-dist reconstruction] → sky split → [pre-pass] → temporal accumulation →
history fix → history clamping → à-trous ×N → compose/remodulate → G-buffer
history), with toggles mirroring DenoisingParams (GlobalSettings.h:82-141).
First-frame bootstrap copies current illumination into history
(Denoiser.cu:121-142).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import DenoisingSettings
from ..ops import mathutil as m
from ..ops.denoise import passes
from .pathtracer import GBuffers

BIG = 1e30


class DenoiserState(NamedTuple):
    slow: jnp.ndarray         # (H, W, 3) accumulated illumination
    fast: jnp.ndarray         # (H, W, 3) fast history
    moments: jnp.ndarray      # (H, W, 2) luminance moments
    hist_len: jnp.ndarray     # (H, W)
    prev_depth: jnp.ndarray   # (H, W)
    prev_normal: jnp.ndarray  # (H, W, 3)
    bootstrapped: jnp.ndarray # () bool


def initial_denoiser_state(h: int, w: int) -> DenoiserState:
    return DenoiserState(
        slow=jnp.zeros((h, w, 3)),
        fast=jnp.zeros((h, w, 3)),
        moments=jnp.zeros((h, w, 2)),
        hist_len=jnp.zeros((h, w)),
        prev_depth=jnp.full((h, w), BIG, jnp.float32),
        prev_normal=jnp.zeros((h, w, 3)),
        bootstrapped=jnp.array(False),
    )


@partial(jax.jit, static_argnames=("cfg",))
def _denoise_jit(g: GBuffers, state: DenoiserState, cfg: DenoisingSettings):
    illum = jnp.stack(g.illum, axis=-1)
    normal = jnp.stack(g.normal, axis=-1)
    albedo = jnp.stack(g.albedo, axis=-1)
    depth = g.depth

    if cfg.firefly_filter:
        illum = passes.firefly_filter(illum, depth, normal)
    if cfg.pre_pass:
        illum = passes.pre_pass(illum, depth, normal)

    lum = m.luminance(illum[..., 0], illum[..., 1], illum[..., 2])
    moments_in = jnp.stack([lum, lum * lum], axis=-1)

    if cfg.temporal_accumulation:
        slow, fast, moments, hist_len = passes.temporal_accumulate(
            illum, moments_in, g.motion_u, g.motion_v, depth, normal,
            state.slow, state.fast, state.moments, state.hist_len,
            state.prev_depth, state.prev_normal,
            cfg.max_accumulated_frames, cfg.max_fast_accumulated_frames,
            cfg.disocclusion_threshold)
        # first frame: histories are garbage — bootstrap from current
        boot = state.bootstrapped
        slow = jnp.where(boot, slow, illum)
        fast = jnp.where(boot, fast, illum)
        moments = jnp.where(boot, moments, moments_in)
        hist_len = jnp.where(boot, hist_len, jnp.ones_like(hist_len))
    else:
        slow, fast, moments, hist_len = illum, illum, moments_in, jnp.ones_like(depth)

    if cfg.history_fix:
        slow = passes.history_fix(slow, depth, hist_len)
    if cfg.history_clamping:
        slow = passes.history_clamp(slow, fast)

    var = jnp.maximum(moments[..., 1] - moments[..., 0] ** 2, 0.0)
    # boost variance for young pixels (standard RELAX behavior)
    var = var * jnp.clip(4.0 / jnp.maximum(hist_len, 1.0), 1.0, 4.0)

    filtered = slow
    if jax.default_backend() == "tpu":
        # Pallas stencil kernel (Atrous.h/AtrousSmem.h role): ~10ms/pass as
        # XLA shifted-tap chains → VMEM-windowed tiles
        from ..ops.denoise import atrous_kernel as AK
        H, W = depth.shape
        guide_p = AK.pad_guides(depth, normal, g.roughness)
        for i in range(cfg.atrous_iterations):
            step = 1 << i
            if step <= AK.MAX_STEP:
                filtered, var = AK.atrous_pass_tpu(
                    filtered, var, guide_p, H, W, step,
                    cfg.phi_luminance, cfg.phi_normal, cfg.phi_depth)
            else:   # beyond the kernel's VMEM halo: XLA twin
                filtered, var = passes.atrous_pass(
                    filtered, var, depth, normal, g.roughness, step,
                    cfg.phi_luminance, cfg.phi_normal, cfg.phi_depth)
    else:
        for i in range(cfg.atrous_iterations):
            filtered, var = passes.atrous_pass(
                filtered, var, depth, normal, g.roughness, 1 << i,
                cfg.phi_luminance, cfg.phi_normal, cfg.phi_depth)

    # compose: remodulate albedo; sky/emissive pixels pass through unfiltered
    rgb = filtered * albedo
    raw = jnp.stack(g.illum, axis=-1) * albedo
    rgb = jnp.where(g.emissive_first[..., None], raw, rgb)

    new_state = DenoiserState(
        slow=slow, fast=fast, moments=moments, hist_len=hist_len,
        prev_depth=depth, prev_normal=normal,
        bootstrapped=jnp.array(True),
    )
    return rgb, new_state


def denoise(g: GBuffers, state: DenoiserState, cam, hist_cam,
            cfg: DenoisingSettings):
    """Denoiser::run equivalent. Returns (rgb (H,W,3) linear, new state)."""
    if not cfg.enabled:
        rgb = jnp.stack([g.illum[i] * g.albedo[i] for i in range(3)], axis=-1)
        return rgb, state
    return _denoise_jit(g, state, cfg)
