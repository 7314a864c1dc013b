"""Wavefront path tracer: the engine's hot loop.

Capability parity with the reference's OptiX megakernel stack —
RayGen.cu (bounce loop: totalBounceLimit=3, diffuseBounceLimit=1, blue-noise
jittered primaries, NaN scrub), closesthit.cu (hit shading: triplanar UV,
texture LOD, path regularization, albedo demodulation, G-buffer writes,
RIS direct lighting with local/sun/sky candidates + visibility ray),
miss.cu (sky radiance + sun disk) — re-architected as a *wavefront over SoA
pixel buffers*: every bounce is one trace + one fused shading pass over all
pixels; "divergence" is masked lanes.  There is no SBT, no payload registers,
no SER — the compiler sees a single straight-line jittable function.

ReSTIR temporal reuse layers on top in render/restir.py; this module produces
candidate reservoirs via streaming RIS exactly like closesthit.cu:330-600.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..assets import textures
from ..assets.materials import MaterialTable
from ..core.camera import Camera, camera_rays, pixel_uv
from ..core.config import RenderingSettings
from ..ops import bsdf as B
from ..ops import mathutil as m
from ..ops import rng
from ..ops import triangles as tri_ops
from ..ops.dda import BIG, HitRecord
from ..world.lighting import LightTable, light_radiance, sample_light_point
from ..world.voxel import WorldConfig, VoxelWorld, schema_block_id
from . import restir as restir_mod
from . import sky as sky_mod

SPAWN_EPS = 1e-3     # self-intersection avoidance offset (SelfHit.h role)


def spawn_eps(p):
    """Adaptive self-hit offset (renderer/shaders/SelfHit.h role — the
    reference offsets spawn points by position-scaled integer ulps so large
    world coordinates cannot round back onto the surface).  Float form:
    1e-5·|p| ≈ 84 f32 ulps, floored at SPAWN_EPS so behavior in the
    unit-voxel world (coords ≤ 64, where 1e-5·|p| < 1e-3) is unchanged;
    entity triangles at large coordinates get a proportionally safe
    offset."""
    mx = jnp.maximum(jnp.abs(p[0]),
                     jnp.maximum(jnp.abs(p[1]), jnp.abs(p[2])))
    return jnp.maximum(jnp.float32(SPAWN_EPS), 1e-5 * mx)


REGULARIZE_ROUGHNESS = 0.35   # path regularization after first diffuse


class EntityBuffers(NamedTuple):
    """Device-side triangle soup of all live entities + instanced decoration
    meshes for the brute-force intersector (replaces BLAS refits,
    OptixRenderer.cpp:487-555). Pad with zero rows to a fixed T."""
    tri_packed: jnp.ndarray   # (T, 9) [v0 | e1 | e2]
    normals: jnp.ndarray      # (T, 3) geometric normals
    prev_v0: jnp.ndarray      # (T, 3) previous-frame vertices (motion vectors)
    prev_v1: jnp.ndarray
    prev_v2: jnp.ndarray
    mat_index: jnp.ndarray    # (T,) i32 material index per triangle
    light_slot: jnp.ndarray   # (T,) i32 light-table slot, -1 = not a light
                              # (instanceLightMapping role, Light.h:6-11)
    uvs: jnp.ndarray = None       # (T, 6) per-vertex (u, v) ×3 for textured
                                  # entities (TEXCOORD_0 role); zeros if none
    image_id: jnp.ndarray = None  # (T,) i32 atlas slot, -1 = untextured


class GBuffers(NamedTuple):
    illum: tuple        # demodulated radiance (r, g, b), (H, W)
    albedo: tuple       # (r, g, b)
    normal: tuple       # (x, y, z)
    depth: jnp.ndarray
    roughness: jnp.ndarray
    motion_u: jnp.ndarray
    motion_v: jnp.ndarray
    emissive_first: jnp.ndarray   # primary hit was emissive / sky (denoiser skips)
    # picked-block edge mask (VoxelEngine.cu:884-903 edgeToHighlight +
    # closesthit.cu:136-158 segment-distance draw); None unless
    # block_highlight was requested
    highlight: jnp.ndarray = None


class Reservoir(NamedTuple):
    """DI reservoir (RestirCommon.h:6-13): chosen light sample + RIS state.
    kind/slot/face/fa/fb identify the sample for temporal storage
    (lightData/uvData equivalent)."""
    dir: tuple            # direction to the light sample
    dist: jnp.ndarray     # distance to the sample (BIG for sun/sky)
    le: tuple             # radiance of the chosen sample
    target_pdf: jnp.ndarray
    wsum: jnp.ndarray
    m_count: jnp.ndarray  # number of streamed candidates
    kind: jnp.ndarray     # restir.KIND_* of the chosen sample
    slot: jnp.ndarray     # local-light slot
    face: jnp.ndarray     # cube face
    fa: jnp.ndarray       # face uv
    fb: jnp.ndarray


def resolve_block_id(cfg: WorldConfig, world: VoxelWorld, rec: HitRecord):
    """Block id at a hit: schema arithmetic + exception lookup via one-hot
    key match over the sorted exception list (replaces the reference's
    per-triangle materialIndex SBT lookup)."""
    from ..ops.gatherlib import fast_gather, keyed_lookup
    c = jnp.clip(rec.ix * cfg.z + rec.iz, 0, cfg.n_cols - 1)
    if rec.schema is not None:
        # the trace kernel fetched these while the tables were in VMEM
        sch = rec.schema
        emask = rec.exc_mask
    else:
        sch = fast_gather(world.schema.reshape(-1), c)
        emask = fast_gather(world.exc_mask.reshape(-1), c)
    bid = schema_block_id(sch, rec.iy)
    has_exc = ((emask >> jnp.clip(rec.iy, 0, 31).astype(jnp.uint32))
               & jnp.uint32(1)) == 1

    key = c * cfg.y + rec.iy
    exc_bid, found = keyed_lookup(world.exc_key, world.exc_id, key)
    return jnp.where(has_exc & found, exc_bid, bid)


def gather_material(mats: MaterialTable, bid, min_roughness):
    from ..ops.gatherlib import fast_gather
    mi = fast_gather(mats.block_to_mat, bid)
    return material_from_index(mats, mi, min_roughness)


def material_from_index(mats: MaterialTable, mi, min_roughness):
    from ..ops.gatherlib import fast_gather_multi
    (ar, ag, ab, er, eg, eb, rough, metal, trans, tex_f, uvs) = fast_gather_multi(
        (mats.albedo[:, 0], mats.albedo[:, 1], mats.albedo[:, 2],
         mats.emissive[:, 0], mats.emissive[:, 1], mats.emissive[:, 2],
         mats.roughness, mats.metallic, mats.translucency,
         mats.texture_id, mats.uv_scale), mi)
    mat = B.Material(
        albedo_r=ar, albedo_g=ag, albedo_b=ab,
        roughness=jnp.maximum(rough, min_roughness),
        metallic=metal, translucency=trans,
    )
    return mat, (er, eg, eb), tex_f, uvs


def _nee_ris(rs: rng.RandState, lights: LightTable, sky_state, p, n, wo, mat,
             n_local: int, trace_any, sun_cos_max,
             ent_unreachable: bool = False):
    """Streaming RIS over light candidates (closesthit.cu:330-600):
    n_local local-light + 1 sun + 1 sky candidates → 1 visibility ray."""
    shape = p[0].shape
    zi = jnp.zeros(shape, jnp.int32)
    zf = jnp.zeros(shape)
    res = Reservoir(
        dir=(zf, zf, zf),
        dist=jnp.full(shape, BIG), le=(zf,) * 3,
        target_pdf=zf, wsum=zf,
        m_count=zi,
        kind=zi, slot=zi, face=zi, fa=zf, fb=zf,
    )

    def stream(res, wi, dist, le, src_pdf, u, kind, slot=None, face=None,
               fa=None, fb=None, mis_w=1.0, force_full=None):
        """Weighted reservoir update. mis_w is the within-strategy MIS weight
        (1/N): candidates estimate the SUM of the local/sun/sky integrals, so
        w = m·p̂/p and the final W = wsum/p̂ carries no M division (GRIS
        convention).  Each candidate additionally carries the light-vs-BRDF
        balance weight p_nee/(p_nee + p_bsdf) (LightBrdfMisWeight role,
        Restir.h:286-328): the BSDF continuation ray adds the complementary
        p_bsdf/(p_bsdf + p_nee) share on emissive/sky hits, keeping the total
        weight for direct light at exactly 1."""
        f_lum, pdf_b = B.eval_lum(mat, n, wo, wi)
        cos_i = jnp.maximum(m.dot(n, wi), 0.0)
        p_hat = f_lum * cos_i * m.luminance(le)
        balance = src_pdf / jnp.maximum(src_pdf + pdf_b, 1e-9)
        if force_full is not None:
            # the complementary BSDF-hit share is unreachable for this
            # sample (entity light meshes with entity_in_bounces=False):
            # NEE must carry the full weight or the light darkens
            balance = jnp.where(force_full, 1.0, balance)
        w = jnp.where(src_pdf > 1e-9,
                      mis_w * balance * p_hat / jnp.maximum(src_pdf, 1e-9), 0.0)
        wsum = res.wsum + w
        take_it = (u * jnp.maximum(wsum, 1e-20)) < w
        sel = lambda a, b: jnp.where(take_it, a, b)
        return Reservoir(
            dir=m.where3(take_it, wi, res.dir),
            dist=sel(dist, res.dist),
            le=m.where3(take_it, le, res.le),
            target_pdf=sel(p_hat, res.target_pdf),
            wsum=wsum,
            m_count=res.m_count + 1,
            kind=sel(jnp.full(shape, kind, jnp.int32), res.kind),
            slot=sel(slot if slot is not None else zi, res.slot),
            face=sel(face if face is not None else zi, res.face),
            fa=sel(fa if fa is not None else zf, res.fa),
            fb=sel(fb if fb is not None else zf, res.fb),
        )

    # local light candidates: triangle lights (TriangleLight::calcSample +
    # calcSolidAnglePdf, Light.h:42-137)
    n_slots = lights.prob.shape[0]
    any_lights = lights.count > 0
    for _ in range(n_local):
        u_slot, u_take = rs.next2()
        u1, u2, u3 = rs.next3()
        from ..ops.gatherlib import fast_gather, fast_gather_multi
        un = u_slot * n_slots
        col = jnp.clip(un.astype(jnp.int32), 0, n_slots - 1)
        frac = un - col.astype(jnp.float32)
        pr, al = fast_gather_multi((lights.prob, lights.alias), col)
        slot = jnp.where(frac < pr, col, al)
        pmf = fast_gather(lights.pmf, slot)

        lp, ln, pdf_area, (fa, fb) = sample_light_point(lights, slot, u1, u2, u3)
        to_l = m.sub(lp, p)
        dist2 = jnp.maximum(m.length_sq(to_l), 1e-6)
        dist = jnp.sqrt(dist2)
        wi = m.scale(to_l, 1.0 / dist)
        cos_l = jnp.maximum(m.dot(ln, m.neg(wi)), 0.0)
        # area pdf → solid angle (TriangleLight::calcSolidAnglePdf role)
        pdf_sa = pmf * pdf_area * dist2 / jnp.maximum(cos_l, 1e-6)
        le = light_radiance(lights, slot)
        le = m.where3((cos_l > 0.0) & any_lights, le, m.splat(0.0, le[0]))
        force_full = fast_gather(lights.ent.astype(jnp.float32), slot) > 0.5 \
            if ent_unreachable else None
        res = stream(res, wi, dist, le, pdf_sa, u_take, restir_mod.KIND_LOCAL,
                     slot=slot, fa=fa, fb=fb, mis_w=1.0 / n_local,
                     force_full=force_full)

    # sun candidate: uniform cone around sun_dir
    u1, u2 = rs.next2()
    u_take = rs.next()
    local = m.uniform_sample_cone(u1, u2, sun_cos_max)
    t, bt = m.orthonormal_basis(sky_state.sun_dir)
    wi_sun = m.from_local(local, t, bt, sky_state.sun_dir)
    wi_sun = (jnp.broadcast_to(wi_sun[0], shape), jnp.broadcast_to(wi_sun[1], shape),
              jnp.broadcast_to(wi_sun[2], shape))
    pdf_sun = 1.0 / jnp.maximum(2.0 * jnp.pi * (1.0 - sun_cos_max), 1e-9)
    le_sun = sky_mod.sun_radiance_cone(u1, sky_state)
    res = stream(res, wi_sun, jnp.full(shape, BIG), le_sun,
                 jnp.full(shape, pdf_sun), u_take, restir_mod.KIND_SUN)

    # sky candidate: env-map importance sample (equal-area luminance alias,
    # Sky.cu:383-391 role) — matches the reference's map-driven sky NEE and
    # beats cosine sampling at low sun
    u1, u2, u3 = rs.next3()
    u_take = rs.next()
    wi_sky, pdf_sky = sky_mod.sky_env_sample(sky_state, u1, u2, u3)
    le_sky = sky_mod.sky_radiance(wi_sky, sky_state)
    res = stream(res, wi_sky, jnp.full(shape, BIG), le_sky, pdf_sky, u_take,
                 restir_mod.KIND_SKY)

    return res


def shade_reservoir(res: Reservoir, p, n, wo, mat, trace_any, live=None):
    """Final visibility ray + contribution of the RIS winner
    (closesthit.cu:787-845). Candidates carry MIS weights, so W = wsum/p̂."""
    rgb, origin, sdir, cap = shade_reservoir_deferred(res, p, n, wo, mat, live)
    srec = trace_any(origin, sdir, cap)
    visible = ~srec.hit
    return tuple(c * visible for c in rgb)


def shade_reservoir_deferred(res: Reservoir, p, n, wo, mat, live=None):
    """Pre-visibility contribution + the visibility ray of the RIS winner.

    Returns (rgb, origin, dir, cap): the caller traces the ray later —
    render_frame batches every bounce's visibility rays into ONE any-hit
    wave (the per-bounce waves spent more time in fixed per-wave cost than
    in traversal; visibility results feed only the radiance sum, never the
    continuation ray, so deferral is exact)."""
    W = jnp.where(res.target_pdf > 1e-9,
                  res.wsum / jnp.maximum(res.target_pdf, 1e-9),
                  0.0)
    eps = spawn_eps(p)
    origin = m.add(p, m.scale(n, eps))
    sdir = res.dir
    cap = jnp.maximum(res.dist - 2.0 * eps, 0.0)
    if live is not None:
        # kill degenerate winners (p̂=0 → dir=(0,0,0)) and dead lanes
        live2 = live & (res.target_pdf > 1e-9)
        sdir = m.where3(live2, sdir, (jnp.zeros_like(origin[0]),
                                      jnp.ones_like(origin[1]),
                                      jnp.zeros_like(origin[2])))
        cap = jnp.where(live2, cap, 0.0)
    f, _ = B.evaluate(mat, n, wo, res.dir)
    cos_i = jnp.maximum(m.dot(n, res.dir), 0.0)
    rgb = tuple(fc * cos_i * lc * W for fc, lc in zip(f, res.le))
    return rgb, origin, sdir, cap


def _ds(a):
    """2x2-quad representative pick (static top-left rep: the rep's own
    per-frame subpixel jitter supplies temporal dither).

    NOT written as a[0::2, 0::2]: the strided slice lowers to a scalarized
    gather relayout on TPU — 1.26 ms PER 540x960 plane, ~14 ms/frame across
    the ~14 planes of the GI transition (r5 xplane trace).  The masked 2x2
    sum-pool below picks the identical value (rep + 0 + 0 + 0, exact in
    f32/i32) as one vectorized pooling op."""
    if a.dtype == jnp.bool_:
        return _ds(a.astype(jnp.int32)) > 0
    H, W = a.shape
    iy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    mask = ((iy & 1) == 0) & ((ix & 1) == 0)
    az = jnp.where(mask, a, jnp.zeros_like(a))
    return jax.lax.reduce_window(az, jnp.zeros((), a.dtype), jax.lax.add,
                                 (2, 2), (2, 2), "VALID")


def _ds3(v):
    return (_ds(v[0]), _ds(v[1]), _ds(v[2]))


def _up(a):
    """Broadcast each half-res value over its 2x2 quad."""
    return jnp.repeat(jnp.repeat(a, 2, axis=0), 2, axis=1)


def _picked_face_edges(vrec, p, t_hit, hit_now, cone_spread, H, W,
                       max_dist: float = 8.0):
    """Picked-block edge-highlight mask (H, W) float32 in {0, 1}.

    The center pixel's voxel-only primary hit is the pick
    (VoxelEngine.cu:879 performRayTraversal); its hit face's 4 corners are
    the reference's ``edgeToHighlight`` quad (VoxelEngine.cu:884-903), and
    each primary hit point is tested against the 4 edges by point-to-segment
    distance (closesthit.cu:146-157), with the fixed 0.005 tolerance widened
    to ~1.5 px of world-space footprint so the line stays ~1 px at any
    distance.  Voxel (ix,iy,iz) spans the unit cube with corner (ix,iy,iz)
    (ops/dda.py:166 floor convention)."""
    cy, cx = H // 2, W // 2
    pick = vrec.hit[cy, cx] & (vrec.t[cy, cx] < max_dist)
    bcx = vrec.ix[cy, cx].astype(jnp.float32) + 0.5
    bcy = vrec.iy[cy, cx].astype(jnp.float32) + 0.5
    bcz = vrec.iz[cy, cx].astype(jnp.float32) + 0.5
    nx0, ny0, nz0 = vrec.nx[cy, cx], vrec.ny[cy, cx], vrec.nz[cy, cx]
    x_face = jnp.abs(nx0) > 0.5
    y_face = jnp.abs(ny0) > 0.5
    # face-plane tangents (axis aligned): ±x faces → (y, z); ±y → (x, z);
    # ±z → (x, y)
    t1 = (jnp.where(x_face, 0.0, 1.0), jnp.where(x_face, 1.0, 0.0),
          jnp.zeros(()))
    t2 = (jnp.zeros(()), jnp.where(x_face | y_face, 0.0, 1.0),
          jnp.where(x_face | y_face, 1.0, 0.0))
    fc = (bcx + 0.5 * nx0, bcy + 0.5 * ny0, bcz + 0.5 * nz0)
    corners = []
    for s1, s2 in ((-0.5, -0.5), (0.5, -0.5), (0.5, 0.5), (-0.5, 0.5)):
        corners.append((fc[0] + s1 * t1[0] + s2 * t2[0],
                        fc[1] + s1 * t1[1] + s2 * t2[1],
                        fc[2] + s1 * t1[2] + s2 * t2[2]))
    tol = jnp.maximum(0.006, t_hit * cone_spread * 1.5)
    d2_min = jnp.full((H, W), BIG)
    for k in range(4):
        a, b = corners[k], corners[(k + 1) % 4]
        ab = (b[0] - a[0], b[1] - a[1], b[2] - a[2])      # unit-length edge
        pa = (p[0] - a[0], p[1] - a[1], p[2] - a[2])
        s = jnp.clip(pa[0] * ab[0] + pa[1] * ab[1] + pa[2] * ab[2], 0.0, 1.0)
        dx = pa[0] - s * ab[0]
        dy = pa[1] - s * ab[1]
        dz = pa[2] - s * ab[2]
        d2_min = jnp.minimum(d2_min, dx * dx + dy * dy + dz * dz)
    mask = hit_now & pick & (d2_min < tol * tol)
    return mask.astype(jnp.float32)


def render_frame(cfg: WorldConfig, world: VoxelWorld, mats: MaterialTable,
                 lights: LightTable, sky_state, cam: Camera, hist_cam: Camera,
                 frame_idx, width: int, height: int,
                 rs_cfg: RenderingSettings, trace_fn,
                 y0=0, rows: int | None = None,
                 prev_restir=None, light_remap=None,
                 entities: EntityBuffers | None = None,
                 atlas=None, shade_backend: str | None = None,
                 half_res_gi: bool = False, block_highlight: bool = False):
    """One 1-spp path-traced frame producing denoiser-ready G-buffers.

    trace_fn(o, d, t_cap, any_hit) -> HitRecord, closed over world tables
    (XLA or Pallas implementation — same semantics).  y0/rows render a
    horizontal band of the image (pixel-tile sharding).

    When prev_restir (render/restir.ReSTIRState) is given, direct lighting at
    the primary vertex runs temporal ReSTIR (reservoir reuse across frames,
    closesthit.cu:636-785); light_remap maps previous light slots to current
    ones after edits.  Returns (GBuffers, new_restir | None).

    shade_backend selects the per-bounce direct-lighting estimator:
      None      — the in-line XLA composition below (_nee_ris +
                  restir.temporal_combine + B.sample), the original path;
      "pallas"  — render/ris_kernel.fused_shade as a TPU kernel (the whole
                  RIS + temporal-reuse + winner-shading + BSDF-continuation
                  block in VMEM; closesthit.cu:330-845 role);
      "xla"     — the same fused body traced directly (CPU tests/goldens).
    All three consume the identical RNG stream and compute the same
    estimator; the fused paths exist because the XLA composition is
    VPU-op-bound (docs/PROFILE.md round 3).
    """
    use_restir = prev_restir is not None
    H, W = (height if rows is None else rows), width
    # realtime GI ray budget (config.half_res_gi): bounces >= 1 trace one
    # representative path per 2x2 quad; see the transition block at the end
    # of the bounce-0 iteration and the fold-up after the shadow wave
    half_gi = (half_res_gi and H % 2 == 0 and W % 2 == 0
               and rs_cfg.total_bounce_limit > 1)
    px = jnp.broadcast_to(jnp.arange(W, dtype=jnp.uint32)[None, :], (H, W))
    py = jnp.broadcast_to(
        (jnp.arange(H, dtype=jnp.uint32) + jnp.asarray(y0, jnp.uint32))[:, None], (H, W))
    frame_u = jnp.asarray(frame_idx, jnp.uint32)

    bn_full = rng.bn_packed(H, W, y0) if getattr(rs_cfg, "blue_noise", False) \
        else None
    bn_cur = bn_full     # tracks the live wave resolution (half-res after GI)
    rs = rng.RandState(px, py, frame_u, 0, bn=bn_full)
    ju, jv = rs.next2()
    o, d = camera_rays(cam, W, height, ju, jv, y0=y0, rows=H)

    # Dead/masked lanes must still flow through trace waves; give them a ray
    # that misses instantly (origin above the world, pointing up) — otherwise
    # one garbage ray per tile can pin the kernel's while-loop at max_steps.
    def neutralize(oo, dd, live):
        miss_o = (jnp.zeros_like(oo[0]), jnp.full_like(oo[1], 1e4), jnp.zeros_like(oo[2]))
        miss_d = (jnp.zeros_like(dd[0]), jnp.ones_like(dd[1]), jnp.zeros_like(dd[2]))
        return m.where3(live, oo, miss_o), m.where3(live, dd, miss_d)

    def trace_any(oo, dd, t_cap):
        srec = trace_fn(oo, dd, t_cap=t_cap, any_hit=True)
        if entities is not None and rs_cfg.entity_shadows:
            sth = tri_ops.intersect_packed(
                oo, dd, entities.tri_packed,
                t_cap=jnp.minimum(t_cap, srec.t))
            srec = srec._replace(hit=srec.hit | sth.hit)
        return srec

    L = [jnp.zeros((H, W)) for _ in range(3)]
    throughput = [jnp.ones((H, W)) for _ in range(3)]
    alive = jnp.ones((H, W), bool)
    diffuse_count = jnp.zeros((H, W), jnp.int32)
    min_roughness = jnp.zeros((H, W))
    prev_delta = jnp.ones((H, W), bool)     # primary counts as delta (camera)
    prev_cos_pdf = jnp.zeros((H, W))        # NEE pdf proxies for MIS
    prev_n = (jnp.zeros((H, W)), jnp.ones((H, W)), jnp.zeros((H, W)))

    # G-buffer defaults (sky)
    g_albedo = [jnp.ones((H, W)) for _ in range(3)]
    g_normal = [jnp.zeros((H, W)), jnp.ones((H, W)), jnp.zeros((H, W))]
    g_depth = jnp.full((H, W), BIG)
    g_rough = jnp.ones((H, W))
    g_emissive = jnp.zeros((H, W), bool)
    g_highlight = None

    sun_cos_max = sky_state.cos_sun_radius
    pdf_sun_cone = 1.0 / jnp.maximum(2.0 * jnp.pi * (1.0 - sun_cos_max), 1e-9)

    if shade_backend is not None:
        # per-frame packed tables for the fused shade kernel: light fields /
        # light ints (with the id-remap row baked in), env alias rows, and
        # the sky/sun scalar vector (render/ris_kernel.py layouts)
        from . import ris_kernel
        lf_pack, li_pack = ris_kernel.pack_light_tables(lights, light_remap)
        envf_pack, envi_pack = ris_kernel.pack_env_tables(sky_state)
        sf_pack = sky_mod.sky_scalar_pack(sky_state, lights.count > 0)

    # NEE visibility rays are deferred: each bounce appends its winner's
    # shadow ray + pre-visibility contribution; ONE batched any-hit wave
    # after the loop resolves them all (3 waves -> 1: visibility feeds only
    # the radiance sum, never the continuation ray)
    shadow_rays: list = []
    shadow_rgb: list = []
    restir_pending = None

    # half-res GI bookkeeping: Lcur aliases L until the bounce-0/1
    # transition, then points at the half-res GI accumulator (basis
    # throughput 1; th0_full redistributes it per full-res pixel at the end)
    Lcur = L
    L_gi = None
    th0_full = None

    for bounce in range(rs_cfg.total_bounce_limit):
        rs.dim = 8 + bounce * 64
        if bounce > 0:
            o, d = neutralize(o, d, alive)
        rec = trace_fn(o, d, t_cap=None, any_hit=False)
        if bounce == 0 and block_highlight:
            vrec0 = rec          # voxel-only primary record: the pick ignores
                                 # entities (performRayTraversal traverses the
                                 # voxel grid only, VoxelEngine.cu:879)

        # ---- entity/decoration triangles: brute-force composite hit ----
        test_ent = entities is not None and (bounce == 0 or rs_cfg.entity_in_bounces)
        if test_ent:
            th = tri_ops.intersect_packed(o, d, entities.tri_packed, t_cap=rec.t)
            is_ent = th.hit
            from ..ops.gatherlib import fast_gather_multi as _fgm
            tidx = jnp.clip(th.tri, 0, entities.normals.shape[0] - 1)
            enx_, eny_, enz_ = _fgm((entities.normals[:, 0],
                                     entities.normals[:, 1],
                                     entities.normals[:, 2]), tidx)
            en = jnp.stack([enx_, eny_, enz_], -1)
            # two-sided: face the incoming ray
            eflip = jnp.where(en[..., 0] * d[0] + en[..., 1] * d[1]
                              + en[..., 2] * d[2] > 0, -1.0, 1.0)
            ent_n = (en[..., 0] * eflip, en[..., 1] * eflip, en[..., 2] * eflip)
            rec = rec._replace(hit=rec.hit | is_ent,
                               t=jnp.where(is_ent, th.t, rec.t))
        else:
            is_ent = jnp.zeros_like(alive)

        # ---- miss: sky + sun with MIS against the NEE sky/sun candidates ----
        sky_rgb = sky_mod.sky_radiance(d, sky_state)
        sun_rgb = sky_mod.sun_radiance(d, sky_state)
        if bounce == 0:
            mis_sky = jnp.ones((H, W))
            mis_sun = jnp.ones((H, W))
        else:
            pdf_b = prev_cos_pdf
            # counterweight of the env-map sky candidate (sky_env_sample)
            pdf_nee_sky = sky_mod.sky_env_pdf(sky_state, d)
            mis_sky = jnp.where(prev_delta, 1.0, pdf_b / jnp.maximum(pdf_b + pdf_nee_sky, 1e-9))
            mis_sun = jnp.where(prev_delta, 1.0, pdf_b / jnp.maximum(pdf_b + pdf_sun_cone, 1e-9))
        miss_now = alive & ~rec.hit
        for i in range(3):
            Lcur[i] = Lcur[i] + jnp.where(
                miss_now,
                throughput[i] * (sky_rgb[i] * mis_sky + sun_rgb[i] * mis_sun), 0.0)
        alive = alive & rec.hit

        # ---- hit shading ----
        n = (rec.nx, rec.ny, rec.nz)
        if test_ent:
            n = m.where3(is_ent, ent_n, n)
        p = m.add(o, m.scale(d, rec.t))
        wo = m.neg(d)

        if bounce == 0 and block_highlight:
            # picked-block edge highlight, fully in-frame: the center pixel's
            # voxel hit IS the pick (camera-center DDA, VoxelEngine.cu:879),
            # and every primary hit point is tested against the 4 edges of
            # the picked face (closesthit.cu:146-157 PointToSegmentDistance,
            # tolerance widened to ~1.5 px of world footprint).  A handful of
            # fused VPU ops per pixel; no host round-trip, no extra wave.
            g_highlight = _picked_face_edges(vrec0, p, rec.t, rec.hit,
                                             cam.pixel_cone_spread(height),
                                             H, W)

        from ..ops.gatherlib import fast_gather as _fgmi
        if rec.mi is not None:
            # the trace kernel resolved block id -> material in VMEM
            mi = rec.mi
        else:
            bid = resolve_block_id(cfg, world, rec)
            mi = _fgmi(mats.block_to_mat, bid)
        if test_ent:
            mi = jnp.where(is_ent, _fgmi(entities.mat_index, tidx), mi)
        if rec.mat is not None and not test_ent:
            # kernel-gathered material fields (no XLA one-hot gathers)
            (ar_, ag_, ab_, er_, eg_, eb_, ro_, me_, tr_, tx_, uv_) = rec.mat
            mat = B.Material(albedo_r=ar_, albedo_g=ag_, albedo_b=ab_,
                             roughness=jnp.maximum(ro_, min_roughness),
                             metallic=me_, translucency=tr_)
            emis = (er_, eg_, eb_)
            tex_id = tx_.astype(jnp.int32)
            uv_scale = uv_
        else:
            mat, emis, tex_id, uv_scale = material_from_index(
                mats, mi, min_roughness)

        # triplanar world-grid UV + procedural texture (ray-cone LOD proxy).
        # Primary vertices only: at secondary vertices the accumulated cone
        # width has already rolled the analytic pattern contrast to ~zero
        # (sample_scale's 1/(1+2·lod) term), so the 5-pattern noise stack
        # (~400 VPU ops/pixel) would compute a multiplier ≈ 1 — the same
        # roll-off a mip chain would give the reference at depth
        # (closesthit.cu:195-200).
        u, v = textures.triplanar_uv(p[0], p[1], p[2], n[0], n[1], n[2])
        # ray-cone footprint on the surface: cone width t·spread divided by
        # the incidence cosine (closesthit.cu:195-200 cone/normal role) —
        # grazing surfaces cover more texels per pixel, so they mip up.
        # Bounded 4×: enough to stop grazing tiles from demanding the
        # 512² levels their screen footprint can't resolve (the texture
        # kernel's wide-row-window worst case), mild enough that facing
        # surfaces keep full detail.
        inc = jnp.maximum(jnp.abs(m.dot(n, d)), 0.25)
        lod = rec.t * cam.pixel_cone_spread(height) * 8.0 / inc
        if bounce == 0:
            tex = textures.sample_scale(tex_id, u * uv_scale, v * uv_scale, lod)
            mat = mat._replace(albedo_r=mat.albedo_r * tex,
                               albedo_g=mat.albedo_g * tex,
                               albedo_b=mat.albedo_b * tex)

        # authored PBR image textures (TextureManager.cu:222-240 +
        # materials.yaml:10-13 albedo/normal/roughness maps role): one
        # adaptive-mip kernel sample at primary hits yields albedo, a
        # normal-map gradient and a roughness multiplier (secondary
        # vertices keep the procedural detail — invisible at 1 spp)
        authored = None
        if atlas is not None and bounce == 0:
            img_id = _fgmi(mats.image_id, mi)
            u_s = u * uv_scale
            v_s = v * uv_scale
            if test_ent and entities.image_id is not None:
                # textured entities (character skin): barycentric TEXCOORD_0
                # interpolation + the entity's atlas slot replace the
                # triplanar coords on entity pixels (GLTFUtils texture role)
                from ..ops.gatherlib import fast_gather_multi as _fgm_uv
                euv = _fgm_uv(tuple(entities.uvs[:, k] for k in range(6)),
                              tidx)
                w0e = 1.0 - th.u - th.v
                ue = w0e * euv[0] + th.u * euv[2] + th.v * euv[4]
                ve = w0e * euv[1] + th.u * euv[3] + th.v * euv[5]
                from ..ops.gatherlib import fast_gather as _fg_img
                ent_img = _fg_img(entities.image_id, tidx)
                img_id = jnp.where(is_ent, ent_img, img_id)
                u_s = jnp.where(is_ent, ue, u_s)
                v_s = jnp.where(is_ent, ve, v_s)
            from ..assets import image_textures
            authored = image_textures.sample_atlas(
                atlas, img_id, u_s, v_s, lod)
            # the image IS the albedo (the reference's textured materials
            # ignore the flat tint, TextureManager.cu + closesthit.cu:195);
            # untextured materials keep tint × procedural detail
            use_img = img_id >= 0
            mat = mat._replace(
                albedo_r=jnp.where(use_img, authored.rgb[0], mat.albedo_r),
                albedo_g=jnp.where(use_img, authored.rgb[1], mat.albedo_g),
                albedo_b=jnp.where(use_img, authored.rgb[2], mat.albedo_b),
                roughness=jnp.maximum(mat.roughness * authored.rough_mul,
                                      min_roughness))
        else:
            use_img = None

        # procedural normal mapping at the primary hit (closesthit.cu:241-254
        # role): bend the face normal by the texture height gradient in the
        # triplanar tangent frame.  Geometric normal stays in the G-buffer
        # (denoiser edge stopping wants stable normals); shading uses the
        # bent one.  Secondary bounces keep flat normals (invisible detail,
        # 4 extra noise evals saved per bounce).
        n_geom = n
        if bounce == 0 and rs_cfg.normal_mapping:
            du_t, dv_t = textures.sample_normal_delta(
                tex_id, u * uv_scale, v * uv_scale, lod)
            if authored is not None:
                # authored normal map replaces the procedural gradient on
                # textured pixels (closesthit.cu:241-254 sampled normals)
                du_t = jnp.where(use_img, authored.du, du_t)
                dv_t = jnp.where(use_img, authored.dv, dv_t)
            n_bent = textures.perturb_normal(n, du_t, dv_t)
            n = m.where3(is_ent | ~rec.hit, n, n_bent)

        is_emissive = (emis[0] + emis[1] + emis[2]) > 0.0

        # emissive hit: add light, terminate (closesthit.cu:107-122)
        if bounce == 0:
            mis_e = jnp.ones((H, W))
        else:
            # exact light-vs-BRDF balance: reconstruct the NEE solid-angle
            # pdf of sampling this emissive point from the previous vertex —
            # pmf(light tri)·(1/area)·dist²/cosθ, the complement of the
            # candidate-side balance weight in _nee_ris.stream.
            # Entity hits (lantern glow box) map triangle → light slot via
            # EntityBuffers.light_slot (instanceLightMapping role); voxel
            # hits (cube emissives) look up the first triangle of the voxel.
            from ..ops.gatherlib import fast_gather as _fg, \
                fast_gather_multi as _fgm_l, keyed_lookup as _kl
            c_hit = jnp.clip(rec.ix * cfg.z + rec.iz, 0, cfg.n_cols - 1)
            key_e = (c_hit * cfg.y + rec.iy) * 16
            slot_v, found_v = _kl(lights.key,
                                  jnp.arange(lights.key.shape[0],
                                             dtype=jnp.int32), key_e)
            if test_ent:
                slot_t = _fg(entities.light_slot, tidx)
                slot_e = jnp.where(is_ent, slot_t, slot_v)
                found_e = jnp.where(is_ent, slot_t >= 0, found_v)
            else:
                slot_e, found_e = slot_v, found_v
            slot_e = jnp.clip(slot_e, 0, lights.key.shape[0] - 1)
            pmf_e, area_e = _fgm_l((lights.pmf, lights.area), slot_e)
            cos_le = jnp.abs(n[0] * d[0] + n[1] * d[1] + n[2] * d[2])
            pdf_nee_e = jnp.where(
                found_e,
                pmf_e * rec.t * rec.t
                / (jnp.maximum(area_e, 1e-8) * jnp.maximum(cos_le, 1e-4)),
                0.0)
            mis_e = jnp.where(prev_delta, 1.0,
                              prev_cos_pdf / jnp.maximum(
                                  prev_cos_pdf + pdf_nee_e, 1e-9))
        hit_emis = alive & is_emissive
        for i in range(3):
            Lcur[i] = Lcur[i] + jnp.where(hit_emis, throughput[i] * emis[i] * mis_e, 0.0)

        if bounce == 0:
            first_hit = rec.hit
            for i in range(3):
                g_albedo[i] = jnp.where(first_hit, (mat.albedo_r, mat.albedo_g, mat.albedo_b)[i], 1.0)
                g_normal[i] = jnp.where(first_hit, n_geom[i], g_normal[i])
            g_depth = jnp.where(first_hit, rec.t, BIG)
            g_rough = jnp.where(first_hit, mat.roughness, 1.0)
            g_emissive = hit_emis

            # motion vectors: reproject first hit (or miss dir) into hist cam;
            # entity hits reproject their previous-frame vertex position
            # (closesthit.cu:75-94 skinned motion vectors)
            u_cur, v_cur = pixel_uv(W, height, ju, jv, y0=y0, rows=H)
            p_ref = p
            if test_ent:
                w0 = 1.0 - th.u - th.v
                from ..ops.gatherlib import fast_gather_multi as _fgm2
                pvs = _fgm2(tuple(t[:, i] for t in (entities.prev_v0,
                                                    entities.prev_v1,
                                                    entities.prev_v2)
                                  for i in range(3)), tidx)
                p_prev_ent = tuple(
                    w0 * pvs[i] + th.u * pvs[3 + i] + th.v * pvs[6 + i]
                    for i in range(3))
                p_ref = m.where3(is_ent, p_prev_ent, p)
            up_h, vp_h, okp = hist_cam.point_to_uv(p_ref)
            ud_h, vd_h, okd = hist_cam.dir_to_uv(d)
            ok = jnp.where(first_hit, okp, okd)
            g_motion_u = jnp.where(ok, jnp.where(first_hit, up_h, ud_h) - u_cur, 2.0)
            g_motion_v = jnp.where(ok, jnp.where(first_hit, vp_h, vd_h) - v_cur, 2.0)

        alive = alive & ~is_emissive

        # ---- NEE via streaming RIS + one visibility ray ----
        n_cand = rs_cfg.local_light_candidates if bounce == 0 else \
            min(rs_cfg.local_light_candidates,
                rs_cfg.secondary_light_candidates)
        eps_p = spawn_eps(p)
        ent_unreach = (entities is not None and not rs_cfg.entity_in_bounces)
        if shade_backend is not None:
            # fused estimator: the whole RIS + temporal-combine + winner
            # shading + BSDF continuation block as one kernel invocation
            p_off = m.add(p, m.scale(n, eps_p))
            n_taps_b = 0
            taps = ()
            if bounce == 0 and use_restir:
                n_taps_b = max(1, rs_cfg.restir_temporal_samples)
                raw = restir_mod.warp_taps(prev_restir, g_motion_u,
                                           g_motion_v, frame_u, n_taps_b)
                taps = [([tp[c] for c in range(8)], tv.astype(jnp.int32))
                        for tp, tv in raw]
            sh_cfg = ris_kernel.ShadeConfig(
                n_local=n_cand, n_taps=n_taps_b,
                k_slots=int(lights.prob.shape[0]),
                base_dim=8 + bounce * 64,
                ent_unreachable=ent_unreach,
                m_cap=float(restir_mod.M_CAP), dis_thr=0.2,
                approx=(shade_backend == "pallas"),
                blue_noise=bn_cur is not None)
            out = ris_kernel.fused_shade(
                sh_cfg, frame_u, y0, sf_pack, lf_pack, li_pack,
                envf_pack, envi_pack, p_off, n, wo,
                (mat.albedo_r, mat.albedo_g, mat.albedo_b),
                mat.roughness, mat.metallic, mat.translucency,
                depth=g_depth if n_taps_b else None, taps=taps,
                backend=shade_backend, bn=bn_cur)
            nee = out.nee
            live2 = alive & (out.phat > 1e-9)
            vdir = m.where3(live2, out.dir, (jnp.zeros_like(p[0]),
                                             jnp.ones_like(p[1]),
                                             jnp.zeros_like(p[2])))
            vcap = jnp.where(live2,
                             jnp.maximum(out.dist - 2.0 * eps_p, 0.0), 0.0)
            shadow_rays.append((p_off, vdir, vcap))
            if bounce == 0 and use_restir:
                restir_pending = (out.kind, out.slot,
                                  jnp.zeros_like(out.kind), out.fa, out.fb,
                                  out.dir, out.le, out.M, out.W, alive, n)
        else:
            res = _nee_ris(rs, lights, sky_state,
                           m.add(p, m.scale(n, eps_p)),
                           n, wo, mat, n_cand, trace_any,
                           sun_cos_max, ent_unreachable=ent_unreach)
            if bounce == 0 and use_restir:
                n_taps = max(1, rs_cfg.restir_temporal_samples)
                u_takes = tuple(rs.next() for _ in range(n_taps))
                (k2, s2, f2, fa2, fb2, dir2, dist2, le2, phat2, wsum2, M2,
                 W2) = restir_mod.temporal_combine(
                    res.kind, res.slot, res.face, res.fa, res.fb, res.dir,
                    res.dist, res.le, res.wsum,
                    res.m_count.astype(jnp.float32), res.target_pdf,
                    prev_restir, g_motion_u, g_motion_v, g_depth, n, p, wo,
                    mat, lights, sky_state, light_remap, u_takes,
                    frame_idx=frame_u, n_taps=n_taps)
                origin = m.add(p, m.scale(n, eps_p))
                live2 = alive & (phat2 > 1e-9)
                vdir = m.where3(live2, dir2, (jnp.zeros_like(origin[0]),
                                              jnp.ones_like(origin[1]),
                                              jnp.zeros_like(origin[2])))
                vcap = jnp.where(live2,
                                 jnp.maximum(dist2 - 2.0 * eps_p, 0.0), 0.0)
                fv, _ = B.evaluate(mat, n, wo, dir2)
                cos2 = jnp.maximum(m.dot(n, dir2), 0.0)
                nee = tuple(fc * cos2 * lc * W2 for fc, lc in zip(fv, le2))
                keep = alive
                restir_pending = (k2, s2, f2, fa2, fb2, dir2, le2, M2, W2,
                                  keep, n)
                shadow_rays.append((origin, vdir, vcap))
            else:
                nee, origin, vdir, vcap = shade_reservoir_deferred(
                    res, p, n, wo, mat, live=alive)
                shadow_rays.append((origin, vdir, vcap))
        # contribution pending visibility: applied after the batched wave
        shadow_rgb.append(tuple(
            jnp.where(alive, throughput[i] * nee[i], 0.0) for i in range(3)))

        # ---- BSDF bounce ----
        if bounce == rs_cfg.total_bounce_limit - 1:
            alive = jnp.zeros_like(alive)
            break
        if shade_backend is not None:
            # continuation sample computed by the fused kernel
            samp = B.BsdfSample(
                wi=out.wi, weight=out.weight,
                pdf=jnp.zeros_like(out.phat),
                is_delta=out.is_delta != 0,
                is_transmission=out.is_transmission != 0)
        else:
            u1, u2, u3 = rs.next3()
            samp = B.sample(mat, n, wo, u1, u2, u3)
        # delta lobes (mirror, glass pass-through) never consume the diffuse
        # budget; rough surfaces and diffuse thin transmission do
        is_diffuse_lobe = ~samp.is_delta & ((mat.roughness > 0.35)
                                            | samp.is_transmission)
        diffuse_count = diffuse_count + jnp.where(alive & is_diffuse_lobe, 1, 0)
        over_diffuse = diffuse_count > rs_cfg.diffuse_bounce_limit
        # path regularization after a diffuse bounce (closesthit.cu:219-222)
        min_roughness = jnp.where(is_diffuse_lobe,
                                  jnp.maximum(min_roughness, REGULARIZE_ROUGHNESS),
                                  min_roughness)

        throughput = [jnp.where(alive, t * w, t) for t, w in zip(throughput, samp.weight)]
        zero_tp = (throughput[0] + throughput[1] + throughput[2]) < 1e-6
        alive = alive & ~over_diffuse & ~zero_tp

        # transmission through a terrain voxel: spawn from the *exit* face of
        # the cube (the voxel is solid in the traversal tables; restarting
        # inside it would re-hit immediately).  Entities are true thin
        # surfaces — a back-side epsilon suffices.
        wi = samp.wi
        ex = jnp.where(wi[0] > 0, rec.ix + 1.0, rec.ix.astype(jnp.float32))
        ey = jnp.where(wi[1] > 0, rec.iy + 1.0, rec.iy.astype(jnp.float32))
        ez = jnp.where(wi[2] > 0, rec.iz + 1.0, rec.iz.astype(jnp.float32))
        safe = lambda v: jnp.where(jnp.abs(v) < 1e-6,
                                   jnp.where(v >= 0, 1e-6, -1e-6), v)
        t_exit = jnp.minimum(jnp.minimum((ex - p[0]) / safe(wi[0]),
                                         (ey - p[1]) / safe(wi[1])),
                             (ez - p[2]) / safe(wi[2]))
        t_exit = jnp.clip(t_exit, 0.0, 1.75)
        o_exit = m.add(p, m.scale(wi, t_exit + eps_p))
        trans_voxel = samp.is_transmission & ~is_ent
        side = jnp.where(samp.is_transmission, -1.0, 1.0)
        o_surf = m.add(p, m.scale(n, eps_p * side))
        o = m.where3(trans_voxel, o_exit, o_surf)
        d = wi
        prev_delta = samp.is_delta
        # balance-weight counterpart: the NEE side weighted candidates by
        # src_pdf/(src_pdf + eval_lum.pdf); the emissive/sky-hit complement
        # must evaluate the SAME proxy at the continuation direction or the
        # two MIS halves stop summing to 1 (the estimator itself still
        # divides by the TRUE pdf via samp.weight — proxy affects weights
        # only, not unbiasedness)
        if shade_backend is not None:
            prev_cos_pdf = out.prev_cos_pdf   # kernel zeroed delta lobes
        else:
            _, prev_cos_pdf = B.eval_lum(mat, n, wo, wi)
            prev_cos_pdf = jnp.where(samp.is_delta, 0.0, prev_cos_pdf)
        prev_n = n

        if half_gi and bounce == 0:
            # ---- GI transition: bounces >= 1 at half resolution ----
            # th0_full (the full-res path weight through the primary BSDF)
            # redistributes the quad-representative incoming radiance per
            # pixel at the end; the half-res wave carries basis-1 throughput
            # so NEE/emissive/sky adds need no renormalization.
            th0_full = tuple(throughput)
            o = _ds3(o)
            d = _ds3(d)
            alive = _ds(alive) & (
                _ds(throughput[0] + throughput[1] + throughput[2]) > 1e-6)
            one_h = jnp.ones_like(alive, jnp.float32)
            throughput = [one_h, one_h, one_h]
            diffuse_count = _ds(diffuse_count)
            min_roughness = _ds(min_roughness)
            prev_delta = _ds(prev_delta)
            prev_cos_pdf = _ds(prev_cos_pdf)
            prev_n = _ds3(prev_n)
            bn_cur = None if bn_full is None \
                else rng.bn_packed(H // 2, W // 2, y0, step=2)
            rs = rng.RandState(_ds(px), _ds(py), frame_u, 0, bn=bn_cur)
            L_gi = [jnp.zeros_like(one_h) for _ in range(3)]
            Lcur = L_gi

    # ---- batched NEE visibility waves (one per resolution group: the
    # full-res primary wave, plus the half-res GI wave when half_gi) ----
    new_restir = None
    if shadow_rays:
        groups: dict = {}
        for k, (_, _, rc) in enumerate(shadow_rays):
            groups.setdefault(rc.shape, []).append(k)
        vis_parts: list = [None] * len(shadow_rays)
        for shape, idxs in groups.items():
            if len(idxs) == 1:
                srec = trace_any(*shadow_rays[idxs[0]])
                vis_parts[idxs[0]] = ~srec.hit
            else:
                o_all = tuple(
                    jnp.concatenate([shadow_rays[k][0][i] for k in idxs], 0)
                    for i in range(3))
                d_all = tuple(
                    jnp.concatenate([shadow_rays[k][1][i] for k in idxs], 0)
                    for i in range(3))
                cap_all = jnp.concatenate([shadow_rays[k][2] for k in idxs], 0)
                srec = trace_any(o_all, d_all, cap_all)
                vis_all = ~srec.hit
                rows_g = shape[0]
                for j, k in enumerate(idxs):
                    vis_parts[k] = vis_all[j * rows_g:(j + 1) * rows_g]
        for rgb_k, vis_k in zip(shadow_rgb, vis_parts):
            tgt = L if rgb_k[0].shape == L[0].shape else L_gi
            for i in range(3):
                tgt[i] = tgt[i] + jnp.where(vis_k, rgb_k[i], 0.0)
        if restir_pending is not None:
            (k2, s2, f2, fa2, fb2, dir2, le2, M2, W2, keep, n0) = \
                restir_pending
            visible0 = vis_parts[0]
            new_restir = restir_mod.pack_state(
                kind=jnp.where(keep, k2, restir_mod.KIND_NONE),
                slot=s2, fa=fa2, fb=fb2, dir3=dir2,
                W=jnp.where(keep & visible0, W2, 0.0),
                M=jnp.where(keep, M2, 0.0),
                depth=g_depth, n3=n0, le=le2)

    # fold the half-res GI accumulator up through each pixel's own primary
    # path weight (albedo/BSDF variation inside the quad stays per-pixel)
    if L_gi is not None:
        for i in range(3):
            L[i] = L[i] + th0_full[i] * _up(L_gi[i])

    # NaN scrub (RayGen.cu:175-178) + albedo demodulation
    # (closesthit.cu:293-303), computed through ONE stacked root: with three
    # separate per-channel roots XLA duplicated the whole channel-independent
    # shading chain (pdf streams, reservoir math) into each channel's loop
    # fusion — 3 x ~1.3M-cycle fusions at the 1/2 rung; a single stacked
    # root shares it.  Stack on axis 0: (3, H, W) keeps each plane in the
    # native (8,128)-tiled layout, so the per-channel re-slices below are
    # free — the round-3 axis=-1 form gave the root layout {1,0,2} and the
    # device trace showed three ~6 ms transposing copies per frame
    # converting each (H, W, 1) slice back to row-major.
    L3 = m.nan_scrub(jnp.stack(L, axis=0))
    alb3 = jnp.stack(g_albedo, axis=0)
    illum3 = L3 / jnp.maximum(alb3, 0.01)
    illum = tuple(illum3[i] for i in range(3))

    g = GBuffers(
        illum=illum,
        albedo=tuple(g_albedo),
        normal=tuple(g_normal),
        depth=g_depth,
        roughness=g_rough,
        motion_u=g_motion_u,
        motion_v=g_motion_v,
        emissive_first=g_emissive | (g_depth >= BIG),
        highlight=g_highlight,
    )
    return g, (new_restir if use_restir else None)
