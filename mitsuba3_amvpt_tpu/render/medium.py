"""Participating media + phase functions.

Replaces the reference's Medium/PhaseFunction interfaces
(include/mitsuba/render/medium.h:53 sample_interaction,
:72 transmittance_eval_pdf), the homogeneous medium plugin
(src/media/homogeneous.cpp) and the heterogeneous medium plugin
(src/media/heterogeneous.cpp) with a flat MediumTable.

Heterogeneous media store volume-grid ids (render/volume.py) for the
density (and optionally albedo) fields and a scalar *majorant*
(= max-density * scale * max-channel sigma_t, the reference's
``get_majorant`` / combined extinction).  Free-flight sampling then uses
**delta tracking** against the majorant with per-channel null-collision
ratio weights — the single-sampled-channel spectral MIS of
volpath.cpp:83,239-247 — and shadow transmittance uses **ratio
tracking**.  Both loops draw from a per-lane TEA sub-stream key so the
sampler's dimension counter stays independent of the (data-dependent)
collision count, which keeps PRB replay deterministic (SURVEY.md §A.5).

Phase functions (src/phase/{isotropic,hg}.cpp): isotropic and
Henyey-Greenstein, dispatched by type id like BSDFs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core import math as m
from ..core import warp
from ..core.rng import bits_to_float01, sample_tea_32

P_ISOTROPIC = 0
P_HG = 1
P_RAYLEIGH = 2   # src/phase/rayleigh.cpp
P_TAB = 3        # src/phase/tabphase.cpp (tabulated over cos theta)
P_BLEND = 4      # src/phase/blendphase.cpp (two-lobe mixture)
P_SGGX = 5       # src/phase/sggx.cpp + render/microflake.h

# tabphase resolution: tabulated pdfs are resampled at load time onto
# TAB_K uniform nodes over cos(theta) in [-1, 1]
TAB_K = 64

# hard cap on tracking-loop collisions per flight (wavefront-global
# while_loop bound; optical depth per segment rarely exceeds ~100)
MAX_TRACK_STEPS = 4096


@struct.dataclass
class MediumTable:
    sigma_t: jnp.ndarray     # (M, 3) extinction (base value for hetero)
    albedo: jnp.ndarray      # (M, 3) single-scattering albedo
    phase_type: jnp.ndarray  # (M,) int32
    g: jnp.ndarray           # (M,) HG anisotropy
    scale: jnp.ndarray       # (M,)
    density_vol: jnp.ndarray = None  # (M,) int32 volume id, -1 = constant
    albedo_vol: jnp.ndarray = None   # (M,) int32 volume id, -1 = constant
    majorant: jnp.ndarray = None     # (M,) scalar majorant extinction
    # blendphase nested lobes (restricted to iso/hg/rayleigh):
    # nested[0] = (phase_type2, g2), nested[1] = (phase_type3, g3),
    # mixture = (1-w)*nested0 + w*nested1 (blendphase.cpp:128-133)
    phase_type2: jnp.ndarray = None  # (M,) int32
    g2: jnp.ndarray = None           # (M,)
    phase_type3: jnp.ndarray = None  # (M,) int32
    g3: jnp.ndarray = None           # (M,)
    blend_w: jnp.ndarray = None      # (M,) probability of nested[1]
    # tabphase: normalized pdf + cdf over TAB_K uniform cos-theta nodes
    tab_pdf: jnp.ndarray = None      # (M, TAB_K)
    tab_cdf: jnp.ndarray = None     # (M, TAB_K), cdf[..., -1] == 1
    # sggx microflake NDF params [S_xx, S_yy, S_zz, S_xy, S_xz, S_yz]
    sggx_s: jnp.ndarray = None       # (M, 6)

    @property
    def n(self):
        return self.sigma_t.shape[0]

    def __post_init__(self):
        M = self.sigma_t.shape[0] if hasattr(self.sigma_t, "shape") else 1
        if self.density_vol is None:
            object.__setattr__(self, "density_vol",
                               jnp.full((M,), -1, jnp.int32))
        if self.albedo_vol is None:
            object.__setattr__(self, "albedo_vol",
                               jnp.full((M,), -1, jnp.int32))
        if self.majorant is None:
            object.__setattr__(
                self, "majorant",
                jnp.max(self.sigma_t, -1) * self.scale)
        if self.phase_type2 is None:
            object.__setattr__(self, "phase_type2",
                               jnp.zeros((M,), jnp.int32))
        if self.g2 is None:
            object.__setattr__(self, "g2", jnp.zeros((M,)))
        if self.phase_type3 is None:
            object.__setattr__(self, "phase_type3",
                               jnp.zeros((M,), jnp.int32))
        if self.g3 is None:
            object.__setattr__(self, "g3", jnp.zeros((M,)))
        if self.blend_w is None:
            object.__setattr__(self, "blend_w", jnp.full((M,), 0.5))
        if self.tab_pdf is None:
            object.__setattr__(self, "tab_pdf",
                               jnp.full((M, TAB_K), 0.5))
        if self.tab_cdf is None:
            object.__setattr__(
                self, "tab_cdf",
                jnp.broadcast_to(jnp.linspace(0.0, 1.0, TAB_K), (M, TAB_K)))
        if self.sggx_s is None:
            s = jnp.concatenate([jnp.ones((M, 3)), jnp.zeros((M, 3))], -1)
            object.__setattr__(self, "sggx_s", s)

    @staticmethod
    def empty() -> "MediumTable":
        return MediumTable(sigma_t=jnp.zeros((1, 3)),
                           albedo=jnp.zeros((1, 3)),
                           phase_type=jnp.zeros((1,), jnp.int32),
                           g=jnp.zeros((1,)), scale=jnp.ones((1,)))


# ---------------------------------------------------------------------------
# phase functions
# ---------------------------------------------------------------------------


def _pick_channel(v3, ch):
    """v3[..., ch] for ch in {0,1,2} WITHOUT take_along_axis: TPU
    lowers the per-lane row gather at ~2 ms/Mlane (measured round 4 on
    the Veach sphere merge); a 3-wide one-hot select is pure VPU."""
    oh = jax.lax.broadcasted_iota(jnp.int32, v3.shape, v3.ndim - 1) \
        == ch[..., None]
    return jnp.sum(jnp.where(oh, v3, 0.0), axis=-1)

def _around(axis, ct, phi):
    """Direction with polar angle acos(ct) around ``axis``."""
    st = m.safe_sqrt(1.0 - ct * ct)
    s, t = m.coordinate_system(axis)
    return (st * jnp.cos(phi))[..., None] * s \
        + (st * jnp.sin(phi))[..., None] * t + ct[..., None] * axis


def _hg_sample_ct(g, u):
    """HG inverse CDF (src/phase/hg.cpp): cos between wo and -wi."""
    g = jnp.where(jnp.abs(g) < 1e-3, 1e-3 * jnp.sign(g) + 1e-6, g)
    sqr = (1.0 - g * g) / (1.0 + g - 2.0 * g * u)
    return -(1.0 + g * g - sqr * sqr) / (2.0 * g)


def _hg_eval(g, ct_fwd):
    """HG value at cos(theta) between wo and the forward dir -wi."""
    denom = 1.0 + g * g + 2.0 * g * ct_fwd
    return warp.INV_FOURPI * (1.0 - g * g) / jnp.maximum(
        denom * m.safe_sqrt(denom), 1e-8)


def _rayleigh_eval(ct):
    """(3/16pi)(1+cos^2) — rayleigh.cpp eval_rayleigh (symmetric in ct)."""
    return (3.0 / 16.0) * warp.INV_PI * (1.0 + ct * ct)


def _rayleigh_sample_ct(u):
    """Invert the Rayleigh CDF via Cardano (rayleigh.cpp sample)."""
    z = 2.0 * (2.0 * u - 1.0)
    tmp = jnp.sqrt(z * z + 1.0)
    return jnp.cbrt(z + tmp) + jnp.cbrt(z - tmp)


def _simple_eval(ptype, g, ct_fwd):
    """Dispatch over the non-tabulated azimuthal-symmetric lobes
    (iso / hg / rayleigh).  ct_fwd = dot(wo, -wi)."""
    val = jnp.full_like(ct_fwd, warp.INV_FOURPI)
    val = jnp.where(ptype == P_HG, _hg_eval(g, ct_fwd), val)
    val = jnp.where(ptype == P_RAYLEIGH, _rayleigh_eval(ct_fwd), val)
    return val


def _pick_node(row, i):
    """row (..., TAB_K) at per-lane node i -> (...,): one-hot
    multiply-reduce over the 64-node axis instead of take_along_axis,
    whose per-lane row-gather lowering costs ~2 ms/Mlane on TPU
    (VERDICT r4 weak #6; same ablation as commit 8b34e90)."""
    nodes = jnp.arange(TAB_K, dtype=jnp.int32)
    return jnp.sum(jnp.where(i[..., None] == nodes, row, 0.0), -1)


def _tab_eval(tab_pdf, ct_mi):
    """Tabulated pdf lookup (tabphase.cpp eval_pdf): linear interp of the
    per-row pdf at ct = dot(wo, wi), directional pdf = pdf(ct)/(2pi)."""
    x = (jnp.clip(ct_mi, -1.0, 1.0) + 1.0) * 0.5 * (TAB_K - 1)
    i = jnp.clip(x.astype(jnp.int32), 0, TAB_K - 2)
    t = x - i.astype(x.dtype)
    p0 = _pick_node(tab_pdf, i)
    p1 = _pick_node(tab_pdf, i + 1)
    return (p0 + (p1 - p0) * t) * (0.5 * warp.INV_PI)


def _tab_sample_ct(tab_pdf, tab_cdf, u):
    """Sample ct = dot(wo, wi) from the per-lane tabulated distribution
    (piecewise-linear pdf; quadratic segment inversion as distr_1d.h)."""
    i = jnp.clip(jnp.sum(tab_cdf <= u[..., None], -1) - 1, 0, TAB_K - 2)
    c0 = _pick_node(tab_cdf, i)
    p0 = _pick_node(tab_pdf, i)
    p1 = _pick_node(tab_pdf, i + 1)
    dx = 2.0 / (TAB_K - 1)
    rem = (u - c0)
    a = 0.5 * (p1 - p0) * dx
    b = p0 * dx
    disc = m.safe_sqrt(b * b + 4.0 * a * rem)
    t = jnp.where(jnp.abs(a) > 1e-12 * jnp.abs(b) + 1e-20,
                  m.safe_div(2.0 * rem, b + disc), m.safe_div(rem, b))
    t = jnp.clip(t, 0.0, 1.0)
    return -1.0 + (i.astype(u.dtype) + t) * dx


# -- SGGX microflake distribution (render/microflake.h) ---------------------

def _sggx_proj_area(w, s6):
    """sqrt(w^T S w) — microflake.h sggx_projected_area."""
    x, y, z = w[..., 0], w[..., 1], w[..., 2]
    return m.safe_sqrt(
        x * x * s6[..., 0] + y * y * s6[..., 1] + z * z * s6[..., 2]
        + 2.0 * (x * y * s6[..., 3] + x * z * s6[..., 4]
                 + y * z * s6[..., 5]))


def _sggx_ndf_pdf(wm, s6):
    """Visible-normal-free SGGX NDF pdf of a microflake normal
    (microflake.h sggx_pdf)."""
    sxx, syy, szz = s6[..., 0], s6[..., 1], s6[..., 2]
    sxy, sxz, syz = s6[..., 3], s6[..., 4], s6[..., 5]
    det = jnp.abs(sxx * syy * szz - sxx * syz * syz - syy * sxz * sxz
                  - szz * sxy * sxy + 2.0 * sxy * sxz * syz)
    x, y, z = wm[..., 0], wm[..., 1], wm[..., 2]
    den = (x * x * (syy * szz - syz * syz)
           + y * y * (sxx * szz - sxz * sxz)
           + z * z * (sxx * syy - sxy * sxy)
           + 2.0 * (x * y * (sxz * syz - szz * sxy)
                    + x * z * (sxy * syz - syy * sxz)
                    + y * z * (sxy * sxz - sxx * syz)))
    return jnp.maximum(det, 0.0) * m.safe_sqrt(det) \
        / (jnp.pi * jnp.maximum(den * den, 1e-20))


def _sggx_sample_normal(wi, u2, s6):
    """Sample a visible microflake normal (microflake.h sggx_sample):
    express S in a frame whose +Z is wi, Cholesky-like decomposition of
    the projected ellipsoid, cosine-hemisphere warp."""
    fs, ft = m.coordinate_system(wi)
    # S in the (fs, ft, wi) frame: s2 = B^T S B with B columns (fs,ft,wi)
    def srow(v):  # S @ v
        sxx, syy, szz = s6[..., 0], s6[..., 1], s6[..., 2]
        sxy, sxz, syz = s6[..., 3], s6[..., 4], s6[..., 5]
        return jnp.stack([
            sxx * v[..., 0] + sxy * v[..., 1] + sxz * v[..., 2],
            sxy * v[..., 0] + syy * v[..., 1] + syz * v[..., 2],
            sxz * v[..., 0] + syz * v[..., 1] + szz * v[..., 2]], -1)

    Sfs, Sft, Swi = srow(fs), srow(ft), srow(wi)
    s2 = {}
    for (a, va, Sa) in (("k", fs, Sfs), ("j", ft, Sft), ("i", wi, Swi)):
        for (b, vb) in (("k", fs), ("j", ft), ("i", wi)):
            s2[a + b] = jnp.sum(vb * Sa, -1)
    inv_sqrt_s_ii = m.safe_div(1.0, m.safe_sqrt(s2["ii"]))
    tmp = m.safe_sqrt(s2["jj"] * s2["ii"] - s2["ji"] * s2["ji"])
    det = jnp.abs(
        s2["kk"] * (s2["jj"] * s2["ii"] - s2["ji"] * s2["ji"])
        - s2["kj"] * (s2["kj"] * s2["ii"] - s2["ji"] * s2["ki"])
        + s2["ki"] * (s2["kj"] * s2["ji"] - s2["jj"] * s2["ki"]))
    m_k = jnp.stack([m.safe_div(m.safe_sqrt(det), tmp),
                     jnp.zeros_like(tmp), jnp.zeros_like(tmp)], -1)
    m_j = jnp.stack([
        -inv_sqrt_s_ii * m.safe_div(
            s2["ki"] * s2["ji"] - s2["kj"] * s2["ii"], tmp),
        inv_sqrt_s_ii * tmp, jnp.zeros_like(tmp)], -1)
    m_i = inv_sqrt_s_ii[..., None] * jnp.stack(
        [s2["ki"], s2["ji"], s2["ii"]], -1)
    uvw = warp.square_to_cosine_hemisphere(u2)
    nl = m.normalize(uvw[..., 0:1] * m_k + uvw[..., 1:2] * m_j
                     + uvw[..., 2:3] * m_i)
    return nl[..., 0:1] * fs + nl[..., 1:2] * ft + nl[..., 2:3] * wi


def _radio_rows(media: MediumTable, sid):
    """Per-lane radiometric medium parameters via ONE one-hot matmul
    fetch (m.take_rows) instead of five per-lane row gathers — the
    take_along_axis lowering billed ~2 ms/Mlane each (VERDICT r4 weak
    #6).  Returns dict with st = sigma_t*scale (N,3), albedo (N,3),
    majorant (N,), density_vol/albedo_vol (N,) int32."""
    packed = jnp.concatenate([
        media.sigma_t * media.scale[..., None],          # 0:3
        media.albedo,                                    # 3:6
        media.majorant[..., None],                       # 6
        media.density_vol.astype(media.sigma_t.dtype)[..., None],   # 7
        media.albedo_vol.astype(media.sigma_t.dtype)[..., None],    # 8
    ], -1)
    rows = m.take_rows(packed, sid)
    return dict(st=rows[..., 0:3], albedo=rows[..., 3:6],
                majorant=rows[..., 6],
                density_vol=rows[..., 7].astype(jnp.int32),
                albedo_vol=rows[..., 8].astype(jnp.int32))


def _phase_rows(media: MediumTable, sid):
    """Per-lane phase parameters without per-lane row gathers.

    ``table[sid]`` lowers to an XLA per-lane gather (~2 ms/Mlane on TPU,
    the pattern that cost Veach 5x — commit 8b34e90); with M media small
    this packs the scalar attributes into one (M, C) table and fetches
    everything through ``m.take_rows`` one-hot matmuls instead."""
    scal = jnp.stack([media.g, media.g2, media.g3, media.blend_w,
                      media.phase_type.astype(media.g.dtype),
                      media.phase_type2.astype(media.g.dtype),
                      media.phase_type3.astype(media.g.dtype)], -1)
    rows = m.take_rows(scal, sid)
    return dict(ptype=rows[..., 4].astype(jnp.int32), g=rows[..., 0],
                ptype2=rows[..., 5].astype(jnp.int32), g2=rows[..., 1],
                ptype3=rows[..., 6].astype(jnp.int32), g3=rows[..., 2],
                blend_w=rows[..., 3],
                tab_pdf=m.take_rows(media.tab_pdf, sid),
                tab_cdf=m.take_rows(media.tab_cdf, sid),
                sggx_s=m.take_rows(media.sggx_s, sid))


def phase_sample(media: MediumTable, sid, wi_world, u2):
    """Sample a scattered direction (world frame); returns (wo, pdf).

    wi_world points toward the previous vertex (incoming).  Dispatches
    over iso / hg / rayleigh / tabphase / blendphase / sggx by masked
    evaluation, like BSDFs (src/phase/*.cpp).
    """
    p = _phase_rows(media, sid)
    ptype, g = p["ptype"], p["g"]
    phi = 2.0 * jnp.pi * u2[..., 1]
    fwd = -wi_world

    # blendphase: stochastically pick a nested lobe with an independent
    # TEA-derived uniform (decision decorrelated from u2; the reference
    # remaps sample1, blendphase.cpp:128-144)
    u_sel = bits_to_float01(sample_tea_32(
        (u2[..., 0] * 16777216.0).astype(jnp.uint32),
        jnp.uint32(0x9e41), 4)[0])
    is_blend = ptype == P_BLEND
    pick1 = u_sel <= p["blend_w"]
    eff_type = jnp.where(is_blend,
                         jnp.where(pick1, p["ptype3"], p["ptype2"]), ptype)
    eff_g = jnp.where(is_blend,
                      jnp.where(pick1, p["g3"], p["g2"]), g)

    # azimuthally symmetric lobes around fwd = -wi
    ct_iso = 1.0 - 2.0 * u2[..., 0]
    ct = jnp.where(eff_type == P_HG,
                   _hg_sample_ct(eff_g, u2[..., 0]), ct_iso)
    ct = jnp.where(eff_type == P_RAYLEIGH,
                   jnp.clip(_rayleigh_sample_ct(u2[..., 0]), -1.0, 1.0), ct)
    # tabphase samples ct' = dot(wo, wi) (tabphase.cpp:85-99)
    ct_tab = _tab_sample_ct(p["tab_pdf"], p["tab_cdf"], u2[..., 0])
    ct = jnp.where(eff_type == P_TAB, -ct_tab, ct)
    wo = _around(fwd, ct, phi)

    # sggx: reflect mi.wi (= -ray.d; callers pass the ray direction)
    # about a sampled visible microflake normal (sggx.cpp:85-101)
    mi_wi = -wi_world
    n_s = _sggx_sample_normal(mi_wi, u2, p["sggx_s"])
    wo_sggx = 2.0 * jnp.sum(mi_wi * n_s, -1, keepdims=True) * n_s - mi_wi
    wo = jnp.where((ptype == P_SGGX)[..., None], m.normalize(wo_sggx), wo)
    pdf = phase_eval(media, sid, wi_world, wo)
    return wo, pdf


def phase_eval(media: MediumTable, sid, wi_world, wo_world):
    """Phase value == pdf (all implemented lobes importance-sample
    themselves exactly; phase.h eval_pdf)."""
    p = _phase_rows(media, sid)
    ptype = p["ptype"]
    ct_fwd = m.dot(-wi_world, wo_world)
    val = _simple_eval(ptype, p["g"], ct_fwd)
    val = jnp.where(ptype == P_TAB, _tab_eval(p["tab_pdf"], -ct_fwd), val)
    # blendphase mixture: (1-w)*nested0 + w*nested1 (blendphase.cpp:178+)
    v0 = _simple_eval(p["ptype2"], p["g2"], ct_fwd)
    v1 = _simple_eval(p["ptype3"], p["g3"], ct_fwd)
    val = jnp.where(ptype == P_BLEND,
                    (1.0 - p["blend_w"]) * v0 + p["blend_w"] * v1, val)
    # sggx: 0.25 * D(wm) / sigma(mi.wi), wm = half vector of (mi.wi, wo)
    # with mi.wi = -ray.d (sggx.cpp:117)
    wm = m.normalize(wo_world - wi_world)
    v_sggx = 0.25 * _sggx_ndf_pdf(wm, p["sggx_s"]) \
        / jnp.maximum(_sggx_proj_area(wi_world, p["sggx_s"]), 1e-8)
    val = jnp.where(ptype == P_SGGX, v_sggx, val)
    return val


# ---------------------------------------------------------------------------
# homogeneous medium sampling
# ---------------------------------------------------------------------------

def sample_interaction(media: MediumTable, med_id, u_channel, u_dist, maxt):
    """Free-flight sampling with uniform spectral channel selection
    (volpath.cpp:83, homogeneous.cpp): returns
    (t, is_medium (bool), tr_pdf_weight (3,), sigma_s (3,)).

    tr_pdf_weight = T(t)*sigma_t_ratio... — specifically the combined
    weight Tr/pdf for the sampled event:
      medium event at t:  sigma_s * T(t) / pdf_t
      surface event:      T(maxt) / P(surface)
    computed with the single-sample spectral MIS of the reference
    (uniform channel pick, pdf averaged over channels).
    """
    rows = _radio_rows(media, jnp.maximum(med_id, 0))
    st, alb = rows["st"], rows["albedo"]                    # (N, 3)
    sigma_s = st * alb

    ch = jnp.clip((u_channel * 3).astype(jnp.int32), 0, 2)
    st_c = _pick_channel(st, ch)
    st_c = jnp.maximum(st_c, 1e-8)
    # DETACHED SAMPLING (prb.py style, essential for unbiased naive AD
    # too): the sampled distance and the sampling pdfs are evaluated at
    # detached parameters; only the integrand (Tr, sigma_s) is attached.
    t = jax.lax.stop_gradient(
        -jnp.log(jnp.maximum(1.0 - u_dist, 1e-20)) / st_c)
    is_medium = t < maxt
    t_clamped = jnp.minimum(t, maxt)

    Tr = jnp.exp(-st * t_clamped[..., None])                # (N, 3)
    # pdf of medium event at t: mean_c sigma_t_c exp(-sigma_t_c t)
    pdf_t = jax.lax.stop_gradient(jnp.mean(st * Tr, axis=-1))
    # pdf of reaching the surface: mean_c exp(-sigma_t_c maxt)
    pdf_surf = jax.lax.stop_gradient(jnp.mean(Tr, axis=-1))
    w_medium = sigma_s * Tr / jnp.maximum(pdf_t, 1e-20)[..., None]
    w_surface = Tr / jnp.maximum(pdf_surf, 1e-20)[..., None]
    weight = jnp.where(is_medium[..., None], w_medium, w_surface)
    return t_clamped, is_medium, weight, sigma_s


def transmittance(media: MediumTable, med_id, dist):
    """Analytic homogeneous transmittance along a segment
    (Medium::transmittance_eval_pdf medium.h:72)."""
    st = _radio_rows(media, jnp.maximum(med_id, 0))["st"]
    inside = med_id >= 0
    T = jnp.exp(-st * dist[..., None])
    return jnp.where(inside[..., None], T, 1.0)


# ---------------------------------------------------------------------------
# heterogeneous media: delta tracking / ratio tracking
# ---------------------------------------------------------------------------

def eval_sigma(media: MediumTable, vols, med_id, p):
    """Extinction and scattering coefficients at world point ``p``
    (heterogeneous.cpp get_scattering_coefficients): sigma_t(x) =
    base_sigma_t * scale * density(x); albedo constant or gridded.
    Returns (sigma_t (N,3), sigma_s (N,3))."""
    rows = _radio_rows(media, jnp.maximum(med_id, 0))
    dvol = rows["density_vol"]
    dens = jnp.where((dvol >= 0)[..., None], vols.eval(dvol, p), 1.0)
    st = rows["st"] * dens
    avol = rows["albedo_vol"]
    alb = jnp.where((avol >= 0)[..., None], vols.eval(avol, p),
                    rows["albedo"])
    return st, st * alb


def _track_u(key, step, salt):
    """In-flight uniform draw: tea(flight_key, 2*step + salt)."""
    return bits_to_float01(
        sample_tea_32(key, jnp.uint32(2) * step.astype(jnp.uint32)
                      + jnp.uint32(salt), rounds=4)[0])


def sample_interaction_dt(media: MediumTable, vols, med_id, o, d, maxt,
                          key, u_channel):
    """Delta-tracking free-flight sampling against the scalar majorant
    (heterogeneous media; volpath.cpp:239-247 null-scattering scheme).

    A real collision at x is accepted with probability
    ``sigma_t_c(x)/majorant`` for one uniformly sampled channel c; the
    per-channel weights carry the spectral ratio-tracking factors
    ``sigma_s(x)/sigma_t_c(x)`` (real) and
    ``(majorant - sigma_t(x))/(majorant - sigma_t_c(x))`` (null).
    Unbiased for homogeneous lanes too (density == 1).

    Returns (t, is_medium_event (bool), weight (N,3), sigma_s (N,3)).
    """
    n = maxt.shape[0]
    mj = _radio_rows(media, jnp.maximum(med_id, 0))["majorant"]
    ch = jnp.clip((u_channel * 3).astype(jnp.int32), 0, 2)
    in_medium = (med_id >= 0) & (mj > 0.0)

    init = dict(
        t=jnp.zeros((n,)),
        w=jnp.ones((n, 3)),
        is_med=jnp.zeros((n,), bool),
        w_evt=jnp.zeros((n, 3)),
        active=in_medium,
        step=jnp.zeros((), jnp.int32),
    )

    def cond(c):
        return jnp.any(c["active"]) & (c["step"] < MAX_TRACK_STEPS)

    def body(c):
        u1 = _track_u(key, c["step"], 0)
        u2 = _track_u(key, c["step"], 1)
        t_new = c["t"] - jnp.log1p(-u1) / jnp.maximum(mj, 1e-20)
        reached = t_new >= maxt
        x = o + d * t_new[..., None]
        st, ss = eval_sigma(media, vols, med_id, x)
        st_c = _pick_channel(st, ch)
        prob = st_c / jnp.maximum(mj, 1e-20)
        real = (u2 < prob) & ~reached
        null = ~real & ~reached
        w_real = ss / jnp.maximum(st_c, 1e-20)[..., None]
        w_null = (mj[..., None] - st) \
            / jnp.maximum(mj - st_c, 1e-20)[..., None]
        act = c["active"]
        upd = lambda mask, new, old: jnp.where(  # noqa: E731
            (act & mask)[..., None] if new.ndim == 2 else (act & mask),
            new, old)
        return dict(
            t=upd(real, t_new, c["t"]),
            w=upd(null, c["w"] * w_null, c["w"]),
            is_med=c["is_med"] | (act & real),
            w_evt=upd(real, c["w"] * w_real, c["w_evt"]),
            active=act & null,
            step=c["step"] + 1,
        )

    out = jax.lax.while_loop(cond, body, init)
    is_med = out["is_med"]
    t = jnp.where(is_med, out["t"], maxt)
    # medium event: weight = (prod of null factors) * sigma_s/sigma_t_c;
    # surface event: product of null factors (transmittance estimator)
    weight = jnp.where(is_med[..., None], out["w_evt"], out["w"])
    weight = jnp.where(in_medium[..., None], weight, 1.0)
    return t, is_med, weight, jnp.where(is_med[..., None], out["w_evt"], 0.0)


def transmittance_rt(media: MediumTable, vols, med_id, o, d, dist, key):
    """Ratio-tracking transmittance estimate along a shadow segment
    (heterogeneous.cpp via Medium::transmittance_eval_pdf): unbiased
    product of ``1 - sigma_t(x)/majorant`` at majorant-sampled points."""
    n = dist.shape[0]
    mj = _radio_rows(media, jnp.maximum(med_id, 0))["majorant"]
    in_medium = (med_id >= 0) & (mj > 0.0)

    init = dict(
        t=jnp.zeros((n,)),
        w=jnp.ones((n, 3)),
        active=in_medium,
        step=jnp.zeros((), jnp.int32),
    )

    def cond(c):
        return jnp.any(c["active"]) & (c["step"] < MAX_TRACK_STEPS)

    def body(c):
        u1 = _track_u(key, c["step"], 0)
        t_new = c["t"] - jnp.log1p(-u1) / jnp.maximum(mj, 1e-20)
        reached = t_new >= dist
        x = o + d * t_new[..., None]
        st, _ = eval_sigma(media, vols, med_id, x)
        f = 1.0 - st / jnp.maximum(mj, 1e-20)[..., None]
        act = c["active"]
        keep = act & ~reached
        return dict(
            t=jnp.where(keep, t_new, c["t"]),
            w=jnp.where(keep[..., None], c["w"] * f, c["w"]),
            active=keep,
            step=c["step"] + 1,
        )

    out = jax.lax.while_loop(cond, body, init)
    return jnp.where(in_medium[..., None], out["w"], 1.0)


def medium_transmittance(media: MediumTable, vols, med_id, o, d, dist,
                         key, hetero: bool):
    """Per-segment transmittance: analytic for purely homogeneous scenes,
    ratio tracking when any heterogeneous medium is present (``hetero``
    is a static scene flag)."""
    if not hetero:
        return transmittance(media, med_id, dist)
    return transmittance_rt(media, vols, med_id, o, d, dist, key)


# ---------------------------------------------------------------------------
# Spectral-MIS (Miller et al. 2019) weight-matrix machinery for volpathmis
# ---------------------------------------------------------------------------
# The volpathmis estimator (reference src/integrators/volpathmis.cpp)
# carries two 3x3 "p over f" matrices per lane: entry [i, j] is the
# running product of (pdf evaluated as if channel j had driven the
# sampling) / (path contribution in channel i).  The balance heuristic
# over the 3 channel-sampling techniques is then
# w[i] = 3 / sum_j M[i, j] (volpathmis.cpp:623-655 mis_weight).


def wm_identity(n):
    """Fresh weight matrices (N, 3, 3) of ones (volpathmis.cpp:152)."""
    return jnp.ones((n, 3, 3))


def wm_update(M, p, f, active):
    """M[i, j] *= p[j] / f[i], non-finite ratios -> 0
    (volpathmis.cpp:599-620 update_weights, SpectralMis variant).
    p, f: (N, 3) spectra (scalars broadcast)."""
    n = M.shape[0]
    p = jnp.broadcast_to(jnp.asarray(p, M.dtype).reshape(n, -1), (n, 3))
    f = jnp.broadcast_to(jnp.asarray(f, M.dtype).reshape(n, -1), (n, 3))
    ratio = p[:, None, :] / f[:, :, None]
    ratio = jnp.where(jnp.isfinite(ratio), ratio, 0.0)
    out = M * ratio
    out = jnp.where(jnp.isnan(out), 0.0, out)
    return jnp.where(active[:, None, None], out, M)


def wm_mis(M):
    """Single-matrix MIS throughput: w[i] = 3 / sum_j M[i, j]
    (volpathmis.cpp:623-637)."""
    s = jnp.sum(M, axis=-1)
    return jnp.where(s == 0.0, 0.0, 3.0 / jnp.where(s == 0.0, 1.0, s))


def wm_mis2(M1, M2):
    """Two-technique MIS (NEE vs unidirectional): w[i] =
    3 / sum_j (M1 + M2)[i, j] (volpathmis.cpp:640-655)."""
    s = jnp.sum(M1 + M2, axis=-1)
    return jnp.where(s == 0.0, 0.0, 3.0 / jnp.where(s == 0.0, 1.0, s))


def _spectral_majorant(media: MediumTable, med_id):
    """Per-lane spectral majorant (N, 3): heterogeneous media use the
    scalar grid majorant in all channels; homogeneous media use sigma_t
    itself (homogeneous.cpp:161-165 get_majorant), which makes every
    homogeneous collision a real collision."""
    rows = _radio_rows(media, jnp.maximum(med_id, 0))
    is_het = rows["density_vol"] >= 0
    maj_hom = rows["st"]
    maj_het = jnp.broadcast_to(rows["majorant"][..., None], maj_hom.shape)
    return jnp.where(is_het[..., None], maj_het, maj_hom)


def ff_spectral_mis(media: MediumTable, vols, med_id, o, d, seg_len,
                    key, channel):
    """Free-flight sampling with spectral-MIS weight-matrix updates
    (volpathmis.cpp:253-312: transmittance_eval_pdf + null/real
    classification + per-event sigma ratio updates).

    Walks majorant-sampled collisions; null collisions update the
    matrices and continue, a real collision stops.  Returns
    (t, real_event (bool), Mu_mult (N,3,3), Mn_mult (N,3,3)) where the
    mults fold the whole flight: Mu_mult includes the real-scatter
    factor (sigma_t/maj)/sigma_s; the caller resets the NEE matrix at
    real events so Mn_mult carries only flight+null factors.
    """
    n = seg_len.shape[0]
    maj = _spectral_majorant(media, med_id)             # (N, 3)
    ch = jnp.clip(channel, 0, 2)
    maj_c = _pick_channel(maj, ch)
    in_medium = (med_id >= 0) & (maj_c > 0.0)

    init = dict(
        t=jnp.zeros((n,)),
        Mu=wm_identity(n), Mn=wm_identity(n),
        real=jnp.zeros((n,), bool),
        active=in_medium,
        step=jnp.zeros((), jnp.int32),
    )

    def cond(c):
        return jnp.any(c["active"]) & (c["step"] < MAX_TRACK_STEPS)

    def body(c):
        u1 = _track_u(key, c["step"], 0)
        u2 = _track_u(key, c["step"], 1)
        t_new = c["t"] - jnp.log1p(-u1) / jnp.maximum(maj_c, 1e-20)
        reached = t_new >= seg_len
        dt = jnp.minimum(t_new, seg_len) - c["t"]
        tr = jnp.exp(-dt[..., None] * maj)               # (N, 3)
        # flight step: pdf = tr * maj at a collision, tr on escape
        pdf_ff = jnp.where(reached[..., None], tr, tr * maj)
        act = c["active"]
        Mu = wm_update(c["Mu"], pdf_ff, tr, act)
        Mn = wm_update(c["Mn"], pdf_ff, tr, act)

        x = o + d * t_new[..., None]
        st, ss = eval_sigma(media, vols, med_id, x)
        st_c = _pick_channel(st, ch)
        real = (u2 < st_c / jnp.maximum(maj_c, 1e-20)) & ~reached
        null = ~real & ~reached
        sn = jnp.maximum(maj - st, 0.0)
        # null collision (volpathmis.cpp:296-303)
        Mu = wm_update(Mu, sn / maj, sn, act & null)
        Mn = wm_update(Mn, jnp.ones((n, 3)), sn, act & null)
        # real collision (volpathmis.cpp:306-311)
        Mu = wm_update(Mu, st / maj, ss, act & real)
        return dict(
            t=jnp.where(act & real, t_new, jnp.where(act & null, t_new,
                                                     c["t"])),
            Mu=Mu, Mn=Mn,
            real=c["real"] | (act & real),
            active=act & null,
            step=c["step"] + 1,
        )

    out = jax.lax.while_loop(cond, body, init)
    real = out["real"]
    t = jnp.where(real, out["t"], seg_len)
    ident = wm_identity(n)
    Mu = jnp.where(in_medium[:, None, None], out["Mu"], ident)
    Mn = jnp.where(in_medium[:, None, None], out["Mn"], ident)
    return t, real, Mu, Mn


def shadow_spectral_mis(media: MediumTable, vols, med_id, o, d, dist,
                        key, channel):
    """Shadow-segment transmittance walk for volpathmis NEE
    (volpathmis.cpp:437-556 sample_emitter loop, single medium
    segment): every collision is a forced null step.  Returns
    (Mn_mult, Mu_mult) multiplicative (N,3,3) updates."""
    n = dist.shape[0]
    maj = _spectral_majorant(media, med_id)
    ch = jnp.clip(channel, 0, 2)
    maj_c = _pick_channel(maj, ch)
    in_medium = (med_id >= 0) & (maj_c > 0.0)

    init = dict(
        t=jnp.zeros((n,)),
        Mn=wm_identity(n), Mu=wm_identity(n),
        active=in_medium,
        step=jnp.zeros((), jnp.int32),
    )

    def cond(c):
        return jnp.any(c["active"]) & (c["step"] < MAX_TRACK_STEPS)

    def body(c):
        u1 = _track_u(key, c["step"], 0)
        t_new = c["t"] - jnp.log1p(-u1) / jnp.maximum(maj_c, 1e-20)
        reached = t_new >= dist
        dt = jnp.minimum(t_new, dist) - c["t"]
        tr = jnp.exp(-dt[..., None] * maj)
        pdf_ff = jnp.where(reached[..., None], tr, tr * maj)
        act = c["active"]
        Mn = wm_update(c["Mn"], pdf_ff, tr, act)
        Mu = wm_update(c["Mu"], pdf_ff, tr, act)
        x = o + d * t_new[..., None]
        st, _ = eval_sigma(media, vols, med_id, x)
        sn = jnp.maximum(maj - st, 0.0)
        coll = act & ~reached
        # forced null step (volpathmis.cpp:540-548)
        Mn = wm_update(Mn, jnp.ones((n, 3)), sn, coll)
        Mu = wm_update(Mu, sn / maj, sn, coll)
        return dict(
            t=jnp.where(coll, t_new, c["t"]),
            Mn=Mn, Mu=Mu,
            active=coll,
            step=c["step"] + 1,
        )

    out = jax.lax.while_loop(cond, body, init)
    ident = wm_identity(n)
    Mn = jnp.where(in_medium[:, None, None], out["Mn"], ident)
    Mu = jnp.where(in_medium[:, None, None], out["Mu"], ident)
    return Mn, Mu
