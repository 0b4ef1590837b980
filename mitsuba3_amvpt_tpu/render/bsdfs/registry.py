"""BSDF material table + masked per-type wavefront dispatch.

Replaces the reference's BSDF plugin polymorphism (render/bsdf.h vcalls
via DRJIT_CALL_METHOD bsdf.h:663) with dense masked evaluation: the
dispatcher loops (statically, at trace time) over the BSDF types present
in the scene and blends per-lane results by type mask — the idiomatic
XLA analog of Dr.Jit's vectorized virtual calls (SURVEY.md §2.2).

Implemented lobes (reference plugin in src/bsdfs/):
  diffuse, (smooth) conductor, roughconductor (GGX + VNDF),
  (smooth) dielectric, roughdielectric, plastic, roughplastic,
  thindielectric, null.

Conventions (identical to Mitsuba):
  * directions live in the local shading frame, +Z = shading normal,
  * ``wi`` points toward the viewer, ``wo`` toward the next bounce,
  * ``eval`` returns f(wi, wo) * |cos_theta_o| (radiance convention),
  * delta lobes: eval/pdf = 0; ``sample`` returns the discrete lobe
    probability in ``pdf`` and full weight f*cos/pdf in ``weight``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ...core import fresnel as fr
from ...core import math as m
from ...core import microfacet as mf
from ...core import warp
from ..records import BSDFSample

D_DIFFUSE = 0
D_CONDUCTOR = 1
D_ROUGHCONDUCTOR = 2
D_DIELECTRIC = 3
D_ROUGHDIELECTRIC = 4
D_PLASTIC = 5
D_ROUGHPLASTIC = 6
D_THINDIELECTRIC = 7
D_NULL = 8
D_PRINCIPLED = 9
D_BLEND = 10      # blendbsdf.cpp: weight-mix of two children
D_MASK = 11       # mask.cpp: opacity-mix of child and null transmission
D_PRINCIPLEDTHIN = 12  # principledthin.cpp: thin-surface principled
D_PPLASTIC = 13   # pplastic.cpp: rough specular + diffuse, fixed lobe
#                   weights (unpolarized path; polarized eval lives in
#                   render/polarized.py)
# polarization optical elements (delta forward transmission; their
# Mueller action is applied by the polarized integrator
# render/integrators/stokes.py; the scalar path keeps the M00 energy):
D_POLARIZER = 14  # polarizer.cpp: linear polarizer, angle extra[0] deg
D_RETARDER = 15   # retarder.cpp: linear retarder, retardance extra[1] deg
D_CIRCULAR = 16   # circular.cpp: circular polarizer, extra[2] = left
D_MEASURED = 17   # measured.cpp: RGL data-driven BRDF; child_a indexes
#                   scene.measured (dispatched in bsdf_sample/eval_pdf
#                   because the tensor tables live on the Scene)
D_HAIR = 18       # hair.cpp: Chiang et al. 2016 fiber BCSDF; fiber
#                   tangent = sh_t of the interaction frame
D_MEASURED_POL = 19  # measured_polarized.cpp: RGL pBSDF Mueller tensor;
#                   child_a indexes scene.measured_pol (scalar path uses
#                   M00; full Mueller via stokes integrator)

_SMOOTH_TYPES = (D_DIFFUSE, D_ROUGHCONDUCTOR, D_ROUGHDIELECTRIC,
                 D_PLASTIC, D_ROUGHPLASTIC, D_PPLASTIC)


@struct.dataclass
class MaterialTable:
    """Flat per-material parameter rows (SoA)."""

    mtype: jnp.ndarray       # (M,) int32
    albedo: jnp.ndarray      # (M, 3) diffuse reflectance
    albedo_tex: jnp.ndarray  # (M,) int32 texture id or -1
    alpha: jnp.ndarray       # (M, 2) roughness (alpha_u, alpha_v)
    alpha_tex: jnp.ndarray   # (M,) int32 roughness texture or -1
    eta_c: jnp.ndarray       # (M, 3) conductor eta
    k_c: jnp.ndarray         # (M, 3) conductor k
    eta: jnp.ndarray         # (M,) dielectric relative IOR int/ext
    spec_refl: jnp.ndarray   # (M, 3) specular reflectance tint
    spec_trans: jnp.ndarray  # (M, 3) specular transmittance tint
    twosided: jnp.ndarray    # (M,) bool
    types_present: tuple = struct.field(pytree_node=False, default=())
    has_shading_maps: bool = struct.field(pytree_node=False, default=False)
    # plastic precomputations
    fdr_int: jnp.ndarray = None   # (M,) internal diffuse Fresnel reflectance
    spec_weight: jnp.ndarray = None  # (M,) specular sampling weight
    # principled extras: [metallic, spec_tint, sheen, sheen_tint,
    #   clearcoat, clearcoat_gloss, anisotropic, flatness, spec_trans, _]
    extra: jnp.ndarray = None     # (M, 10)
    normal_tex: jnp.ndarray = None  # (M,) int32 normal-map texture or -1
    bump_tex: jnp.ndarray = None    # (M,) int32 bump-map texture or -1
    # blend/mask children: material row indices (-1 = none)
    child_a: jnp.ndarray = None   # (M,) int32
    child_b: jnp.ndarray = None   # (M,) int32


def apply_shading_maps(scene, si):
    """Perturb the shading frame by normal/bump maps
    (src/bsdfs/normalmap.cpp, bumpmap.cpp).  Returns a new si with the
    frame rebuilt and wi re-expressed in it."""
    mt = scene.materials
    if not mt.has_shading_maps:
        return si
    i = jnp.maximum(si.material_index, 0)
    ntex = mt.normal_tex[i]
    btex = mt.bump_tex[i]
    wi_world = si.to_world(si.wi)

    n_world = si.sh_n
    # normal map: tangent-space normal from RGB
    nm = scene.textures.eval_bilinear(jnp.maximum(ntex, 0), si.uv) * 2.0 - 1.0
    n_nm = si.to_world(m.normalize(nm))
    n_world = jnp.where((ntex >= 0)[..., None], n_nm, n_world)
    # bump map: central-difference height gradient
    eps = 1e-3
    du = jnp.array([eps, 0.0])
    dv = jnp.array([0.0, eps])
    h0 = scene.textures.eval_bilinear(jnp.maximum(btex, 0), si.uv)[..., 0]
    hu = scene.textures.eval_bilinear(jnp.maximum(btex, 0), si.uv + du)[..., 0]
    hv = scene.textures.eval_bilinear(jnp.maximum(btex, 0), si.uv + dv)[..., 0]
    dhdu = (hu - h0) / eps
    dhdv = (hv - h0) / eps
    n_bm = m.normalize(si.sh_n - dhdu[..., None] * si.sh_s
                       - dhdv[..., None] * si.sh_t)
    n_world = jnp.where((btex >= 0)[..., None], n_bm, n_world)

    s, t = m.coordinate_system(n_world)
    return si.replace(sh_n=n_world, sh_s=s, sh_t=t,
                      wi=m.frame_to_local(n_world, s, t, wi_world))


# column-group users for the packed-gather pruning in _gather_params:
# a group is gathered only when a type that reads it is present
_SPEC_USERS = frozenset((D_CONDUCTOR, D_ROUGHCONDUCTOR, D_DIELECTRIC,
                         D_ROUGHDIELECTRIC, D_THINDIELECTRIC, D_PLASTIC,
                         D_ROUGHPLASTIC, D_PPLASTIC, D_PRINCIPLED,
                         D_PRINCIPLEDTHIN, D_HAIR, D_MEASURED_POL))
_PLASTIC_USERS = frozenset((D_PLASTIC, D_ROUGHPLASTIC, D_PPLASTIC))
_EXTRA_USERS = frozenset((D_PRINCIPLED, D_PRINCIPLEDTHIN, D_HAIR,
                          D_POLARIZER, D_RETARDER, D_CIRCULAR))


def _gather_params(scene, si):
    """Resolve per-lane material parameters (textures applied).

    The needed float columns of the MaterialTable are packed into ONE
    (M, C) matrix so the per-lane lookup is a single gather — TPU
    gather cost is per row, so one wide gather beats ~14 narrow ones.
    Column groups a scene's material types never read are excluded
    STATICALLY (types_present is a static pytree field) and surface as
    broadcast zeros: a diffuse-only scene gathers 9 columns, not 34 —
    the gather row width is the hot-loop's main HBM term."""
    mt = scene.materials
    tp = set(mt.types_present)
    i = jnp.maximum(si.material_index, 0)
    f32 = jnp.float32
    parts = [mt.albedo, mt.alpha,
             mt.mtype[:, None].astype(f32),
             mt.albedo_tex[:, None].astype(f32),
             mt.alpha_tex[:, None].astype(f32),
             mt.twosided[:, None].astype(f32)]     # 9 base cols
    has_spec = bool(tp & _SPEC_USERS)
    has_plastic = bool(tp & _PLASTIC_USERS)
    has_extra = bool(tp & _EXTRA_USERS)
    if has_spec:
        parts += [mt.eta_c, mt.k_c, mt.eta[:, None], mt.spec_refl,
                  mt.spec_trans]                   # 13 cols
    if has_plastic:
        parts += [mt.fdr_int[:, None], mt.spec_weight[:, None]]  # 2
    if has_extra:
        parts += [mt.extra]                        # 10
    A = jnp.concatenate(parts, axis=1)
    a = m.take_rows(A, i)
    n = a.shape[0]

    albedo = a[:, 0:3]
    alpha = a[:, 3:5]
    if si.vattr is not None:
        # mesh_attribute texture (tex id sentinel -2): the interpolated
        # per-vertex color, scaled by the constant albedo column
        atex0 = a[:, 6].astype(jnp.int32)
        albedo = jnp.where((atex0 == -2)[..., None], albedo * si.vattr,
                           albedo)
    if not scene.textures.empty:
        atex = a[:, 6].astype(jnp.int32)
        albedo = jnp.where(
            (atex >= 0)[..., None],
            scene.textures.eval_bilinear(jnp.maximum(atex, 0), si.uv),
            albedo)
        rtex = a[:, 7].astype(jnp.int32)
        rough = scene.textures.eval_bilinear(jnp.maximum(rtex, 0),
                                             si.uv)[..., 0]
        alpha = jnp.where((rtex >= 0)[..., None],
                          jnp.stack([rough, rough], -1), alpha)
    alpha = jnp.maximum(alpha, 1e-4)

    off = 9
    if has_spec:
        eta_c, k_c = a[:, off:off + 3], a[:, off + 3:off + 6]
        eta = a[:, off + 6]
        spec_refl = a[:, off + 7:off + 10]
        spec_trans = a[:, off + 10:off + 13]
        off += 13
    else:
        eta_c = jnp.zeros((n, 3))
        k_c = jnp.ones((n, 3))
        eta = jnp.ones((n,))
        spec_refl = jnp.ones((n, 3))
        spec_trans = jnp.ones((n, 3))
    if has_plastic:
        fdr_int, spec_weight = a[:, off], a[:, off + 1]
        off += 2
    else:
        fdr_int = jnp.zeros((n,))
        spec_weight = jnp.full((n,), 0.5)
    extra = a[:, off:off + 10] if has_extra else jnp.zeros((n, 10))

    return dict(
        mtype=a[:, 5].astype(jnp.int32), albedo=albedo, alpha=alpha,
        eta_c=eta_c, k_c=k_c, eta=eta,
        spec_refl=spec_refl, spec_trans=spec_trans,
        twosided=a[:, 8] > 0.5,
        fdr_int=fdr_int, spec_weight=spec_weight,
        extra=extra)


def _flip(p, wi, wo=None):
    """Two-sided adapter (src/bsdfs/twosided.cpp): mirror the frame when
    arriving from below for materials flagged twosided."""
    flip = p["twosided"] & (m.cos_theta(wi) < 0.0)
    fz = jnp.where(flip, -1.0, 1.0)
    wi_f = wi * jnp.stack([jnp.ones_like(fz), jnp.ones_like(fz), fz], -1)
    if wo is None:
        return wi_f, fz
    wo_f = wo * jnp.stack([jnp.ones_like(fz), jnp.ones_like(fz), fz], -1)
    return wi_f, wo_f, fz


# ===========================================================================
# per-type implementations: each returns
#   sample: (wo, pdf, weight(N,3), eta, is_delta, is_trans)
#   eval_pdf: (f_cos(N,3), pdf(N,))
# ===========================================================================

# -- diffuse (src/bsdfs/diffuse.cpp) ---------------------------------------

def _diffuse_sample(p, wi, u1, u2):
    wo = warp.square_to_cosine_hemisphere(u2)
    pdf = warp.square_to_cosine_hemisphere_pdf(wo)
    active = m.cos_theta(wi) > 0.0
    weight = jnp.where(active[..., None], p["albedo"], 0.0)
    return wo, jnp.where(active, pdf, 0.0), weight, jnp.ones_like(pdf), \
        jnp.zeros_like(active), jnp.zeros_like(active)


def _diffuse_eval_pdf(p, wi, wo):
    active = (m.cos_theta(wi) > 0.0) & (m.cos_theta(wo) > 0.0)
    f = p["albedo"] * (warp.INV_PI * jnp.maximum(m.cos_theta(wo), 0.0))[..., None]
    pdf = warp.square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(active[..., None], f, 0.0), jnp.where(active, pdf, 0.0)


# -- smooth conductor (src/bsdfs/conductor.cpp) ----------------------------

def _conductor_sample(p, wi, u1, u2):
    ci = m.cos_theta(wi)
    active = ci > 0.0
    wo = m.reflect(wi)
    F = fr.fresnel_conductor(ci[..., None], p["eta_c"], p["k_c"])
    weight = jnp.where(active[..., None], p["spec_refl"] * F, 0.0)
    one = jnp.ones_like(ci)
    return wo, jnp.where(active, one, 0.0), weight, one, \
        jnp.ones_like(active), jnp.zeros_like(active)


def _conductor_eval_pdf(p, wi, wo):
    z = jnp.zeros(wi.shape[:-1] + (3,))
    return z, jnp.zeros(wi.shape[:-1])


# -- rough conductor (src/bsdfs/roughconductor.cpp, GGX + VNDF) ------------

def _rough_conductor_sample(p, wi, u1, u2):
    ax, ay = p["alpha"][..., 0], p["alpha"][..., 1]
    ci = m.cos_theta(wi)
    active = ci > 0.0
    h, pdf_h = mf.sample_vndf(wi, u2, ax, ay)
    wo = m.reflect_h(wi, h)
    pdf = m.safe_div(pdf_h, 4.0 * jnp.abs(m.dot(wo, h)))
    F = fr.fresnel_conductor(m.dot(wi, h)[..., None], p["eta_c"], p["k_c"])
    # weight = f*cos/pdf = F * G2/G1 with VNDF sampling
    g2 = mf.G(wi, wo, h, ax, ay)
    g1 = mf.smith_g1(wi, h, ax, ay)
    ok = active & (m.cos_theta(wo) > 0.0) & (pdf > 0.0)
    weight = jnp.where(ok[..., None],
                       p["spec_refl"] * F * m.safe_div(g2, g1)[..., None], 0.0)
    return wo, jnp.where(ok, pdf, 0.0), weight, jnp.ones_like(ci), \
        jnp.zeros_like(active), jnp.zeros_like(active)


def _rough_conductor_eval_pdf(p, wi, wo):
    ax, ay = p["alpha"][..., 0], p["alpha"][..., 1]
    ci, co = m.cos_theta(wi), m.cos_theta(wo)
    active = (ci > 0.0) & (co > 0.0)
    h = m.normalize(wi + wo)
    D = mf.ndf(h, ax, ay)
    G = mf.G(wi, wo, h, ax, ay)
    F = fr.fresnel_conductor(m.dot(wi, h)[..., None], p["eta_c"], p["k_c"])
    f = p["spec_refl"] * F * m.safe_div(D * G, 4.0 * ci)[..., None]
    pdf = m.safe_div(mf.pdf_vndf(wi, h, ax, ay), 4.0 * jnp.abs(m.dot(wo, h)))
    return jnp.where(active[..., None], f, 0.0), jnp.where(active, pdf, 0.0)


# -- smooth dielectric (src/bsdfs/dielectric.cpp) --------------------------

def _dielectric_sample(p, wi, u1, u2):
    ci = m.cos_theta(wi)
    F, cos_t, eta_it, eta_ti = fr.fresnel_dielectric(ci, p["eta"])
    refl = u1 < F
    wo = jnp.where(refl[..., None], m.reflect(wi), m.refract(wi, cos_t, eta_ti))
    pdf = jnp.where(refl, F, 1.0 - F)
    # radiance transport: transmitted throughput scales by 1/eta_it^2
    w_refl = p["spec_refl"]
    w_trans = p["spec_trans"] * (eta_ti * eta_ti)[..., None]
    weight = jnp.where(refl[..., None], w_refl, w_trans)
    eta = jnp.where(refl, 1.0, eta_it)
    one = jnp.ones_like(ci, dtype=bool)
    return wo, pdf, weight, eta, one, ~refl


def _dielectric_eval_pdf(p, wi, wo):
    return jnp.zeros(wi.shape[:-1] + (3,)), jnp.zeros(wi.shape[:-1])


# -- thin dielectric (src/bsdfs/thindielectric.cpp) ------------------------

def _thindielectric_sample(p, wi, u1, u2):
    ci = m.cos_theta(wi)
    F, _, _, _ = fr.fresnel_dielectric(jnp.abs(ci), p["eta"])
    # double-interface: R' = R + TRT + ... = 2R/(1+R)
    R = jnp.where(F < 1.0, F * 2.0 / (1.0 + F), 1.0)
    refl = u1 < R
    wo = jnp.where(refl[..., None], m.reflect(wi), -wi)
    pdf = jnp.where(refl, R, 1.0 - R)
    weight = jnp.where(refl[..., None], p["spec_refl"], p["spec_trans"])
    one = jnp.ones_like(ci, dtype=bool)
    return wo, pdf, weight, jnp.ones_like(ci), one, ~refl


def _thindielectric_eval_pdf(p, wi, wo):
    return jnp.zeros(wi.shape[:-1] + (3,)), jnp.zeros(wi.shape[:-1])


# -- rough dielectric (src/bsdfs/roughdielectric.cpp, Walter 2007) ---------

def _rough_dielectric_sample(p, wi, u1, u2):
    ax, ay = p["alpha"][..., 0], p["alpha"][..., 1]
    ci = m.cos_theta(wi)
    # sample microfacet normal (h in upper hemisphere, both-side wi ok)
    h, pdf_h = mf.sample_vndf(wi, u2, ax, ay)
    cos_ih = m.dot(wi, h)
    F, cos_t, eta_it, eta_ti = fr.fresnel_dielectric(cos_ih, p["eta"])
    refl = u1 < F
    wo_r = m.reflect_h(wi, h)
    # refraction about h
    wo_t = (-eta_ti[..., None] * wi
            + (eta_ti * cos_ih - m.mulsign(jnp.abs(cos_t), cos_ih))[..., None] * h)
    wo = jnp.where(refl[..., None], wo_r, wo_t)
    # jacobians dwh/dwo
    cos_oh = m.dot(wo, h)
    dwh_dwo_r = m.safe_div(1.0, 4.0 * jnp.abs(cos_oh))
    denom_t = cos_ih + cos_oh / jnp.maximum(eta_ti, 1e-20)
    dwh_dwo_t = m.safe_div(jnp.abs(cos_oh),
                           jnp.maximum(denom_t * denom_t, 1e-20) * eta_ti * eta_ti)
    pdf = pdf_h * jnp.where(refl, F * dwh_dwo_r, (1.0 - F) * dwh_dwo_t)
    g2 = mf.G(wi, wo, h, ax, ay)
    g1 = mf.smith_g1(wi, h, ax, ay)
    gw = m.safe_div(g2, g1)
    w_refl = p["spec_refl"] * gw[..., None]
    w_trans = p["spec_trans"] * (gw * eta_ti * eta_ti)[..., None]
    weight = jnp.where(refl[..., None], w_refl, w_trans)
    same_side = m.cos_theta(wi) * m.cos_theta(wo) > 0.0
    ok = jnp.where(refl, same_side, ~same_side) & (pdf > 0.0)
    weight = jnp.where(ok[..., None], weight, 0.0)
    eta = jnp.where(refl, 1.0, eta_it)
    return wo, jnp.where(ok, pdf, 0.0), weight, eta, \
        jnp.zeros_like(refl), ~refl


def _rough_dielectric_eval_pdf(p, wi, wo):
    ax, ay = p["alpha"][..., 0], p["alpha"][..., 1]
    ci, co = m.cos_theta(wi), m.cos_theta(wo)
    reflect = ci * co > 0.0
    eta = p["eta"]
    eta_signed = jnp.where(ci > 0.0, eta, 1.0 / eta)
    # half vector (generalized): reflection h ~ wi+wo; refraction h ~ wi+eta*wo
    h_r = wi + wo
    h_t = wi + wo * eta_signed[..., None]
    h = jnp.where(reflect[..., None], h_r, h_t)
    h = m.normalize(h)
    h = m.mulsign(h, h[..., 2:3])  # upper hemisphere
    cos_ih = m.dot(wi, h)
    cos_oh = m.dot(wo, h)
    F, _, _, eta_ti_i = fr.fresnel_dielectric(cos_ih, eta)
    D = mf.ndf(h, ax, ay)
    G = mf.G(wi, wo, h, ax, ay)
    # reflection: f*|cos_o| = D G F / (4 |cos_i|)
    f_r = m.safe_div(D * G * F, 4.0 * jnp.abs(ci))
    # transmission: Walter eq. 21 (x eta_it^2) times the radiance-transport
    # scale 1/eta_it^2 — the two factors cancel (roughdielectric.cpp eval)
    denom = cos_ih + cos_oh / jnp.maximum(eta_ti_i, 1e-20)
    f_t_scalar = m.safe_div(
        jnp.abs(cos_ih * cos_oh) * (1.0 - F) * D * G,
        jnp.abs(ci) * jnp.maximum(denom * denom, 1e-20))
    f = jnp.where(reflect[..., None],
                  p["spec_refl"] * f_r[..., None],
                  p["spec_trans"] * f_t_scalar[..., None])
    pdf_h = mf.pdf_vndf(m.mulsign(wi, ci[..., None]), h, ax, ay)
    dwh_dwo = jnp.where(reflect,
                        m.safe_div(1.0, 4.0 * jnp.abs(cos_oh)),
                        m.safe_div(jnp.abs(cos_oh),
                                   jnp.maximum(denom * denom, 1e-20)
                                   * eta_ti_i * eta_ti_i))
    pdf = pdf_h * jnp.where(reflect, F, 1.0 - F) * dwh_dwo
    # Walter 2007 sidedness: the reconstructed half vector must face the
    # same side as each direction (roughdielectric.cpp eval masks) —
    # without this the pdf claims mass in unreachable regions
    valid = ((jnp.abs(cos_ih) > 1e-6)
             & (cos_ih * ci > 0.0) & (cos_oh * co > 0.0))
    return jnp.where(valid[..., None], f, 0.0), jnp.where(valid, pdf, 0.0)


# -- plastic (src/bsdfs/plastic.cpp: smooth coat over diffuse) -------------

def _plastic_probs(p, wi):
    F_i, _, _, _ = fr.fresnel_dielectric(m.cos_theta(wi), p["eta"])
    sw = p["spec_weight"]
    prob_spec = m.safe_div(F_i * sw, F_i * sw + (1.0 - F_i) * (1.0 - sw))
    return F_i, prob_spec


def _plastic_diffuse_factor(p, F_i, F_o):
    """Nonlinear internal-scattering compensation (plastic.cpp eval)."""
    inv_eta2 = 1.0 / (p["eta"] * p["eta"])
    denom = 1.0 - p["fdr_int"][..., None] * p["albedo"]
    return (p["albedo"] * ((1.0 - F_i) * (1.0 - F_o) * inv_eta2)[..., None]
            / jnp.maximum(denom, 1e-4))


def _plastic_sample(p, wi, u1, u2):
    ci = m.cos_theta(wi)
    active = ci > 0.0
    F_i, prob_spec = _plastic_probs(p, wi)
    spec = u1 < prob_spec
    wo = jnp.where(spec[..., None], m.reflect(wi),
                   warp.square_to_cosine_hemisphere(u2))
    F_o, _, _, _ = fr.fresnel_dielectric(m.cos_theta(wo), p["eta"])
    pdf_diff = warp.square_to_cosine_hemisphere_pdf(wo) * (1.0 - prob_spec)
    # specular branch weight: F / prob_spec
    w_spec = p["spec_refl"] * m.safe_div(F_i, prob_spec)[..., None]
    w_diff = m.safe_div(
        _plastic_diffuse_factor(p, F_i, F_o),
        (1.0 - prob_spec)[..., None]) * 1.0
    weight = jnp.where(spec[..., None], w_spec, w_diff)
    pdf = jnp.where(spec, prob_spec, pdf_diff)
    ok = active & (pdf > 0.0)
    return wo, jnp.where(ok, pdf, 0.0), jnp.where(ok[..., None], weight, 0.0), \
        jnp.ones_like(ci), spec, jnp.zeros_like(active)


def _plastic_eval_pdf(p, wi, wo):
    ci, co = m.cos_theta(wi), m.cos_theta(wo)
    active = (ci > 0.0) & (co > 0.0)
    F_i, prob_spec = _plastic_probs(p, wi)
    F_o, _, _, _ = fr.fresnel_dielectric(co, p["eta"])
    f = _plastic_diffuse_factor(p, F_i, F_o) * (warp.INV_PI * co)[..., None]
    pdf = warp.square_to_cosine_hemisphere_pdf(wo) * (1.0 - prob_spec)
    return jnp.where(active[..., None], f, 0.0), jnp.where(active, pdf, 0.0)


# -- rough plastic (src/bsdfs/roughplastic.cpp) ----------------------------

def _rough_plastic_sample(p, wi, u1, u2):
    ci = m.cos_theta(wi)
    active = ci > 0.0
    F_i, prob_spec = _plastic_probs(p, wi)
    spec = u1 < prob_spec
    ax, ay = p["alpha"][..., 0], p["alpha"][..., 1]
    h, _ = mf.sample_vndf(wi, u2, ax, ay)
    wo_spec = m.reflect_h(wi, h)
    wo_diff = warp.square_to_cosine_hemisphere(u2)
    wo = jnp.where(spec[..., None], wo_spec, wo_diff)
    f, pdf = _rough_plastic_eval_pdf(p, wi, wo)
    ok = active & (pdf > 0.0) & (m.cos_theta(wo) > 0.0)
    weight = jnp.where(ok[..., None],
                       m.safe_div(f, pdf[..., None]), 0.0)
    return wo, jnp.where(ok, pdf, 0.0), weight, jnp.ones_like(ci), \
        jnp.zeros_like(active), jnp.zeros_like(active)


def _rough_plastic_eval_pdf(p, wi, wo):
    ci, co = m.cos_theta(wi), m.cos_theta(wo)
    active = (ci > 0.0) & (co > 0.0)
    ax, ay = p["alpha"][..., 0], p["alpha"][..., 1]
    h = m.normalize(wi + wo)
    D = mf.ndf(h, ax, ay)
    G = mf.G(wi, wo, h, ax, ay)
    F_h, _, _, _ = fr.fresnel_dielectric(m.dot(wi, h), p["eta"])
    f_spec = p["spec_refl"] * m.safe_div(D * G * F_h, 4.0 * ci)[..., None]
    F_i, prob_spec = _plastic_probs(p, wi)
    F_o, _, _, _ = fr.fresnel_dielectric(co, p["eta"])
    f_diff = _plastic_diffuse_factor(p, F_i, F_o) * (warp.INV_PI * co)[..., None]
    f = f_spec + f_diff
    pdf_spec = m.safe_div(mf.pdf_vndf(wi, h, ax, ay), 4.0 * jnp.abs(m.dot(wo, h)))
    pdf = prob_spec * pdf_spec + (1.0 - prob_spec) * warp.square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(active[..., None], f, 0.0), jnp.where(active, pdf, 0.0)


# -- pplastic (src/bsdfs/pplastic.cpp, unpolarized branch :371-397) --------
#
# Rough GGX specular + diffuse where both lobes are weighted by smooth
# Fresnel terms; unlike roughplastic there is NO internal-scattering
# compensation and the lobe-selection probability is the FIXED mean-
# reflectance weight m_specular_sampling_weight (pplastic.cpp:211,233).

def _pplastic_eval_pdf(p, wi, wo):
    ci, co = m.cos_theta(wi), m.cos_theta(wo)
    active = (ci > 0.0) & (co > 0.0)
    ax, ay = p["alpha"][..., 0], p["alpha"][..., 1]
    h = m.normalize(wi + wo)
    D = mf.ndf(h, ax, ay)
    G = mf.G(wi, wo, h, ax, ay)
    F_h, _, _, _ = fr.fresnel_dielectric(m.dot(wi, h), p["eta"])
    f_spec = p["spec_refl"] * m.safe_div(D * G * F_h, 4.0 * ci)[..., None]
    F_i, _, _, _ = fr.fresnel_dielectric(ci, p["eta"])
    F_o, _, _, _ = fr.fresnel_dielectric(co, p["eta"])
    f_diff = ((1.0 - F_o) * (1.0 - F_i))[..., None] * p["albedo"] \
        * (warp.INV_PI * co)[..., None]
    f = f_spec + f_diff
    prob_spec = p["spec_weight"]
    pdf_spec = m.safe_div(mf.pdf_vndf(wi, h, ax, ay),
                          4.0 * jnp.abs(m.dot(wo, h)))
    pdf_spec = jnp.where((m.dot(wi, h) > 0.0) & (m.dot(wo, h) > 0.0),
                         pdf_spec, 0.0)
    pdf = prob_spec * pdf_spec \
        + (1.0 - prob_spec) * warp.square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(active[..., None], f, 0.0), jnp.where(active, pdf, 0.0)


def _pplastic_sample(p, wi, u1, u2):
    ci = m.cos_theta(wi)
    active = ci > 0.0
    spec = u1 < p["spec_weight"]
    ax, ay = p["alpha"][..., 0], p["alpha"][..., 1]
    h, _ = mf.sample_vndf(wi, u2, ax, ay)
    wo_spec = m.reflect_h(wi, h)
    wo_diff = warp.square_to_cosine_hemisphere(u2)
    wo = jnp.where(spec[..., None], wo_spec, wo_diff)
    f, pdf = _pplastic_eval_pdf(p, wi, wo)
    ok = active & (pdf > 0.0) & (m.cos_theta(wo) > 0.0)
    weight = jnp.where(ok[..., None], m.safe_div(f, pdf[..., None]), 0.0)
    return wo, jnp.where(ok, pdf, 0.0), weight, jnp.ones_like(ci), \
        jnp.zeros_like(active), jnp.zeros_like(active)


# -- principled (src/bsdfs/principled.cpp, 905 LoC; Burley 2012/2015) ------
#
# Reflection-only v1: diffuse + retro/fake-subsurface + sheen + anisotropic
# GGX specular with metallic/spec_tint Schlick Fresnel + GTR1 clearcoat.
# spec_trans (the refractive lobe) is a later-round item.

def _schlick(F0, cos_t):
    m5 = jnp.clip(1.0 - cos_t, 0.0, 1.0) ** 5
    # discriminate RGB-valued F0 by its trailing color axis (an ndim
    # comparison breaks when cos_t carries extra leading batch axes,
    # e.g. the (J, N) direction batch of bsdf_pdf_matrix)
    if jnp.ndim(F0) and F0.shape[-1] == 3:
        return F0 + (1.0 - F0) * m5[..., None]
    return F0 + (1.0 - F0) * m5


def _principled_alphas(p):
    rough = jnp.clip(p["alpha"][..., 0], 1e-3, 1.0)
    aniso = p["extra"][..., 6]
    aspect = jnp.sqrt(1.0 - 0.9 * aniso)
    a2 = rough * rough
    ax = jnp.maximum(a2 / aspect, 1e-4)
    ay = jnp.maximum(a2 * aspect, 1e-4)
    return ax, ay, rough


def _gtr1_d(ct, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * ct * ct
    return m.safe_div(a2 - 1.0, jnp.pi * jnp.log(jnp.maximum(a2, 1e-8)) * t)


def _principled_lobe_weights(p, wi):
    metallic = p["extra"][..., 0]
    cc = p["extra"][..., 4]
    w_spec = jnp.ones_like(metallic)
    w_diff = jnp.clip(1.0 - metallic, 0.0, 1.0)
    w_cc = 0.25 * cc
    total = w_spec + w_diff + w_cc
    return w_diff / total, w_spec / total, w_cc / total


def _principled_eval_pdf(p, wi, wo):
    """principled.cpp eval + pdf (Burley 2012/2015, Mitsuba port):
    diffuse+retro+fake-subsurface, sheen, anisotropic GGX specular with
    the principled Fresnel mix (principledhelpers.h:239), GTR1 clearcoat,
    and the spec_trans refractive lobe (principled.cpp:604-620)."""
    ci, co = m.cos_theta(wi), m.cos_theta(wo)
    active = jnp.abs(ci) > 1e-6
    base = p["albedo"]
    ex = p["extra"]
    metallic, spec_tint = ex[..., 0], ex[..., 1]
    sheen, sheen_tint = ex[..., 2], ex[..., 3]
    cc, cc_gloss = ex[..., 4], ex[..., 5]
    flat, st = ex[..., 7], ex[..., 8]
    brdf_w = (1.0 - metallic) * (1.0 - st)
    bsdf_w = (1.0 - metallic) * st
    ax, ay, rough = _principled_alphas(p)

    front = ci > 0.0
    eta = jnp.where((st > 0.0) & (jnp.abs(p["eta"] - 1.0) < 1e-3),
                    1.001, p["eta"])
    eta_path = jnp.where(front, eta, 1.0 / eta)
    inv_eta_path = 1.0 / eta_path
    reflect = ci * co > 0.0
    refract = ci * co < 0.0

    # generalized half vector, flipped to the upper hemisphere
    wh = m.normalize(wi + wo * jnp.where(reflect, 1.0, eta_path)[..., None])
    wh = m.mulsign(wh, wh[..., 2:3])
    cos_ih = m.dot(wi, wh)
    cos_oh = m.dot(wo, wh)
    F_d, _, eta_it, _ = fr.fresnel_dielectric(cos_ih, eta)

    # macro/micro compatibility (principledhelpers.h mac_mic_compatibility)
    wh_s_i = m.mulsign(cos_ih, ci)     # dot(wi, mulsign(wh, ci))
    wh_s_o = m.mulsign(cos_oh, ci)
    mm_r = (wh_s_i > 0.0) & (wh_s_o > 0.0)
    mm_t = (wh_s_i > 0.0) & (wh_s_o < 0.0)

    D = mf.ndf(wh, ax, ay)
    G = mf.G(wi, wo, wh, ax, ay)

    # --- principled Fresnel for the main reflection lobe
    lum = (0.2126 * base[..., 0] + 0.7152 * base[..., 1]
           + 0.0722 * base[..., 2])
    tint = jnp.where((lum > 0)[..., None],
                     base / jnp.maximum(lum, 1e-6)[..., None],
                     jnp.ones_like(base))
    acd = jnp.abs(cos_ih)
    F_schlick = metallic[..., None] * _schlick(base, acd)
    R0_tint = tint * (((eta_it - 1.0) / (eta_it + 1.0)) ** 2)[..., None]
    F_schlick = F_schlick + ((1.0 - metallic) * spec_tint)[..., None] \
        * _schlick(R0_tint, acd)
    F_front = ((1.0 - metallic) * (1.0 - spec_tint) * F_d)[..., None] \
        + F_schlick
    F_pr = jnp.where(front[..., None], F_front,
                     (bsdf_w * F_d)[..., None])

    # --- main specular reflection
    sr_ok = active & reflect & mm_r & (F_d > 0.0)
    f_sr = F_pr * m.safe_div(D * G, 4.0 * jnp.abs(ci))[..., None]
    f = jnp.where(sr_ok[..., None], f_sr, 0.0)

    # --- specular transmission (radiance-transport scale inv_eta_path^2)
    st_ok = active & refract & mm_t & (bsdf_w > 0.0) & (F_d < 1.0)
    denom_t = cos_ih + eta_path * cos_oh
    f_st_scalar = jnp.abs(m.safe_div(
        inv_eta_path * inv_eta_path * (1.0 - F_d) * D * G * eta_path
        * eta_path * cos_ih * cos_oh,
        ci * jnp.maximum(denom_t * denom_t, 1e-20)))
    f = f + jnp.where(st_ok[..., None],
                      (bsdf_w * f_st_scalar)[..., None]
                      * m.safe_sqrt(base), 0.0)

    # --- clearcoat (front side only)
    a_cc = m.lerp(0.1, 0.001, cc_gloss)
    Dc = _gtr1_d(m.cos_theta(wh), a_cc)
    Fc = _schlick(jnp.full_like(cos_ih, 0.04), acd)
    Gc = mf.G(wi, wo, wh, 0.25, 0.25)
    cc_ok = active & reflect & mm_r & front & (cc > 0.0)
    f = f + jnp.where(cc_ok, 0.25 * cc * Dc * Fc * Gc * jnp.abs(co),
                      0.0)[..., None]

    # --- diffuse + retro + fake subsurface + sheen (front, reflection)
    di_ok = active & reflect & front & (brdf_w > 0.0)
    aci, aco = jnp.abs(ci), jnp.abs(co)
    Fo = (1.0 - aco) ** 5
    Fi = (1.0 - aci) ** 5
    f_diff = (1.0 - 0.5 * Fi) * (1.0 - 0.5 * Fo)
    cos_d = cos_oh
    Rr = 2.0 * rough * cos_d * cos_d
    f_retro = Rr * (Fo + Fi + Fo * Fi * (Rr - 1.0))
    fss90 = 0.5 * Rr
    fss = m.lerp(1.0, fss90, Fo) * m.lerp(1.0, fss90, Fi)
    f_ss = 1.25 * (fss * (m.safe_div(1.0, aco + aci) - 0.5) + 0.5)
    f_d_scalar = m.lerp(f_diff + f_retro, f_ss, flat) * warp.INV_PI * aco
    f = f + jnp.where(di_ok[..., None],
                      (brdf_w * f_d_scalar)[..., None] * base, 0.0)
    sh_ok = active & reflect & front & (sheen > 0.0) & (metallic < 1.0)
    Fd_sheen = (1.0 - jnp.abs(cos_d)) ** 5
    c_sheen = m.lerp(jnp.ones_like(base), tint, sheen_tint[..., None])
    f = f + jnp.where(sh_ok[..., None],
                      (sheen * (1.0 - metallic) * Fd_sheen * aco)[..., None]
                      * c_sheen, 0.0)

    # --- pdf: reference lobe mixture (principled.cpp:760-840, srates = 1)
    prob_sr = jnp.where(front, 1.0 - bsdf_w * (1.0 - F_d), F_d)
    prob_st = jnp.where(front, bsdf_w * (1.0 - F_d), 1.0 - F_d)
    prob_cc = jnp.where(front, 0.25 * cc, 0.0)
    prob_di = jnp.where(front, brdf_w, 0.0)
    tot = jnp.maximum(prob_sr + prob_st + prob_cc + prob_di, 1e-20)
    dwh_dwo = jnp.abs(jnp.where(
        reflect, m.safe_div(1.0, 4.0 * cos_oh),
        m.safe_div(eta_path * eta_path * cos_oh,
                   jnp.maximum(denom_t * denom_t, 1e-20))))
    pdf_h = mf.pdf_vndf(m.mulsign(wi, ci[..., None]), wh, ax, ay)
    pdf = jnp.where(reflect & mm_r, prob_sr * pdf_h * dwh_dwo, 0.0)
    pdf = pdf + jnp.where(reflect & front,
                          prob_di
                          * warp.square_to_cosine_hemisphere_pdf(wo), 0.0)
    pdf = pdf + jnp.where(refract & mm_t, prob_st * pdf_h * dwh_dwo, 0.0)
    pdf = pdf + jnp.where(reflect & mm_r & front,
                          prob_cc * Dc * jnp.abs(m.cos_theta(wh)) * dwh_dwo,
                          0.0)
    pdf = pdf / tot
    return jnp.where(active[..., None], f, 0.0), jnp.where(active, pdf, 0.0)


def _principled_sample(p, wi, u1, u2):
    """principled.cpp sample: stochastic lobe pick with the reference's
    Fresnel-aware probabilities, then weight = eval/pdf."""
    ci = m.cos_theta(wi)
    ex = p["extra"]
    metallic, cc, st = ex[..., 0], ex[..., 4], ex[..., 8]
    brdf_w = (1.0 - metallic) * (1.0 - st)
    bsdf_w = (1.0 - metallic) * st
    front = ci > 0.0
    active = (jnp.abs(ci) > 1e-6) & (front | (bsdf_w > 0.0))
    eta = jnp.where((st > 0.0) & (jnp.abs(p["eta"] - 1.0) < 1e-3),
                    1.001, p["eta"])
    ax, ay, rough = _principled_alphas(p)

    # main specular microfacet normal (VNDF, both-side wi)
    h_spec, _ = mf.sample_vndf(wi, u2, ax, ay)
    cos_ih = m.dot(wi, h_spec)
    F_d, cos_t, eta_it, eta_ti = fr.fresnel_dielectric(cos_ih, eta)

    prob_sr = jnp.where(front, 1.0 - bsdf_w * (1.0 - F_d), F_d)
    prob_st = jnp.where(front, bsdf_w * (1.0 - F_d), 1.0 - F_d)
    prob_cc = jnp.where(front, 0.25 * cc, 0.0)
    prob_di = jnp.where(front, brdf_w, 0.0)
    tot = jnp.maximum(prob_sr + prob_st + prob_cc + prob_di, 1e-20)
    p_di, p_cc, p_st = prob_di / tot, prob_cc / tot, prob_st / tot

    pick_di = u1 < p_di
    pick_cc = (u1 >= p_di) & (u1 < p_di + p_cc)
    pick_st = (u1 >= p_di + p_cc) & (u1 < p_di + p_cc + p_st)

    wo_diff = warp.square_to_cosine_hemisphere(u2)
    wo_spec = m.reflect_h(wi, h_spec)
    # refraction about h (same construction as roughdielectric)
    wo_st = (-eta_ti[..., None] * wi
             + (eta_ti * cos_ih
                - m.mulsign(jnp.abs(cos_t), cos_ih))[..., None] * h_spec)
    # clearcoat GTR1 normal
    a_cc = m.lerp(0.1, 0.001, ex[..., 5])
    a2 = a_cc * a_cc
    ct2 = m.safe_div(1.0 - jnp.power(a2, 1.0 - u2[..., 0]), 1.0 - a2)
    ct = m.safe_sqrt(ct2)
    stheta = m.safe_sqrt(1.0 - ct2)
    phi = 2.0 * jnp.pi * u2[..., 1]
    h_cc = m.vec(stheta * jnp.cos(phi), stheta * jnp.sin(phi), ct)
    wo_cc = m.reflect_h(wi, h_cc)

    wo = jnp.where(pick_di[..., None], wo_diff,
                   jnp.where(pick_cc[..., None], wo_cc,
                             jnp.where(pick_st[..., None], wo_st, wo_spec)))
    co = m.cos_theta(wo)
    side_ok = jnp.where(pick_st, ci * co < 0.0, ci * co > 0.0)
    # macro-micro compatibility rejection (principled.cpp:427-480): keep
    # sampling density consistent with the mixture pdf's masked lobes
    hs_i = m.mulsign(m.dot(wi, h_spec), ci)
    hc_i = m.mulsign(m.dot(wi, h_cc), ci)
    pick_sr = ~(pick_di | pick_cc | pick_st)
    side_ok = side_ok & jnp.where(
        pick_sr, (hs_i > 0.0) & (m.mulsign(m.dot(wo_spec, h_spec), ci) > 0.0),
        jnp.where(pick_st,
                  (hs_i > 0.0) & (m.mulsign(m.dot(wo_st, h_spec), ci) < 0.0),
                  jnp.where(pick_cc,
                            (hc_i > 0.0)
                            & (m.mulsign(m.dot(wo_cc, h_cc), ci) > 0.0),
                            jnp.ones_like(pick_di))))
    f, pdf = _principled_eval_pdf(p, wi, wo)
    ok = active & side_ok & (pdf > 0.0)
    weight = jnp.where(ok[..., None], m.safe_div(f, pdf[..., None]), 0.0)
    eta_out = jnp.where(pick_st, eta_it, 1.0)
    return wo, jnp.where(ok, pdf, 0.0), weight, eta_out, \
        jnp.zeros_like(ok), pick_st & ok


# -- principledthin (src/bsdfs/principledthin.cpp) -------------------------
#
# Thin-surface principled: symmetric in incidence side (the sheet has no
# interior), specular reflection + non-bending "transmission by flipped
# reflection" with IOR-scaled roughness (Burley 2015 fig. 15), diffuse/
# retro/sheen reflection and Lambertian diffuse transmission.

def _thin_alphas(rough, aniso):
    aspect = jnp.sqrt(1.0 - 0.9 * aniso)
    a2 = jnp.clip(rough, 1e-3, 1.0) ** 2
    return jnp.maximum(a2 / aspect, 1e-4), jnp.maximum(a2 * aspect, 1e-4)


def _principledthin_eval_pdf(p, wi, wo):
    ci_raw = m.cos_theta(wi)
    active = jnp.abs(ci_raw) > 1e-6
    base = p["albedo"]
    ex = p["extra"]
    spec_tint, sheen, sheen_tint = ex[..., 1], ex[..., 2], ex[..., 3]
    aniso, flat = ex[..., 6], ex[..., 7]
    st = ex[..., 8]
    dt = 0.5 * ex[..., 9]          # diff_trans in [0,2] -> [0,1]
    rough = jnp.clip(p["alpha"][..., 0], 1e-3, 1.0)
    eta_t = p["eta"]

    # thin BSDF is symmetric: fold to the front side
    wi_f = m.mulsign(wi, ci_raw[..., None])
    wo_f = m.mulsign(wo, ci_raw[..., None])
    ci = jnp.abs(ci_raw)
    co = m.cos_theta(wo_f)
    reflect = co > 0.0
    refract = co < 0.0

    # half vector from the |z|-flipped wo (transmission = mirrored refl)
    wo_r = jnp.concatenate([wo_f[..., :2],
                            jnp.abs(wo_f[..., 2:3])], -1)
    wh = m.normalize(wi_f + wo_r)
    cos_ih = m.dot(wi_f, wh)
    cos_oh = m.dot(wo_f, wh)       # signed: <0 for transmission side
    mm_r = (cos_ih > 0.0) & (cos_oh > 0.0)
    mm_t = (cos_ih > 0.0) & (cos_oh < 0.0)

    F_d, _, _, _ = fr.fresnel_dielectric(cos_ih, eta_t)

    ax, ay = _thin_alphas(rough, aniso)
    rough_sc = jnp.clip((0.65 * eta_t - 0.35) * rough, 1e-3, 1.0)
    ax_s, ay_s = _thin_alphas(rough_sc, aniso)

    lum = (0.2126 * base[..., 0] + 0.7152 * base[..., 1]
           + 0.0722 * base[..., 2])
    tint = jnp.where((lum > 0)[..., None],
                     base / jnp.maximum(lum, 1e-6)[..., None],
                     jnp.ones_like(base))

    f = jnp.zeros(wi.shape[:-1] + (3,))

    # specular reflection (thin_fresnel mix, principledhelpers.h:296)
    sr_ok = active & reflect & mm_r & (st > 0.0)
    R0 = ((eta_t - 1.0) / (eta_t + 1.0)) ** 2
    F_tinted = _schlick(tint * R0[..., None], jnp.abs(cos_ih))
    F_thin = m.lerp(F_d[..., None], F_tinted, spec_tint[..., None])
    D = mf.ndf(wh, ax, ay)
    G = mf.G(wi_f, wo_f, wh, ax, ay)
    f = f + jnp.where(sr_ok[..., None],
                      st[..., None] * F_thin
                      * m.safe_div(D * G, 4.0 * ci)[..., None], 0.0)

    # specular transmission (scaled roughness; G with the folded wo)
    st_ok = active & refract & mm_t & (st > 0.0)
    Ds = mf.ndf(wh, ax_s, ay_s)
    Gs = mf.G(wi_f, wo_f, wh, ax_s, ay_s)
    f = f + jnp.where(st_ok[..., None],
                      (st * (1.0 - F_d)
                       * m.safe_div(Ds * Gs, 4.0 * ci))[..., None] * base,
                      0.0)

    # diffuse + retro + fake subsurface + sheen (reflection side)
    di_w = (1.0 - st) * (1.0 - dt)
    di_ok = active & reflect & (st < 1.0) & (dt < 1.0)
    aco = jnp.abs(co)
    Fo = (1.0 - aco) ** 5
    Fi = (1.0 - ci) ** 5
    f_diff = (1.0 - 0.5 * Fi) * (1.0 - 0.5 * Fo)
    cos_d = cos_oh
    Rr = 2.0 * rough * cos_d * cos_d
    f_retro = Rr * (Fo + Fi + Fo * Fi * (Rr - 1.0))
    fss90 = 0.5 * Rr
    fss = m.lerp(1.0, fss90, Fo) * m.lerp(1.0, fss90, Fi)
    f_ss = 1.25 * (fss * (m.safe_div(1.0, aco + ci) - 0.5) + 0.5)
    f_d_scalar = m.lerp(f_diff + f_retro, f_ss, flat) * warp.INV_PI * aco
    f = f + jnp.where(di_ok[..., None],
                      (di_w * f_d_scalar)[..., None] * base, 0.0)
    Fd_sheen = (1.0 - jnp.abs(cos_d)) ** 5
    c_sheen = m.lerp(jnp.ones_like(base), tint, sheen_tint[..., None])
    f = f + jnp.where((di_ok & (sheen > 0.0))[..., None],
                      (sheen * di_w * Fd_sheen * aco)[..., None] * c_sheen,
                      0.0)

    # Lambertian diffuse transmission
    dt_ok = active & refract & (st < 1.0) & (dt > 0.0)
    f = f + jnp.where(dt_ok[..., None],
                      ((1.0 - st) * dt * warp.INV_PI * aco)[..., None]
                      * base, 0.0)

    # pdf (principledthin.cpp:633-706; srates = 1)
    p_sr = 0.5 * st
    p_st = 0.5 * st
    p_cr = (1.0 - st) * (1.0 - dt)
    p_ct = (1.0 - st) * dt
    tot = jnp.maximum(p_sr + p_st + p_cr + p_ct, 1e-20)
    dwh_dwo = jnp.abs(m.safe_div(1.0, 4.0 * m.dot(wo_r, wh)))
    pdf = jnp.where(reflect & mm_r,
                    p_sr * mf.pdf_vndf(wi_f, wh, ax, ay) * dwh_dwo, 0.0)
    pdf = pdf + jnp.where(refract & mm_t,
                          p_st * mf.pdf_vndf(wi_f, wh, ax_s, ay_s)
                          * dwh_dwo, 0.0)
    cos_pdf = warp.INV_PI * jnp.abs(co)
    pdf = pdf + jnp.where(reflect, p_cr * cos_pdf, 0.0)
    pdf = pdf + jnp.where(refract, p_ct * cos_pdf, 0.0)
    pdf = pdf / tot
    return jnp.where(active[..., None], f, 0.0), jnp.where(active, pdf, 0.0)


def _principledthin_sample(p, wi, u1, u2):
    ci_raw = m.cos_theta(wi)
    active = jnp.abs(ci_raw) > 1e-6
    ex = p["extra"]
    aniso, st = ex[..., 6], ex[..., 8]
    dt = 0.5 * ex[..., 9]
    rough = jnp.clip(p["alpha"][..., 0], 1e-3, 1.0)
    eta_t = p["eta"]
    wi_f = m.mulsign(wi, ci_raw[..., None])

    p_sr = 0.5 * st
    p_st = 0.5 * st
    p_cr = (1.0 - st) * (1.0 - dt)
    p_ct = (1.0 - st) * dt
    tot = jnp.maximum(p_sr + p_st + p_cr + p_ct, 1e-20)
    p_sr, p_st, p_cr = p_sr / tot, p_st / tot, p_cr / tot

    ax, ay = _thin_alphas(rough, aniso)
    rough_sc = jnp.clip((0.65 * eta_t - 0.35) * rough, 1e-3, 1.0)
    ax_s, ay_s = _thin_alphas(rough_sc, aniso)

    h_r, _ = mf.sample_vndf(wi_f, u2, ax, ay)
    h_t, _ = mf.sample_vndf(wi_f, u2, ax_s, ay_s)
    wo_sr = m.reflect_h(wi_f, h_r)
    wo_st = m.reflect_h(wi_f, h_t)
    wo_st = wo_st.at[..., 2].set(-wo_st[..., 2])
    wo_cr = warp.square_to_cosine_hemisphere(u2)
    wo_ct = -wo_cr

    pick_sr = u1 < p_sr
    pick_st = (u1 >= p_sr) & (u1 < p_sr + p_st)
    pick_cr = (u1 >= p_sr + p_st) & (u1 < p_sr + p_st + p_cr)
    wo_f = jnp.where(pick_sr[..., None], wo_sr,
                     jnp.where(pick_st[..., None], wo_st,
                               jnp.where(pick_cr[..., None], wo_cr, wo_ct)))
    is_trans = pick_st | ~(pick_sr | pick_st | pick_cr)
    side_ok = jnp.where(is_trans, m.cos_theta(wo_f) < 0.0,
                        m.cos_theta(wo_f) > 0.0)
    # macro-micro compatibility rejection (principledthin.cpp:349-392):
    # the pdf assigns the specular lobes no density outside these
    # regions, so such samples must be discarded, not kept
    side_ok = side_ok & jnp.where(
        pick_sr, (m.dot(wi_f, h_r) > 0.0) & (m.dot(wo_sr, h_r) > 0.0),
        jnp.where(pick_st,
                  (m.dot(wi_f, h_t) > 0.0) & (m.dot(wo_st, h_t) < 0.0),
                  jnp.ones_like(pick_sr)))
    wo = m.mulsign(wo_f, ci_raw[..., None])
    f, pdf = _principledthin_eval_pdf(p, wi, wo)
    ok = active & side_ok & (pdf > 0.0)
    weight = jnp.where(ok[..., None], m.safe_div(f, pdf[..., None]), 0.0)
    return wo, jnp.where(ok, pdf, 0.0), weight, jnp.ones_like(ci_raw), \
        jnp.zeros_like(ok), is_trans & ok


# -- null (src/bsdfs/null.cpp) ---------------------------------------------

# -- polarization elements (polarizer/retarder/circular.cpp) ---------------
#
# Forward-facing Dirac delta transmission.  In the scalar (unpolarized)
# pipeline they only attenuate by the M00 element of their Mueller
# matrix: 0.5*T for the (linear|circular) polarizer, T for the retarder
# (polarizer.cpp:148, retarder.cpp / circular.cpp unpolarized branches).

def _polar_element_sample_factory(m00_scale):
    def _sample(p, wi, u1, u2):
        one = jnp.ones(wi.shape[:-1])
        w = m00_scale * p["albedo"]    # transmittance lives in albedo
        return -wi, one, w, one, jnp.ones_like(one, bool), \
            jnp.ones_like(one, bool)
    return _sample


_polarizer_sample = _polar_element_sample_factory(0.5)
_retarder_sample = _polar_element_sample_factory(1.0)
_circular_sample = _polar_element_sample_factory(0.5)


def _null_sample(p, wi, u1, u2):
    one = jnp.ones(wi.shape[:-1])
    return -wi, one, jnp.ones(wi.shape[:-1] + (3,)), one, \
        jnp.ones_like(one, bool), jnp.ones_like(one, bool)


def _null_eval_pdf(p, wi, wo):
    return jnp.zeros(wi.shape[:-1] + (3,)), jnp.zeros(wi.shape[:-1])


# -- hair (src/bsdfs/hair.cpp, 797 LoC; Chiang et al. 2016 fiber model) -----
#
# Local frame convention (hair.cpp:566-589): y = fiber tangent, z points
# away from the fiber in the cross-section plane (the shading normal),
# so directions must arrive in an si frame whose sh_t is the fiber axis
# (curve shapes set per-vertex tangents; see loader/curves.py).
# Parameter packing (set by dict_loader._bsdf_row):
#   albedo     = sigma_a (absorption, pigmentation pre-mixed)
#   eta        = IOR
#   extra[0:3] = longitudinal variances v[0..2] (v[3] == v[2])
#   extra[3]   = azimuthal logistic scale s
#   extra[4]   = scale tilt alpha (radians)
# eval returns the full BCSDF value (it integrates to 1 over the sphere
# for sigma_a = 0 — no extra cosine factor; hair.cpp white furnace).

_P_MAX = 3
PI_F = warp.PI
_EUMELANIN_SIGMA_A = (0.419, 0.697, 1.37)     # d'Eon et al. 2011
_PHEOMELANIN_SIGMA_A = (0.187, 0.4, 1.05)


def _hair_gamma(w):
    """Angle between the normal (+z) and w in the cross-section plane
    (hair.cpp:580-589); sin(gamma(wi)) is the fiber offset h."""
    proj = m.safe_sqrt(w[..., 0] ** 2 + w[..., 2] ** 2)
    g = jnp.arccos(jnp.clip(m.safe_div(w[..., 2], proj), -1.0, 1.0))
    g = jnp.where(proj == 0.0, 0.0, g)
    return jnp.where(w[..., 0] < 0.0, g, -g)


def _hair_reframe(st_i, ct_i, alpha, p):
    """Shift theta_i by the cuticle-scale tilt for lobe p
    (hair.cpp:598-628 reframe_with_scales)."""
    s0 = jnp.sin(alpha)
    c0 = m.safe_sqrt(1.0 - s0 * s0)
    s1, c1 = 2.0 * c0 * s0, c0 * c0 - s0 * s0
    s2, c2 = 2.0 * c1 * s1, c1 * c1 - s1 * s1
    if p == 0:
        st, ct = st_i * c1 - ct_i * s1, ct_i * c1 + st_i * s1
    elif p == 1:
        st, ct = st_i * c0 + ct_i * s0, ct_i * c0 - st_i * s0
    elif p == 2:
        st, ct = st_i * c2 + ct_i * s2, ct_i * c2 - st_i * s2
    else:
        st, ct = st_i, ct_i
    return st, jnp.abs(ct)


def _hair_attenuation(ct_i, eta, h, transmittance):
    """Per-lobe attenuation a_p (hair.cpp:631-651), list of 4 (n,3)."""
    cg_i = m.safe_sqrt(1.0 - h * h)
    f = fr.fresnel_dielectric(ct_i * cg_i, eta)[0][..., None]
    a = [f, (1.0 - f) ** 2 * transmittance]
    for _ in range(2, _P_MAX):
        a.append(a[-1] * transmittance * f)
    tf = transmittance * f
    a.append(a[-1] * tf / jnp.maximum(1.0 - tf, 1e-6))
    return a


def _hair_geometry(p, wi):
    """Shared incident-side quantities: (h, gamma_i, st_i, ct_i,
    gamma_t, transmittance, a_p, a_p_pdf)."""
    from ...core.spectrum import luminance
    gamma_i = _hair_gamma(wi)
    h = jnp.sin(gamma_i)
    st_i = wi[..., 1]
    ct_i = m.safe_sqrt(1.0 - st_i * st_i)
    eta = p["eta"]
    # longitudinal / azimuthal transmission angles
    st_t = st_i / eta
    ct_t = m.safe_sqrt(1.0 - st_t * st_t)
    eta_p = m.safe_div(m.safe_sqrt(eta * eta - st_i * st_i), ct_i)
    sg_t = m.safe_div(h, eta_p)
    cg_t = m.safe_sqrt(1.0 - sg_t * sg_t)
    gamma_t = jnp.arcsin(jnp.clip(sg_t, -1.0, 1.0))
    sigma_a = p["albedo"]
    transmittance = jnp.exp(-sigma_a
                            * (2.0 * cg_t / jnp.maximum(ct_t, 1e-6))[..., None])
    a_p = _hair_attenuation(ct_i, eta, h, transmittance)
    lum = [jnp.maximum(luminance(ai), 0.0) for ai in a_p]
    total = sum(lum)
    a_p_pdf = [m.safe_div(l, total) for l in lum]
    return h, gamma_i, st_i, ct_i, gamma_t, a_p, a_p_pdf


def _hair_logistic(x, s):
    e = jnp.exp(-jnp.abs(x) / s)
    return e / (s * (1.0 + e) ** 2)


def _hair_logistic_cdf(x, s):
    return 1.0 / (1.0 + jnp.exp(-x / s))


def _hair_trimmed_logistic_sample(u, s):
    k = _hair_logistic_cdf(PI_F, s) - _hair_logistic_cdf(-PI_F, s)
    x = -s * jnp.log(1.0 / jnp.maximum(
        u * k + _hair_logistic_cdf(-PI_F, s), 1e-12) - 1.0)
    return jnp.clip(x, -PI_F, PI_F)


def _hair_azimuthal(delta_phi, lobe, s, gamma_i, gamma_t):
    """Trimmed-logistic azimuthal lobe around the perfect specular
    deflection (hair.cpp:724-746)."""
    perfect = 2.0 * lobe * gamma_t - 2.0 * gamma_i + lobe * PI_F
    phi = delta_phi - perfect
    phi = phi - 2.0 * PI_F * jnp.round(phi / (2.0 * PI_F))
    k = _hair_logistic_cdf(PI_F, s) - _hair_logistic_cdf(-PI_F, s)
    return _hair_logistic(phi, s) / k


def _hair_longitudinal(wi, wo, v):
    return warp.square_to_rough_fiber_pdf(
        wo, wi, jnp.array([0.0, 1.0, 0.0]), 1.0 / jnp.maximum(v, 1e-9))


def _hair_eval_pdf(p, wi, wo):
    """hair.cpp eval_pdf (:439-510): fused BCSDF value + sampling pdf."""
    h, gamma_i, st_i, ct_i, gamma_t, a_p, a_p_pdf = _hair_geometry(p, wi)
    phi_i = jnp.arctan2(wi[..., 2], wi[..., 0])
    phi_o = jnp.arctan2(wo[..., 2], wo[..., 0])
    sp_i, cp_i = jnp.sin(phi_i), jnp.cos(phi_i)
    v = [p["extra"][..., 0], p["extra"][..., 1], p["extra"][..., 2],
         p["extra"][..., 2]]
    s = p["extra"][..., 3]
    alpha = p["extra"][..., 4]
    delta_phi = phi_o - phi_i

    pdf = jnp.zeros(wi.shape[:-1])
    value = jnp.zeros(wi.shape[:-1] + (3,))
    for lobe in range(_P_MAX):
        st_ip, ct_ip = _hair_reframe(st_i, ct_i, alpha, lobe)
        wi_p = jnp.stack([ct_ip * cp_i, st_ip, ct_ip * sp_i], -1)
        lon = _hair_longitudinal(wi_p, wo, v[lobe])
        az = _hair_azimuthal(delta_phi, lobe, s, gamma_i, gamma_t)
        pdf = pdf + lon * (2.0 * PI_F) * a_p_pdf[lobe] * az
        value = value + (lon * (2.0 * PI_F) * az)[..., None] * a_p[lobe]
    lon = _hair_longitudinal(wi, wo, v[_P_MAX])
    pdf = pdf + lon * a_p_pdf[_P_MAX]
    value = value + lon[..., None] * a_p[_P_MAX]

    bad = ~jnp.isfinite(pdf)
    pdf = jnp.where(bad, 0.0, pdf)
    value = jnp.where(bad[..., None] | ~jnp.isfinite(value), 0.0, value)
    return value, pdf


def _hair_sample(p, wi, u1, u2):
    """hair.cpp sample (:227-331): pick lobe by attenuation luminance,
    sample the longitudinal cone + azimuthal trimmed logistic."""
    h, gamma_i, st_i, ct_i, gamma_t, a_p, a_p_pdf = _hair_geometry(p, wi)
    phi_i = jnp.arctan2(wi[..., 2], wi[..., 0])
    v_tab = [p["extra"][..., 0], p["extra"][..., 1], p["extra"][..., 2],
             p["extra"][..., 2]]
    s = p["extra"][..., 3]
    alpha = p["extra"][..., 4]

    # lobe selection cascade on u1 with rescaled remainder (hair.cpp:248-259)
    u00 = u1
    u01 = u1 / jnp.maximum(a_p_pdf[0], 1e-12)
    lobe = jnp.zeros(u1.shape, jnp.int32)
    for i in range(_P_MAX):
        pick = a_p_pdf[i] < u00
        u00 = u00 - a_p_pdf[i]   # unconditional (hair.cpp:253-258):
        #   settled lanes go negative so every later pick stays false
        lobe = jnp.where(pick, i + 1, lobe)
        u01 = jnp.where(pick, u00 / jnp.maximum(a_p_pdf[i + 1], 1e-12), u01)
    u01 = jnp.clip(u01, 0.0, 1.0 - 1e-7)

    # tilt-shifted incident angle for the selected lobe
    st_ip, ct_ip = st_i, ct_i
    for j in range(_P_MAX):
        st_j, ct_j = _hair_reframe(st_i, ct_i, alpha, j)
        st_ip = jnp.where(lobe == j, st_j, st_ip)
        ct_ip = jnp.where(lobe == j, ct_j, ct_ip)

    # longitudinal cone sample (vMF; hair.cpp:271-283)
    v_sel = v_tab[_P_MAX]
    for i in range(_P_MAX):
        v_sel = jnp.where(lobe == i, v_tab[i], v_sel)
    u10 = jnp.maximum(u2[..., 0], 1e-7)
    cos_theta = 1.0 + v_sel * jnp.log(
        u10 + (1.0 - u10) * jnp.exp(-2.0 / jnp.maximum(v_sel, 1e-9)))
    sin_theta = m.safe_sqrt(1.0 - cos_theta ** 2)
    cos_phi = jnp.cos(2.0 * PI_F * u2[..., 1])
    st_o = -cos_theta * st_ip + sin_theta * cos_phi * ct_ip
    ct_o = m.safe_sqrt(1.0 - st_o ** 2)

    # azimuthal deflection (hair.cpp:290-298)
    perfect = (2.0 * lobe.astype(jnp.float32) * gamma_t - 2.0 * gamma_i
               + lobe.astype(jnp.float32) * PI_F)
    dphi_spec = perfect + _hair_trimmed_logistic_sample(u01, s)
    dphi = jnp.where(lobe < _P_MAX, dphi_spec, 2.0 * PI_F * u01)

    phi_o = phi_i + dphi
    wo = jnp.stack([ct_o * jnp.cos(phi_o), st_o, ct_o * jnp.sin(phi_o)], -1)
    wo = m.normalize(wo)

    f, pdf = _hair_eval_pdf(p, wi, wo)
    ok = pdf > 0.0
    weight = jnp.where(ok[..., None], m.safe_div(f, pdf[..., None]), 0.0)
    one = jnp.ones(u1.shape)
    return wo, jnp.where(ok, pdf, 0.0), weight, one, \
        jnp.zeros_like(ok), wo[..., 2] * wi[..., 2] < 0.0


_SAMPLERS = {
    D_PRINCIPLED: _principled_sample,
    D_PRINCIPLEDTHIN: _principledthin_sample,
    D_DIFFUSE: _diffuse_sample,
    D_CONDUCTOR: _conductor_sample,
    D_ROUGHCONDUCTOR: _rough_conductor_sample,
    D_DIELECTRIC: _dielectric_sample,
    D_ROUGHDIELECTRIC: _rough_dielectric_sample,
    D_PLASTIC: _plastic_sample,
    D_ROUGHPLASTIC: _rough_plastic_sample,
    D_THINDIELECTRIC: _thindielectric_sample,
    D_PPLASTIC: _pplastic_sample,
    D_NULL: _null_sample,
    D_HAIR: _hair_sample,
    D_POLARIZER: _polarizer_sample,
    D_RETARDER: _retarder_sample,
    D_CIRCULAR: _circular_sample,
}
_EVALS = {
    D_PRINCIPLED: _principled_eval_pdf,
    D_PRINCIPLEDTHIN: _principledthin_eval_pdf,
    D_DIFFUSE: _diffuse_eval_pdf,
    D_CONDUCTOR: _conductor_eval_pdf,
    D_ROUGHCONDUCTOR: _rough_conductor_eval_pdf,
    D_DIELECTRIC: _dielectric_eval_pdf,
    D_ROUGHDIELECTRIC: _rough_dielectric_eval_pdf,
    D_PLASTIC: _plastic_eval_pdf,
    D_ROUGHPLASTIC: _rough_plastic_eval_pdf,
    D_THINDIELECTRIC: _thindielectric_eval_pdf,
    D_PPLASTIC: _pplastic_eval_pdf,
    D_NULL: _null_eval_pdf,
    D_HAIR: _hair_eval_pdf,
    D_POLARIZER: _null_eval_pdf,
    D_RETARDER: _null_eval_pdf,
    D_CIRCULAR: _null_eval_pdf,
}

# types whose twosided flag flips the frame (transmissive types handle
# both sides natively)
_FLIPPABLE = (D_DIFFUSE, D_CONDUCTOR, D_ROUGHCONDUCTOR, D_PLASTIC,
              D_ROUGHPLASTIC, D_PRINCIPLED, D_PPLASTIC)


def _blend_weight(scene, si):
    """Blend weight / mask opacity (stored in the albedo slot)."""
    mt = scene.materials
    i = jnp.maximum(si.material_index, 0)
    w = mt.albedo[i][..., 0]
    wtex = mt.albedo_tex[i]
    wt = scene.textures.eval_bilinear(jnp.maximum(wtex, 0), si.uv)[..., 0]
    return jnp.where(wtex >= 0, wt, w)


def _resolve_children(scene, si, u_sel):
    """For blend/mask rows: stochastically redirect material_index to a
    child (blendbsdf.cpp sample / mask.cpp sample); returns
    (si_resolved, is_wrapper, w, child pick info)."""
    mt = scene.materials
    i = jnp.maximum(si.material_index, 0)
    t = mt.mtype[i]
    is_blend = t == D_BLEND
    is_mask = t == D_MASK
    w = _blend_weight(scene, si)
    pick_a = u_sel < w
    child = jnp.where(pick_a, mt.child_a[i], mt.child_b[i])
    # mask: child_b slot holds a null row (pass-through)
    new_idx = jnp.where((is_blend | is_mask) & (child >= 0), child,
                        si.material_index)
    return si.replace(material_index=new_idx), is_blend | is_mask, w, pick_a


def bsdf_sample(scene, si, u1, u2):
    """Dispatch BSDFSample over present types (bsdf.h ``sample``).

    The returned wo is expressed in the CALLER's (unperturbed) shading
    frame even when normal/bump maps perturb the internal frame.
    blend/mask wrappers stochastically select a child using extra bits
    of u1; their pdf/weight composition matches blendbsdf.cpp (the
    sampled child's quantities scaled by the discrete pick pdf cancel).
    """
    si_orig = si
    si = apply_shading_maps(scene, si)
    mt_tbl = scene.materials
    if D_BLEND in mt_tbl.types_present or D_MASK in mt_tbl.types_present:
        from ...core.rng import sample_tea_32, bits_to_float01
        u_sel = bits_to_float01(sample_tea_32(
            (u1 * 16777216.0).astype(jnp.uint32), jnp.uint32(0x51), 4)[0])
        si, _, _, _ = _resolve_children(scene, si, u_sel)
    p = _gather_params(scene, si)
    wi = si.wi
    n = wi.shape[0]
    out = BSDFSample(
        wo=jnp.zeros((n, 3)), pdf=jnp.zeros((n,)), eta=jnp.ones((n,)),
        sampled_delta=jnp.zeros((n,), bool),
        sampled_transmission=jnp.zeros((n,), bool),
        weight=jnp.zeros((n, 3)))
    for t in scene.materials.types_present:
        if t in (D_BLEND, D_MASK):
            continue   # resolved to children above
        mask = p["mtype"] == t
        if t == D_MEASURED_POL:
            from .measured_polarized import mp_sample
            i_meas = scene.materials.child_a[
                jnp.maximum(si.material_index, 0)]
            wi_t, fz = _flip(p, wi)
            for k, mb in enumerate(scene.measured_pol):
                mk = mask & (i_meas == k)
                bs_m = mp_sample(mb, wi_t, u1, u2)
                wo = bs_m.wo * jnp.stack(
                    [jnp.ones_like(fz), jnp.ones_like(fz), fz], -1)
                out = out.replace(
                    wo=jnp.where(mk[..., None], wo, out.wo),
                    pdf=jnp.where(mk, bs_m.pdf, out.pdf),
                    eta=jnp.where(mk, bs_m.eta, out.eta),
                    sampled_delta=jnp.where(mk, bs_m.sampled_delta,
                                            out.sampled_delta),
                    sampled_transmission=jnp.where(
                        mk, bs_m.sampled_transmission,
                        out.sampled_transmission),
                    weight=jnp.where(mk[..., None], bs_m.weight,
                                     out.weight))
            continue
        if t == D_MEASURED:
            # per-table dispatch (tables differ in shape -> static loop)
            from .measured import measured_sample
            i_meas = scene.materials.child_a[
                jnp.maximum(si.material_index, 0)]
            wi_t, fz = _flip(p, wi)
            for k, mb in enumerate(scene.measured):
                mk = mask & (i_meas == k)
                bs_m = measured_sample(mb, wi_t, u2)
                wo = bs_m.wo * jnp.stack(
                    [jnp.ones_like(fz), jnp.ones_like(fz), fz], -1)
                out = out.replace(
                    wo=jnp.where(mk[..., None], wo, out.wo),
                    pdf=jnp.where(mk, bs_m.pdf, out.pdf),
                    eta=jnp.where(mk, bs_m.eta, out.eta),
                    sampled_delta=jnp.where(mk, bs_m.sampled_delta,
                                            out.sampled_delta),
                    sampled_transmission=jnp.where(
                        mk, bs_m.sampled_transmission,
                        out.sampled_transmission),
                    weight=jnp.where(mk[..., None], bs_m.weight,
                                     out.weight))
            continue
        if t in _FLIPPABLE:
            wi_t, fz = _flip(p, wi)
        else:
            wi_t, fz = wi, jnp.ones((n,))
        wo, pdf, w, eta, is_d, is_t = _SAMPLERS[t](p, wi_t, u1, u2)
        wo = wo * jnp.stack([jnp.ones_like(fz), jnp.ones_like(fz), fz], -1)
        out = out.replace(
            wo=jnp.where(mask[..., None], wo, out.wo),
            pdf=jnp.where(mask, pdf, out.pdf),
            eta=jnp.where(mask, eta, out.eta),
            sampled_delta=jnp.where(mask, is_d, out.sampled_delta),
            sampled_transmission=jnp.where(mask, is_t, out.sampled_transmission),
            weight=jnp.where(mask[..., None], w, out.weight))
    if si is not si_orig:
        out = out.replace(wo=si_orig.to_local(si.to_world(out.wo)))
    return out


def _eval_pdf_inner(scene, si, wo):
    p = _gather_params(scene, si)
    wi = si.wi
    n = wi.shape[0]
    f_out = jnp.zeros((n, 3))
    pdf_out = jnp.zeros((n,))
    for t in scene.materials.types_present:
        if t in (D_BLEND, D_MASK):
            continue
        mask = p["mtype"] == t
        if t == D_MEASURED:
            from .measured import measured_eval_pdf
            i_meas = scene.materials.child_a[
                jnp.maximum(si.material_index, 0)]
            wi_t, wo_t, _ = _flip(p, wi, wo)
            for k, mb in enumerate(scene.measured):
                mk = mask & (i_meas == k)
                f, pdf = measured_eval_pdf(mb, wi_t, wo_t)
                f_out = jnp.where(mk[..., None], f, f_out)
                pdf_out = jnp.where(mk, pdf, pdf_out)
            continue
        if t == D_MEASURED_POL:
            from .measured_polarized import mp_eval_pdf
            i_meas = scene.materials.child_a[
                jnp.maximum(si.material_index, 0)]
            wi_t, wo_t, _ = _flip(p, wi, wo)
            for k, mb in enumerate(scene.measured_pol):
                mk = mask & (i_meas == k)
                f, pdf = mp_eval_pdf(mb, wi_t, wo_t)
                f_out = jnp.where(mk[..., None], f, f_out)
                pdf_out = jnp.where(mk, pdf, pdf_out)
            continue
        if t in _FLIPPABLE:
            wi_t, wo_t, _ = _flip(p, wi, wo)
        else:
            wi_t, wo_t = wi, wo
        f, pdf = _EVALS[t](p, wi_t, wo_t)
        f_out = jnp.where(mask[..., None], f, f_out)
        pdf_out = jnp.where(mask, pdf, pdf_out)
    return f_out, pdf_out


def bsdf_eval_pdf(scene, si, wo):
    """Dispatch (f*cos, pdf) (bsdf.h:455 ``eval_pdf``).

    NOTE: wo must be in si's *unperturbed* local frame; shading maps
    re-express both wi and wo consistently.  blend: w*f_a + (1-w)*f_b;
    mask: o*f_child (the delta pass-through has zero eval)."""
    si_m = apply_shading_maps(scene, si)
    if si_m is not si:
        wo = si_m.to_local(si.to_world(wo))
    si = si_m
    mt = scene.materials
    if D_BLEND not in mt.types_present and D_MASK not in mt.types_present:
        return _eval_pdf_inner(scene, si, wo)

    i = jnp.maximum(si.material_index, 0)
    t = mt.mtype[i]
    is_blend = t == D_BLEND
    is_mask = t == D_MASK
    w = _blend_weight(scene, si)
    ca = jnp.where(is_blend | is_mask, mt.child_a[i], si.material_index)
    cb = jnp.where(is_blend, mt.child_b[i], si.material_index)
    f_a, p_a = _eval_pdf_inner(scene, si.replace(material_index=ca), wo)
    f_b, p_b = _eval_pdf_inner(scene, si.replace(material_index=cb), wo)
    f = jnp.where(is_blend[..., None],
                  w[..., None] * f_a + (1.0 - w[..., None]) * f_b,
                  jnp.where(is_mask[..., None], w[..., None] * f_a, f_a))
    pdf = jnp.where(is_blend, w * p_a + (1.0 - w) * p_b,
                    jnp.where(is_mask, w * p_a, p_a))
    return f, pdf


def bsdf_pdf_matrix(scene, si, wos):
    """PDFs of J outgoing directions per lane in ONE dispatch.

    ``wos``: (J, N, 3) local directions.  Returns (J, N) pdfs, equal to
    ``stack([bsdf_eval_pdf(scene, si, wos[j])[1] for j in range(J)])``,
    but with the packed material-parameter gather and the per-type
    masked dispatch done ONCE — the J axis rides along as a broadcast
    leading dimension through the elementwise eval math.  This is the
    AMVPT exact-tv_pdf hot path (mvpath_multi.h:466-523 computes the
    full S x S view-pdf matrix per bounce; S+1 separate dispatches
    re-gathered parameters every time).

    Data-driven BSDFs (measured / measured_polarized / hair) do table
    lookups that don't broadcast over J; scenes containing them fall
    back to the loop (correct, just not fused).
    """
    J = wos.shape[0]
    tp = set(scene.materials.types_present)
    if tp & {D_MEASURED, D_MEASURED_POL, D_HAIR}:
        return jnp.stack([bsdf_eval_pdf(scene, si, wos[j])[1]
                          for j in range(J)])
    si_m = apply_shading_maps(scene, si)
    if si_m is not si:
        wos = si_m.to_local(si.to_world(wos))
    si = si_m
    mt = scene.materials
    if D_BLEND not in mt.types_present and D_MASK not in mt.types_present:
        return _eval_pdf_inner(scene, si, wos)[1]
    i = jnp.maximum(si.material_index, 0)
    t = mt.mtype[i]
    is_blend = t == D_BLEND
    is_mask = t == D_MASK
    w = _blend_weight(scene, si)
    ca = jnp.where(is_blend | is_mask, mt.child_a[i], si.material_index)
    cb = jnp.where(is_blend, mt.child_b[i], si.material_index)
    _, p_a = _eval_pdf_inner(scene, si.replace(material_index=ca), wos)
    _, p_b = _eval_pdf_inner(scene, si.replace(material_index=cb), wos)
    return jnp.where(is_blend, w * p_a + (1.0 - w) * p_b,
                     jnp.where(is_mask, w * p_a, p_a))


def bsdf_flags_delta(scene, si):
    """Per-lane: is the material a pure-delta BSDF (no smooth lobe)?
    Used to skip NEE at delta vertices (BSDFFlags::Smooth check)."""
    mt = scene.materials
    i = jnp.maximum(si.material_index, 0)
    t = mt.mtype[i]
    return ((t == D_CONDUCTOR) | (t == D_DIELECTRIC)
            | (t == D_THINDIELECTRIC) | (t == D_NULL)
            | (t == D_POLARIZER) | (t == D_RETARDER) | (t == D_CIRCULAR))


def eval_roughness(scene, si):
    """Fork-added BSDF::eval_roughness (bsdf.h:596) — scalar roughness
    used by AMVPT's reuse eligibility / tv_pdf_fast."""
    mt = scene.materials
    i = jnp.maximum(si.material_index, 0)
    t = mt.mtype[i]
    alpha = mt.alpha[i][..., 0]
    rtex = mt.alpha_tex[i]
    rough_t = scene.textures.eval_bilinear(jnp.maximum(rtex, 0), si.uv)[..., 0]
    alpha = jnp.where(rtex >= 0, rough_t, alpha)
    delta = ((t == D_CONDUCTOR) | (t == D_DIELECTRIC)
             | (t == D_THINDIELECTRIC) | (t == D_POLARIZER)
             | (t == D_RETARDER) | (t == D_CIRCULAR))
    diffuse_like = (t == D_DIFFUSE)
    return jnp.where(delta, 0.0, jnp.where(diffuse_like, 1.0, alpha))
