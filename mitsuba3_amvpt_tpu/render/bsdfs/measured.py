"""Measured BRDF — Dupuy & Jakob adaptive parameterization
(src/bsdfs/measured.cpp, 507 LoC; "An Adaptive Parameterization for
Efficient Material Acquisition and Rendering", rgl.epfl.ch materials).

RGB variant of the reference plugin: the spectral tensor's wavelength
axis collapses to three channel slices (the reference does the same in
RGB variants by passing the channel index as the third warp parameter,
measured.cpp:327-331).

Scene integration: measured materials are registry type D_MEASURED;
their per-material tensor tables live in ``scene.measured`` (a static
tuple — one pytree per distinct .bsdf file) and ``child_a`` of the
material row indexes into it.  Dispatch loops over the tuple with lane
masks, the same pattern as BSDF-type dispatch.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from ...core import math as m
from ...core.marginal import MarginalContinuous2D
from ..records import BSDFSample

_PI = float(np.pi)


@struct.dataclass
class MeasuredBSDF:
    ndf: MarginalContinuous2D        # raw NDF (no sampling tables)
    sigma: MarginalContinuous2D      # projected area
    vndf: MarginalContinuous2D       # visible-NDF warp, params (phi, theta)
    luminance: MarginalContinuous2D  # luminance warp, params (phi, theta)
    rgb: MarginalContinuous2D        # spectra, params (phi, theta, channel)
    isotropic: bool = struct.field(pytree_node=False, default=True)
    jacobian: bool = struct.field(pytree_node=False, default=True)
    reduction: int = struct.field(pytree_node=False, default=1)

    @staticmethod
    def from_tensors(t: dict) -> "MeasuredBSDF":
        """Build from a parsed .bsdf tensor dict
        (measured.cpp:120-231 ctor checks + warp construction)."""
        phi_i = np.asarray(t["phi_i"], np.float32).reshape(-1)
        theta_i = np.asarray(t["theta_i"], np.float32).reshape(-1)
        ndf = np.asarray(t["ndf"], np.float32)
        sigma = np.asarray(t["sigma"], np.float32)
        vndf = np.asarray(t["vndf"], np.float32)
        lum = np.asarray(t["luminance"], np.float32)
        spec = np.asarray(t["spectra"], np.float32)
        jac = bool(np.asarray(t["jacobian"]).reshape(-1)[0])

        isotropic = phi_i.shape[0] <= 2
        reduction = 1
        if not isotropic:
            reduction = int(round(
                (2 * _PI) / (phi_i[-1] - phi_i[0])))

        if spec.ndim == 5 and spec.shape[2] != 3:
            # spectral measurement: integrate against CIE-weighted RGB?
            # Keep it simple and correct-ish: resample the wavelength
            # axis to 3 RGB bands (documented approximation; use the
            # RGB .bsdf downloads for exact parity).
            wav = np.asarray(t["wavelengths"], np.float32).reshape(-1)
            bands = [(580.0, 700.0), (480.0, 580.0), (380.0, 480.0)]
            chans = []
            for lo, hi in bands:
                w = ((wav >= lo) & (wav < hi)).astype(np.float32)
                w = w / max(w.sum(), 1.0)
                chans.append(np.tensordot(spec, w, axes=([2], [0])))
            spec = np.stack(chans, axis=2)

        params2 = (phi_i, theta_i)
        return MeasuredBSDF(
            ndf=MarginalContinuous2D.build(ndf, (), normalize=False,
                                           enable_sampling=False),
            sigma=MarginalContinuous2D.build(sigma, (), normalize=False,
                                             enable_sampling=False),
            vndf=MarginalContinuous2D.build(vndf, params2),
            luminance=MarginalContinuous2D.build(lum, params2),
            rgb=MarginalContinuous2D.build(
                spec, params2 + (np.arange(3, dtype=np.float32),),
                normalize=False, enable_sampling=False),
            isotropic=isotropic, jacobian=jac, reduction=reduction)

    @staticmethod
    def from_file(path: str) -> "MeasuredBSDF":
        from ...loader.tensor_file import read_tensor_file
        return MeasuredBSDF.from_tensors(read_tensor_file(path))


def _elevation(d):
    """Numerically stable elevation (measured.cpp:236-239)."""
    dist = jnp.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2
                    + (d[..., 2] - 1.0) ** 2)
    return 2.0 * jnp.arcsin(jnp.clip(0.5 * dist, -1.0, 1.0))


def _theta2u(theta):
    return jnp.sqrt(jnp.maximum(theta * (2.0 / _PI), 0.0))


def _u2theta(u):
    return (u * u) * (_PI / 2.0)


def _phi2u(phi):
    return (phi + _PI) / (2.0 * _PI)


def _u2phi(u):
    return (2.0 * u - 1.0) * _PI


def _reduce_in(mb: MeasuredBSDF, wi, wo=None):
    """Symmetry reduction of anisotropic measurements
    (measured.cpp:258-264, 357-366): mirror wi (and wo) into the
    measured sector; returns the flip signs to undo on sampled wo."""
    if mb.reduction < 2:
        if wo is None:
            return wi, jnp.ones(wi.shape[:-1]), jnp.ones(wi.shape[:-1])
        return wi, wo
    sy = wi[..., 1]
    sx = wi[..., 0] if mb.reduction == 4 else sy
    fx = jnp.where(sx < 0, -1.0, 1.0)
    fy = jnp.where(sy < 0, -1.0, 1.0)
    flip = jnp.stack([fx, fy, jnp.ones_like(fx)], -1)
    if wo is None:
        return wi * flip, fx, fy
    return wi * flip, wo * flip


def measured_sample(mb: MeasuredBSDF, wi, u2) -> BSDFSample:
    """measured.cpp:243-343 sample (luminance warp -> VNDF warp ->
    half-vector reflection)."""
    n = wi.shape[0]
    wi_r, fx, fy = _reduce_in(mb, wi)
    active = m.cos_theta(wi) > 0.0

    theta_i = _elevation(wi_r)
    phi_i = jnp.arctan2(wi_r[..., 1], wi_r[..., 0])
    params = [phi_i, theta_i]
    u_wi = jnp.stack([_theta2u(theta_i), _phi2u(phi_i)], -1)

    sample = jnp.stack([u2[..., 1], u2[..., 0]], -1)
    sample, lum_pdf = mb.luminance.sample(sample, params)
    u_m, ndf_pdf = mb.vndf.sample(sample, params)

    phi_m = _u2phi(u_m[..., 1])
    theta_m = _u2theta(u_m[..., 0])
    if mb.isotropic:
        phi_m = phi_m + phi_i

    sp, cp = jnp.sin(phi_m), jnp.cos(phi_m)
    st, ct = jnp.sin(theta_m), jnp.cos(theta_m)
    wm = jnp.stack([cp * st, sp * st, ct], -1)

    jac = jnp.maximum(2.0 * _PI ** 2 * u_m[..., 0] * st, 1e-6) \
        * 4.0 * jnp.sum(wi_r * wm, -1)
    wo = 2.0 * jnp.sum(wm * wi_r, -1, keepdims=True) * wm - wi_r
    pdf = ndf_pdf * lum_pdf / jac

    spec = _eval_spectra(mb, sample, params)
    if mb.jacobian:
        spec = spec * (mb.ndf.eval(u_m)
                       / (4.0 * jnp.maximum(mb.sigma.eval(u_wi),
                                            1e-12)))[..., None]
    # undo symmetry reduction
    wo = wo * jnp.stack([fx, fy, jnp.ones_like(fx)], -1)
    active = active & (m.cos_theta(wo) > 0.0) & (pdf > 0.0)
    weight = jnp.where(active[..., None],
                       m.safe_div(spec, pdf[..., None]), 0.0)
    one = jnp.ones((n,))
    return BSDFSample(
        wo=wo, pdf=jnp.where(active, pdf, 0.0), eta=one,
        sampled_delta=jnp.zeros((n,), bool),
        sampled_transmission=jnp.zeros((n,), bool),
        weight=weight)


def _eval_spectra(mb: MeasuredBSDF, sample, params):
    chans = []
    for i in range(3):
        ci = jnp.full(sample.shape[:-1], float(i))
        chans.append(mb.rgb.eval(sample, params + [ci]))
    return jnp.maximum(jnp.stack(chans, -1), 0.0)


def measured_eval_pdf(mb: MeasuredBSDF, wi, wo):
    """measured.cpp:345-399 eval + :401-459 pdf fused (our registry's
    eval_pdf convention: returns (f*cos, pdf))."""
    active = (m.cos_theta(wi) > 0.0) & (m.cos_theta(wo) > 0.0)
    wi_r, wo_r = _reduce_in(mb, wi, wo)

    wm = m.normalize(wi_r + wo_r)
    theta_i = _elevation(wi_r)
    phi_i = jnp.arctan2(wi_r[..., 1], wi_r[..., 0])
    theta_m = _elevation(wm)
    phi_m = jnp.arctan2(wm[..., 1], wm[..., 0])

    u_wi = jnp.stack([_theta2u(theta_i), _phi2u(phi_i)], -1)
    phi_m_rel = phi_m - phi_i if mb.isotropic else phi_m
    u_m_phi = _phi2u(phi_m_rel)
    u_m_phi = u_m_phi - jnp.floor(u_m_phi)
    u_m = jnp.stack([_theta2u(theta_m), u_m_phi], -1)

    params = [phi_i, theta_i]
    sample, vndf_pdf = mb.vndf.invert(u_m, params)

    spec = _eval_spectra(mb, sample, params)
    if mb.jacobian:
        spec = spec * (mb.ndf.eval(u_m)
                       / (4.0 * jnp.maximum(mb.sigma.eval(u_wi),
                                            1e-12)))[..., None]

    lum_pdf = mb.luminance.eval(sample, params)
    sin_m = jnp.sqrt(jnp.maximum(wm[..., 0] ** 2 + wm[..., 1] ** 2, 0.0))
    jac = jnp.maximum(2.0 * _PI ** 2 * u_m[..., 0] * sin_m, 1e-6) \
        * 4.0 * jnp.sum(wi_r * wm, -1)
    pdf = vndf_pdf * lum_pdf / jac

    f = jnp.where(active[..., None], spec, 0.0)
    return f, jnp.where(active, jnp.maximum(pdf, 0.0), 0.0)
