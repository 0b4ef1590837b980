"""Measured polarized BRDF — RGL pBSDF tensor files
(src/bsdfs/measured_polarized.cpp, 408 LoC; Baek et al. style Mueller
image-based acquisition, rgl.epfl.ch pBSDF datasets).

A .pbsdf tensor file stores Mueller matrices on a Rusinkiewicz grid:
``M[phi_d, theta_d, theta_h, wavelength, 4, 4]`` with non-uniform node
arrays per axis.  Evaluation is multilinear interpolation over the four
parameter axes (the reference routes this through Marginal2D<4> with an
inner 4x4 "sample" grid that lands exactly on Mueller entries,
measured_polarized.cpp:164-176 + :266).

Sampling is a fixed cosine-hemisphere/GGX(alpha_sample) mixture with
weight 0.1 on the diffuse lobe (measured_polarized.cpp:13,195-205) —
the data itself is not importance sampled.

Like the reference in RGB (non-spectral) variants, the scalar pipeline
needs a fixed ``wavelength`` (measured_polarized.cpp:120-121); if none
is given the loader defaults to the 550 nm green channel and the three
RGB channels read the tensor at (620, 550, 465) nm.  The full Mueller
matrix for the stokes integrator is produced by ``mp_mueller``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from ...core import math as m
from ...core import microfacet as mf
from ...core import warp
from ..records import BSDFSample

COSINE_HEMISPHERE_PDF_WEIGHT = 0.1   # measured_polarized.cpp:13
RGB_WAVELENGTHS = (620.0, 550.0, 465.0)


@struct.dataclass
class MeasuredPolarizedBSDF:
    M: jnp.ndarray         # (P, T, H, W, 4, 4)
    phi_d: jnp.ndarray     # (P,) nodes
    theta_d: jnp.ndarray   # (T,)
    theta_h: jnp.ndarray   # (H,)
    wvls: jnp.ndarray      # (W,) nm
    alpha_sample: float = struct.field(pytree_node=False, default=0.1)
    wavelength: float = struct.field(pytree_node=False, default=-1.0)

    @staticmethod
    def from_tensors(t: dict, alpha_sample: float = 0.1,
                     wavelength: float = -1.0) -> "MeasuredPolarizedBSDF":
        M = np.asarray(t["M"], np.float32)
        assert M.ndim == 6 and M.shape[4] == 4 and M.shape[5] == 4, \
            "pbsdf tensor M must be (phi_d, theta_d, theta_h, wvls, 4, 4)"
        return MeasuredPolarizedBSDF(
            M=jnp.asarray(M),
            phi_d=jnp.asarray(np.asarray(t["phi_d"],
                                         np.float32).reshape(-1)),
            theta_d=jnp.asarray(np.asarray(t["theta_d"],
                                           np.float32).reshape(-1)),
            theta_h=jnp.asarray(np.asarray(t["theta_h"],
                                           np.float32).reshape(-1)),
            wvls=jnp.asarray(np.asarray(t["wvls"],
                                        np.float32).reshape(-1)),
            alpha_sample=alpha_sample, wavelength=wavelength)

    @staticmethod
    def from_file(path: str, alpha_sample: float = 0.1,
                  wavelength: float = -1.0) -> "MeasuredPolarizedBSDF":
        from ...loader.tensor_file import read_tensor_file
        return MeasuredPolarizedBSDF.from_tensors(
            read_tensor_file(path), alpha_sample, wavelength)


def _axis_lerp(nodes, x):
    """Bracketing index + lerp weight on a non-uniform node array."""
    n = nodes.shape[0]
    x = jnp.clip(x, nodes[0], nodes[-1])
    i1 = jnp.clip(jnp.searchsorted(nodes, x, side="right"), 1, n - 1)
    i0 = i1 - 1
    lo, hi = nodes[i0], nodes[i1]
    w = jnp.where(hi > lo, (x - lo) / jnp.maximum(hi - lo, 1e-20), 0.0)
    return i0, i1, w


def _rusinkiewicz(wi, wo):
    """(wi, wo) local directions -> (phi_d, theta_h, theta_d)
    (measured_polarized.cpp:376-396 directions_to_rusinkiewicz, after
    the phi(wi) standard-frame rotation at :240-244)."""
    # rotate both directions about z so wi lies in the xz-plane
    phi_std = jnp.arctan2(wi[..., 1], wi[..., 0])
    cp, sp = jnp.cos(-phi_std), jnp.sin(-phi_std)

    def rot_z(v):
        return jnp.stack([v[..., 0] * cp - v[..., 1] * sp,
                          v[..., 0] * sp + v[..., 1] * cp,
                          v[..., 2]], -1)

    i = rot_z(wi)
    o = rot_z(wo)
    h = m.normalize(i + o)
    nz = jnp.asarray([0.0, 0.0, 1.0])
    b = jnp.cross(jnp.broadcast_to(nz, h.shape), h)
    bl = jnp.linalg.norm(b, axis=-1, keepdims=True)
    b = jnp.where(bl > 1e-9, b / jnp.maximum(bl, 1e-20),
                  jnp.asarray([0.0, 1.0, 0.0]))
    tt = m.normalize(jnp.cross(b, h))
    theta_d = jnp.arccos(jnp.clip(m.dot(h, i), -1.0, 1.0))
    theta_h = jnp.arccos(jnp.clip(h[..., 2], -1.0, 1.0))
    i_prj = i - m.dot(i, h)[..., None] * h
    ipl = jnp.linalg.norm(i_prj, axis=-1, keepdims=True)
    i_prj = jnp.where(ipl > 1e-9, i_prj / jnp.maximum(ipl, 1e-20), tt)
    cos_pd = jnp.clip(m.dot(tt, i_prj), -1.0, 1.0)
    sin_pd = jnp.clip(m.dot(b, i_prj), -1.0, 1.0)
    phi_d = jnp.arctan2(sin_pd, cos_pd)
    return phi_d, theta_h, theta_d, phi_std


def mp_interp(mb: MeasuredPolarizedBSDF, phi_d, theta_h, theta_d, wvl):
    """Multilinear Mueller lookup -> (n, 4, 4)."""
    P, T, H, W = mb.M.shape[:4]
    flat = mb.M.reshape(-1, 16)
    ip0, ip1, wp = _axis_lerp(mb.phi_d, phi_d)
    it0, it1, wt = _axis_lerp(mb.theta_d, theta_d)
    ih0, ih1, wh = _axis_lerp(mb.theta_h, theta_h)
    iw0, iw1, ww = _axis_lerp(mb.wvls, wvl)

    out = 0.0
    for ip, fp in ((ip0, 1.0 - wp), (ip1, wp)):
        for it, ft in ((it0, 1.0 - wt), (it1, wt)):
            for ih, fh in ((ih0, 1.0 - wh), (ih1, wh)):
                for iw, fw in ((iw0, 1.0 - ww), (iw1, ww)):
                    idx = ((ip * T + it) * H + ih) * W + iw
                    out = out + (fp * ft * fh * fw)[..., None] * flat[idx]
    return out.reshape(out.shape[:-1] + (4, 4))


def _m00_rgb(mb: MeasuredPolarizedBSDF, wi, wo):
    """Unpolarized RGB intensity: M00 at the three RGB wavelengths (or
    the fixed override)."""
    phi_d, theta_h, theta_d, _ = _rusinkiewicz(wi, wo)
    chans = []
    for k in range(3):
        wl = mb.wavelength if mb.wavelength > 0 else RGB_WAVELENGTHS[k]
        Mk = mp_interp(mb, phi_d, theta_h, theta_d,
                       jnp.full(phi_d.shape, wl))
        chans.append(jnp.maximum(Mk[..., 0, 0], 0.0))
    f = jnp.stack(chans, -1)
    return jnp.where(jnp.isfinite(f), f, 0.0)


def mp_eval_pdf(mb: MeasuredPolarizedBSDF, wi, wo):
    """Registry-convention (f*cos, pdf) (measured_polarized.cpp eval
    :216-336 unpolarized branch + pdf :338-349)."""
    ci, co = m.cos_theta(wi), m.cos_theta(wo)
    active = (ci > 0.0) & (co > 0.0)
    f = _m00_rgb(mb, wi, wo) * jnp.maximum(co, 0.0)[..., None]
    pdf = _mixture_pdf(mb, wi, wo)
    return (jnp.where(active[..., None], f, 0.0),
            jnp.where(active, pdf, 0.0))


def _mixture_pdf(mb: MeasuredPolarizedBSDF, wi, wo):
    h = m.normalize(wi + wo)
    a = jnp.full(wi.shape[:-1], mb.alpha_sample)
    pdf_mf = mf.pdf_vndf(wi, h, a, a) / jnp.maximum(
        4.0 * m.dot(wo, h), 1e-9)
    pdf_d = warp.square_to_cosine_hemisphere_pdf(wo)
    return (COSINE_HEMISPHERE_PDF_WEIGHT * pdf_d
            + (1.0 - COSINE_HEMISPHERE_PDF_WEIGHT) * pdf_mf)


def mp_sample(mb: MeasuredPolarizedBSDF, wi, u1, u2) -> BSDFSample:
    """Diffuse/GGX mixture sampling (measured_polarized.cpp:178-216)."""
    n = wi.shape[0]
    active = m.cos_theta(wi) > 0.0
    wo_d = warp.square_to_cosine_hemisphere(u2)
    a = jnp.full((n,), mb.alpha_sample)
    h, _ = mf.sample_vndf(wi, u2, a, a)
    wo_m = 2.0 * m.dot(wi, h)[..., None] * h - wi
    pick_d = u1 < COSINE_HEMISPHERE_PDF_WEIGHT
    wo = jnp.where(pick_d[..., None], wo_d, wo_m)
    pdf = _mixture_pdf(mb, wi, wo)
    f, _ = mp_eval_pdf(mb, wi, wo)
    ok = active & (pdf > 0.0) & (m.cos_theta(wo) > 0.0)
    one = jnp.ones((n,))
    return BSDFSample(
        wo=wo, pdf=jnp.where(ok, pdf, 0.0), eta=one,
        sampled_delta=jnp.zeros((n,), bool),
        sampled_transmission=jnp.zeros((n,), bool),
        weight=jnp.where(ok[..., None], m.safe_div(f, pdf[..., None]),
                         0.0))


def mp_mueller(mb: MeasuredPolarizedBSDF, wi, wo_local):
    """M00-normalized Mueller matrix (n, 3, 4, 4) in the *implicit
    local bases* of (-wo_local, wi) — the stokes integrator applies its
    standard local->world conversion afterwards
    (measured_polarized.cpp:236-301: Rusinkiewicz lookup in the
    phi-standard frame, reflection-plane Stokes bases, rotation into
    the implicit direction bases)."""
    from ...core import mueller as mu
    phi_d, theta_h, theta_d, phi_std = _rusinkiewicz(wi, wo_local)
    chans = []
    for k in range(3):
        wl = mb.wavelength if mb.wavelength > 0 else RGB_WAVELENGTHS[k]
        Mk = mp_interp(mb, phi_d, theta_h, theta_d,
                       jnp.full(phi_d.shape, wl))
        bad = ~jnp.isfinite(Mk).all((-1, -2))
        Mk = jnp.where(bad[..., None, None], 0.0, Mk)
        Mk = Mk.at[..., 0, 0].set(jnp.maximum(Mk[..., 0, 0], 0.0))
        chans.append(Mk)
    M = jnp.stack(chans, 1)                      # (n, 3, 4, 4)

    # reflection-plane Stokes bases in the standard frame
    cp, sp = jnp.cos(-phi_std), jnp.sin(-phi_std)

    def rot_z(v, c, s):
        return jnp.stack([v[..., 0] * c - v[..., 1] * s,
                          v[..., 0] * s + v[..., 1] * c,
                          v[..., 2]], -1)

    wi_std = rot_z(wi, cp, sp)
    wo_std = rot_z(wo_local, cp, sp)
    zo = -wo_std
    to = m.normalize(jnp.cross(wo_std - wi_std, zo))
    yo = m.normalize(jnp.cross(to, zo))
    xo = jnp.cross(yo, zo)
    zi = wi_std
    ti = m.normalize(jnp.cross(wi_std - wo_std, zi))
    yi = m.normalize(jnp.cross(ti, zi))
    xi = jnp.cross(yi, zi)

    # undo the standard-frame rotation on the basis vectors
    cpb, spb = jnp.cos(phi_std), jnp.sin(phi_std)
    xo_hat = rot_z(xo, cpb, spb)
    xi_hat = rot_z(xi, cpb, spb)

    M = mu.rotate_mueller_basis(
        M,
        (-wo_local)[:, None, :], xo_hat[:, None, :],
        mu.stokes_basis(-wo_local)[:, None, :],
        wi[:, None, :], xi_hat[:, None, :],
        mu.stokes_basis(wi)[:, None, :])
    # M00-normalized like every other Mueller factor in the stokes
    # integrator (intensity rides on the scalar path weight)
    return M / jnp.maximum(M[..., 0:1, 0:1], 1e-12)
