"""Mueller/Stokes polarization calculus (render/mueller.h, 409 LoC).

All functions are batched jnp ports: Mueller matrices have shape
(..., 4, 4) and Stokes vectors (..., 4); scalar args broadcast, so the
same code serves per-lane (N,) and per-lane-per-channel (N, 3) use.
Conventions match the reference exactly:

* A Stokes vector travels along a *forward* direction and is expressed
  in the implicit basis ``stokes_basis(forward)`` (mueller.h:284-288 —
  the first output of coordinate_system).
* ``specular_reflection`` uses the "Verdet convention" sign of a_p
  (fresnel.h:173-178) and encodes the retardance of total internal
  reflection / conductors in the lower-right 2x2 block.

The polarized Fresnel terms are computed with complex64 arithmetic —
XLA lowers this to pairs of f32 ops, so it stays vectorizable on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import math as m

# ---------------------------------------------------------------------------
# elementary Mueller matrices
# ---------------------------------------------------------------------------


def _mm(rows, batch_shape):
    """Assemble a (..., 4, 4) matrix from 16 broadcastable entries."""
    flat = [jnp.broadcast_to(jnp.asarray(e, jnp.float32), batch_shape)
            for r in rows for e in r]
    return jnp.stack(flat, -1).reshape(*batch_shape, 4, 4)


def depolarizer(value=1.0):
    """Ideal depolarizer (mueller.h:37): only M00 = value survives."""
    value = jnp.asarray(value, jnp.float32)
    z = jnp.zeros_like(value)
    return _mm([[value, z, z, z], [z, z, z, z], [z, z, z, z], [z, z, z, z]],
               value.shape)


def absorber(value):
    """Neutral absorber (mueller.h:50): value * identity."""
    value = jnp.asarray(value, jnp.float32)
    return value[..., None, None] * jnp.eye(4, dtype=jnp.float32)


def linear_polarizer(value=1.0):
    """Ideal linear polarizer along the horizontal axis (mueller.h:65)."""
    value = jnp.asarray(value, jnp.float32)
    a = value * 0.5
    z = jnp.zeros_like(a)
    return _mm([[a, a, z, z], [a, a, z, z], [z, z, z, z], [z, z, z, z]],
               a.shape)


def linear_retarder(phase):
    """Linear retarder with fast axis horizontal, retardance ``phase``
    in radians (mueller.h:91)."""
    phase = jnp.asarray(phase, jnp.float32)
    s, c = jnp.sin(phase), jnp.cos(phase)
    o = jnp.ones_like(phase)
    z = jnp.zeros_like(phase)
    return _mm([[o, z, z, z], [z, o, z, z], [z, z, c, -s], [z, z, s, c]],
               phase.shape)


def right_circular_polarizer(batch_shape=()):
    """mueller.h:108."""
    o = jnp.ones(batch_shape, jnp.float32)
    z = jnp.zeros(batch_shape, jnp.float32)
    return 0.5 * _mm([[o, z, z, o], [z, z, z, z], [z, z, z, z],
                      [o, z, z, o]], batch_shape)


def left_circular_polarizer(batch_shape=()):
    """mueller.h:123."""
    o = jnp.ones(batch_shape, jnp.float32)
    z = jnp.zeros(batch_shape, jnp.float32)
    return 0.5 * _mm([[o, z, z, -o], [z, z, z, z], [z, z, z, z],
                      [-o, z, z, o]], batch_shape)


def diattenuator(x, y):
    """Linear diattenuator with transmittances (x, y) along the two
    axes (mueller.h:138)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.broadcast_to(jnp.asarray(y, jnp.float32), x.shape)
    a = 0.5 * (x + y)
    b = 0.5 * (x - y)
    c = jnp.sqrt(jnp.maximum(x * y, 0.0))
    z = jnp.zeros_like(a)
    return _mm([[a, b, z, z], [b, a, z, z], [z, z, c, z], [z, z, z, c]],
               a.shape)


def rotator(theta):
    """Ideal rotator: rotates the plane of polarization by ``theta``
    (mueller.h:164; note the 2-theta frequency of Stokes space)."""
    theta = jnp.asarray(theta, jnp.float32)
    s, c = jnp.sin(2.0 * theta), jnp.cos(2.0 * theta)
    o = jnp.ones_like(theta)
    z = jnp.zeros_like(theta)
    return _mm([[o, z, z, z], [z, c, s, z], [z, -s, c, z], [z, z, z, o]],
               theta.shape)


def rotated_element(theta, M):
    """Apply an optical element M rotated by theta around the optical
    axis (mueller.h:179): R(theta) M R(-theta)."""
    R = rotator(theta)
    Rt = jnp.swapaxes(R, -1, -2)
    return R @ M @ Rt


# ---------------------------------------------------------------------------
# polarized Fresnel
# ---------------------------------------------------------------------------


def fresnel_polarized(cos_theta_i, eta_re, eta_im=None):
    """Complex s/p reflection amplitudes at a planar interface
    (fresnel.h:150 real / :227 complex).  Returns
    (a_s, a_p, cos_theta_t, eta_it, eta_ti) where a_s/a_p are complex64
    and, in the conductor case, eta_it/eta_ti are complex too.
    """
    cos_theta_i = jnp.asarray(cos_theta_i, jnp.float32)
    if eta_im is None:
        eta_im = jnp.zeros_like(jnp.asarray(eta_re, jnp.float32))
    eta = jnp.asarray(eta_re, jnp.float32) \
        - 1j * jnp.abs(jnp.asarray(eta_im, jnp.float32)).astype(jnp.complex64)
    eta = eta.astype(jnp.complex64)

    outside = cos_theta_i >= 0.0
    rcp_eta = 1.0 / eta
    eta_it = jnp.where(outside, eta, rcp_eta)
    eta_ti = jnp.where(outside, rcp_eta, eta)

    ct2 = 1.0 - jnp.square(eta_ti) * (1.0 - jnp.square(cos_theta_i))
    ci_abs = jnp.abs(cos_theta_i)
    ct = jnp.sqrt(ct2)
    # sign of the root for TIR phase (Clarke, "Stellar Polarimetry" A.2)
    ct = jnp.where(jnp.imag(ct) > 0.0, jnp.conj(ct), ct)

    a_s = (ci_abs - eta_it * ct) / (ci_abs + eta_it * ct)
    a_p = (eta_it * ci_abs - ct) / (eta_it * ci_abs + ct)

    index_matched = (jnp.abs(eta - 1.0) == 0.0)
    invalid = jnp.abs(eta) == 0.0
    a_s = jnp.where(index_matched | invalid, 0.0, a_s)
    a_p = jnp.where(index_matched | invalid, 0.0, a_p)

    ct_signed = jnp.where(jnp.real(ct2) >= 0.0,
                          -jnp.sign(cos_theta_i) * jnp.real(ct), 0.0)
    return a_s, a_p, ct_signed, eta_it, eta_ti


def specular_reflection(cos_theta_i, eta_re, eta_im=None):
    """Mueller matrix of specular reflection (mueller.h:198)."""
    a_s, a_p, _, _, _ = fresnel_polarized(cos_theta_i, eta_re, eta_im)
    # phase delay delta = arg(a_p) - arg(a_s)
    prod = a_p * jnp.conj(a_s)
    nrm = jnp.abs(prod)
    sin_d = jnp.where(nrm > 0, jnp.imag(prod) / jnp.maximum(nrm, 1e-30), 0.0)
    cos_d = jnp.where(nrm > 0, jnp.real(prod) / jnp.maximum(nrm, 1e-30), 0.0)
    r_s = jnp.square(jnp.abs(a_s))
    r_p = jnp.square(jnp.abs(a_p))
    a = 0.5 * (r_s + r_p)
    b = 0.5 * (r_s - r_p)
    c = jnp.sqrt(jnp.maximum(r_s * r_p, 0.0))
    sin_d = jnp.where(c == 0.0, 0.0, sin_d)
    cos_d = jnp.where(c == 0.0, 0.0, cos_d)
    z = jnp.zeros_like(a)
    return _mm([[a, b, z, z], [b, a, z, z],
                [z, z, c * cos_d, -c * sin_d],
                [z, z, c * sin_d, c * cos_d]], a.shape)


def specular_transmission(cos_theta_i, eta):
    """Mueller matrix of specular transmission through a dielectric
    interface (mueller.h:238); includes the radiance unit conversion
    factor eta_it * cos_theta_t / cos_theta_i."""
    a_s, a_p, ct_t, eta_it, eta_ti = fresnel_polarized(cos_theta_i, eta)
    eta_it_r = jnp.real(eta_it)
    eta_ti_r = jnp.real(eta_ti)
    cos_theta_i = jnp.asarray(cos_theta_i, jnp.float32)
    factor = -eta_it_r * jnp.where(jnp.abs(cos_theta_i) > 1e-8,
                                   ct_t / jnp.where(
                                       jnp.abs(cos_theta_i) > 1e-8,
                                       cos_theta_i, 1.0), 0.0)
    a_s_r = 1.0 + jnp.real(a_s)
    a_p_r = (1.0 + jnp.real(a_p)) * eta_ti_r
    t_s = jnp.square(a_s_r)
    t_p = jnp.square(a_p_r)
    a = 0.5 * factor * (t_s + t_p)
    b = 0.5 * factor * (t_s - t_p)
    c = factor * jnp.sqrt(jnp.maximum(t_s * t_p, 0.0))
    z = jnp.zeros_like(a)
    return _mm([[a, b, z, z], [b, a, z, z], [z, z, c, z], [z, z, z, c]],
               a.shape)


# ---------------------------------------------------------------------------
# Stokes reference frames
# ---------------------------------------------------------------------------


def stokes_basis(forward):
    """Implicit Stokes reference basis of a propagation direction
    (mueller.h:285): first output of coordinate_system."""
    s, _ = m.coordinate_system(forward)
    return s


def unit_angle(a, b):
    """Numerically robust angle between unit vectors (drjit unit_angle)."""
    dot_uv = jnp.sum(a * b, -1)
    temp = 2.0 * jnp.arcsin(jnp.clip(
        0.5 * jnp.linalg.norm(b - jnp.sign(dot_uv)[..., None] * a, axis=-1),
        0.0, 1.0))
    return jnp.where(dot_uv >= 0, temp, jnp.pi - temp)


def rotate_stokes_basis(forward, basis_current, basis_target):
    """Mueller rotator aligning two Stokes bases for the same forward
    direction (mueller.h:315)."""
    theta = unit_angle(m.normalize(basis_current), m.normalize(basis_target))
    sgn = jnp.sum(forward * jnp.cross(basis_current, basis_target), -1)
    theta = jnp.where(sgn < 0.0, -theta, theta)
    return rotator(theta)


def rotate_mueller_basis(M, in_forward, in_basis_current, in_basis_target,
                         out_forward, out_basis_current, out_basis_target):
    """Re-express M in new input/output Stokes frames (mueller.h:377):
    R_out M R_in^T."""
    R_in = rotate_stokes_basis(in_forward, in_basis_current, in_basis_target)
    R_out = rotate_stokes_basis(out_forward, out_basis_current,
                                out_basis_target)
    return R_out @ M @ jnp.swapaxes(R_in, -1, -2)


def rotate_mueller_basis_collinear(M, forward, basis_current, basis_target):
    """mueller.h:401: same rotation applied to both frames."""
    R = rotate_stokes_basis(forward, basis_current, basis_target)
    return R @ M @ jnp.swapaxes(R, -1, -2)
