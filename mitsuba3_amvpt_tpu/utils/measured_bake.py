"""Bake analytic BRDFs into the RGL measured-BSDF tensor format.

The inverse of what src/bsdfs/measured.cpp consumes: given a microfacet
model, produce ``ndf / sigma / vndf / luminance / spectra`` tables in
the Dupuy & Jakob adaptive parameterization.  Used by the test suite to
validate the measured plugin against a closed-form ground truth (the
role resources/data plays for the reference), and usable as a data tool.
"""

from __future__ import annotations

import numpy as np

_PI = float(np.pi)


def _ggx_ndf_exact(ct, alpha):
    """GGX D(theta_m), isotropic."""
    ct = np.maximum(ct, 1e-7)
    a2 = alpha * alpha
    denom = ct * ct * (a2 - 1.0) + 1.0
    return a2 / (_PI * denom * denom)


def _ggx_lambda(ct, alpha):
    ct = np.clip(ct, 1e-6, 1.0)
    st = np.sqrt(np.maximum(1 - ct * ct, 0.0))
    t = st / ct
    return 0.5 * (np.sqrt(1.0 + (alpha * t) ** 2) - 1.0)


def _ggx_g1(ct, alpha):
    return 1.0 / (1.0 + _ggx_lambda(ct, alpha))


def _fresnel_conductor(ct, eta, k):
    ct = np.clip(ct, 0.0, 1.0)[..., None]
    c2 = ct * ct
    s2 = 1 - c2
    e2 = eta * eta - k * k
    ek = 2 * eta * k
    t0 = e2 - s2
    a2b2 = np.sqrt(np.maximum(t0 * t0 + ek * ek, 0.0))
    t1 = a2b2 + c2
    a = np.sqrt(np.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2 * a * ct
    Rs = (t1 - t2) / np.maximum(t1 + t2, 1e-12)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    Rp = Rs * (t3 - t4) / np.maximum(t3 + t4, 1e-12)
    return 0.5 * (Rs + Rp)


def bake_ggx_conductor(path: str, alpha: float = 0.3,
                       eta=(0.2, 0.92, 1.1), k=(3.9, 2.45, 2.14),
                       n_theta_i: int = 32, res: int = 64):
    """Write a .bsdf tensor file of an isotropic GGX conductor.

    Derivation: f*cos_o = F(wi.m) D(m) G1(wi) G1(wo) / (4 cos_i)
    = spec(u) * D / (4 sigma) with sigma = cos_i / G1(wi), hence
    spec = F * G1(wo) evaluated at the VNDF-warp input coordinates
    (measured.cpp sample/eval relation with luminance == 1).
    """
    from ..loader.tensor_file import write_tensor_file

    eta = np.asarray(eta, np.float32)
    k = np.asarray(k, np.float32)
    theta_i = np.linspace(0.0, _PI / 2 * 0.995, n_theta_i).astype(
        np.float32)
    phi_i = np.array([-_PI, _PI], np.float32)

    # --- NDF / sigma over u coordinates -----------------------------------
    u_t = np.linspace(0, 1, res)
    th_m = (u_t ** 2) * (_PI / 2)
    ndf_row = _ggx_ndf_exact(np.cos(th_m), alpha)           # (res,)
    ndf = np.tile(ndf_row, (res, 1)).astype(np.float32)     # (phi, theta)
    sigma_row = np.cos(theta_i) / _ggx_g1(np.cos(theta_i), alpha)
    # sigma table is indexed by u_wi = (theta2u(theta_i), phi2u(phi_i))
    u_sig = np.linspace(0, 1, res)
    th_sig = (u_sig ** 2) * (_PI / 2)
    sig_row = np.cos(th_sig) / _ggx_g1(np.cos(th_sig), alpha)
    sigma = np.tile(sig_row, (res, 1)).astype(np.float32)

    # --- VNDF in u space per theta_i ---------------------------------------
    # D_wi(m) * |dm/du|, u = (theta2u, phi2u); |dm/du| = 2 pi^2 u_t sin(th)
    H = W = res
    u_tm = np.linspace(0, 1, W)
    u_pm = np.linspace(0, 1, H)
    th_g = (u_tm ** 2) * (_PI / 2)                   # (W,)
    ph_g = (2 * u_pm - 1) * _PI                      # (H,)
    st_g, ct_g = np.sin(th_g), np.cos(th_g)
    m_dirs = np.stack([np.cos(ph_g)[:, None] * st_g[None, :],
                       np.sin(ph_g)[:, None] * st_g[None, :],
                       np.tile(ct_g, (H, 1))], -1)   # (H, W, 3)
    D_m = _ggx_ndf_exact(ct_g, alpha)                # (W,)
    jac_u = 2 * _PI ** 2 * u_tm * st_g               # (W,)

    vndf = np.zeros((2, n_theta_i, H, W), np.float32)
    for it, ti in enumerate(theta_i):
        wi = np.array([np.sin(ti), 0.0, np.cos(ti)])
        cos_wi_m = m_dirs @ wi                       # (H, W)
        vis = np.maximum(cos_wi_m, 0.0) * D_m[None, :]
        vndf[:, it] = (vis * jac_u[None, :]).astype(np.float32)[None]

    luminance = np.ones((2, n_theta_i, H, W), np.float32)

    # --- spectra: F * G1(wo) at the vndf-warp INPUT coordinates ------------
    from ..core.marginal import MarginalContinuous2D
    import jax.numpy as jnp
    warp = MarginalContinuous2D.build(
        vndf, (phi_i, theta_i))
    su = np.stack(np.meshgrid(np.linspace(0.005, 0.995, W),
                              np.linspace(0.005, 0.995, H),
                              indexing="xy"), -1).reshape(-1, 2)
    spectra = np.zeros((2, n_theta_i, 3, H, W), np.float32)
    for it, ti in enumerate(theta_i):
        wi = np.array([np.sin(ti), 0.0, np.cos(ti)])
        params = [jnp.full((su.shape[0],), 0.0),
                  jnp.full((su.shape[0],), float(ti))]
        u_m, _ = warp.sample(jnp.asarray(su, jnp.float32), params)
        u_m = np.asarray(u_m)
        th = (u_m[:, 0] ** 2) * (_PI / 2)
        ph = (2 * u_m[:, 1] - 1) * _PI               # iso: relative phi
        mv = np.stack([np.cos(ph) * np.sin(th), np.sin(ph) * np.sin(th),
                       np.cos(th)], -1)
        cos_im = np.maximum(mv @ wi, 0.0)
        wo = 2 * cos_im[:, None] * mv - wi[None, :]
        F = _fresnel_conductor(cos_im, eta, k)       # (N, 3)
        g1o = _ggx_g1(np.clip(wo[:, 2], 0.0, 1.0), alpha)
        val = F * g1o[:, None]
        val = np.where((cos_im > 0)[:, None] & (wo[:, 2:3] > 0), val, 0.0)
        spectra[:, it] = val.reshape(H, W, 3).transpose(
            2, 0, 1).astype(np.float32)[None]

    write_tensor_file(path, {
        "phi_i": phi_i,
        "theta_i": theta_i,
        "ndf": ndf,
        "sigma": sigma,
        "vndf": vndf,
        "luminance": luminance,
        "spectra": spectra,
        "wavelengths": np.array([0.0, 1.0, 2.0], np.float32),
        "jacobian": np.array([1], np.uint8),
        "description": np.frombuffer(b"baked ggx conductor",
                                     dtype=np.uint8),
    })
    return path


def bake_constant_pbsdf(path, m00=(0.2, 0.25, 0.3), dop=0.0,
                        res=(8, 8, 8), wvls=(400, 465, 550, 620, 700)):
    """Synthetic RGL .pbsdf tensor (measured_polarized.cpp layout:
    M[phi_d, theta_d, theta_h, wvls, 4, 4]) for tests.

    M00 is constant per wavelength band (piecewise-linear across the
    5 bands through the RGB anchor values at 620/550/465 nm); ``dop``
    adds a horizontal-linear-polarizer component of that degree in the
    reflection-plane basis.
    """
    import numpy as np

    from ..loader.tensor_file import write_tensor_file

    P, T, H = res
    wvls = np.asarray(wvls, np.float64)
    # map wavelength -> rgb anchor interpolation
    anchors_wl = np.array([465.0, 550.0, 620.0])
    anchors_v = np.array([m00[2], m00[1], m00[0]])
    m00_wl = np.interp(wvls, anchors_wl, anchors_v)

    M = np.zeros((P, T, H, len(wvls), 4, 4), np.float32)
    for iw, v in enumerate(m00_wl):
        M[..., iw, 0, 0] = v
        M[..., iw, 0, 1] = v * dop
        M[..., iw, 1, 0] = v * dop
        M[..., iw, 1, 1] = v * dop
    write_tensor_file(path, {
        "phi_d": np.linspace(-np.pi, np.pi, P,
                             dtype=np.float32).reshape(1, -1),
        "theta_d": np.linspace(0, np.pi / 2, T,
                               dtype=np.float32).reshape(1, -1),
        "theta_h": np.linspace(0, np.pi / 2, H,
                               dtype=np.float32).reshape(1, -1),
        "wvls": wvls.astype(np.uint16),
        "M": M,
        "description": np.frombuffer(b"constant pbsdf", dtype=np.uint8),
    })
    return path
