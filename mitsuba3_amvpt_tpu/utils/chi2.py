"""Chi-square goodness-of-fit harness for sampling routines.

Port of the reference's src/python/python/chi2.py (ChiSquareTest:5):
draw ~1e6 samples from a (warp / BSDF / emitter / phase) sampling
routine, histogram them over the sphere, integrate the analytic pdf
over the same bins on a finer sub-grid, and run a chi-square test at 1%
significance with low-expected-count cell pooling (chi2.py:239-322).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import math as m


class SphericalDomain:
    """Maps directions <-> (phi, cos_theta) unit rectangle (chi2.py:371)."""

    def bounds(self):
        return np.array([[-np.pi, np.pi], [-1.0, 1.0]])

    def map_backward(self, d):
        """direction (N,3) -> (phi, cos_theta)."""
        d = np.asarray(d)
        phi = np.arctan2(d[..., 1], d[..., 0])
        return np.stack([phi, d[..., 2]], -1)

    def map_forward(self, p):
        phi, ct = p[..., 0], p[..., 1]
        st = np.sqrt(np.maximum(1 - ct * ct, 0))
        return np.stack([st * np.cos(phi), st * np.sin(phi), ct], -1)

    def aspect(self):
        return 2


class PlanarDomain:
    """2D square/disk domain (chi2.py:399)."""

    def __init__(self, bounds=None):
        self._bounds = np.array([[-1.0, 1.0], [-1.0, 1.0]]) \
            if bounds is None else np.asarray(bounds)

    def bounds(self):
        return self._bounds

    def map_backward(self, p):
        return np.asarray(p)

    def map_forward(self, p):
        return np.asarray(p)

    def aspect(self):
        b = self._bounds
        return (b[0, 1] - b[0, 0]) / (b[1, 1] - b[1, 0])


class ChiSquareTest:
    """chi2.py:5 ChiSquareTest.

    sample_func: (N,2)[ + (N,1)] uniforms -> points in the domain
    pdf_func: domain points -> density (w.r.t. the domain measure:
      for SphericalDomain that's solid angle — the (phi, cos_theta)
      parametrization has unit Jacobian).
    """

    def __init__(self, domain, sample_func, pdf_func, sample_dim: int = 2,
                 sample_count: int = 1000_000, res: int = 101, ires: int = 8,
                 seed: int = 0):
        self.domain = domain
        self.sample_func = sample_func
        self.pdf_func = pdf_func
        self.sample_dim = sample_dim
        self.sample_count = int(sample_count)
        self.res = np.array([res, res * domain.aspect()], int)
        self.ires = ires
        self.seed = seed
        self.messages = []

    def tabulate_histogram(self):
        rng = np.random.default_rng(self.seed)
        u = jnp.asarray(rng.random((self.sample_count, self.sample_dim),
                                   np.float32))
        pts = np.asarray(self.sample_func(u))
        p = self.domain.map_backward(pts)
        b = self.domain.bounds()
        eps = 1e-6
        x = (p[..., 0] - b[0, 0]) / (b[0, 1] - b[0, 0])
        y = (p[..., 1] - b[1, 0]) / (b[1, 1] - b[1, 0])
        ok = (x >= -eps) & (x <= 1 + eps) & (y >= -eps) & (y <= 1 + eps) \
            & np.isfinite(x) & np.isfinite(y)
        xi = np.clip((x * self.res[1]).astype(int), 0, self.res[1] - 1)
        yi = np.clip((y * self.res[0]).astype(int), 0, self.res[0] - 1)
        hist = np.zeros(self.res, np.float64)
        np.add.at(hist, (yi[ok], xi[ok]), 1.0)
        self.histogram = hist
        return hist

    def tabulate_pdf(self):
        """Integrate the pdf over each bin with a composite
        Gauss-Legendre rule: ires/2 sub-cells x 2-point GL per axis
        (same ires-point budget as the reference's trapezoid sub-grid,
        chi2.py:175).  Composite low-order GL is the right rule here:
        degree-3 exact on smooth regions (sharply peaked low-alpha
        microfacet lobes) while keeping the error of an in-bin pdf
        DISCONTINUITY (critical-angle cutoffs) confined to one
        quarter-width sub-cell — a single high-order rule rings on
        those edges."""
        from ..core.quad import gauss_legendre
        b = self.domain.bounds()
        ry, rx = self.res
        nsub = max(self.ires // 2, 1)
        g2x, g2w = gauss_legendre(2)
        # sub-cell j of [-1,1] has center (2j+1)/nsub - 1, width 2/nsub
        gx = ((np.arange(nsub)[:, None] * 2 + 1 + g2x[None, :])
              / nsub - 1.0).ravel()
        gw = np.tile(g2w / nsub, nsub)
        # bin edges and per-bin composite GL nodes in each axis
        def axis_nodes(lo, hi, r):
            edges = np.linspace(lo, hi, r + 1)
            h = (hi - lo) / r
            mid = 0.5 * (edges[:-1] + edges[1:])
            pts = mid[:, None] + 0.5 * h * gx[None, :]    # (r, n_pts)
            return pts, 0.5 * h * gw                      # weights

        xpts, xw = axis_nodes(b[0, 0], b[0, 1], rx)
        ypts, yw = axis_nodes(b[1, 0], b[1, 1], ry)
        X = np.broadcast_to(xpts[None, None, :, :],
                            (ry, self.ires, rx, self.ires))
        Y = np.broadcast_to(ypts[:, :, None, None],
                            (ry, self.ires, rx, self.ires))
        pts2 = np.stack([X.ravel(), Y.ravel()], -1)
        d = self.domain.map_forward(pts2)
        pdf = np.asarray(self.pdf_func(jnp.asarray(d, jnp.float32)))
        pdf = pdf.reshape(ry, self.ires, rx, self.ires).astype(np.float64)
        pdf = np.einsum("yjxi,j,i->yx", pdf, yw, xw)
        self.pdf = pdf * self.sample_count
        return self.pdf

    def run(self, significance_level: float = 0.01,
            test_count: int = 1) -> bool:
        """Pooled Pearson chi^2 vs the analytic pdf (chi2.py:239-322).

        ``test_count`` applies the Sidak correction when several
        hypothesis tests run in sequence (chi2.py:302-306)."""
        hist = self.tabulate_histogram()
        pdf = self.tabulate_pdf()
        # samples landing in zero-expectation cells reject immediately
        # (chi2.py:278-281)
        if np.any((pdf == 0) & (hist != 0)):
            self.messages.append("samples in zero-expectation cells")
            return False
        # sort cells by expected count; pool cells with expectation < 5
        flat_h = hist.ravel()
        flat_p = pdf.ravel()
        order = np.argsort(flat_p)
        flat_h = flat_h[order]
        flat_p = flat_p[order]
        pooled_h = []
        pooled_p = []
        accum_h = accum_p = 0.0
        for h, p in zip(flat_h, flat_p):
            accum_h += h
            accum_p += p
            if accum_p >= 5.0:
                pooled_h.append(accum_h)
                pooled_p.append(accum_p)
                accum_h = accum_p = 0.0
        if accum_p > 0 and pooled_p:
            pooled_h[-1] += accum_h
            pooled_p[-1] += accum_p
        pooled_h = np.asarray(pooled_h)
        pooled_p = np.asarray(pooled_p)
        if len(pooled_p) < 2:
            self.messages.append("chi2: insufficient cells")
            return False
        stat = float(np.sum((pooled_h - pooled_p) ** 2 / pooled_p))
        dof = len(pooled_p) - 1
        from scipy.stats import chi2 as chi2_dist
        p_value = float(chi2_dist.sf(stat, dof))
        self.p_value = p_value
        self.messages.append(
            f"chi2 stat={stat:.2f} dof={dof} p={p_value:.4f}")
        # total mass sanity: sampler mass vs pdf mass
        mass_ratio = hist.sum() / max(pdf.sum(), 1e-12)
        if not (0.97 < mass_ratio < 1.03):
            self.messages.append(f"mass mismatch: {mass_ratio:.4f}")
            return False
        significance_level = 1.0 - (1.0 - significance_level) \
            ** (1.0 / max(test_count, 1))
        return p_value > significance_level
