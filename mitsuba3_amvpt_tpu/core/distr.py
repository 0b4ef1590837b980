"""1D / 2D sampling distributions (CDF tables + searchsorted).

Replaces include/mitsuba/core/distr_1d.h (DiscreteDistribution,
ContinuousDistribution) and the Marginal2D warp from distr_2d.h used by
the environment emitter.  The reference's Hierarchical2D mip-warp is
replaced by a row-marginal + conditional-CDF scheme: identical pdf and
unbiasedness, simpler gathers, and `searchsorted` maps well to XLA.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from . import math as m


@struct.dataclass
class DiscreteDistribution:
    """Discrete distribution over weights (distr_1d.h DiscreteDistribution)."""

    cdf: jnp.ndarray       # (N,) inclusive cumulative weights
    total: jnp.ndarray     # scalar sum of weights

    @staticmethod
    def from_pmf(pmf) -> "DiscreteDistribution":
        pmf = jnp.asarray(pmf)
        cdf = jnp.cumsum(pmf)
        return DiscreteDistribution(cdf=cdf, total=cdf[-1])

    @property
    def n(self):
        return self.cdf.shape[0]

    def pmf_normalized(self, index):
        prev = jnp.where(index > 0, self.cdf[jnp.maximum(index - 1, 0)], 0.0)
        return m.safe_div(self.cdf[index] - prev, self.total)

    def sample(self, u):
        """u in [0,1) -> index."""
        x = u * self.total
        return jnp.clip(jnp.searchsorted(self.cdf, x, side="right"), 0, self.n - 1)

    def sample_reuse(self, u):
        """Sample an index and re-uniformize u (distr_1d.h sample_reuse;
        used by Scene::sample_emitter_direction scene.cpp:234)."""
        x = u * self.total
        idx = jnp.clip(jnp.searchsorted(self.cdf, x, side="right"), 0, self.n - 1)
        lo = jnp.where(idx > 0, self.cdf[jnp.maximum(idx - 1, 0)], 0.0)
        w = self.cdf[idx] - lo
        u_re = m.safe_div(x - lo, w)
        return idx, jnp.clip(u_re, 0.0, 1.0 - 1e-7)


@struct.dataclass
class ContinuousDistribution:
    """Piecewise-linear continuous distribution over [a, b]
    (distr_1d.h ContinuousDistribution) — used by irregular/regular
    spectra and the specfilm."""

    nodes: jnp.ndarray   # (N,) x positions
    pdf: jnp.ndarray     # (N,) unnormalized density at nodes
    cdf: jnp.ndarray     # (N,) integral up to node i (cdf[0] = 0)
    total: jnp.ndarray   # integral over the domain

    @staticmethod
    def from_pdf(nodes, pdf) -> "ContinuousDistribution":
        nodes = jnp.asarray(nodes, jnp.float32)
        pdf = jnp.asarray(pdf, jnp.float32)
        dx = nodes[1:] - nodes[:-1]
        seg = 0.5 * (pdf[1:] + pdf[:-1]) * dx
        cdf = jnp.concatenate([jnp.zeros((1,), pdf.dtype), jnp.cumsum(seg)])
        return ContinuousDistribution(nodes=nodes, pdf=pdf, cdf=cdf, total=cdf[-1])

    def eval_pdf_normalized(self, x):
        i = jnp.clip(jnp.searchsorted(self.nodes, x, side="right") - 1, 0, self.nodes.shape[0] - 2)
        x0, x1 = self.nodes[i], self.nodes[i + 1]
        t = m.safe_div(x - x0, x1 - x0)
        p = m.lerp(self.pdf[i], self.pdf[i + 1], t)
        inside = (x >= self.nodes[0]) & (x <= self.nodes[-1])
        return jnp.where(inside, m.safe_div(p, self.total), 0.0)

    def sample(self, u):
        """Returns (x, pdf_normalized)."""
        x = u * self.total
        i = jnp.clip(jnp.searchsorted(self.cdf, x, side="right") - 1, 0, self.nodes.shape[0] - 2)
        x0, x1 = self.nodes[i], self.nodes[i + 1]
        p0, p1 = self.pdf[i], self.pdf[i + 1]
        dx = x1 - x0
        rem = x - self.cdf[i]
        # solve 0.5*(p0 + p(t))*t*dx = rem for t in [0,1], p(t)=lerp
        a = 0.5 * (p1 - p0) * dx
        b = p0 * dx
        disc = m.safe_sqrt(b * b + 4.0 * a * rem)
        t = jnp.where(jnp.abs(a) > 1e-12 * jnp.abs(b) + 1e-20,
                      m.safe_div(2.0 * rem, b + disc),
                      m.safe_div(rem, b))
        t = jnp.clip(t, 0.0, 1.0)
        xs = x0 + t * dx
        pdf = m.safe_div(m.lerp(p0, p1, t), self.total)
        return xs, pdf


def _invert_linear_cdf(a, b, target):
    """Solve fx in [0,1]: a*fx + (b-a)*fx^2/2 == target for a linear
    density segment from a to b (distr_2d.h sample_continuous quadratic
    inversion).  Falls back to the linear solution for a ~= b."""
    d = b - a
    lin = m.safe_div(target, jnp.maximum(a, 1e-20))
    disc = jnp.maximum(a * a + 2.0 * d * target, 0.0)
    quad = m.safe_div(jnp.sqrt(disc) - a, d)
    fx = jnp.where(jnp.abs(d) > 1e-7 * jnp.maximum(a + b, 1e-20),
                   quad, lin)
    return jnp.clip(fx, 0.0, 1.0)


@struct.dataclass
class Marginal2D:
    """Continuous bilinear 2D warp over a (H, W) node grid.

    Replaces Hierarchical2D<0> used by the envmap emitter
    (src/emitters/envmap.cpp:103,233; include/mitsuba/core/distr_2d.h:49):
    the table entries are *node* values of a bilinear interpolant on
    [0,1]^2, the sampled density is exactly that interpolant (continuous
    pdf — gradients of env radiance flow through a smooth density, and
    chi2 tests bin against the same bilinear pdf), and ``pdf()`` matches
    ``sample()`` analytically.  Sampling inverts the piecewise-quadratic
    marginal/conditional CDFs; the conditional inversion is a masked
    binary search over the per-row segment-integral cumsums lerped
    between the two bracketing rows (the interpolated conditional CDF of
    a bilinear density IS the lerp of the row CDFs), log2(W) two-gather
    steps — the TPU analog of Hierarchical2D's mip descent.
    """

    node: jnp.ndarray       # (H, W) node values
    cond_cdf: jnp.ndarray   # (H, W-1) per-row cumsum of x-seg integrals
    marg_cdf: jnp.ndarray   # (H-1,) cumsum of y-seg integrals
    _n_steps: int = struct.field(pytree_node=False, default=0)

    @staticmethod
    def from_data(data) -> "Marginal2D":
        data = jnp.asarray(data, jnp.float32)
        if data.shape[0] < 2:
            data = jnp.broadcast_to(data, (2,) + data.shape[1:])
        if data.shape[1] < 2:
            data = jnp.broadcast_to(data.reshape(data.shape[0], 1),
                                    (data.shape[0], 2))
        segx = 0.5 * (data[:, :-1] + data[:, 1:])     # (H, W-1)
        cond = jnp.cumsum(segx, axis=1)
        r = cond[:, -1]                                # row integrals
        marg = jnp.cumsum(0.5 * (r[:-1] + r[1:]))
        n_steps = max(int(data.shape[1] - 1).bit_length(), 1)
        return Marginal2D(node=data, cond_cdf=cond, marg_cdf=marg,
                          _n_steps=n_steps)

    @property
    def shape(self):
        return self.node.shape

    @property
    def total(self):
        """Integral of the interpolant in node-index space."""
        return self.marg_cdf[-1]

    def _row_integral(self, j):
        return self.cond_cdf[j, -1]

    def sample(self, u2):
        """u2 (..., 2) in [0,1)^2 -> (uv in [0,1)^2, pdf w.r.t. uv)."""
        H, W = self.node.shape
        total = self.marg_cdf[-1]
        # ---- marginal row: piecewise-quadratic CDF inversion over y
        xr = u2[..., 1] * total
        j = jnp.clip(jnp.searchsorted(self.marg_cdf, xr, side="right"),
                     0, H - 2)
        lo = jnp.where(j > 0, self.marg_cdf[jnp.maximum(j - 1, 0)], 0.0)
        r0 = self._row_integral(j)
        r1 = self._row_integral(j + 1)
        fy = _invert_linear_cdf(r0, r1, xr - lo)
        r_fy = m.lerp(r0, r1, fy)

        # ---- conditional column: binary search on the lerped row CDFs
        xc = u2[..., 0] * r_fy
        cc = self.cond_cdf.reshape(-1)
        base0 = j * (W - 1)
        base1 = (j + 1) * (W - 1)

        def cdf_at(k):
            """Lerped conditional CDF up to node k+1 (k in [0, W-2])."""
            return m.lerp(cc[base0 + k], cc[base1 + k], fy)

        k = jnp.zeros_like(j)
        step = 1 << (self._n_steps - 1)
        for _ in range(self._n_steps):
            probe = k + step
            ok = (probe <= W - 2) & (cdf_at(probe - 1) < xc)
            k = jnp.where(ok, probe, k)
            step >>= 1
        k = jnp.clip(k, 0, W - 2)
        clo = jnp.where(k > 0, cdf_at(jnp.maximum(k - 1, 0)), 0.0)

        nd = self.node
        a = m.lerp(nd[j, k], nd[j + 1, k], fy)
        b = m.lerp(nd[j, k + 1], nd[j + 1, k + 1], fy)
        fx = _invert_linear_cdf(a, b, xc - clo)

        uv = jnp.stack([(k + fx) / (W - 1), (j + fy) / (H - 1)], axis=-1)
        dens = m.lerp(a, b, fx)
        pdf = m.safe_div(dens, total) * ((W - 1) * (H - 1))
        return jnp.clip(uv, 0.0, 1.0 - 1e-7), pdf

    def eval(self, uv):
        """Bilinear interpolant at uv (unnormalized node units)."""
        H, W = self.node.shape
        x = jnp.clip(uv[..., 0], 0.0, 1.0) * (W - 1)
        y = jnp.clip(uv[..., 1], 0.0, 1.0) * (H - 1)
        k = jnp.clip(x.astype(jnp.int32), 0, W - 2)
        j = jnp.clip(y.astype(jnp.int32), 0, H - 2)
        fx = x - k
        fy = y - j
        nd = self.node
        return m.lerp(m.lerp(nd[j, k], nd[j, k + 1], fx),
                      m.lerp(nd[j + 1, k], nd[j + 1, k + 1], fx), fy)

    def pdf(self, uv):
        H, W = self.node.shape
        return m.safe_div(self.eval(uv), self.marg_cdf[-1]) \
            * ((W - 1) * (H - 1))
