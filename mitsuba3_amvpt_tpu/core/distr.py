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


@struct.dataclass
class Marginal2D:
    """2D warp over a (H, W) luminance table.

    Replaces Hierarchical2D<0> used by the envmap emitter
    (src/emitters/envmap.cpp:103).  Sampling: pick row from the marginal
    CDF, then column from the row's conditional CDF, with bilinear
    re-uniformization inside the texel.  pdf() matches sample() exactly.
    """

    cond_cdf: jnp.ndarray   # (H, W) per-row inclusive cumsum of weights
    marg_cdf: jnp.ndarray   # (H,) inclusive cumsum of row sums
    data: jnp.ndarray       # (H, W) weights

    @staticmethod
    def from_data(data) -> "Marginal2D":
        data = jnp.asarray(data, jnp.float32)
        cond = jnp.cumsum(data, axis=1)
        marg = jnp.cumsum(cond[:, -1])
        return Marginal2D(cond_cdf=cond, marg_cdf=marg, data=data)

    @property
    def shape(self):
        return self.data.shape

    def sample(self, u2):
        """u2 (..., 2) in [0,1)^2 -> (uv (..., 2) in [0,1)^2, pdf).

        pdf is w.r.t. the unit square.
        """
        H, W = self.data.shape
        total = self.marg_cdf[-1]
        # row
        xr = u2[..., 1] * total
        row = jnp.clip(jnp.searchsorted(self.marg_cdf, xr, side="right"), 0, H - 1)
        row_lo = jnp.where(row > 0, self.marg_cdf[jnp.maximum(row - 1, 0)], 0.0)
        row_w = self.marg_cdf[row] - row_lo
        ur = jnp.clip(m.safe_div(xr - row_lo, row_w), 0.0, 1.0 - 1e-7)
        # column within row
        cond = self.cond_cdf[row]                       # (..., W)
        xc = u2[..., 0] * cond[..., -1]
        col = jnp.clip(
            jnp.sum((cond < xc[..., None]).astype(jnp.int32), axis=-1), 0, W - 1)
        col_lo = jnp.where(col > 0,
                           jnp.take_along_axis(cond, jnp.maximum(col - 1, 0)[..., None], -1)[..., 0],
                           0.0)
        col_hi = jnp.take_along_axis(cond, col[..., None], -1)[..., 0]
        col_w = col_hi - col_lo
        uc = jnp.clip(m.safe_div(xc - col_lo, col_w), 0.0, 1.0 - 1e-7)

        uv = jnp.stack([(col + uc) / W, (row + ur) / H], axis=-1)
        w = self.data[row, col]
        pdf = m.safe_div(w, total) * (H * W)
        return uv, pdf

    def pdf(self, uv):
        H, W = self.data.shape
        col = jnp.clip((uv[..., 0] * W).astype(jnp.int32), 0, W - 1)
        row = jnp.clip((uv[..., 1] * H).astype(jnp.int32), 0, H - 1)
        total = self.marg_cdf[-1]
        return m.safe_div(self.data[row, col], total) * (H * W)
