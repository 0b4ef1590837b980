"""Parameterized continuous Marginal2D warp (core/distr_2d.h:837-1466,
``Marginal2D<Float, Dimension, Continuous=true>``) — the sampling
machinery behind the RGL measured-BSDF format (src/bsdfs/measured.cpp).

The density is piecewise-bilinear on an (H, W) grid over [0,1]^2 and may
additionally depend on up to three conditional parameters (phi_i,
theta_i, wavelength); parameter lookups blend the 2^D surrounding data
slices linearly, exactly like ``Distribution2D::interpolate_weights``
(distr_2d.h:250-288).

TPU mapping: all tables live as (S, ...) device arrays (S = product of
parameter resolutions); binary searches run as static log2(H)-step
gather loops per lane, and every fetch is a 2^D-corner blended gather —
the same memory pattern the reference hits through dr::gather.
"""

from __future__ import annotations

import math as _pymath

import jax.numpy as jnp
import numpy as np
from flax import struct

from . import math as m


def _find_interval(values, x):
    """math::find_interval: largest index i in [0, n-2] such that
    values[i] <= x (values: (n,) sorted; x: (N,))."""
    n = values.shape[0]
    i = jnp.searchsorted(values, x, side="right") - 1
    return jnp.clip(i, 0, max(n - 2, 0))


@struct.dataclass
class MarginalContinuous2D:
    """Up-to-3-parameter continuous marginal warp."""

    data: jnp.ndarray        # (S, H, W) density values (normalization baked)
    marg_cdf: jnp.ndarray    # (S, H-1)
    cond_cdf: jnp.ndarray    # (S, H, W-1)
    param_values: tuple      # tuple of (Pk,) arrays (pytree leaves)
    param_strides: tuple = struct.field(pytree_node=False, default=())
    normalized: bool = struct.field(pytree_node=False, default=True)
    sampling: bool = struct.field(pytree_node=False, default=True)

    # -- construction (host side, numpy) ------------------------------------

    @staticmethod
    def build(data, param_values=(), normalize=True,
              enable_sampling=True) -> "MarginalContinuous2D":
        """``Marginal2D`` ctor (distr_2d.h:871-994, Continuous branch).

        data: (*param_res, H, W) array; param_values: per-dim node
        positions (lengths must match param_res).
        """
        data = np.asarray(data, np.float64)
        pv = [np.asarray(p, np.float32).reshape(-1) for p in param_values]
        pres = tuple(len(p) for p in pv)
        assert data.shape[:len(pres)] == pres, (data.shape, pres)
        H, W = data.shape[len(pres):]
        S = int(np.prod(pres)) if pres else 1
        d = data.reshape(S, H, W)

        scale_x = 0.5 / (W - 1)
        scale_y = 0.5 / (H - 1)
        # conditional CDF per row: integral of the linear interpolant
        cond = np.cumsum(scale_x * (d[:, :, :-1] + d[:, :, 1:]), axis=2)
        cond_sum = cond[:, :, -1]                       # (S, H)
        marg = np.cumsum(scale_y * (cond_sum[:, :-1] + cond_sum[:, 1:]),
                         axis=1)                        # (S, H-1)
        if normalize:
            norm = 1.0 / np.maximum(marg[:, -1:], 1e-30)  # (S, 1)
            d = d * norm[:, :, None]
            cond = cond * norm[:, :, None]
            marg = marg * norm
        # param slice strides (distr_2d.h:229-247): last dim fastest
        strides = []
        stride = 1
        for k in range(len(pres) - 1, -1, -1):
            strides.insert(0, stride if pres[k] > 1 else 0)
            stride *= pres[k]
        return MarginalContinuous2D(
            data=jnp.asarray(d, jnp.float32),
            marg_cdf=jnp.asarray(marg, jnp.float32),
            cond_cdf=jnp.asarray(cond, jnp.float32),
            param_values=tuple(jnp.asarray(p) for p in pv),
            param_strides=tuple(strides),
            normalized=normalize, sampling=enable_sampling)

    # -- parameter interpolation ---------------------------------------------

    @property
    def size(self):
        return self.data.shape[2], self.data.shape[1]    # (W, H)

    def _weights(self, params):
        """interpolate_weights (distr_2d.h:250): returns (slice_offset
        (N,), [(w0, w1), ...]) per dim."""
        if not self.param_values:
            return None, []
        slice_offset = 0
        wts = []
        for dim, pv in enumerate(self.param_values):
            if pv.shape[0] == 1:
                wts.append((1.0, 0.0))
                continue
            x = params[dim]
            i = _find_interval(pv, x)
            p0, p1 = pv[i], pv[i + 1]
            w1 = jnp.clip(m.safe_div(x - p0, p1 - p0), 0.0, 1.0)
            wts.append((1.0 - w1, w1))
            slice_offset = slice_offset + self.param_strides[dim] * i
        if isinstance(slice_offset, int):
            slice_offset = jnp.zeros(params[0].shape, jnp.int32)
        return slice_offset.astype(jnp.int32), wts

    def _lookup(self, table, sid, wts, *idx):
        """2^D-corner blended gather (distr_2d.h ``lookup``): table
        (S, ...), sid (N,), idx per trailing axis (N,)."""
        if sid is None:
            return table[0][tuple(idx)]
        out = 0.0
        D = len(wts)
        for corner in range(1 << D):
            w = 1.0
            off = sid
            for dim in range(D):
                bit = (corner >> dim) & 1
                wd = wts[dim][bit]
                if isinstance(wd, float) and wd == 0.0:
                    w = None
                    break
                w = w * wd
                if bit:
                    off = off + self.param_strides[dim]
            if w is None:
                continue
            out = out + w * table[(off,) + tuple(idx)]
        return out

    # -- eval / sample / invert ----------------------------------------------

    def eval(self, pos, params=()):
        """Bilinear density at pos (N, 2) in [0,1]^2 (distr_2d.h:1022)."""
        W, H = self.size
        sid, wts = self._weights(params)
        p = jnp.clip(pos, 0.0, 1.0) * jnp.asarray(
            [W - 1, H - 1], jnp.float32)
        ix = jnp.minimum(p[..., 0].astype(jnp.int32), W - 2)
        iy = jnp.minimum(p[..., 1].astype(jnp.int32), H - 2)
        fx = p[..., 0] - ix
        fy = p[..., 1] - iy
        v00 = self._lookup(self.data, sid, wts, iy, ix)
        v10 = self._lookup(self.data, sid, wts, iy, ix + 1)
        v01 = self._lookup(self.data, sid, wts, iy + 1, ix)
        v11 = self._lookup(self.data, sid, wts, iy + 1, ix + 1)
        return (v00 * (1 - fx) + v10 * fx) * (1 - fy) \
            + (v01 * (1 - fx) + v11 * fx) * fy

    def _bsearch(self, n, shape, pred):
        """dr::binary_search(0, n-1, pred): smallest i in [0, n-1] with
        pred(i) False (pred: monotone (N,) bool fetches); static
        log2(n)-step loop."""
        lo = jnp.zeros(shape, jnp.int32)
        hi = jnp.full(shape, n - 1, jnp.int32)
        steps = max(int(_pymath.ceil(_pymath.log2(max(n, 2)))) + 1, 1)
        for _ in range(steps):
            mid = (lo + hi) // 2
            take = pred(mid)
            lo = jnp.where(take, jnp.minimum(mid + 1, n - 1), lo)
            hi = jnp.where(take, hi, mid)
        return lo

    def _sample_segment(self, u, inv_width, v0, v1):
        """distr_2d.h:1432 sample_segment (quadratic inversion of the
        linear-density segment)."""
        non_const = jnp.abs(v0 - v1) > 1e-4 * (v0 + v1)
        divisor = jnp.where(non_const, v0 - v1, v0 + v1)
        u = u * 2.0 * inv_width
        u_nc = v0 - m.safe_sqrt(v0 * v0 + u * (v1 - v0))
        u = jnp.where(non_const, u_nc, u)
        u = jnp.where(divisor != 0.0, m.safe_div(u, divisor), u)
        return u

    def _invert_segment(self, u, width, v0, v1):
        return u * (v0 + (v1 - v0) * (0.5 * u)) * width

    def sample(self, u, params=()):
        """Warp uniform u (N, 2) -> (pos (N, 2), pdf) —
        sample_continuous (distr_2d.h:1257)."""
        W, H = self.size
        n_marg = H - 1
        sid, wts = self._weights(params)
        eps = 1e-6
        ux = jnp.clip(u[..., 0], eps, 1.0 - eps)
        uy = jnp.clip(u[..., 1], eps, 1.0 - eps)

        def marg(idx):
            return self._lookup(self.marg_cdf, sid, wts,
                                jnp.clip(idx, 0, n_marg - 1))

        if not self.normalized:
            uy = uy * self._lookup(self.marg_cdf, sid, wts,
                                   jnp.full(ux.shape, n_marg - 1, jnp.int32))

        row = self._bsearch(n_marg, ux.shape, lambda i: marg(i) < uy)
        uy = uy - jnp.where(row > 0, marg(row - 1), 0.0)

        # conditional CDF at x == 1 for rows `row` and `row + 1`
        r0 = self._lookup(self.cond_cdf, sid, wts, row, W - 2)
        r1 = self._lookup(self.cond_cdf, sid, wts, row + 1, W - 2)
        fy = self._sample_segment(uy, float(H - 1), r0, r1)
        ux = ux * (r0 + (r1 - r0) * fy)

        def cond(idx):
            i = jnp.clip(idx, 0, W - 2)
            v0 = self._lookup(self.cond_cdf, sid, wts, row, i)
            v1 = self._lookup(self.cond_cdf, sid, wts, row + 1, i)
            return v0 + (v1 - v0) * fy

        col = self._bsearch(W - 1, ux.shape, lambda i: cond(i) < ux)
        ux = ux - jnp.where(col > 0, cond(col - 1), 0.0)

        v00 = self._lookup(self.data, sid, wts, row, col)
        v10 = self._lookup(self.data, sid, wts, row, col + 1)
        v01 = self._lookup(self.data, sid, wts, row + 1, col)
        v11 = self._lookup(self.data, sid, wts, row + 1, col + 1)
        c0 = v00 + (v01 - v00) * fy
        c1 = v10 + (v11 - v10) * fy
        fx = self._sample_segment(ux, float(W - 1), c0, c1)
        pos = jnp.stack([(col + fx) / (W - 1), (row + fy) / (H - 1)], -1)
        pdf = c0 + (c1 - c0) * fx
        return pos, pdf

    def invert(self, pos, params=()):
        """Inverse of sample(): pos -> (u, pdf) — invert_continuous
        (distr_2d.h:1352)."""
        W, H = self.size
        n_marg = H - 1
        sid, wts = self._weights(params)
        p = jnp.clip(pos, 0.0, 1.0) * jnp.asarray(
            [W - 1, H - 1], jnp.float32)
        col = jnp.minimum(p[..., 0].astype(jnp.int32), W - 2)
        row = jnp.minimum(p[..., 1].astype(jnp.int32), H - 2)
        fx = p[..., 0] - col
        fy = p[..., 1] - row

        v00 = self._lookup(self.data, sid, wts, row, col)
        v10 = self._lookup(self.data, sid, wts, row, col + 1)
        v01 = self._lookup(self.data, sid, wts, row + 1, col)
        v11 = self._lookup(self.data, sid, wts, row + 1, col + 1)
        c0 = v00 + (v01 - v00) * fy
        c1 = v10 + (v11 - v10) * fy
        pdf = c0 + (c1 - c0) * fx

        ux = self._invert_segment(fx, 1.0 / (W - 1), c0, c1)

        def cond(idx):
            i = jnp.clip(idx, 0, W - 2)
            v0 = self._lookup(self.cond_cdf, sid, wts, row, i)
            v1 = self._lookup(self.cond_cdf, sid, wts, row + 1, i)
            return v0 + (v1 - v0) * fy

        ux = ux + jnp.where(col > 0, cond(col - 1), 0.0)
        r0 = self._lookup(self.cond_cdf, sid, wts, row, W - 2)
        r1 = self._lookup(self.cond_cdf, sid, wts, row + 1, W - 2)
        ux = m.safe_div(ux, r0 + (r1 - r0) * fy)
        uy = self._invert_segment(fy, 1.0 / (H - 1), r0, r1)
        uy = uy + jnp.where(row > 0,
                            self._lookup(self.marg_cdf, sid, wts,
                                         jnp.clip(row - 1, 0, n_marg - 1)),
                            0.0)
        if not self.normalized:
            uy = m.safe_div(uy, self._lookup(
                self.marg_cdf, sid, wts,
                jnp.full(ux.shape, n_marg - 1, jnp.int32)))
        return jnp.stack([ux, uy], -1), pdf
