"""Cubic Hermite (Catmull-Rom) spline evaluation, integration and
inversion — the reference's include/mitsuba/core/spline.h (1079 LoC)
reimplemented as vectorized jnp kernels.

The reference's convention: a 1D function sampled at K nodes is
interpolated per-segment by a cubic Hermite polynomial whose endpoint
derivatives come from centered finite differences of the neighboring
values (one-sided at the boundary) — spline.h:97 eval_spline /
spline.h:214,277 eval_1d (uniform and non-uniform node variants).
``integrate_1d`` produces the CDF at the nodes (spline.h:337) and
``invert_1d`` samples it by monotonic segment inversion via Newton
iterations bracketed by bisection (spline.h:412).

All functions are jittable; per-lane queries use gathers over the
node arrays (tables are small: spectra, BRDF slices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def eval_spline(f0, f1, d0, d1, t):
    """Cubic Hermite on [0,1] with values f0,f1 and derivatives d0,d1
    (spline.h:97)."""
    t2 = t * t
    t3 = t2 * t
    return ((2.0 * t3 - 3.0 * t2 + 1.0) * f0
            + (-2.0 * t3 + 3.0 * t2) * f1
            + (t3 - 2.0 * t2 + t) * d0
            + (t3 - t2) * d1)


def _segment_coeffs(values):
    """Per-segment (f0, f1, d0, d1) with centered-difference slopes
    (uniform nodes, unit spacing); one-sided at the boundaries —
    spline.h:214 eval_1d's derivative construction."""
    v = values
    k = v.shape[0]
    dl = jnp.concatenate([(v[1:2] - v[0:1]),
                          0.5 * (v[2:] - v[:-2]),
                          (v[-1:] - v[-2:-1])])
    f0 = v[:-1]
    f1 = v[1:]
    d0 = dl[:-1]
    d1 = dl[1:]
    return f0, f1, d0, d1


def eval_1d(xmin: float, xmax: float, values, x):
    """Evaluate the Catmull-Rom spline through uniformly spaced
    ``values`` on [xmin, xmax] at (array) x; zero outside the domain
    (spline.h:214)."""
    values = jnp.asarray(values)
    k = values.shape[0]
    u = (x - xmin) / (xmax - xmin) * (k - 1)
    seg = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, k - 2)
    t = u - seg
    f0, f1, d0, d1 = _segment_coeffs(values)
    y = eval_spline(f0[seg], f1[seg], d0[seg], d1[seg], t)
    inside = (x >= xmin) & (x <= xmax)
    return jnp.where(inside, y, 0.0)


def eval_1d_nonuniform(nodes, values, x):
    """Non-uniform node variant (spline.h:277): derivatives scaled by
    the local node spacing."""
    nodes = jnp.asarray(nodes)
    values = jnp.asarray(values)
    k = values.shape[0]
    seg = jnp.clip(jnp.searchsorted(nodes, x, side="right") - 1, 0, k - 2)
    x0 = nodes[seg]
    x1 = nodes[seg + 1]
    w = x1 - x0
    t = (x - x0) / jnp.maximum(w, 1e-30)

    # centered slopes in x units
    dv = values[1:] - values[:-1]
    dx = nodes[1:] - nodes[:-1]
    sl = dv / jnp.maximum(dx, 1e-30)           # per-segment secant
    interior = 0.5 * (sl[1:] + sl[:-1])
    slopes = jnp.concatenate([sl[0:1], interior, sl[-1:]])
    y = eval_spline(values[seg], values[seg + 1],
                    slopes[seg] * w, slopes[seg + 1] * w, t)
    inside = (x >= nodes[0]) & (x <= nodes[-1])
    return jnp.where(inside, y, 0.0)


def integrate_1d(xmin: float, xmax: float, values):
    """Node-wise antiderivative of the spline (CDF at the nodes),
    spline.h:337: the cubic on each unit segment integrates to
    (f0 + f1)/2 + (d0 - d1)/12."""
    values = jnp.asarray(values)
    k = values.shape[0]
    h = (xmax - xmin) / (k - 1)
    f0, f1, d0, d1 = _segment_coeffs(values)
    seg_int = h * (0.5 * (f0 + f1) + (d0 - d1) / 12.0)
    return jnp.concatenate([jnp.zeros((1,) + values.shape[1:]),
                            jnp.cumsum(seg_int, 0)])


def invert_1d(xmin: float, xmax: float, values, y, n_iter: int = 12):
    """Solve eval-integral(x) == y for x (spline.h:412 invert_1d as
    used for sampling): locate the segment by the node CDF, then
    bisect the monotone cubic CDF inside it."""
    values = jnp.asarray(values)
    cdf = integrate_1d(xmin, xmax, values)
    k = values.shape[0]
    h = (xmax - xmin) / (k - 1)
    y = jnp.clip(y, 0.0, cdf[-1])
    seg = jnp.clip(jnp.searchsorted(cdf, y, side="right") - 1, 0, k - 2)
    f0s, f1s, d0s, d1s = _segment_coeffs(values)
    f0 = f0s[seg]
    f1 = f1s[seg]
    d0 = d0s[seg]
    d1 = d1s[seg]
    ybase = cdf[seg]

    def seg_cdf(t):
        # antiderivative of eval_spline on [0, t], x h
        t2 = t * t
        t3 = t2 * t
        t4 = t3 * t
        return h * ((0.5 * t4 - t3 + t) * f0
                    + (-0.5 * t4 + t3) * f1
                    + (0.25 * t4 - (2.0 / 3.0) * t3 + 0.5 * t2) * d0
                    + (0.25 * t4 - t3 / 3.0) * d1)

    lo = jnp.zeros_like(y)
    hi = jnp.ones_like(y)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        below = (ybase + seg_cdf(mid)) < y
        return (jnp.where(below, mid, lo), jnp.where(below, hi, mid))

    lo, hi = jax.lax.fori_loop(0, n_iter * 2, body, (lo, hi))
    t = 0.5 * (lo + hi)
    return xmin + (seg + t) * h
