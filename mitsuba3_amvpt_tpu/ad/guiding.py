"""Guiding distributions for projective (boundary) gradient sampling.

TPU-native counterpart of the reference's ``ad/guiding.py`` —
``GridDistr`` (regular-grid importance distribution over the boundary
sample space, guiding.py:22) and the spirit of ``OcSpaceDistr``
(guiding.py:141, adaptive octree; here a regular grid with neighbor
smoothing plays the adaptive role — the axis XLA can express without
dynamic tree structure).

The reference pipeline: draw pilot samples uniformly in the unit
sample cube, deposit each sample's contribution magnitude into the
grid, then importance-sample the final boundary samples from the grid
mixed with a uniform floor (``pdf > 0`` wherever the integrand can be
nonzero keeps the estimator unbiased).

Here the boundary sample space is the 2D unit square (u_edge, u_pos)
that parametrizes a silhouette-edge point: u_edge indexes the
length-proportional edge CDF, u_pos the position along the edge — the
same factorization ad/projective.py's estimators use.  The integrand
is sharply structured along u_edge (which edge) and smooth along u_pos
(where on it), so the grid is ANISOTROPIC: fine along u_edge, coarse
along u_pos.  The deposited mass is box-blurred one cell along u_edge
before normalization: silhouette edges are contiguous along the edge
CDF, so smearing covers signal cells a sparse pilot missed — the same
robustness job the reference's octree refinement rules do.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.rng import Sampler


class GridDistr2D:
    """Anisotropic RES_X x RES_Y importance grid over [0,1]^2 with a
    uniform mixture floor (reference GridDistr semantics).

    Built inside jit from pilot samples; ``sample`` warps fresh uniform
    pairs and returns (u (N,2), pdf (N,)) with pdf relative to the
    uniform density on the unit square.
    """

    def __init__(self, mass: jnp.ndarray, uniform_frac: float = 0.2):
        self.res_x, self.res_y = mass.shape
        n = self.res_x * self.res_y
        m = jnp.maximum(mass, 0.0).reshape(n)
        tot = jnp.sum(m)
        guided = jnp.where(tot > 0.0, m / jnp.maximum(tot, 1e-30),
                           jnp.full_like(m, 1.0 / n))
        self.p_cell = (1.0 - uniform_frac) * guided + uniform_frac / n
        self.cdf = jnp.cumsum(self.p_cell)

    @staticmethod
    def build(u: jnp.ndarray, weight: jnp.ndarray, res_x: int = 128,
              res_y: int = 2, blur: int = 1,
              uniform_frac: float = 0.2) -> "GridDistr2D":
        """Deposit |weight| of uniform pilot samples at u (N, 2); blur
        ``blur`` cells along the edge axis."""
        xi = jnp.clip((u[:, 0] * res_x).astype(jnp.int32), 0, res_x - 1)
        yi = jnp.clip((u[:, 1] * res_y).astype(jnp.int32), 0, res_y - 1)
        mass = jnp.zeros((res_x * res_y,)).at[xi * res_y + yi].add(
            jnp.abs(weight)).reshape(res_x, res_y)
        for s in range(1, blur + 1):
            mass = mass + jnp.roll(mass, s, 0) + jnp.roll(mass, -s, 0)
        return GridDistr2D(mass, uniform_frac)

    def sample(self, u: jnp.ndarray):
        """Warp uniform u (N, 2) -> guided samples + pdf (vs uniform).

        The first coordinate picks a cell through the flat-cell CDF
        (its within-cell remainder re-used as the cell-local x — the
        CDF-reuse trick keeps stratification), the second is the
        cell-local y."""
        rx, ry = self.res_x, self.res_y
        n = rx * ry
        ci = jnp.clip(jnp.searchsorted(self.cdf, u[:, 0], side="right"),
                      0, n - 1)
        p = self.p_cell[ci]
        c_lo = jnp.where(ci > 0, self.cdf[jnp.maximum(ci - 1, 0)], 0.0)
        frac = jnp.clip((u[:, 0] - c_lo) / jnp.maximum(p, 1e-30),
                        0.0, 1.0 - 1e-7)
        # cell layout: flat = xi * res_y + yi
        ux = ((ci // ry).astype(jnp.float32) + frac) / rx
        uy = ((ci % ry).astype(jnp.float32) + u[:, 1]) / ry
        pdf = p * n
        return jnp.stack([ux, uy], -1), pdf


def guided_boundary_samples(pilot_fn, n_pilot: int, n_main: int,
                            seed, res_x: int = 128, res_y: int = 2,
                            uniform_frac: float = 0.2):
    """Two-phase guided sampling driver (reference projective.py
    get_projective_detail: pilot -> grid -> guided batch).

    ``pilot_fn(u (N,2)) -> |contribution|`` evaluates the boundary
    integrand magnitude at uniform sample positions.  Returns
    (u_main (n_main, 2), pdf_main (n_main,)) for the guided batch.
    """
    smp = Sampler.seed(jnp.asarray(seed, jnp.uint32) ^ jnp.uint32(0x5D1F),
                      n_pilot)
    up, smp = smp.next_2d()
    w = pilot_fn(up)
    grid = GridDistr2D.build(up, jax.lax.stop_gradient(w), res_x, res_y,
                             uniform_frac=uniform_frac)
    smp2 = Sampler.seed(jnp.asarray(seed, jnp.uint32) ^ jnp.uint32(0xA5C9),
                        n_main)
    um, _ = smp2.next_2d()
    return grid.sample(um)
