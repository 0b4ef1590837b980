"""Signed-distance-function grid shape (src/shapes/sdfgrid.cpp, 1146
LoC).

The reference registers every surface-crossing voxel as an Embree/OptiX
custom primitive and solves a per-voxel cubic for the trilinear SDF's
zero crossing (Hansson-Söderlund, Evans, Akenine-Möller, "Ray Tracing
of Signed Distance Function Grids", JCGT 2022).  The TPU-native
formulation keeps the same voxel-cubic math but replaces the
BVH-over-voxels with an Amanatides-Woo DDA walk under
``lax.while_loop`` — every lane marches its own voxel chain, the hot
work (8-corner fetch + cubic solve) is branchless vector code.

Differentiable hits follow sdfgrid.cpp:390-420: the detached march
finds t*, then the tangent-plane reattachment
``t_diff = s(p_local) / dot(n, -d_local)`` grafts grid-parameter
gradients onto t via replace_grad, so SDF grids are recoverable by
inverse rendering through PRB.

Normal modes (sdfgrid.cpp:133-137): ``analytic`` = gradient of the
trilinear interpolant (C0 across voxel faces), ``smooth`` = trilinear
interpolation of per-*vertex* central-difference gradients — same goal
as the reference's JCGT voxel-gradient blend, formulated as one more
grid lookup.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core import math as m


@struct.dataclass
class SDFGrid:
    grid: jnp.ndarray        # (Z, Y, X) SDF samples — differentiable leaf
    to_world: jnp.ndarray    # (4, 4)
    to_object: jnp.ndarray   # (4, 4)
    shape_index: int = struct.field(pytree_node=False, default=0)
    normal_mode: str = struct.field(pytree_node=False, default="smooth")

    @property
    def res(self):
        z, y, x = self.grid.shape
        return x, y, z

    @property
    def grad(self):
        """(Z, Y, X, 3) vertex gradients in local units, derived from
        the live grid so inverse rendering sees consistent smooth
        normals (sdfgrid.cpp voxel_grad role).  XLA hoists the full-grid
        differences out of per-lane code."""
        z, y, x = self.grid.shape
        gx = jnp.gradient(self.grid, axis=2) * (x - 1)
        gy = jnp.gradient(self.grid, axis=1) * (y - 1)
        gz = jnp.gradient(self.grid, axis=0) * (z - 1)
        return jnp.stack([gx, gy, gz], -1)


def build_sdf(data, to_world=None, shape_index: int = 0,
              normal_mode: str = "smooth") -> SDFGrid:
    """Build an SDFGrid from a (Z, Y, X) sample array; samples sit on
    the corners of a [0,1]^3 local cube (sdfgrid.cpp grid layout)."""
    data = np.asarray(data, np.float32)
    if data.ndim == 4:
        data = data[..., 0]
    assert data.ndim == 3 and min(data.shape) >= 2, \
        "sdfgrid needs a (Z, Y, X) grid with every axis >= 2"
    tw = np.eye(4) if to_world is None else np.asarray(to_world, np.float64)

    return SDFGrid(grid=jnp.asarray(data),
                   to_world=jnp.asarray(tw, jnp.float32),
                   to_object=jnp.asarray(np.linalg.inv(tw), jnp.float32),
                   shape_index=shape_index, normal_mode=normal_mode)


def _fetch8(grid, ix, iy, iz):
    """Gather the 8 corner samples of voxel (ix, iy, iz) -> (n, 8) in
    order (000, 100, 010, 110, 001, 101, 011, 111)."""
    z, y, x = grid.shape
    flat = grid.reshape(-1)
    base = (iz * y + iy) * x + ix
    offs = jnp.asarray([0, 1, x, x + 1, x * y, x * y + 1,
                        x * y + x, x * y + x + 1], jnp.int32)
    return flat[base[..., None] + offs[None, :]]


def _cubic_coeffs(s8, o, d):
    """Trilinear SDF along a segment p(u) = o + u*d in voxel-local
    [0,1]^3 coordinates -> cubic coefficients (c0..c3)
    (sdfgrid.cpp cubic setup, JCGT 2022 eq. 2-4)."""
    s000, s100, s010, s110, s001, s101, s011, s111 = [
        s8[..., i] for i in range(8)]
    k0 = s000
    k1 = s100 - s000
    k2 = s010 - s000
    k3 = s001 - s000
    k4 = s000 - s100 - s010 + s110
    k5 = s000 - s010 - s001 + s011
    k6 = s000 - s100 - s001 + s101
    k7 = -s000 + s100 + s010 - s110 + s001 - s101 - s011 + s111
    ox, oy, oz = o[..., 0], o[..., 1], o[..., 2]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    c0 = (k0 + k1 * ox + k2 * oy + k3 * oz + k4 * ox * oy + k5 * oy * oz
          + k6 * ox * oz + k7 * ox * oy * oz)
    c1 = (k1 * dx + k2 * dy + k3 * dz
          + k4 * (ox * dy + oy * dx)
          + k5 * (oy * dz + oz * dy)
          + k6 * (ox * dz + oz * dx)
          + k7 * (ox * oy * dz + oy * oz * dx + ox * oz * dy))
    c2 = (k4 * dx * dy + k5 * dy * dz + k6 * dx * dz
          + k7 * (ox * dy * dz + oy * dx * dz + oz * dx * dy))
    c3 = k7 * dx * dy * dz
    return c0, c1, c2, c3


def _cubic_first_root(c0, c1, c2, c3, h, iters: int = 20):
    """Smallest root of the cubic in [0, h], found by splitting at the
    derivative's critical points (the cubic is monotone on each piece)
    and bisecting the first sign-change interval.  Returns (found,
    root)."""
    f = lambda s: ((c3 * s + c2) * s + c1) * s + c0

    # critical points of 3 c3 s^2 + 2 c2 s + c1
    A, B, C = 3.0 * c3, 2.0 * c2, c1
    lin = jnp.abs(A) < 1e-12
    disc = B * B - 4.0 * A * C
    sq = m.safe_sqrt(jnp.maximum(disc, 0.0))
    qq = -0.5 * (B + jnp.where(B >= 0, sq, -sq))
    r1 = jnp.where(lin, jnp.where(jnp.abs(B) > 1e-12,
                                  -C / jnp.where(jnp.abs(B) > 1e-12, B, 1.0),
                                  -1.0),
                   qq / jnp.where(lin, 1.0, A))
    r2 = jnp.where(lin, r1, C / jnp.where(jnp.abs(qq) > 1e-20, qq, 1e-20))
    bad = (disc < 0.0) & ~lin
    r1 = jnp.where(bad, -1.0, r1)
    r2 = jnp.where(bad, -1.0, r2)
    e1 = jnp.clip(jnp.minimum(r1, r2), 0.0, h)
    e2 = jnp.clip(jnp.maximum(r1, r2), 0.0, h)

    zero = jnp.zeros_like(h)
    found = jnp.zeros(h.shape, bool)
    root = jnp.full(h.shape, jnp.inf)
    for a, b in ((zero, e1), (e1, e2), (e2, h)):
        fa, fb = f(a), f(b)
        has = (fa * fb <= 0.0) & (b > a) & ~found
        lo, hi = a, b
        flo = fa
        for _ in range(iters):
            mid = 0.5 * (lo + hi)
            fm = f(mid)
            same = (fm * flo) > 0.0
            lo = jnp.where(same, mid, lo)
            flo = jnp.where(same, fm, flo)
            hi = jnp.where(same, hi, mid)
        r = 0.5 * (lo + hi)
        root = jnp.where(has, r, root)
        found = found | has
    return found, root


def sdf_intersect(sdf: SDFGrid, o_w, d_w, maxt, active=None):
    """DDA march of the SDF grid.  o_w/d_w in world space; returns
    (t, hit) with t in world-ray units (inf on miss)."""
    n = o_w.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)
    f32 = jnp.float32
    # the march is detached end to end (while_loop is not reverse-mode
    # differentiable); grid gradients enter through the tangent-plane
    # reattachment in Scene.compute_surface_interaction instead
    sdf = jax.lax.stop_gradient(sdf)
    o_w = jax.lax.stop_gradient(o_w)
    d_w = jax.lax.stop_gradient(d_w)
    maxt = jax.lax.stop_gradient(maxt)
    o = m.transform_point(sdf.to_object, o_w)
    d = m.transform_vector(sdf.to_object, d_w)

    nx, ny, nz = sdf.res
    res = jnp.asarray([nx - 1, ny - 1, nz - 1], f32)

    # slab test against the unit cube
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                            jnp.where(d >= 0, 1e-12, -1e-12), d)
    t_lo = (0.0 - o) * inv_d
    t_hi = (1.0 - o) * inv_d
    t0 = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
    t1 = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
    t0 = jnp.maximum(t0, 0.0)
    t1 = jnp.minimum(t1, maxt)
    active = active & (t0 < t1)

    # voxel-space ray q(t) = oq + t * dq
    oq = o * res
    dq = d * res
    eps = 1e-5 * jnp.maximum(t1 - t0, 1e-30)
    q_ent = oq + (t0 + eps)[..., None] * dq
    iv = jnp.clip(jnp.floor(q_ent).astype(jnp.int32), 0,
                  jnp.asarray([nx - 2, ny - 2, nz - 2], jnp.int32))
    step = jnp.where(dq >= 0, 1, -1).astype(jnp.int32)
    inv_dq = 1.0 / jnp.where(jnp.abs(dq) < 1e-12,
                             jnp.where(dq >= 0, 1e-12, -1e-12), dq)
    # t at which the ray crosses the next voxel boundary on each axis
    next_bound = iv.astype(f32) + (step > 0).astype(f32)
    t_next = (next_bound - oq) * inv_dq
    t_next = jnp.where(jnp.abs(dq) < 1e-12, jnp.inf, t_next)
    t_delta = jnp.abs(inv_dq)

    max_steps = int(3 * max(nx, ny, nz) + 4)

    def cond(st):
        return jnp.any(st["live"]) & (st["i"] < max_steps)

    def body(st):
        iv, t_cur, t_next, live = st["iv"], st["t"], st["tn"], st["live"]
        t_exit = jnp.minimum(jnp.min(t_next, axis=-1), t1)
        s8 = _fetch8(sdf.grid, iv[..., 0], iv[..., 1], iv[..., 2])
        # voxel-local segment: u(s) = (q(t_cur) - iv) + s * dq
        o_loc = oq + t_cur[..., None] * dq - iv.astype(f32)
        h = jnp.maximum(t_exit - t_cur, 0.0)
        c0, c1, c2, c3 = _cubic_coeffs(s8, o_loc, dq)
        found, s_root = _cubic_first_root(c0, c1, c2, c3, h)
        found = found & live
        t_hit = jnp.where(found & (t_cur + s_root < st["t_hit"]),
                          t_cur + s_root, st["t_hit"])
        hit = st["hit"] | found

        # advance to the next voxel (branchless 3-way argmin)
        ax = jnp.argmin(t_next, axis=-1)
        onehot = jax.nn.one_hot(ax, 3, dtype=jnp.int32)
        iv2 = iv + onehot * step
        t_cur2 = jnp.min(t_next, axis=-1)
        t_next2 = t_next + onehot.astype(f32) * t_delta
        inside = (jnp.all(iv2 >= 0, -1)
                  & (iv2[..., 0] <= nx - 2) & (iv2[..., 1] <= ny - 2)
                  & (iv2[..., 2] <= nz - 2))
        live2 = live & ~found & inside & (t_cur2 < t1)
        return dict(iv=jnp.where(live[..., None], iv2, iv),
                    t=jnp.where(live, t_cur2, t_cur),
                    tn=jnp.where(live[..., None], t_next2, t_next),
                    live=live2, hit=hit, t_hit=t_hit,
                    i=st["i"] + 1)

    st = dict(iv=iv, t=t0, tn=t_next, live=active,
              hit=jnp.zeros((n,), bool), t_hit=jnp.full((n,), jnp.inf),
              i=jnp.asarray(0, jnp.int32))
    st = jax.lax.while_loop(cond, body, st)
    return st["t_hit"], st["hit"]


def sdf_value(sdf: SDFGrid, p_local):
    """Differentiable trilinear SDF lookup at local [0,1]^3 points."""
    return _trilinear(sdf.grid[..., None], p_local)[..., 0]


def sdf_grad(sdf: SDFGrid, p_local):
    """Analytic gradient of the trilinear interpolant (local units)."""
    nx, ny, nz = sdf.res
    f32 = jnp.float32
    fx = jnp.clip(p_local[..., 0], 0.0, 1.0) * (nx - 1)
    fy = jnp.clip(p_local[..., 1], 0.0, 1.0) * (ny - 1)
    fz = jnp.clip(p_local[..., 2], 0.0, 1.0) * (nz - 1)
    ix = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, nx - 2)
    iy = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, ny - 2)
    iz = jnp.clip(jnp.floor(fz).astype(jnp.int32), 0, nz - 2)
    x, y_, z_ = fx - ix, fy - iy, fz - iz
    s8 = _fetch8(sdf.grid, ix, iy, iz)
    s000, s100, s010, s110, s001, s101, s011, s111 = [
        s8[..., i] for i in range(8)]
    k1 = s100 - s000
    k2 = s010 - s000
    k3 = s001 - s000
    k4 = s000 - s100 - s010 + s110
    k5 = s000 - s010 - s001 + s011
    k6 = s000 - s100 - s001 + s101
    k7 = -s000 + s100 + s010 - s110 + s001 - s101 - s011 + s111
    gx = (k1 + k4 * y_ + k6 * z_ + k7 * y_ * z_) * (nx - 1)
    gy = (k2 + k4 * x + k5 * z_ + k7 * x * z_) * (ny - 1)
    gz = (k3 + k5 * y_ + k6 * x + k7 * x * y_) * (nz - 1)
    return jnp.stack([gx, gy, gz], -1).astype(f32)


def sdf_smooth_normal(sdf: SDFGrid, p_local):
    """Trilinearly interpolated vertex gradients -> smooth local normal."""
    g = _trilinear(sdf.grad, p_local)
    return m.normalize(g)


def _trilinear(vals, p_local):
    """Trilinear interpolation of a (Z, Y, X, C) vertex array at local
    [0,1]^3 points -> (n, C)."""
    z, y, x, _ = vals.shape
    fx = jnp.clip(p_local[..., 0], 0.0, 1.0) * (x - 1)
    fy = jnp.clip(p_local[..., 1], 0.0, 1.0) * (y - 1)
    fz = jnp.clip(p_local[..., 2], 0.0, 1.0) * (z - 1)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, x - 2)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, y - 2)
    z0 = jnp.clip(jnp.floor(fz).astype(jnp.int32), 0, z - 2)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    tz = (fz - z0)[..., None]
    flat = vals.reshape(-1, vals.shape[-1])

    def at(dx, dy, dz):
        return flat[((z0 + dz) * y + (y0 + dy)) * x + (x0 + dx)]

    c00 = at(0, 0, 0) * (1 - tx) + at(1, 0, 0) * tx
    c10 = at(0, 1, 0) * (1 - tx) + at(1, 1, 0) * tx
    c01 = at(0, 0, 1) * (1 - tx) + at(1, 0, 1) * tx
    c11 = at(0, 1, 1) * (1 - tx) + at(1, 1, 1) * tx
    c0 = c00 * (1 - ty) + c10 * ty
    c1 = c01 * (1 - ty) + c11 * ty
    return c0 * (1 - tz) + c1 * tz
