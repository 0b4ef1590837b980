"""Core vector/frame/transform math (pure jnp).

TPU-native replacement for the Dr.Jit-templated headers
``include/mitsuba/core/{vector,frame,transform,ray,bbox}.h`` of the
reference.  Everything operates on arrays with a trailing axis of size 3
(points/vectors) or (..., 4, 4) (transforms) so that a whole wavefront
is processed per call.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

EPS = 1e-7
RAY_EPS = 1e-4  # spawn-ray offset along the normal (reference: math::RayEpsilon)
INF = jnp.inf


def dot(a, b, keepdims=False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def norm(a, keepdims=False):
    return jnp.sqrt(jnp.maximum(dot(a, a, keepdims=keepdims), 0.0))


def squared_norm(a, keepdims=False):
    return dot(a, a, keepdims=keepdims)


def normalize(a):
    return a / jnp.maximum(norm(a, keepdims=True), 1e-20)


def cross(a, b):
    return jnp.cross(a, b)


def lerp(a, b, t):
    return a + (b - a) * t


def clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def safe_rsqrt(x):
    return 1.0 / jnp.sqrt(jnp.maximum(x, 1e-20))


def safe_acos(x):
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


def safe_div(a, b, fallback=0.0):
    """a/b with `fallback` where b == 0 (used for pdf ratios / MIS)."""
    ok = b != 0.0
    return jnp.where(ok, a / jnp.where(ok, b, 1.0), fallback)


def replace_grad(primal, differentiable):
    """Value of `primal`, derivative of `differentiable`
    (dr::replace_grad — the reattachment primitive of SURVEY.md §A.1)."""
    import jax
    return jax.lax.stop_gradient(primal) + (
        differentiable - jax.lax.stop_gradient(differentiable))


# Row tables this small are fetched with a one-hot matmul instead of a
# gather: XLA's TPU row-gather costs ~2 ms per million lanes regardless
# of row width, while onehot(n, R) @ table(R, C) rides the MXU at
# n*R*C*2 flops — a >10x win for the packed-attribute lookups of small
# scenes (profiled on v5e; the crossover sits near R ~ 512).
TAKE_ROWS_MATMUL_MAX = 512


_JVP_MODE = False


class take_rows_jvp_mode:
    """Trace-time switch: route take_rows through the raw einsum impl
    (no custom_vjp) so forward-mode autodiff (jax.jvp) works — used by
    the PRB forward replay (ad/prb.py _replay_forward).  Identical
    primal numerics (same HIGHEST-precision einsum); the jvp of the
    einsum fetches tangent rows on the MXU."""

    def __enter__(self):
        global _JVP_MODE
        self._prev = _JVP_MODE
        _JVP_MODE = True

    def __exit__(self, *exc):
        global _JVP_MODE
        _JVP_MODE = self._prev


def take_rows(table, idx):
    """table (R, C) indexed by idx (N,) -> (N, C); exact (0/1 weights,
    one nonzero per row) but MXU-speed for small R.

    precision=HIGHEST is load-bearing: the TPU default feeds the MXU
    bf16-truncated inputs, which silently quantizes every fetched
    attribute (measured as a 5% image shift on Cornell).  f32x3
    reconstructs the full 24-bit mantissa, so the fetch is exact.

    The VJP is a scatter-add, NOT the einsum transpose — the transpose
    is a (R, n) @ (n, C) f32x3 contraction over the whole wavefront,
    which made PRB backward 2.6x slower than the plain-gather days."""
    R = table.shape[0]
    if R > TAKE_ROWS_MATMUL_MAX:
        return table[idx]
    if _JVP_MODE:
        return _take_rows_mm_impl(table, idx)
    return _take_rows_mm(table, idx)


def _take_rows_fwd(table, idx):
    return _take_rows_mm_impl(table, idx), (idx, table.shape[0])


def _take_rows_bwd(res, g):
    # one-hot matmul transpose at DEFAULT precision: the (R, n) @ (n, C)
    # contraction sums ~1M cotangents per row, so bf16-rounded inputs
    # with f32 accumulation cost ~0.4% relative noise on the gradient —
    # immaterial next to MC noise — while f32x3 (6x passes) made PRB
    # backward 2.6x slower and a scatter-add 4x slower (both measured)
    import jax
    idx, R = res
    onehot = jax.nn.one_hot(idx, R, dtype=g.dtype)
    d_table = jnp.einsum("nr,nc->rc", onehot, g,
                         preferred_element_type=g.dtype)
    return (d_table, None)


def _take_rows_mm_impl(table, idx):
    import jax
    onehot = jax.nn.one_hot(idx, table.shape[0], dtype=table.dtype)
    return jnp.einsum("nr,rc->nc", onehot, table,
                      preferred_element_type=table.dtype,
                      precision=jax.lax.Precision.HIGHEST)


def _make_take_rows_mm():
    import jax
    f = jax.custom_vjp(_take_rows_mm_impl)
    f.defvjp(_take_rows_fwd, _take_rows_bwd)
    return f


_take_rows_mm = _make_take_rows_mm()


def mulsign(x, s):
    """x * sign(s) with sign(0) = +1 (matches dr::mulsign)."""
    return jnp.where(s >= 0.0, x, -x)


def vec(x, y, z):
    return jnp.stack(jnp.broadcast_arrays(x, y, z), axis=-1)


# ---------------------------------------------------------------------------
# Orthonormal frames (reference: include/mitsuba/core/frame.h)
# ---------------------------------------------------------------------------

def coordinate_system(n):
    """Duff et al. 2017 branchless ONB from a unit normal.

    Returns (s, t) so that (s, t, n) is a right-handed orthonormal frame.
    Reference: ``coordinate_system`` in core/vector.h.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    s = vec(1.0 + sign * nx * nx * a, sign * b, -sign * nx)
    t = vec(b, sign + ny * ny * a, -ny)
    return s, t


def frame_to_local(n, s, t, v):
    """World vector -> local shading frame coordinates."""
    return vec(dot(v, s), dot(v, t), dot(v, n))


def frame_to_world(n, s, t, v):
    return (s * v[..., 0:1] + t * v[..., 1:2] + n * v[..., 2:3])


def cos_theta(v):
    return v[..., 2]


def sin_theta_2(v):
    return jnp.maximum(1.0 - v[..., 2] * v[..., 2], 0.0)


def sin_theta(v):
    return jnp.sqrt(sin_theta_2(v))


def tan_theta(v):
    return sin_theta(v) / v[..., 2]


def tan_theta_2(v):
    return sin_theta_2(v) / jnp.maximum(v[..., 2] * v[..., 2], 1e-20)


def sph_to_dir(theta, phi):
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    return vec(st * cp, st * sp, ct)


def dir_to_sph(d):
    """Returns (theta, phi) with phi in [0, 2pi)."""
    theta = safe_acos(d[..., 2])
    phi = jnp.arctan2(d[..., 1], d[..., 0])
    phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
    return theta, phi


def reflect(wi):
    """Local-frame mirror reflection of incident direction wi (pointing away
    from the surface), reference render/fresnel.h ``reflect``."""
    return vec(-wi[..., 0], -wi[..., 1], wi[..., 2])


def reflect_h(wi, h):
    """Reflection about an arbitrary half-vector h."""
    return 2.0 * dot(wi, h, keepdims=True) * h - wi


def refract(wi, cos_theta_t, eta_ti):
    """Local-frame refraction given precomputed cos_theta_t and 1/eta
    (reference render/fresnel.h:285 ``refract``)."""
    scale = -eta_ti
    return vec(scale * wi[..., 0], scale * wi[..., 1], cos_theta_t)


# ---------------------------------------------------------------------------
# 4x4 affine transforms (reference: include/mitsuba/core/transform.h)
# ---------------------------------------------------------------------------

def transform_point(m, p):
    """Apply (..., 4, 4) @ (..., 3) point with perspective divide."""
    r = jnp.einsum("...ij,...j->...i", m[..., :3, :3], p) + m[..., :3, 3]
    w = jnp.einsum("...j,...j->...", m[..., 3, :3], p) + m[..., 3, 3]
    return r / w[..., None]


def transform_vector(m, v):
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], v)


def transform_normal(m_inv, n):
    """Normals transform by the inverse transpose."""
    return jnp.einsum("...ji,...j->...i", m_inv[..., :3, :3], n)


def _np_mat(m):
    return np.asarray(m, dtype=np.float64)


def translate(v):
    m = np.eye(4)
    m[:3, 3] = np.asarray(v, dtype=np.float64)
    return m


def scale(v):
    m = np.eye(4)
    v = np.broadcast_to(np.asarray(v, dtype=np.float64), (3,))
    m[0, 0], m[1, 1], m[2, 2] = v
    return m


def rotate(axis, angle_deg):
    """Rotation about `axis` by `angle_deg` degrees (host-side numpy)."""
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    s, c = np.sin(np.deg2rad(angle_deg)), np.cos(np.deg2rad(angle_deg))
    x, y, z = a
    K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
    R = np.eye(3) * c + s * K + (1 - c) * np.outer(a, a)
    m = np.eye(4)
    m[:3, :3] = R
    return m


def look_at(origin, target, up):
    """Camera-to-world (reference transform.h ``look_at``: +Z toward target,
    +X left-handed convention matching Mitsuba: right = cross(up, dir))."""
    origin = np.asarray(origin, np.float64)
    d = np.asarray(target, np.float64) - origin
    d = d / np.linalg.norm(d)
    up = np.asarray(up, np.float64)
    left = np.cross(up / np.linalg.norm(up), d)
    left = left / np.linalg.norm(left)
    new_up = np.cross(d, left)
    m = np.eye(4)
    m[:3, 0] = left
    m[:3, 1] = new_up
    m[:3, 2] = d
    m[:3, 3] = origin
    return m


def perspective_projection(fov_deg, near, far):
    """Mitsuba-style perspective projection (transform.h:259
    ``perspective``): maps the view frustum to [0,1]^2 x [0,1] after the
    usual scale/translate applied by the sensor."""
    recip = 1.0 / (far - near)
    cot = 1.0 / np.tan(np.deg2rad(fov_deg) / 2.0)
    m = np.zeros((4, 4))
    m[0, 0] = cot
    m[1, 1] = cot
    m[2, 2] = far * recip
    m[2, 3] = -near * far * recip
    m[3, 2] = 1.0
    return m


def transform_point_indexed(table, idx, p):
    """Per-lane point transform ``table[idx] @ p`` WITHOUT gathering
    per-lane (4, 4) matrices: a (N, 4, 4) gather materializes on TPU
    with T(4,128) tile padding — 32x memory (measured 8 GB at 4.2M
    lanes in the AMVPT reprojection).  The 16 matrix entries are
    fetched with ONE take_rows (one-hot MXU matmul) on the flattened
    (V, 16) table — the earlier per-column (N,) gathers still paid the
    per-lane row-gather tax 16 times (~2 ms/Mlane each, round-4
    measurement on the Veach sphere merge).

    ``table`` (V, 4, 4); ``idx`` (N,) int; ``p`` (N, 3).  Includes the
    perspective divide like transform_point."""
    a = take_rows(table.reshape(-1, 16), idx)          # (N, 16)
    x, y, z = p[..., 0], p[..., 1], p[..., 2]

    def g(j):
        return a[..., j]

    px = g(0) * x + g(1) * y + g(2) * z + g(3)
    py = g(4) * x + g(5) * y + g(6) * z + g(7)
    pz = g(8) * x + g(9) * y + g(10) * z + g(11)
    w = g(12) * x + g(13) * y + g(14) * z + g(15)
    return jnp.stack([px, py, pz], -1) / w[..., None]


def transform_vector_indexed(table, idx, v):
    """transform_vector via one take_rows fetch (see
    transform_point_indexed)."""
    a = take_rows(table.reshape(-1, 16), idx)          # (N, 16)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]

    def g(j):
        return a[..., j]

    return jnp.stack([g(0) * x + g(1) * y + g(2) * z,
                      g(4) * x + g(5) * y + g(6) * z,
                      g(8) * x + g(9) * y + g(10) * z], -1)
