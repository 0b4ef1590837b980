"""Counter-based random number generation.

The reference uses per-lane PCG32 streams (core/random.h:53) seeded via
TEA hashing (core/random.h:77 ``sample_tea_32``).  Sequential 64-bit
PCG state is a poor fit for TPU (no native u64, carried loop state); we
instead use a *counter-based* generator: every sample is a pure function
``bits = hash(seed, lane, dim)``.  This makes the backward PRB replay
trivially reproduce the primal path (SURVEY.md §A.5 seeding discipline)
and needs no carried RNG state beyond an int32 dimension counter.

The hash is TEA-8 on (v0, v1) — the same mixer the reference uses for
seed decorrelation — which is statistically solid for MC rendering and
cheap on the VPU (shifts/adds/xors on uint32).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

_U32 = jnp.uint32


def sample_tea_32(v0, v1, rounds: int = 8):
    """TEA hash; bit-exact port of the reference core/random.h:77.

    Returns two decorrelated uint32 streams.
    """
    v0 = jnp.asarray(v0, _U32)
    v1 = jnp.asarray(v1, _U32)
    ssum = _U32(0)
    for _ in range(rounds):
        ssum = ssum + _U32(0x9E3779B9)
        v0 = v0 + (((v1 << 4) + _U32(0xA341316C)) ^ (v1 + ssum) ^ ((v1 >> 5) + _U32(0xC8013EA4)))
        v1 = v1 + (((v0 << 4) + _U32(0xAD90777D)) ^ (v0 + ssum) ^ ((v0 >> 5) + _U32(0x7E95761E)))
    return v0, v1


def sample_tea_f32(v0, v1, rounds: int = 8):
    """Uniform float in [0,1) from TEA (reference ``sample_tea_float32``)."""
    return bits_to_float01(sample_tea_32(v0, v1, rounds)[0])


def bits_to_float01(bits):
    """uint32 -> float32 uniform in [0, 1) by mantissa stuffing."""
    f = (bits >> _U32(9)) | _U32(0x3F800000)
    import jax
    return jax.lax.bitcast_convert_type(f, jnp.float32) - 1.0


@struct.dataclass
class Sampler:
    """Stateless-per-draw wavefront sampler (one RNG stream per lane).

    Replaces the sampler plugin family (src/samplers/{independent,
    stratified,multijitter,ldsampler}.cpp) + Sampler::seed
    (src/render/sampler.cpp:35).  ``key`` is a per-lane uint32 derived
    from (seed, lane); ``dim`` counts dimensions consumed so far.
    next_1d/next_2d return (value, new_sampler) — carried through
    lax.scan bodies so the PRB replay sees identical values.

    ``mode`` selects the sample pattern:
      * independent — pure counter-based TEA (default),
      * stratified  — per-(pixel, dim) permuted 1D strata / sqrt-grid 2D
        strata with jitter (stratified.cpp),
      * multijitter — correlated multi-jittered 2D via Kensler
        permutations (multijitter.cpp),
      * orthogonal  — orthogonal-array sampler, Bose strength-2
        construction with CMJ-style perturbation (orthogonal.cpp:224-253);
        every *pair* of dimensions is stratified on the R x R grid
        (R = smallest prime with R^2 >= spp),
      * ldsampler   — scrambled (0,2) sequence: van der Corput x Sobol'
        (ldsampler.cpp).
    For the non-independent modes, seed with ``pixel`` + ``sample`` ids
    (Sampler.seed_stratified); the stratified pattern applies to every
    requested dimension, keyed per (pixel, dim).
    """

    key: jnp.ndarray   # (N,) uint32 — per-lane (or per-pixel) stream key
    dim: jnp.ndarray   # scalar int32 (traced)
    sample: jnp.ndarray = None   # (N,) uint32 sample-in-pixel index
    spp: int = struct.field(pytree_node=False, default=1)
    mode: str = struct.field(pytree_node=False, default="independent")

    @staticmethod
    def seed(seed, wavefront_size: int = None, lane: jnp.ndarray = None) -> "Sampler":
        """Seed one independent stream per lane (sampler.cpp:35-43)."""
        if lane is None:
            lane = jnp.arange(wavefront_size, dtype=_U32)
        else:
            lane = jnp.asarray(lane, _U32)
        v0, _ = sample_tea_32(jnp.asarray(seed, _U32), lane)
        return Sampler(key=v0, dim=jnp.asarray(0, jnp.int32),
                       sample=jnp.zeros_like(lane))

    @staticmethod
    def seed_stratified(seed, pixel, sample, spp: int,
                        mode: str = "stratified") -> "Sampler":
        """Seed a stratified-family sampler: key per pixel, sample index
        within the pixel distinguishes strata."""
        pk, _ = sample_tea_32(jnp.asarray(seed, _U32),
                              jnp.asarray(pixel, _U32))
        return Sampler(key=pk, dim=jnp.asarray(0, jnp.int32),
                       sample=jnp.asarray(sample, _U32), spp=spp, mode=mode)

    def _bits(self, offset, salt=0):
        # 6 TEA rounds: <0.01 inter-dimension correlation at 5e4 lanes
        # (4 rounds showed 8% adjacent-dim correlation)
        d = jnp.asarray(self.dim + offset, _U32)
        if self.mode == "independent":
            return sample_tea_32(self.key, d, rounds=6)[0]
        # per-(pixel, dim) decorrelated stream + per-sample jitter
        pd_key, _ = sample_tea_32(self.key, d + _U32(salt), rounds=4)
        return sample_tea_32(pd_key, self.sample, rounds=4)[0]

    def _dim_key(self, offset):
        return sample_tea_32(self.key, jnp.asarray(self.dim + offset, _U32),
                             rounds=4)[0]

    def _oa_resolution(self):
        """Smallest prime R with R^2 >= spp (orthogonal.cpp:94-105)."""
        def is_prime(x):
            return x >= 2 and all(x % i for i in range(2, int(x ** 0.5) + 1))
        r = 2
        while r * r < self.spp or not is_prime(r):
            r += 1
        return r

    def _oa_bose(self, offset):
        """Bose strength-2 OA point, dimension ``dim + offset``
        (orthogonal.cpp:224-253): any two dimensions are jointly
        stratified on the R x R grid."""
        from . import qmc
        R = self._oa_resolution()
        p = self.key
        i = qmc.kensler_permute(self.sample % _U32(self.spp), self.spp, p)
        a_i0 = i // R
        a_i1 = i % R
        j = jnp.asarray(self.dim + offset, _U32)
        k = jnp.where(j % 2 > 0, j - _U32(1), j + _U32(1))
        a_ij = (a_i0 + (j - _U32(1)) * a_i1) % R
        a_ik = (a_i0 + (k - _U32(1)) * a_i1) % R
        a_ij = jnp.where(j == 0, a_i0, jnp.where(j == 1, a_i1, a_ij))
        a_ik = jnp.where(j == 0, a_i1, jnp.where(j == 1, a_i0, a_ik))
        stratum = qmc.kensler_permute(
            a_ij, R, p * (j + _U32(1)) * _U32(0x51633E2D))
        sub_stratum = qmc.kensler_permute(
            a_ik, R, p * (j + _U32(1)) * _U32(0x68BC21EB))
        jit = bits_to_float01(self._bits(offset, salt=77))
        return (stratum.astype(jnp.float32)
                + (sub_stratum.astype(jnp.float32) + jit) / R) / R

    def next_1d(self):
        if self.mode == "independent":
            u = bits_to_float01(self._bits(0))
        elif self.mode == "orthogonal":
            u = self._oa_bose(0)
        elif self.mode == "ldsampler":
            from . import qmc
            # (0,2)-sequence point + per-(pixel,dim) Cranley-Patterson
            # rotation: keeps stratification, decorrelates pixels/dims
            k = self._dim_key(0)
            u = qmc.radical_inverse_2(self.sample)
            u = jnp.mod(u + bits_to_float01(k), 1.0)
        else:  # stratified / multijitter 1D: permuted stratum + jitter
            from . import qmc
            k = self._dim_key(0)
            stratum = qmc.kensler_permute(self.sample, self.spp, k)
            jit = bits_to_float01(self._bits(0, salt=77))
            u = (stratum.astype(jnp.float32) + jit) / self.spp
        return u, self.replace(dim=self.dim + 1)

    def next_2d(self):
        if self.mode == "independent":
            b0 = self._bits(0)
            b1 = self._bits(1)
            u = jnp.stack([bits_to_float01(b0), bits_to_float01(b1)], -1)
        elif self.mode == "orthogonal":
            u = jnp.stack([self._oa_bose(0), self._oa_bose(1)], -1)
        elif self.mode == "ldsampler":
            from . import qmc
            k0 = self._dim_key(0)
            k1 = self._dim_key(1)
            u0 = jnp.mod(qmc.radical_inverse_2(self.sample)
                         + bits_to_float01(k0), 1.0)
            u1 = jnp.mod(qmc.sobol_2(self.sample)
                         + bits_to_float01(k1), 1.0)
            u = jnp.stack([u0, u1], -1)
        elif self.mode == "multijitter":
            from . import qmc
            # correlated multi-jitter (Kensler 2013): m x n grid
            import math
            m_res = int(math.sqrt(self.spp))
            n_res = (self.spp + m_res - 1) // m_res
            k = self._dim_key(0)
            s = qmc.kensler_permute(self.sample, self.spp, k * _U32(0x51633E2D))
            sx = qmc.kensler_permute(s % m_res, m_res, k * _U32(0x68BC21EB))
            sy = qmc.kensler_permute(s // m_res, n_res, k * _U32(0x02E5BE93))
            jx = bits_to_float01(self._bits(0, salt=11))
            jy = bits_to_float01(self._bits(1, salt=13))
            x = (s % m_res + (sy + jx) / n_res) / m_res
            y = (s // m_res + (sx + jy) / m_res) / n_res
            u = jnp.stack([x, y], -1)
        else:  # stratified sqrt-grid
            from . import qmc
            import math
            m_res = int(math.sqrt(self.spp))
            if m_res * m_res == self.spp:
                k = self._dim_key(0)
                s = qmc.kensler_permute(self.sample, self.spp, k)
                jx = bits_to_float01(self._bits(0, salt=11))
                jy = bits_to_float01(self._bits(1, salt=13))
                x = (s % m_res + jx) / m_res
                y = (s // m_res + jy) / m_res
                u = jnp.stack([x, y], -1)
            else:  # non-square spp: two independent 1D strata
                u0, s1 = self.next_1d()
                u1, _ = s1.next_1d()
                u = jnp.stack([u0, u1], -1)
        return u, self.replace(dim=self.dim + 2)

    def next_key(self):
        """Draw a per-lane uint32 sub-stream key (one dimension).

        Used by loops with a data-dependent trip count (delta/ratio
        tracking in heterogeneous media): in-loop draws are
        ``tea(key, step)`` so the sampler's global ``dim`` counter stays
        step-count independent — the PRB replay then consumes dimensions
        identically regardless of how many null collisions occurred.
        """
        return self._bits(0), self.replace(dim=self.dim + 1)

    def fork(self, salt) -> "Sampler":
        """Decorrelated child sampler (reference Sampler::fork)."""
        v0, _ = sample_tea_32(self.key, jnp.asarray(salt, _U32))
        return Sampler(key=v0, dim=jnp.asarray(0, jnp.int32),
                       sample=self.sample)
