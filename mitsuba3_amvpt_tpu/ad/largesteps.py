"""Laplacian-preconditioned mesh optimization ("Large Steps in Inverse
Rendering of Geometry", Nicolet et al. 2021).

Equivalent of the reference's ad/largesteps.py:6-55 (which wraps a
Cholesky factorization custom op).  TPU-natively the solve
``(I + lambda L) u = v`` is done with conjugate gradients on a matrix-
free Laplacian operator — dense matvecs (segment-sums over the edge
list) instead of a sparse factorization, which is exactly what maps to
the hardware.

Usage (mirrors the reference API):
    ls = LargeSteps(verts, faces, lambda_=19.0)
    u = ls.to_differential(verts)        # latent parameterization
    ... optimize u with Adam ...
    verts = ls.from_differential(u)      # solve back to vertex space
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class LargeSteps:
    def __init__(self, verts, faces, lambda_: float = 19.0,
                 cg_iters: int = 50, cg_tol: float = 1e-6):
        faces = np.asarray(faces)
        n = np.asarray(verts).shape[0]
        # combinatorial (uniform) Laplacian edge list
        edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                                faces[:, [2, 0]]], axis=0)
        edges = np.unique(np.sort(edges, axis=1), axis=0)
        self.n = n
        self.lambda_ = float(lambda_)
        self.cg_iters = int(cg_iters)
        self.cg_tol = float(cg_tol)
        self.e0 = jnp.asarray(edges[:, 0], jnp.int32)
        self.e1 = jnp.asarray(edges[:, 1], jnp.int32)
        deg = np.zeros(n)
        np.add.at(deg, edges[:, 0], 1.0)
        np.add.at(deg, edges[:, 1], 1.0)
        self.deg = jnp.asarray(deg, jnp.float32)

    def _laplacian(self, x):
        """L x with L = D - A (uniform weights)."""
        a0 = x[self.e0]
        a1 = x[self.e1]
        acc = jnp.zeros_like(x)
        acc = acc.at[self.e0].add(a1)
        acc = acc.at[self.e1].add(a0)
        return self.deg[:, None] * x - acc

    def _matvec(self, x):
        return x + self.lambda_ * self._laplacian(x)

    def to_differential(self, verts):
        """v -> u = (I + lambda L) v (largesteps.py to_differential)."""
        return self._matvec(jnp.asarray(verts))

    def from_differential(self, u):
        """u -> v = (I + lambda L)^-1 u via CG (SPD system).

        Differentiable: the VJP of a CG solve is a CG solve with the
        (symmetric) same operator — jax.scipy CG is jittable and
        differentiable through implicit differentiation."""
        from jax.scipy.sparse.linalg import cg
        x, _ = cg(self._matvec, jnp.asarray(u), maxiter=self.cg_iters,
                  tol=self.cg_tol)
        return x
