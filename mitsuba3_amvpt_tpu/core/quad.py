"""Gauss quadrature rules (reference include/mitsuba/core/quad.h).

Host-side numpy: quadrature nodes/weights are computed once at setup
(the reference computes them with dedicated solvers; numpy's Golub-
Welsch implementation is equivalent) and consumed either by host-side
tooling (chi2 pdf integration) or baked into jnp constants.
"""

from __future__ import annotations

import numpy as np


def gauss_legendre(n: int):
    """Nodes/weights of the n-point Gauss-Legendre rule on [-1, 1]
    (quad.h:31 gauss_legendre): exact for polynomials of degree
    2n - 1."""
    return np.polynomial.legendre.leggauss(int(n))


def gauss_lobatto(n: int):
    """Nodes/weights of the n-point Gauss-Lobatto rule on [-1, 1]
    (quad.h:44): includes both endpoints, exact to degree 2n - 3."""
    n = int(n)
    if n < 2:
        raise ValueError("gauss_lobatto needs n >= 2")
    # interior nodes are roots of P'_{n-1}; use the derivative of the
    # Legendre polynomial via its companion matrix
    c = np.zeros(n)
    c[-1] = 1.0
    dc = np.polynomial.legendre.legder(c)
    interior = np.polynomial.legendre.legroots(dc)
    x = np.concatenate([[-1.0], np.sort(interior), [1.0]])
    Pn1 = np.polynomial.legendre.legval(x, c)
    w = 2.0 / (n * (n - 1) * Pn1 * Pn1)
    return x, w


def composite_quad(f, a: float, b: float, n_cells: int, order: int = 4):
    """Integrate f over [a, b] with an ``order``-point Gauss-Legendre
    rule per uniform sub-cell; f is evaluated vectorized on all nodes
    at once.  Returns (integral, per-cell integrals)."""
    x, w = gauss_legendre(order)
    edges = np.linspace(a, b, n_cells + 1)
    h = (b - a) / n_cells
    mid = 0.5 * (edges[:-1] + edges[1:])
    pts = mid[:, None] + 0.5 * h * x[None, :]
    vals = np.asarray(f(pts.ravel())).reshape(n_cells, order)
    cells = 0.5 * h * vals @ w
    return float(cells.sum()), cells
