"""Shim for recursivenodes.quadrature: Gauss-Jacobi line rules and the
collapsed (Duffy) simplex rule on the default (-1,1) simplex, as consumed by
the reference FIAT (quadrature.py:13)."""

import numpy as np

from fiat_tpu.core.recursive_nodes import (gauss_jacobi_rule,
                                           gauss_lobatto_jacobi_rule)


def gaussjacobi(m, a=0.0, b=0.0):
    """m-point Gauss-Jacobi rule on [-1, 1] for weight (1-x)^a (1+x)^b."""
    return gauss_jacobi_rule(m, a, b)


def lobattogaussjacobi(m, a=0.0, b=0.0):
    """m-point Lobatto-Gauss-Jacobi rule on [-1, 1] (endpoints included)."""
    return gauss_lobatto_jacobi_rule(m, a, b)


def simplexgausslegendre(dim, m):
    """Collapsed Gauss rule with m points per direction on the default
    (-1,1)-vertex dim-simplex: Duffy map of a product of Gauss-Jacobi rules
    with weights (1-eta_k)^k absorbing the Jacobian powers."""
    lines = [gauss_jacobi_rule(m, float(k), 0.0) for k in range(dim)]
    pts = np.zeros((m,) * dim + (dim,))
    wts = np.ones((m,) * dim)
    # eta_k runs along axis k; collapsed coordinates built back-to-front.
    etas = np.meshgrid(*[x for x, _ in lines], indexing="ij")
    for k in range(dim):
        shape = [1] * dim
        shape[k] = m
        wts = wts * (lines[k][1] / 2.0 ** k).reshape(shape)
    for k in range(dim):
        xi = np.ones_like(etas[k]) * (1.0 + etas[k])
        for j in range(k + 1, dim):
            xi = xi * (1.0 - etas[j]) / 2.0
        pts[..., k] = xi - 1.0
    return pts.reshape(-1, dim), wts.reshape(-1)
