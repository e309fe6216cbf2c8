"""Shim for recursivenodes.quadrature: Gauss-Jacobi line rules and the
collapsed (Duffy) simplex rule on the default (-1,1) simplex, as consumed by
the reference FIAT (quadrature.py:13)."""

from fiat_tpu.core.recursive_nodes import (collapsed_gauss_simplex,
                                           gauss_jacobi_rule,
                                           gauss_lobatto_jacobi_rule)


def gaussjacobi(m, a=0.0, b=0.0):
    """m-point Gauss-Jacobi rule on [-1, 1] for weight (1-x)^a (1+x)^b."""
    return gauss_jacobi_rule(m, a, b)


def lobattogaussjacobi(m, a=0.0, b=0.0):
    """m-point Lobatto-Gauss-Jacobi rule on [-1, 1] (endpoints included)."""
    return gauss_lobatto_jacobi_rule(m, a, b)


def simplexgausslegendre(dim, m):
    """Collapsed Gauss rule with m points per direction on the default
    (-1,1)-vertex dim-simplex."""
    return collapsed_gauss_simplex(dim, m)
