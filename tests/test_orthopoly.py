"""Tests for the orthogonal-polynomial utilities (reference:
FIAT/orthopoly.py): exactness of Golub-Welsch rules, orthonormality,
log-weight quadrature."""

import numpy as np
import pytest

from fiat_tpu.core.orthopoly import (gauss, jacobi, jacobiD, lobatto,
                                     mm_log, mod_chebyshev, rec_jacobi,
                                     rec_jacobi01, rec_jaclog)


def test_gauss_legendre_exactness():
    alpha, beta = rec_jacobi(6, 0, 0)
    x, w = gauss(alpha, beta)
    for p in range(12):
        exact = (1 - (-1) ** (p + 1)) / (p + 1)
        assert abs(np.sum(w * x ** p) - exact) < 1e-13


def test_gauss_jacobi_weighted():
    a, b = 1.0, 0.0
    alpha, beta = rec_jacobi(5, a, b)
    x, w = gauss(alpha, beta)
    # integral of (1-x)^1 * x^p over [-1,1]
    for p in range(9):
        lo, hi = -1.0, 1.0
        exact = (hi ** (p + 1) - lo ** (p + 1)) / (p + 1) \
            - (hi ** (p + 2) - lo ** (p + 2)) / (p + 2)
        assert abs(np.sum(w * x ** p) - exact) < 1e-12


def test_lobatto_endpoints_and_exactness():
    alpha, beta = rec_jacobi(6, 0, 0)
    x, w = lobatto(alpha, beta, -1.0, 1.0)
    assert abs(x[0] + 1) < 1e-13 and abs(x[-1] - 1) < 1e-13
    for p in range(9):  # exact to degree 2n-3
        exact = (1 - (-1) ** (p + 1)) / (p + 1)
        assert abs(np.sum(w * x ** p) - exact) < 1e-12


def test_jacobi_orthonormal():
    xg, wg = gauss(*rec_jacobi(12, 0, 0))
    P = jacobi(4, 0, 0, xg, NOPT=2)
    G = (P * wg[:, None]).T @ P
    assert np.allclose(G, np.eye(5), atol=1e-12)


def test_jacobiD_matches_fd():
    x = np.linspace(-0.9, 0.9, 7)
    h = 1e-6
    D = jacobiD(4, 0, 0, x)
    fd = (jacobi(4, 0, 0, x + h) - jacobi(4, 0, 0, x - h)) / (2 * h)
    assert np.allclose(D, fd, atol=1e-7)


@pytest.mark.parametrize("a", [0, 1, 0.5])
def test_log_weight_quadrature(a):
    alpha, beta = rec_jaclog(5, a)
    x, w = gauss(alpha, beta)
    # integral of x^(p+a) log(1/x) on [0,1] = 1/(p+a+1)^2
    for p in range(8):
        assert abs(np.sum(w * x ** p) - 1.0 / (p + a + 1) ** 2) < 1e-12


def test_mod_chebyshev_recovers_legendre():
    """Feeding Legendre's own modified moments returns Legendre's
    recurrence."""
    N = 5
    alpham, betam = rec_jacobi01(2 * N, 0, 0)
    mom = np.zeros(2 * N)
    mom[0] = 1.0  # <P_0, 1> = 1; higher monic moments vanish
    for k in range(1, 2 * N):
        mom[k] = 0.0
    alpha, beta = mod_chebyshev(N, mom, alpham, betam)
    assert np.allclose(alpha, alpham[:N], atol=1e-13)
    assert np.allclose(beta[1:], betam[1:N], atol=1e-13)
