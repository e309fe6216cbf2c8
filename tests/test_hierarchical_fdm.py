"""Hierarchical (Legendre / IntegratedLegendre) and FDM family
properties (behavioral parity with test/FIAT/unit/test_hierarchical.py
and test_fdm.py): dual-interpolation exactness on monomials and the
characteristic sparsity of mass/stiffness moment matrices."""

import numpy as np
import pytest

from fiat_tpu import elements as fe
from fiat_tpu.core.cells import ufc_simplex
from fiat_tpu.core.quadrature import make_quadrature


def _nnz(A):
    return A.size - np.sum(np.isclose(A, 0.0, rtol=1e-14))


def _moments(v, u, q):
    return np.dot(np.asarray(v) * np.asarray(q.get_weights()),
                  np.asarray(u).T)


@pytest.mark.parametrize("dim", (1, 2, 3))
@pytest.mark.parametrize("family", ("CG", "DG"))
@pytest.mark.parametrize("deg", (1, 3, 6))
def test_hierarchical_interpolation_exactness(dim, family, deg):
    degree = deg - 1 if family == "DG" else deg
    s = ufc_simplex(dim)
    q = make_quadrature(s, degree + 1)
    el = (fe.IntegratedLegendre if family == "CG" else fe.Legendre)(
        s, degree)
    tab = np.asarray(el.tabulate(0, q.get_points())[(0,) * dim])
    for test_degree in range(degree + 1):
        v = lambda x: sum(x) ** test_degree  # noqa: E731
        coefs = [float(n(v)) for n in el.get_dual_set().get_nodes()]
        integral = np.dot(coefs, tab @ np.asarray(q.get_weights()))
        assert np.allclose(integral, q.integrate(v), rtol=1e-13)


@pytest.mark.parametrize("family", ("CG", "DG"))
@pytest.mark.parametrize("deg", (1, 2, 3, 4, 5, 6))
def test_hierarchical_sparsity(family, deg):
    degree = deg - 1 if family == "DG" else deg
    s = ufc_simplex(1)
    q = make_quadrature(s, degree + 1)
    if family == "CG":
        el = fe.IntegratedLegendre(s, degree)
        expected = [5 * min(degree, 3) + 3 * max(0, degree - 3) - 1,
                    degree + 3]
    else:
        el = fe.Legendre(s, degree)
        expected = [degree + 1]
    tab = el.tabulate(len(expected) - 1, q.get_points())
    for k, ennz in enumerate(expected):
        A = sum(_moments(tab[a], tab[a], q) for a in tab if sum(a) == k)
        assert _nnz(A) == ennz, (k, _nnz(A), ennz)


def _fdm(ref_el, family, degree):
    return {"CG": fe.FDMLagrange, "DG": fe.FDMDiscontinuousLagrange,
            "BrokenH1": fe.FDMBrokenH1, "BrokenL2": fe.FDMBrokenL2,
            "Quadrature": fe.FDMQuadrature}[family](ref_el, degree)


FDM_FAMILIES = ("CG", "DG", "BrokenH1", "BrokenL2", "Quadrature")


@pytest.mark.parametrize("family", FDM_FAMILIES)
@pytest.mark.parametrize("deg", (1, 3, 6))
def test_fdm_interpolation_exactness(family, deg):
    degree = deg - 1 if family in ("DG", "BrokenL2") else deg
    s = ufc_simplex(1)
    q = make_quadrature(s, degree + 1)
    el = _fdm(s, family, degree)
    tab = np.asarray(el.tabulate(0, q.get_points())[(0,)])
    qpts = np.asarray(q.get_points())
    qwts = np.asarray(q.get_weights())
    for test_degree in range(degree + 1):
        coefs = [float(n(lambda x: x[0] ** test_degree))
                 for n in el.get_dual_set().get_nodes()]
        integral = np.dot(coefs, tab @ qwts)
        reference = np.dot(qpts[:, 0] ** test_degree, qwts)
        assert np.allclose(integral, reference, rtol=1e-13)


@pytest.mark.parametrize("family", FDM_FAMILIES)
@pytest.mark.parametrize("deg", (1, 2, 3, 4, 5, 6))
def test_fdm_sparsity(family, deg):
    """FDM bases diagonalise the even-order operators: the mass and
    stiffness moment matrices have the documented sparsity."""
    degree = deg - 1 if family in ("DG", "BrokenL2") else deg
    s = ufc_simplex(1)
    q = make_quadrature(s, degree + 1)
    el = _fdm(s, family, degree)
    expected = {"CG": [degree + 3, 5 * degree - 1],
                "DG": [degree + 1],
                "BrokenH1": [degree + 1, degree],
                "BrokenL2": [degree + 1],
                "Quadrature": [degree + 1,
                               3 * degree - 1 - (degree == 1)]}[family]
    tab = el.tabulate(len(expected) - 1, q.get_points())
    for k, ennz in enumerate(expected):
        assert _nnz(_moments(tab[(k,)], tab[(k,)], q)) == ennz, (k, ennz)
