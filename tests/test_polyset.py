"""Polynomial-set layer properties (behavioral parity with
test/FIAT/unit/test_polynomial.py and test_nodal_enriched.py):
closed-form sympy values of the Dubiner expansion, bubble duality,
union of polynomial sets with mismatched embedded degrees, and the
nodal-enriched reconstruction identity."""

from itertools import chain

import numpy as np
import pytest

from fiat_tpu.core import expansions
from fiat_tpu.core.cells import default_simplex, ufc_simplex
from fiat_tpu.core import polyset
from fiat_tpu.core.quadrature_schemes import create_quadrature


@pytest.fixture(params=(1, 2, 3))
def cell(request):
    return default_simplex(request.param)


def test_expansion_values_sympy(cell):
    """Expansion tables match the closed-form Jacobi/Duffy product
    basis evaluated symbolically at rational points."""
    import sympy
    degree = 6
    dim = cell.get_spatial_dimension()
    U = expansions.ExpansionSet(cell)
    npts = 4
    dpoints, rpoints = [], []
    from fiat_tpu.core.cells import lattice_iter
    for alpha in lattice_iter(1, npts, dim):
        dpoints.append(tuple(2 * np.array(alpha, dtype="d") / npts - 1))
        rpoints.append(tuple(2 * sympy.Rational(a, npts) - 1
                             for a in alpha))
    Uvals = U.tabulate(degree, dpoints)
    idx = (lambda p: p, expansions.morton_index2,
           expansions.morton_index3)[dim - 1]
    eta = sympy.DeferredVector("eta")
    half = sympy.Rational(1, 2)

    def duffy(pt):
        if len(pt) == 1:
            return pt
        if len(pt) == 2:
            return (2 * (1 + pt[0]) / (1 - pt[1]) - 1, pt[1])
        return (2 * (1 + pt[0]) / (-pt[1] - pt[2]) - 1,
                2 * (1 + pt[1]) / (1 - pt[2]) - 1, pt[2])

    def closed_form(p, q=0, r=0):
        f = sympy.jacobi(p, 0, 0, eta[0]) * sympy.sqrt(half + p)
        if dim >= 2:
            f *= (sympy.jacobi(q, 2 * p + 1, 0, eta[1])
                  * ((1 - eta[1]) / 2) ** p * sympy.sqrt(1 + p + q))
        if dim >= 3:
            f *= (sympy.jacobi(r, 2 * p + 2 * q + 2, 0, eta[2])
                  * ((1 - eta[2]) / 2) ** (p + q)
                  * sympy.sqrt(1 + half + p + q + r))
        return f

    for i in range(degree + 1):
        for indices in polyset.mis(dim, i):
            phi = closed_form(*indices)
            exact = np.array([float(phi.subs(dict(zip(eta, duffy(r)))))
                              for r in rpoints])
            assert np.allclose(np.asarray(Uvals[idx(*indices)]), exact,
                               atol=1e-13), indices


def test_bubble_duality(cell):
    """make_bubbles yields a basis L2-dual (up to scaling) to its own
    sign-normalised self on the interior."""
    degree = 8
    sd = cell.get_spatial_dimension()
    B = polyset.make_bubbles(cell, degree)
    Q = create_quadrature(cell, 2 * B.get_degree() - sd - 1)
    qpts, qwts = Q.get_points(), np.asarray(Q.get_weights())
    phi = np.asarray(B.tabulate(qpts)[(0,) * sd])
    phi_dual = phi / abs(phi[0])
    results = (2 ** sd) * np.dot(phi_dual * qwts, phi.T)
    assert np.allclose(results, np.diag(np.diag(results)))
    assert np.allclose(np.diag(results), 1.0)


def test_union_of_polysets_mixed_degree(cell):
    """polynomial_set_union_normalized accepts operands of different
    embedded degrees (the RT-space construction pattern)."""
    k = 3
    sd = cell.get_spatial_dimension()
    vecPk = polyset.ONPolynomialSet(cell, k, (sd,))
    vec_Pkp1 = polyset.ONPolynomialSet(cell, k + 1, (sd,),
                                       scale="orthonormal")
    dimPkp1 = expansions.polynomial_dimension(cell, k + 1)
    dimPk = expansions.polynomial_dimension(cell, k)
    dimPkm1 = expansions.polynomial_dimension(cell, k - 1)
    vec_Pk_from_Pkp1 = vec_Pkp1.take(list(chain(
        *(range(i * dimPkp1, i * dimPkp1 + dimPk) for i in range(sd)))))
    Pkp1 = polyset.ONPolynomialSet(cell, k + 1, scale="orthonormal")
    PkH = Pkp1.take(list(range(dimPkm1, dimPk)))

    Q = create_quadrature(cell, 2 * (k + 1))
    qpts, qwts = Q.get_points(), np.asarray(Q.get_weights())
    PkH_at = np.asarray(PkH.tabulate(qpts)[(0,) * sd])
    Pkp1_at = np.asarray(Pkp1.tabulate(qpts)[(0,) * sd])
    x = np.asarray(qpts).T
    PkHx_at = PkH_at[:, None, :] * x[None, :, :]
    coeffs = np.dot(PkHx_at * qwts, Pkp1_at.T)
    PkHx = polyset.PolynomialSet(cell, k, k + 1,
                                 vec_Pkp1.get_expansion_set(), coeffs)

    same = polyset.polynomial_set_union_normalized(vec_Pk_from_Pkp1, PkHx)
    diff = polyset.polynomial_set_union_normalized(vecPk, PkHx)
    Q2 = create_quadrature(cell, 2 * k)
    s = np.asarray(same.tabulate(Q2.get_points())[(0,) * sd])
    d = np.asarray(diff.tabulate(Q2.get_points())[(0,) * sd])
    assert np.allclose(s - d, 0)


@pytest.mark.parametrize("sd", (2, 3))
def test_nodal_enriched_reconstructs_guzman_neilan(sd):
    """NodalEnriched(vector P1, facet-restricted GN bubbles) rebuilds
    the Guzman-Neilan element exactly -- the operands carry MISMATCHED
    expansion sets (plain vs macro complex), reconciled by the union
    (test/FIAT/unit/test_nodal_enriched.py)."""
    from fiat_tpu import elements as fe
    cell = ufc_simplex(sd)
    # non-macro vector P1 extracted from hierarchical Bernardi-Raugel
    BR = fe.BernardiRaugel(cell, 1, hierarchical=True)
    P1 = fe.RestrictedElement(BR, restriction_domain="vertex",
                              take_closure=False)
    GN = fe.GuzmanNeilanFirstKindH1(cell, 1)
    MFB = fe.RestrictedElement(GN, restriction_domain="facet",
                               take_closure=False)
    el = fe.NodalEnrichedElement(P1, MFB)

    coeffs = np.asarray(el.get_nodal_basis().get_coeffs())
    V = np.tensordot(np.asarray(GN.get_dual_set()
                                .to_riesz(el.get_nodal_basis())),
                     coeffs, axes=(tuple(range(1, coeffs.ndim)),) * 2)
    assert np.allclose(V, np.eye(*V.shape))

    ref_complex = GN.get_reference_complex()
    top = ref_complex.get_topology()
    pts = []
    for dim in top:
        for entity in top[dim]:
            pts.extend(ref_complex.make_points(dim, entity, GN.degree()))
    assert np.allclose(np.asarray(el.tabulate(0, pts)[(0,) * sd]),
                       np.asarray(GN.tabulate(0, pts)[(0,) * sd]))
