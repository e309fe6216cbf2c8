"""Discrete Stokes-complex properties of the divergence-free macro
families (behavioral parity with test/FIAT/unit/test_stokes_complex.py):
exact-sequence containments rot(V0) <= V1, div(V1) == V2, C0-ness and
polynomial-degree inclusions of the macro vector spaces, and the
Guzman-Neilan facet-divergence / Bernardi-Raugel trace identities.

Also covers the pointwise-dual rebuild (core/pointwise_dual.py, parity
with test/FIAT/unit/test_pointwise_dual.py)."""

from math import factorial

import numpy as np
import pytest

from fiat_tpu.core.cells import symmetric_simplex, ufc_simplex
from fiat_tpu.core.macro import CkPolynomialSet
from fiat_tpu.core.pointwise_dual import compute_pointwise_dual
from fiat_tpu.core.polyset import ONPolynomialSet
from fiat_tpu.core.quadrature import FacetQuadratureRule
from fiat_tpu.core.quadrature_schemes import create_quadrature
from fiat_tpu.core.cells import make_lattice
from fiat_tpu import elements as fe
from fiat_tpu.elements.alfeld_sorokina import AlfeldSorokinaSpace
from fiat_tpu.elements.arnold_qin import ArnoldQinSpace
from fiat_tpu.elements.christiansen_hu import ChristiansenHuSpace
from fiat_tpu.elements.guzman_neilan import GuzmanNeilanSpace

T = ufc_simplex(2)
S = ufc_simplex(3)


def span_ge(A, B, tol=1e-8):
    """span(rows of A) >= span(rows of B) (flattening trailing axes)."""
    A = np.asarray(A).reshape(np.shape(A)[0], -1)
    B = np.asarray(B).reshape(np.shape(B)[0], -1)
    sol, *_ = np.linalg.lstsq(A.T, B.T, rcond=None)
    return np.allclose(A.T @ sol, B.T, atol=tol)


def span_eq(A, B):
    return span_ge(A, B) and span_ge(B, A)


def div(tabs):
    return sum(np.asarray(tabs[a])[:, a.index(1), :]
               for a in tabs if sum(a) == 1)


def rot(tabs):
    return np.stack([np.asarray(tabs[(0, 1)]), -np.asarray(tabs[(1, 0)])],
                    axis=1)


def complex_points(K, degree):
    top = K.get_topology()
    pts = []
    for dim in top:
        for entity in top[dim]:
            pts.extend(K.make_points(dim, entity, degree))
    return np.asarray(pts)


def check_h1div_space(V, degree, reduced=False, bubble=False):
    """div(V) is spanned by a C0 basis on the split, and V >= [Pk]^d."""
    A = V.get_reference_element()
    sd = A.get_spatial_dimension()
    z = (0,) * sd
    pts = complex_points(A, degree + 2)
    V_tab = V.tabulate(pts, 1)
    V_div = div(V_tab)

    C0 = CkPolynomialSet(A, degree - 1, order=0, variant="bubble")
    C0_tab = np.asarray(C0.tabulate(pts)[z])
    assert span_eq(V_div, C0_tab)
    if bubble:
        assert span_eq(V_div[-(sd + 1):], C0_tab[-1:])

    k = degree - 1 if reduced else degree
    cell = A.get_parent() or A
    Pk = ONPolynomialSet(cell, k, shape=(sd,))
    assert span_ge(np.asarray(V_tab[z]), np.asarray(Pk.tabulate(pts)[z]))


@pytest.mark.parametrize("cell", (T, S), ids=("tri", "tet"))
@pytest.mark.parametrize("degree", (2, 3))
def test_h1div_alfeld_sorokina(cell, degree):
    check_h1div_space(AlfeldSorokinaSpace(cell, degree), degree)


@pytest.mark.parametrize("reduced", (False, True), ids=("full", "reduced"))
def test_h1div_guzman_neilan(reduced):
    cell, degree = S, 2
    sd = cell.get_spatial_dimension()
    el = fe.GuzmanNeilanH1div(cell, degree, reduced=reduced)
    reduced_dim = el.space_dimension() - (sd - 1) * (sd + 1)
    V = el.get_nodal_basis().take(list(range(reduced_dim)))
    check_h1div_space(V, degree, reduced=reduced, bubble=True)


def check_stokes_complex(spaces, degree):
    """Exact-sequence containments over the common reference complex."""
    A = spaces[0].get_reference_complex()
    sd = A.get_spatial_dimension()
    z = (0,) * sd
    pts = complex_points(A, degree + 2)
    tab = [V.tabulate(1, pts) for V in spaces]
    if len(tab) > 2:
        assert span_ge(np.asarray(tab[1][z]), rot(tab[0]))
    assert span_eq(np.asarray(tab[-1][z]), div(tab[-2]))
    cell = A.get_parent() or A
    Pk = ONPolynomialSet(cell, degree, shape=(sd,))
    assert span_ge(np.asarray(tab[-2][z]), np.asarray(Pk.tabulate(pts)[z]))


def _rHCT(cell):
    return fe.RestrictedElement(fe.HsiehCloughTocher(cell, reduced=True),
                                restriction_domain="vertex")


def _rAQ(cell):
    return fe.RestrictedElement(fe.ArnoldQin(cell, reduced=True),
                                indices=list(range(9)))


@pytest.mark.parametrize("reduced", (False, True), ids=("full", "reduced"))
@pytest.mark.parametrize("sobolev", ("H1", "H1div"))
def test_hct_stokes_complex(sobolev, reduced):
    cell = T
    if sobolev == "H1":
        spaces = ([_rHCT(cell), _rAQ(cell)] if reduced
                  else [fe.HsiehCloughTocher(cell), fe.ArnoldQin(cell)])
        spaces.append(fe.DiscontinuousLagrange(cell, 0))
        degree = 1
    else:
        if reduced:
            spaces = [_rHCT(cell), fe.GuzmanNeilanH1div(cell, reduced=True),
                      fe.Lagrange(cell, 1, variant="alfeld")]
            degree = 1
        else:
            spaces = [fe.HsiehCloughTocher(cell), fe.AlfeldSorokina(cell),
                      fe.Lagrange(cell, 1, variant="alfeld")]
            degree = 2
    check_stokes_complex(spaces, degree)


@pytest.mark.parametrize("cell", (T, S), ids=("tri", "tet"))
@pytest.mark.parametrize("kind", (1, 2, "H1div", "H1div-red"))
def test_gn_stokes_pairs(cell, kind):
    order = cell.get_spatial_dimension() - 1
    if kind == 1:
        spaces = [fe.GuzmanNeilanFirstKindH1(cell, order),
                  fe.DiscontinuousLagrange(cell, order - 1)]
        degree = order
    elif kind == 2:
        spaces = [fe.GuzmanNeilanSecondKindH1(cell, order),
                  fe.DiscontinuousLagrange(cell, order - 1, variant="alfeld")]
        degree = order
    elif kind == "H1div":
        spaces = [fe.GuzmanNeilanH1div(cell),
                  fe.Lagrange(cell, 1, variant="alfeld")]
        degree = 2
    else:
        spaces = [fe.GuzmanNeilanH1div(cell, reduced=True),
                  fe.Lagrange(cell, 1, variant="alfeld")]
        degree = 1
    check_stokes_complex(spaces, degree)


@pytest.mark.parametrize("element", (fe.GuzmanNeilanFirstKindH1,
                                     fe.BernardiRaugel))
@pytest.mark.parametrize("sd", (2, 3))
def test_gn_facet_div_dofs(element, sd):
    """Divergence moments hit exactly the facet-bubble dofs with the
    signed 1/(sd-1)! facet weights."""
    cell = symmetric_simplex(sd)
    el = element(cell, 1)
    degree = el.degree()
    assert degree == sd
    Q = create_quadrature(el.get_reference_complex(), degree - 1)
    tab = el.tabulate(1, Q.get_points())
    div_moments = div(tab) @ np.asarray(Q.get_weights())
    expected = np.zeros_like(div_moments)
    entity_ids = el.entity_dofs()
    for f in entity_ids[sd - 1]:
        expected[entity_ids[sd - 1][f][0]] = (-1.0) ** f / factorial(sd - 1)
    assert np.allclose(div_moments, expected)


@pytest.mark.parametrize("sd", (2, 3))
def test_gn_trace_matches_bernardi_raugel(sd):
    """GN and BR agree on every facet trace (normal and tangential)."""
    cell = symmetric_simplex(sd)
    gn = fe.GuzmanNeilanFirstKindH1(cell, 1)
    br = fe.BernardiRaugel(cell, 1)
    ref_face = cell.construct_subelement(sd - 1)
    Q_face = create_quadrature(ref_face, 2)
    phis = np.asarray(ONPolynomialSet(ref_face, 1)
                      .tabulate(Q_face.get_points())[(0,) * (sd - 1)])
    for f in cell.get_topology()[sd - 1]:
        Q = FacetQuadratureRule(cell, sd - 1, f, Q_face)
        vals = (np.asarray(gn.tabulate(0, Q.get_points())[(0,) * sd])
                - np.asarray(br.tabulate(0, Q.get_points())[(0,) * sd]))
        wts = np.asarray(Q.get_weights())
        dirs = [cell.compute_normal(f)] + list(cell.compute_tangents(sd - 1, f))
        for direction in dirs:
            trace = np.tensordot(vals, direction, axes=(1, 0))
            assert np.allclose((trace * wts) @ phis.T, 0)


@pytest.mark.parametrize("cell", (T, S), ids=("tri", "tet"))
@pytest.mark.parametrize("family", ("AQ", "CH", "GN", "GN2"))
def test_minimal_stokes_space(cell, family):
    """C0 Stokes spaces: full rank, componentwise C0, div in P0, and
    reduced space contained in the full space."""
    sd = cell.get_spatial_dimension()
    if family == "GN":
        degree, space = 1, GuzmanNeilanSpace
    elif family == "GN2":
        degree = 1
        space = lambda *a, **kw: GuzmanNeilanSpace(*a, kind=2, **kw)  # noqa: E731
    elif family == "CH":
        degree, space = 1, ChristiansenHuSpace
    else:
        if sd != 2:
            pytest.skip("Arnold-Qin is 2D only")
        degree, space = 2, ArnoldQinSpace

    W = space(cell, degree)
    V = space(cell, degree, reduced=True)
    K = W.get_reference_element()
    pts = complex_points(K, degree + 2)
    z = (0,) * sd
    C0_tab = np.asarray(CkPolynomialSet(K, sd, order=0, variant="bubble")
                        .tabulate(pts)[z])
    Wtab = W.tabulate(pts, 1)
    Vtab = V.tabulate(pts, 1)
    for Xtab in (Vtab, Wtab):
        X0 = np.asarray(Xtab[z])
        sig = np.linalg.svd(X0.reshape(-1, sd * len(pts)).T,
                            compute_uv=False)
        assert all(sig > 1e-10)
        for k in range(sd):
            assert span_ge(C0_tab, X0[:, k, :])
        divX = div(Xtab)[:V.get_num_members()]
        if family in ("GN", "GN2"):
            ref_el = K if family == "GN2" else K.get_parent()
            P0_tab = np.asarray(ONPolynomialSet(ref_el, degree - 1)
                                .tabulate(pts)[z])
            assert span_eq(divX, P0_tab)
        else:
            assert np.allclose(divX, divX[:, :1])
    assert W.get_num_members() > V.get_num_members()
    assert span_ge(np.asarray(Wtab[z]), np.asarray(Vtab[z]))


@pytest.mark.parametrize("make", (
    lambda: fe.CubicHermite(T),
    lambda: fe.Morley(T),
    lambda: fe.Argyris(T),
    lambda: fe.BrezziDouglasMarini(T, 1, variant="integral")),
    ids=("hermite", "morley", "argyris", "bdm1-integral"))
def test_pointwise_dual_recovers_riesz(make):
    """compute_pointwise_dual rebuilds a dual whose Riesz representation
    matches the element's own (test/FIAT/unit/test_pointwise_dual.py)."""
    el = make()
    poly_set = el.get_nodal_basis()
    pts = make_lattice(el.get_reference_element().get_vertices(),
                       el.degree())
    assert np.allclose(np.asarray(el.get_dual_set().to_riesz(poly_set)),
                       np.asarray(compute_pointwise_dual(el, pts)
                                  .to_riesz(poly_set)))
