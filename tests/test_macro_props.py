"""Macro-layer properties beyond the parity/continuity suite in
test_macro.py (behavioral coverage of test/FIAT/unit/test_macro.py):
child-to-parent point containment, macro bubbles, is-macro flags,
Alfeld/iso dual-point placement, and split entity transforms."""

import math

import numpy as np
import pytest

from fiat_tpu.core.cells import ufc_simplex
from fiat_tpu.core.macro import AlfeldSplit, IsoSplit, PowellSabinSplit
from fiat_tpu.core.polyset import PolynomialSet, make_bubbles
from fiat_tpu import elements as fe

T, S = ufc_simplex(2), ufc_simplex(3)


@pytest.mark.parametrize("cell", (T, S), ids=("tri", "tet"))
def test_split_cache(cell):
    """Alfeld splits are cached on the cell (reference contract:
    FIAT/macro.py __new__ + _split_cache), and variant elements share
    the cached complex."""
    A = AlfeldSplit(cell)
    assert AlfeldSplit(cell) is A
    el = fe.Lagrange(cell, 1, variant="alfeld")
    assert el.get_reference_complex() is A


@pytest.mark.parametrize("split", (AlfeldSplit, IsoSplit, PowellSabinSplit))
@pytest.mark.parametrize("cell", (T, S), ids=("tri", "tet"))
def test_split_entity_transforms(split, cell):
    """Entity transforms on the split push sub-entity points into the
    closure of the right parent entity (distance zero)."""
    sc = split(cell)
    top = sc.get_topology()
    c2p = sc.get_child_to_parent()
    for dim in top:
        if dim == 0:
            continue
        for e in top[dim]:
            pts = np.asarray(sc.make_points(dim, e, dim + 1))
            if not len(pts):
                continue
            pdim, pent = c2p[dim][e]
            d = cell.distance_to_point_l1(pts, entity=(pdim, pent),
                                          rescale=True) \
                if pdim < cell.get_spatial_dimension() else \
                cell.distance_to_point_l1(pts, rescale=True)
            assert np.all(np.asarray(d) < 1e-12), (dim, e)


@pytest.mark.parametrize("cell", (T, S), ids=("tri", "tet"))
def test_split_child_to_parent_points(cell):
    """Child lattice points live inside the mapped parent lattice."""
    sc = IsoSplit(cell)
    dim_ = cell.get_spatial_dimension()
    degree = 2 if dim_ == 3 else 4
    top = cell.get_topology()
    parent_pts = {d: {e: set(map(tuple, np.round(
        cell.make_points(d, e, 2 * degree), 12)))
        for e in top[d]} for d in top}
    stop = sc.get_topology()
    c2p = sc.get_child_to_parent()
    for d in stop:
        for e in stop[d]:
            pts = set(map(tuple, np.round(sc.make_points(d, e, degree), 12)))
            pd, pe = c2p[d][e]
            assert pts <= parent_pts[pd][pe], (d, e)


@pytest.mark.parametrize("codim", (0, 1))
@pytest.mark.parametrize("split", (None, AlfeldSplit, IsoSplit))
@pytest.mark.parametrize("cell", (T, S), ids=("tri", "tet"))
def test_make_bubbles(cell, split, codim):
    sd = cell.get_spatial_dimension()
    degree = 5
    K = split(cell) if split else cell
    B = make_bubbles(K, degree, codim=codim)
    assert isinstance(B, PolynomialSet)
    top = K.get_topology()
    num_members = B.get_num_members()
    assert num_members == (math.comb(degree - 1, sd - codim)
                           * len(top[sd - codim]))
    points = []
    for dim in range(sd + 1 - codim):
        for e in sorted(top[dim]):
            points.extend(K.make_points(dim, e, degree))
    values = np.asarray(B.tabulate(np.asarray(points))[(0,) * sd])
    n_facet = len(points) - num_members
    assert np.allclose(values[:, :n_facet], 0, atol=1e-12)
    assert np.linalg.matrix_rank(values[:, n_facet:].T,
                                 tol=1e-12) == num_members


def test_is_macro_flags():
    assert not fe.Lagrange(T, 2).is_macroelement()
    assert fe.Lagrange(T, 2, variant="alfeld").is_macroelement()
    assert fe.Lagrange(T, 1, variant="iso").is_macroelement()
    assert fe.HsiehCloughTocher(T, 3).is_macroelement()
    assert not fe.DiscontinuousLagrange(T, 1).is_macroelement()
    assert fe.DiscontinuousLagrange(T, 1,
                                    variant="alfeld").is_macroelement()


@pytest.mark.parametrize("cell", (T, S), ids=("tri", "tet"))
@pytest.mark.parametrize("degree", (1, 2))
def test_alfeld_lagrange_duals_on_lattice(cell, degree):
    """Alfeld-variant Lagrange dofs sit on the SPLIT's lattice and the
    element remains nodal there."""
    el = fe.Lagrange(cell, degree, variant="alfeld")
    ref_complex = el.get_reference_complex()
    pts = np.asarray([list(n.get_point_dict())[0]
                      for n in el.get_dual_set().get_nodes()])
    d = np.asarray(ref_complex.get_parent().distance_to_point_l1(
        pts, rescale=True))
    assert np.all(d < 1e-12)
    tab = np.asarray(el.tabulate(0, pts)[
        (0,) * cell.get_spatial_dimension()])
    assert np.allclose(tab, np.eye(len(pts)), atol=1e-10)


def test_iso_lagrange_matches_p1_refinement():
    """Lagrange(1, iso) nodes = P2 lattice; tabulation is piecewise
    linear (exact midpoint interpolation of linears)."""
    el = fe.Lagrange(T, 1, variant="iso")
    p2 = fe.Lagrange(T, 2)
    pts_el = np.asarray([list(n.get_point_dict())[0]
                         for n in el.get_dual_set().get_nodes()])
    pts_p2 = np.asarray([list(n.get_point_dict())[0]
                         for n in p2.get_dual_set().get_nodes()])
    assert set(map(tuple, np.round(pts_el, 12))) == \
        set(map(tuple, np.round(pts_p2, 12)))
    x = np.asarray([[0.2, 0.1], [0.6, 0.3], [0.05, 0.9]])
    f = 2.0 * x[:, 0] - 0.5 * x[:, 1] + 0.25
    coefs = 2.0 * pts_el[:, 0] - 0.5 * pts_el[:, 1] + 0.25
    vals = coefs @ np.asarray(el.tabulate(0, x)[(0, 0)])
    assert np.allclose(vals, f, atol=1e-12)


# ---------------------------------------------------------------------------
# HDivTrace facet-integration properties (test/FIAT/unit/test_hdivtrace.py)

@pytest.mark.parametrize("dim", (2, 3))
@pytest.mark.parametrize("degree", (1, 3))
def test_hdiv_trace_facet_integration(dim, degree):
    """Trace tabulation integrates facet monomials exactly, both via
    point location and via the explicit entity-pair API."""
    from fiat_tpu.core.quadrature import make_quadrature
    ref_el = ufc_simplex(dim)
    q = make_quadrature(ufc_simplex(dim - 1), degree + 1)
    el = fe.HDivTrace(ref_el, degree)
    facet_el = el.dg_elements[dim - 1]
    nf = facet_el.space_dimension()
    qpts = np.asarray(q.get_points())
    qwts = np.asarray(q.get_weights())
    for f in range(dim + 1):
        cell_pts = np.asarray(ref_el.get_entity_transform(dim - 1, f)(qpts))
        ctab = np.asarray(el.tabulate(0, cell_pts)[(0,) * dim]
                          )[nf * f:nf * (f + 1)]
        etab = np.asarray(el.tabulate(0, qpts, entity=(dim - 1, f))
                          [(0,) * dim])[nf * f:nf * (f + 1)]
        for td in range(degree + 1):
            fn = (lambda x: 1.0) if td == 0 else (lambda x: x[0] ** td)
            coeffs = [float(n(fn)) for n in facet_el.get_dual_set().get_nodes()]
            want = np.dot([fn(x) for x in qpts], qwts)
            assert np.allclose(coeffs @ (ctab @ qwts), want, rtol=1e-13)
            assert np.allclose(coeffs @ (etab @ qwts), want, rtol=1e-13)


@pytest.mark.parametrize("dim", (2, 3))
def test_hdiv_trace_errors(dim):
    """Derivative tables of the trace element carry TraceError failure
    objects (the gem.Failure-style contract; the reference's own
    NaN-fill path crashes on this input, FIAT/hdiv_trace.py)."""
    from fiat_tpu.elements.hdiv_trace import TraceError
    ref_el = ufc_simplex(dim)
    el = fe.HDivTrace(ref_el, 1)
    interior = np.asarray(ref_el.make_points(dim, 0, dim + 1))
    tab = el.tabulate(1, interior)
    for a, t in tab.items():
        if sum(a) > 0:
            arr = np.asarray(t)
            assert arr.dtype == object and isinstance(arr.item(),
                                                      TraceError), a


@pytest.mark.parametrize("degree", (0, 1, 2))
def test_hdiv_trace_tensor_product_cell(degree):
    """Trace element on the TP (interval x interval) cell: per-facet
    tabulation integrates facet monomials exactly (reference oracle:
    test/FIAT/unit/test_hdivtrace.py:86 test_quad_trace)."""
    from fiat_tpu.core.cells import TensorProductCell, ufc_simplex
    from fiat_tpu.core.quadrature import make_quadrature
    tpc = TensorProductCell(ufc_simplex(1), ufc_simplex(1))
    el = fe.HDivTrace(tpc, (degree, degree))
    q = make_quadrature(ufc_simplex(1), degree + 1)
    qpts, qwts = np.asarray(q.get_points()), np.asarray(q.get_weights())
    for i, (edim, eid) in enumerate([((0, 1), 0), ((0, 1), 1),
                                     ((1, 0), 0), ((1, 0), 1)]):
        facet_el = el.dg_elements[edim]
        nf = facet_el.space_dimension()
        tab = np.asarray(el.tabulate(0, qpts, entity=(edim, eid))
                         [(0, 0)])[nf * i:nf * (i + 1)]
        for td in range(degree + 1):
            coeffs = [float(n(lambda x: x[0] ** td))
                      for n in facet_el.get_dual_set().get_nodes()]
            want = np.dot(qpts[:, 0] ** td, qwts)
            assert np.allclose(coeffs @ (tab @ qwts), want,
                               rtol=1e-13), (edim, eid, td)
