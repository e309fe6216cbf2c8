"""Wu-Xu H3-nonconforming elements (parity with
/root/reference/FIAT/wuxu.py): P3 + bubble*P1 (+ bubble^2*P1 for the robust
variant) with vertex 1-jets and edge normal-derivative averages."""

import numpy as np

from ..core import expansions, finite_element, polyset
from ..core.dualset import DualSet
from ..core.expansions import mis
from ..core.functionals import (IntegralMomentOfDerivative, PointDerivative,
                                PointEvaluation)
from ..core.quadrature import FacetQuadratureRule
from ..core.quadrature_schemes import create_quadrature
from .bubble import Bubble
from .lagrange import Lagrange

polydim = expansions.polynomial_dimension


def WuXuH3NCSpace(ref_el, robust=False):
    """P3 + b_T P1 (+ b_T^2 P1 for the robust variant)."""
    sd = ref_el.get_spatial_dimension()
    assert sd == 2
    embedded_degree = 7 if robust else 4
    pk = polyset.ONPolynomialSet(ref_el, embedded_degree)

    dimp1 = polydim(ref_el, 1)
    dimp3 = polydim(ref_el, 3)
    dimpk = polydim(ref_el, embedded_degree)
    p3frompk = pk.take(list(range(dimp3)))

    bT = Bubble(ref_el, 3)
    p1 = Lagrange(ref_el, 1)

    Q = create_quadrature(ref_el, 2 * embedded_degree)
    Qpts, Qwts = Q.get_points(), Q.get_weights()
    bT_at_qpts = bT.tabulate(0, Qpts)[(0,) * sd][0, :]
    p1_at_qpts = p1.tabulate(0, Qpts)[(0,) * sd]
    pk_at_qpts = pk.tabulate(Qpts)[(0,) * sd]

    bubble_coeffs = np.zeros((6, dimpk))
    foo = bT_at_qpts * p1_at_qpts * Qwts
    bubble_coeffs[:dimp1, :] = np.dot(foo, pk_at_qpts.T)
    if robust:
        foo = bT_at_qpts * foo
        bubble_coeffs[dimp1:2 * dimp1, :] = np.dot(foo, pk_at_qpts.T)

    bubbles = polyset.PolynomialSet(ref_el, 3, embedded_degree,
                                    pk.get_expansion_set(), bubble_coeffs)
    return polyset.polynomial_set_union_normalized(p3frompk, bubbles)


def _vertex_jets_plus_edge_normals(ref_el, degree, orders):
    """Vertex 1-jets + averages of the given normal-derivative orders."""
    sd = ref_el.get_spatial_dimension()
    top = ref_el.get_topology()
    entity_ids = {dim: {e: [] for e in top[dim]} for dim in top}
    nodes = []
    verts = ref_el.get_vertices()
    for v in sorted(top[0]):
        cur = len(nodes)
        nodes.append(PointEvaluation(ref_el, verts[v]))
        nodes.extend(PointDerivative(ref_el, verts[v], alpha)
                     for alpha in mis(sd, 1))
        entity_ids[0][v].extend(range(cur, len(nodes)))

    Q_ref = create_quadrature(ref_el.construct_subelement(1),
                              degree - min(orders))
    f = np.ones(Q_ref.get_weights().shape)
    for e in sorted(top[1]):
        n = ref_el.compute_normal(e)
        Q = FacetQuadratureRule(ref_el, 1, e, Q_ref, avg=True)
        cur = len(nodes)
        for k in orders:
            nodes.append(IntegralMomentOfDerivative(ref_el, Q, f, *([n] * k)))
        entity_ids[1][e].extend(range(cur, len(nodes)))
    return nodes, entity_ids


class WuXuRobustH3NCDualSet(DualSet):
    """Vertex jets + first AND second edge normal-derivative averages."""

    def __init__(self, ref_el, degree):
        assert ref_el.get_spatial_dimension() == 2
        nodes, entity_ids = _vertex_jets_plus_edge_normals(ref_el, degree, (1, 2))
        super().__init__(nodes, ref_el, entity_ids)


class WuXuH3NCDualSet(DualSet):
    """Vertex jets + second edge normal-derivative averages."""

    def __init__(self, ref_el, degree):
        assert ref_el.get_spatial_dimension() == 2
        nodes, entity_ids = _vertex_jets_plus_edge_normals(ref_el, degree, (2,))
        super().__init__(nodes, ref_el, entity_ids)


class WuXuRobustH3NC(finite_element.CiarletElement):
    """The robust Wu-Xu H3 nonconforming element."""

    def __init__(self, ref_el, degree=7):
        poly_set = WuXuH3NCSpace(ref_el, robust=True)
        assert degree == poly_set.degree
        dual = WuXuRobustH3NCDualSet(ref_el, degree)
        super().__init__(poly_set, dual, degree)


class WuXuH3NC(finite_element.CiarletElement):
    """The Wu-Xu H3 nonconforming element."""

    def __init__(self, ref_el, degree=4):
        poly_set = WuXuH3NCSpace(ref_el)
        assert degree == poly_set.degree
        dual = WuXuH3NCDualSet(ref_el, degree)
        super().__init__(poly_set, dual, degree)
