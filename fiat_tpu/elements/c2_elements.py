"""Triangular C2 elements (parity with /root/reference/FIAT/c2_elements.py):
Bramble-Zlamal (degree 9 polynomial) and AlfeldC2 (quintic C2 spline on a
double Alfeld split)."""

from ..core import cells as cl
from ..core import finite_element, polyset
from ..core.dualset import DualSet
from ..core.expansions import mis
from ..core.functionals import (IntegralMoment, IntegralMomentOfDerivative,
                                PointDerivative, PointEvaluation)
from ..core.jacobi import eval_jacobi_batch, eval_jacobi_deriv_batch
from ..core.macro import AlfeldSplit, CkPolynomialSet
from ..core.quadrature import FacetQuadratureRule
from ..core.variants import parse_quadrature_scheme


class C2DualSet(DualSet):
    """Vertex vorder-jets + edge normal-derivative Jacobi moments +
    interior moments (C4 at vertices for polynomials, C2 for macro)."""

    def __init__(self, ref_complex, degree, vorder=None, reduced=False,
                 quad_scheme=None):
        if vorder is None:
            vorder = 2 if ref_complex.is_macrocell() else 4
        if degree < 2 * vorder + 1:
            raise ValueError(f"C2 elements need degree >= {2 * vorder + 1}")
        ref_el = ref_complex.get_parent() or ref_complex
        if ref_el.get_shape() != cl.TRIANGLE:
            raise ValueError("C2 elements only defined on triangles")

        top = ref_el.get_topology()
        verts = ref_el.get_vertices()
        sd = ref_el.get_spatial_dimension()
        entity_ids = {dim: {e: [] for e in sorted(top[dim])} for dim in sorted(top)}

        nodes = []
        for v in sorted(top[0]):
            pt = verts[v]
            cur = len(nodes)
            nodes.append(PointEvaluation(ref_el, pt))
            nodes.extend(PointDerivative(ref_el, pt, alpha)
                         for i in range(1, vorder + 1) for alpha in mis(sd, i))
            entity_ids[0][v].extend(range(cur, len(nodes)))

        k = degree - 2 * vorder
        facet = cl.ufc_simplex(1)
        Q_ref = parse_quadrature_scheme(facet, degree - 2 + k, quad_scheme)
        x = facet.compute_barycentric_coordinates(Q_ref.get_points())
        xref = x[:, [1]] - x[:, [0]]

        if reduced:
            raise NotImplementedError
        phis = eval_jacobi_batch(vorder, vorder, k, xref)
        dphis = 2 * eval_jacobi_deriv_batch(vorder, vorder, k, xref, order=1)
        ddphis = 4 * eval_jacobi_deriv_batch(vorder, vorder, k, xref, order=2)
        for e in sorted(top[1]):
            Q = FacetQuadratureRule(ref_el, 1, e, Q_ref, avg=True)
            n = ref_el.compute_normal(e)
            cur = len(nodes)
            nodes.extend(IntegralMoment(ref_el, Q, ddphi) for ddphi in ddphis[2:])
            nodes.extend(IntegralMomentOfDerivative(ref_el, Q, dphi, n)
                         for dphi in dphis[1:])
            nodes.extend(IntegralMomentOfDerivative(ref_el, Q, phi, n, n)
                         for phi in phis)
            entity_ids[1][e].extend(range(cur, len(nodes)))

        q = degree - 3 * (vorder // 2 + 1)
        if q >= 0:
            Q = parse_quadrature_scheme(ref_complex, degree + q, quad_scheme)
            Pq = polyset.ONPolynomialSet(ref_el, q, scale=1)
            phis = Pq.tabulate(Q.get_points())[(0,) * sd]
            phis *= 1 / ref_el.volume()
            cur = len(nodes)
            nodes.extend(IntegralMoment(ref_el, Q, phi) for phi in phis)
            entity_ids[sd][0].extend(range(cur, len(nodes)))

        super().__init__(nodes, ref_el, entity_ids)


class BrambleZlamalC2(finite_element.CiarletElement):
    """The Bramble-Zlamal C2 element (degree-9 polynomials)."""

    def __init__(self, ref_el, degree=9, reduced=False, quad_scheme=None):
        poly_set = polyset.ONPolynomialSet(ref_el, degree)
        dual = C2DualSet(ref_el, degree, reduced=reduced, quad_scheme=quad_scheme)
        super().__init__(poly_set, dual, degree, formdegree=0)


def AlfeldC2Space(ref_el, degree):
    """The C2 spline space on the double Alfeld split (Lai & Schumaker
    Section 7.5 for the quintic case)."""
    ref_complex = AlfeldSplit(AlfeldSplit(ref_el))
    order = {}
    order[1] = dict.fromkeys(ref_complex.get_interior_facets(1), 2)
    order[1].update(dict.fromkeys(range(3, 6), degree - 2))
    order[0] = dict.fromkeys(ref_complex.get_interior_facets(0), degree - 1)
    order[0][3] = degree - 2
    return CkPolynomialSet(ref_complex, degree, order=order, variant="bubble")


class AlfeldC2(finite_element.CiarletElement):
    """The Alfeld C2 macroelement on a double barycentric split."""

    def __init__(self, ref_el, degree=5, reduced=False, quad_scheme=None):
        poly_set = AlfeldC2Space(ref_el, degree)
        ref_complex = poly_set.get_reference_element()
        dual = C2DualSet(ref_complex, degree, reduced=reduced,
                         quad_scheme=quad_scheme)
        super().__init__(poly_set, dual, degree, formdegree=0)
