"""Hsieh-Clough-Tocher macroelement (parity with /root/reference/FIAT/hct.py):
C^1 cubic (or higher, Groselj-Knez super-smooth) space on the Alfeld split,
vertex 1-jets + edge normal-derivative moments."""

from ..core import cells as cl
from ..core import finite_element, polyset
from ..core.dualset import DualSet
from ..core.expansions import mis
from ..core.functionals import (IntegralMoment, IntegralMomentOfDerivative,
                                IntegralMomentOfNormalDerivative,
                                PointDerivative, PointEvaluation)
from ..core.jacobi import eval_jacobi, eval_jacobi_batch, eval_jacobi_deriv_batch
from ..core.macro import AlfeldSplit, CkPolynomialSet
from ..core.quadrature import FacetQuadratureRule
from ..core.variants import parse_quadrature_scheme


class HCTDualSet(DualSet):
    def __init__(self, ref_complex, degree, reduced=False, quad_scheme=None):
        if reduced and degree != 3:
            raise ValueError("Reduced HCT only defined for degree = 3")
        if degree < 3:
            raise ValueError("HCT only defined for degree >= 3")
        ref_el = ref_complex.get_parent()
        if ref_el.get_shape() != cl.TRIANGLE:
            raise ValueError("HCT only defined on triangles")
        top = ref_el.get_topology()
        verts = ref_el.get_vertices()
        sd = ref_el.get_spatial_dimension()
        entity_ids = {dim: {e: [] for e in sorted(top[dim])} for dim in sorted(top)}

        alphas = mis(sd, 1)
        nodes = []
        for v in sorted(top[0]):
            pt = verts[v]
            cur = len(nodes)
            nodes.append(PointEvaluation(ref_el, pt))
            nodes.extend(PointDerivative(ref_el, pt, alpha) for alpha in alphas)
            entity_ids[0][v].extend(range(cur, len(nodes)))

        k = 2 if reduced else degree - 3
        facet = cl.ufc_simplex(1)
        Q_ref = parse_quadrature_scheme(facet, degree - 1 + k, quad_scheme)
        x = facet.compute_barycentric_coordinates(Q_ref.get_points())
        xref = x[:, [1]] - x[:, [0]]
        if reduced:
            f_at_qpts = eval_jacobi(0, 0, k, xref[:, 0])
            for e in sorted(top[1]):
                cur = len(nodes)
                nodes.append(IntegralMomentOfNormalDerivative(ref_el, e, Q_ref,
                                                              f_at_qpts))
                entity_ids[1][e].extend(range(cur, len(nodes)))
        else:
            phis = eval_jacobi_batch(1, 1, k, xref)
            dphis = 2 * eval_jacobi_deriv_batch(1, 1, k, xref)
            for e in sorted(top[1]):
                Q = FacetQuadratureRule(ref_el, 1, e, Q_ref, avg=True)
                n = ref_el.compute_normal(e)
                cur = len(nodes)
                nodes.extend(IntegralMomentOfDerivative(ref_el, Q, phi, n)
                             for phi in phis)
                nodes.extend(IntegralMoment(ref_el, Q, dphi) for dphi in dphis[1:])
                entity_ids[1][e].extend(range(cur, len(nodes)))

            q = degree - 4
            if q >= 0:
                Q = parse_quadrature_scheme(ref_complex, degree + q, quad_scheme)
                Pq = polyset.ONPolynomialSet(ref_el, q, scale=1)
                phis = Pq.tabulate(Q.get_points())[(0,) * sd]
                phis *= 1 / ref_el.volume()
                cur = len(nodes)
                nodes.extend(IntegralMoment(ref_el, Q, phi) for phi in phis)
                entity_ids[sd][0] = list(range(cur, len(nodes)))

        super().__init__(nodes, ref_el, entity_ids)


class HsiehCloughTocher(finite_element.CiarletElement):
    """The HCT macroelement on the Alfeld split (reduced variant drops the
    edge normal moments to linear)."""

    def __init__(self, ref_el, degree=3, reduced=False, quad_scheme=None):
        ref_complex = AlfeldSplit(ref_el)
        dual = HCTDualSet(ref_complex, degree, reduced=reduced,
                          quad_scheme=quad_scheme)
        poly_set = CkPolynomialSet(ref_complex, degree, order=1,
                                   vorder=degree - 1, variant="bubble")
        super().__init__(poly_set, dual, degree, formdegree=0)
