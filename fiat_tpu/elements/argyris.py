"""Argyris element (parity with /root/reference/FIAT/argyris.py): vertex
2-jets plus edge normal-derivative / value moments (Jacobi-weighted in the
integral variant)."""

from ..core import cells as cl
from ..core import finite_element, polyset
from ..core.dualset import DualSet
from ..core.functionals import (IntegralMoment, IntegralMomentOfDerivative,
                                PointDerivative, PointEvaluation,
                                PointNormalDerivative)
from ..core.jacobi import eval_jacobi_batch, eval_jacobi_deriv_batch
from ..core.quadrature import FacetQuadratureRule
from ..core.variants import check_format_variant, parse_quadrature_scheme


class ArgyrisDualSet(DualSet):
    def __init__(self, ref_el, degree, variant, interpolant_deg, quad_scheme):
        if ref_el.get_shape() != cl.TRIANGLE:
            raise ValueError("Argyris only defined on triangles")
        top = ref_el.get_topology()
        sd = ref_el.get_spatial_dimension()
        entity_ids = {dim: {e: [] for e in sorted(top[dim])} for dim in sorted(top)}
        nodes = []

        # second-order jet at each vertex
        verts = ref_el.get_vertices()
        alphas = [(1, 0), (0, 1), (2, 0), (1, 1), (0, 2)]
        for v in sorted(top[0]):
            cur = len(nodes)
            nodes.append(PointEvaluation(ref_el, verts[v]))
            nodes.extend(PointDerivative(ref_el, verts[v], alpha) for alpha in alphas)
            entity_ids[0][v] = list(range(cur, len(nodes)))

        if variant == "integral":
            k = degree - 5
            rline = cl.ufc_simplex(1)
            Q_ref = parse_quadrature_scheme(rline, interpolant_deg + k - 1, quad_scheme)
            x = rline.compute_barycentric_coordinates(Q_ref.get_points())
            xref = x[:, [1]] - x[:, [0]]
            phis = eval_jacobi_batch(2, 2, k, xref)
            dphis = 2 * eval_jacobi_deriv_batch(2, 2, k, xref)
            for e in sorted(top[1]):
                Q = FacetQuadratureRule(ref_el, 1, e, Q_ref, avg=True)
                n = ref_el.compute_normal(e)
                cur = len(nodes)
                nodes.extend(IntegralMomentOfDerivative(ref_el, Q, phi, n)
                             for phi in phis)
                nodes.extend(IntegralMoment(ref_el, Q, dphi) for dphi in dphis[1:])
                entity_ids[1][e].extend(range(cur, len(nodes)))

            q = degree - 6
            if q >= 0:
                cell = ref_el.construct_subelement(sd)
                Q_ref = parse_quadrature_scheme(cell, interpolant_deg + q, quad_scheme)
                Pq = polyset.ONPolynomialSet(cell, q, scale=1)
                phis = Pq.tabulate(Q_ref.get_points())[(0,) * sd]
                for entity in sorted(top[sd]):
                    Q = FacetQuadratureRule(ref_el, sd, entity, Q_ref, avg=True)
                    cur = len(nodes)
                    nodes.extend(IntegralMoment(ref_el, Q, phi) for phi in phis)
                    entity_ids[sd][entity] = list(range(cur, len(nodes)))

        elif variant == "point":
            for e in sorted(top[1]):
                cur = len(nodes)
                ndpts = ref_el.make_points(1, e, degree - 3)
                nodes.extend(PointNormalDerivative(ref_el, e, pt) for pt in ndpts)
                ptvalpts = ref_el.make_points(1, e, degree - 4)
                nodes.extend(PointEvaluation(ref_el, pt) for pt in ptvalpts)
                entity_ids[1][e] = list(range(cur, len(nodes)))
            if degree > 5:
                cur = len(nodes)
                for entity in sorted(top[sd]):
                    internalpts = ref_el.make_points(sd, entity, degree - 3)
                    nodes.extend(PointEvaluation(ref_el, pt) for pt in internalpts)
                    entity_ids[sd][entity] = list(range(cur, len(nodes)))
        else:
            raise ValueError("Invalid variant for Argyris")
        super().__init__(nodes, ref_el, entity_ids)


class Argyris(finite_element.CiarletElement):
    """The Argyris element (variant 'point' | 'integral' | 'integral(q)')."""

    def __init__(self, ref_el, degree=5, variant=None, quad_scheme=None):
        splitting, variant, interpolant_deg = check_format_variant(variant, degree)
        if splitting is not None:
            raise NotImplementedError("Argyris is not implemented as a macroelement.")
        poly_set = polyset.ONPolynomialSet(ref_el, degree, variant="bubble")
        dual = ArgyrisDualSet(ref_el, degree, variant, interpolant_deg, quad_scheme)
        super().__init__(poly_set, dual, degree)
