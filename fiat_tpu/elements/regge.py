"""Generalized Regge elements (parity with /root/reference/FIAT/regge.py):
symmetric tensors with tangential-tangential continuity."""

from ..core import finite_element, polyset
from ..core.dualset import DualSet
from ..core.functionals import (PointwiseInnerProductEvaluation,
                                TensorBidirectionalIntegralMoment)
from ..core.quadrature import FacetQuadratureRule
from ..core.variants import check_format_variant, parse_quadrature_scheme


class ReggeDual(DualSet):
    def __init__(self, ref_el, degree, variant, qdegree, quad_scheme):
        top = ref_el.get_topology()
        entity_ids = {dim: {i: [] for i in sorted(top[dim])} for dim in sorted(top)}
        nodes = []
        if variant == "point":
            for dim in sorted(top):
                for entity in sorted(top[dim]):
                    cur = len(nodes)
                    tangents = ref_el.compute_face_edge_tangents(dim, entity)
                    pts = ref_el.make_points(dim, entity, degree + 2)
                    nodes.extend(PointwiseInnerProductEvaluation(ref_el, t, t, pt)
                                 for pt in pts for t in tangents)
                    entity_ids[dim][entity].extend(range(cur, len(nodes)))
        elif variant == "integral":
            for dim in sorted(top):
                k = degree - dim + 1
                if dim == 0 or k < 0:
                    continue
                facet = ref_el.construct_subelement(dim)
                Q = parse_quadrature_scheme(facet, qdegree + k, quad_scheme)
                P = polyset.ONPolynomialSet(facet, k)
                phis = P.tabulate(Q.get_points())[(0,) * dim]
                for entity in sorted(top[dim]):
                    cur = len(nodes)
                    tangents = ref_el.compute_face_edge_tangents(dim, entity)
                    Q_mapped = FacetQuadratureRule(ref_el, dim, entity, Q, avg=True)
                    nodes.extend(
                        TensorBidirectionalIntegralMoment(ref_el, t, t, Q_mapped, phi)
                        for phi in phis for t in tangents)
                    entity_ids[dim][entity].extend(range(cur, len(nodes)))
        super().__init__(nodes, ref_el, entity_ids)


class Regge(finite_element.CiarletElement):
    """REG(k): symmetric tensor polynomials with t-t continuity."""

    def __init__(self, ref_el, degree=0, variant=None, quad_scheme=None):
        if degree < 0:
            raise ValueError("Regge only defined for degree >= 0")
        splitting, variant, qdegree = check_format_variant(variant, degree)
        if splitting is not None:
            ref_el = splitting(ref_el)
        if ref_el.is_macrocell():
            from ..core.macro import MacroPolynomialSet
            base_element = type(self)(ref_el.get_parent(), degree)
            poly_set = MacroPolynomialSet(ref_el, base_element)
        else:
            poly_set = polyset.ONSymTensorPolynomialSet(ref_el, degree)
        dual = ReggeDual(ref_el, degree, variant, qdegree, quad_scheme)
        super().__init__(poly_set, dual, degree, (1, 1),
                         mapping="double covariant piola")
