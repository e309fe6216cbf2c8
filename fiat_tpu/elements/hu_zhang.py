"""Hu-Zhang elasticity element (parity with /root/reference/FIAT/hu_zhang.py):
symmetric tensors of degree >= 3 on triangles with vertex values, edge nn/nt
DoFs, and interior moments."""

from ..core import cells as cl
from ..core import finite_element, polyset
from ..core.dualset import DualSet
from ..core.functionals import (ComponentPointEvaluation,
                                PointwiseInnerProductEvaluation,
                                TensorBidirectionalIntegralMoment)
from ..core.quadrature import FacetQuadratureRule
from ..core.variants import check_format_variant, parse_quadrature_scheme


class HuZhangDual(DualSet):
    def __init__(self, ref_el, degree, variant, qdegree, quad_scheme):
        top = ref_el.get_topology()
        sd = ref_el.get_spatial_dimension()
        shp = (sd, sd)
        entity_ids = {dim: {e: [] for e in sorted(top[dim])} for dim in sorted(top)}
        nodes = []

        for v in sorted(top[0]):
            cur = len(nodes)
            pt, = ref_el.make_points(0, v, degree)
            nodes.extend(ComponentPointEvaluation(ref_el, (i, j), shp, pt)
                         for i in range(sd) for j in range(i, sd))
            entity_ids[0][v].extend(range(cur, len(nodes)))

        dim = sd - 1
        ref_facet = ref_el.construct_subelement(dim)
        Qref = parse_quadrature_scheme(ref_facet, 2 * degree - 2, quad_scheme)
        P = polyset.ONPolynomialSet(ref_facet, degree - 2)
        phis = P.tabulate(Qref.get_points())[(0,) * dim]
        for entity in sorted(top[1]):
            cur = len(nodes)
            n = ref_el.compute_scaled_normal(entity)
            t = ref_el.compute_edge_tangent(entity)
            if variant == "point":
                pts = ref_el.make_points(1, entity, degree)
                nodes.extend(PointwiseInnerProductEvaluation(ref_el, n, s, pt)
                             for pt in pts for s in (n, t))
            elif variant == "integral":
                Q = FacetQuadratureRule(ref_el, dim, entity, Qref, avg=True)
                nodes.extend(
                    TensorBidirectionalIntegralMoment(ref_el, n, comp, Q, phi)
                    for phi in phis for comp in (n, t))
            entity_ids[1][entity].extend(range(cur, len(nodes)))

        if variant == "integral":
            cell = ref_el.construct_subelement(sd)
            Q_ref = parse_quadrature_scheme(cell, 2 * degree - 2, quad_scheme)
            P = polyset.ONPolynomialSet(cell, degree - 2, scale=1)
            phis = P.tabulate(Q_ref.get_points())[(0,) * sd]

        for entity in sorted(top[sd]):
            cur = len(nodes)
            if variant == "point":
                pts = ref_el.make_points(sd, entity, degree + 1)
                nodes.extend(ComponentPointEvaluation(ref_el, (i, j), shp, pt)
                             for pt in pts for i in range(sd) for j in range(i, sd))
            elif variant == "integral":
                faces = ref_el.get_connectivity()[(sd, sd - 1)][entity]
                n = [ref_el.compute_scaled_normal(f) for f in faces]
                Q = FacetQuadratureRule(ref_el, sd, entity, Q_ref, avg=True)
                nodes.extend(
                    TensorBidirectionalIntegralMoment(ref_el, n[i + 1], n[j + 1],
                                                      Q, phi)
                    for phi in phis for i in range(sd) for j in range(i, sd))
            entity_ids[sd][entity].extend(range(cur, len(nodes)))
        super().__init__(nodes, ref_el, entity_ids)


class HuZhang(finite_element.CiarletElement):
    """The Hu-Zhang element."""

    def __init__(self, ref_el, degree=3, variant=None, quad_scheme=None):
        if degree < 3:
            raise ValueError("HuZhang only defined for degree >= 3")
        if ref_el.shape != cl.TRIANGLE:
            raise ValueError("HuZhang only defined on triangles")
        splitting, variant, qdegree = check_format_variant(variant, degree)
        if splitting is not None:
            raise NotImplementedError("HuZhang is not implemented as a macroelement.")
        poly_set = polyset.ONSymTensorPolynomialSet(ref_el, degree)
        dual = HuZhangDual(ref_el, degree, variant, qdegree, quad_scheme)
        super().__init__(poly_set, dual, degree,
                         ref_el.get_spatial_dimension() - 1,
                         mapping="double contravariant piola")
