"""Hellan-Herrmann-Johnson elements (parity with
/root/reference/FIAT/hellan_herrmann_johnson.py): symmetric tensors with
normal-normal continuity."""

from ..core import finite_element, polyset
from ..core.dualset import DualSet
from ..core.functionals import (ComponentPointEvaluation,
                                PointwiseInnerProductEvaluation,
                                TensorBidirectionalIntegralMoment)
from ..core.quadrature import FacetQuadratureRule
from ..core.variants import check_format_variant, parse_quadrature_scheme


class HellanHerrmannJohnsonDual(DualSet):
    def __init__(self, ref_el, degree, variant, qdegree, quad_scheme):
        sd = ref_el.get_spatial_dimension()
        top = ref_el.get_topology()
        entity_ids = {dim: {i: [] for i in sorted(top[dim])} for dim in sorted(top)}
        nodes = []

        cell_to_faces = ref_el.get_connectivity()[(sd, sd - 1)]
        n = [ref_el.compute_scaled_normal(f) for f in sorted(top[sd - 1])]
        if variant == "point":
            for f in sorted(top[sd - 1]):
                cur = len(nodes)
                pts = ref_el.make_points(sd - 1, f, degree + sd)
                nodes.extend(PointwiseInnerProductEvaluation(ref_el, n[f], n[f], pt)
                             for pt in pts)
                entity_ids[sd - 1][f].extend(range(cur, len(nodes)))

            if sd == 2:
                # Cartesian interior dofs in 2D (reference convention)
                for entity in sorted(top[sd]):
                    cur = len(nodes)
                    pts = ref_el.make_points(sd, entity, degree + sd)
                    nodes.extend(
                        ComponentPointEvaluation(ref_el, (i, j), (sd, sd), pt)
                        for i in range(sd) for j in range(i, sd) for pt in pts)
                    entity_ids[sd][entity].extend(range(cur, len(nodes)))
            else:
                for entity in sorted(top[sd]):
                    faces = cell_to_faces[entity]
                    cur = len(nodes)
                    pts = ref_el.make_points(sd, entity, degree + sd)
                    nodes.extend(
                        PointwiseInnerProductEvaluation(ref_el, n[f], n[f], pt)
                        for pt in pts for f in faces)
                    pts = ref_el.make_points(sd, entity, degree + sd + 1)
                    nodes.extend(
                        PointwiseInnerProductEvaluation(
                            ref_el, n[faces[i + 1]], n[faces[i + 2]], pt)
                        for pt in pts for i in range((sd - 1) * (sd - 2)))
                    entity_ids[sd][entity].extend(range(cur, len(nodes)))

        elif variant == "integral":
            ref_facet = ref_el.construct_subelement(sd - 1)
            Q_ref = parse_quadrature_scheme(ref_facet, qdegree + degree, quad_scheme)
            P = polyset.ONPolynomialSet(ref_facet, degree)
            Phis = P.tabulate(Q_ref.get_points())[(0,) * (sd - 1)]
            for f in sorted(top[sd - 1]):
                cur = len(nodes)
                Q = FacetQuadratureRule(ref_el, sd - 1, f, Q_ref, avg=True)
                nodes.extend(
                    TensorBidirectionalIntegralMoment(ref_el, n[f], n[f], Q, phi)
                    for phi in Phis)
                entity_ids[sd - 1][f].extend(range(cur, len(nodes)))

            ref_cell = ref_el.construct_subelement(sd)
            Q_ref = parse_quadrature_scheme(ref_cell, qdegree + degree, quad_scheme)
            P = polyset.ONPolynomialSet(ref_cell, degree)
            Phis = P.tabulate(Q_ref.get_points())[(0,) * sd]
            dimPkm1 = P.expansion_set.get_num_members(degree - 1)
            for entity in sorted(top[sd]):
                cur = len(nodes)
                faces = cell_to_faces[entity]
                Q = FacetQuadratureRule(ref_el, sd, entity, Q_ref, avg=True)
                nodes.extend(
                    TensorBidirectionalIntegralMoment(ref_el, n[f], n[f], Q, phi)
                    for phi in Phis[:dimPkm1] for f in faces)
                nodes.extend(
                    TensorBidirectionalIntegralMoment(
                        ref_el, n[faces[i + 1]], n[faces[i + 2]], Q, phi)
                    for phi in Phis for i in range((sd - 1) * (sd - 2)))
                entity_ids[sd][entity].extend(range(cur, len(nodes)))

        super().__init__(nodes, ref_el, entity_ids)


class HellanHerrmannJohnson(finite_element.CiarletElement):
    """HHJ(k): symmetric tensor polynomials with n-n continuity."""

    def __init__(self, ref_el, degree=0, variant=None, quad_scheme=None):
        if degree < 0:
            raise ValueError("HHJ only defined for degree >= 0")
        splitting, variant, qdegree = check_format_variant(variant, degree)
        if splitting is not None:
            ref_el = splitting(ref_el)
        if ref_el.is_macrocell():
            from ..core.macro import MacroPolynomialSet
            base_element = type(self)(ref_el.get_parent(), degree)
            poly_set = MacroPolynomialSet(ref_el, base_element)
        else:
            poly_set = polyset.ONSymTensorPolynomialSet(ref_el, degree)
        dual = HellanHerrmannJohnsonDual(ref_el, degree, variant, qdegree, quad_scheme)
        sd = ref_el.get_spatial_dimension()
        super().__init__(poly_set, dual, degree, (sd - 1, sd - 1),
                         mapping="double contravariant piola")
