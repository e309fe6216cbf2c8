"""Hierarchical Legendre / IntegratedLegendre elements (parity with
/root/reference/FIAT/hierarchical.py): modal bases with L2-dual moment
DoFs."""

import numpy as np

from ..core import finite_element, functionals
from ..core.cells import symmetric_simplex
from ..core.dualset import DualSet
from ..core.polyset import ONPolynomialSet, make_bubbles
from ..core.quadrature import FacetQuadratureRule
from ..core.variants import check_format_variant, parse_quadrature_scheme
from .p0 import P0


def make_dual_bubbles(ref_el, degree, codim=0, interpolant_deg=None,
                      quad_scheme=None, scale="orthonormal"):
    """Tabulate the L2-duals of the hierarchical C0 basis at quadrature
    points (mass-matrix solve against the bubble basis)."""
    dim = ref_el.get_spatial_dimension()
    if dim == 0:
        quad_scheme = None
        degree = 0
    if interpolant_deg is None:
        interpolant_deg = degree
    Q = parse_quadrature_scheme(ref_el, degree + interpolant_deg, quad_scheme)
    B = make_bubbles(ref_el, degree, codim=codim, scale=scale)
    P_at_qpts = B.expansion_set.tabulate(degree, Q.get_points())
    M = np.dot(P_at_qpts * Q.get_weights(), P_at_qpts.T)
    phis = np.linalg.solve(M, P_at_qpts)
    phis = np.dot(B.get_coeffs(), phis)
    return Q, phis


class LegendreDual(DualSet):
    """Moments against the L2-Piola-scaled orthonormal basis."""

    def __init__(self, ref_el, degree, codim=0, interpolant_deg=None,
                 quad_scheme=None):
        if interpolant_deg is None:
            interpolant_deg = degree
        sd = ref_el.get_spatial_dimension()
        top = ref_el.get_topology()
        entity_ids = {dim: {e: [] for e in top[dim]} for dim in top}
        nodes = []

        dim = sd - codim
        ref_facet = ref_el.construct_subelement(dim)
        poly_set = ONPolynomialSet(ref_facet, degree, scale="L2 piola")
        Q_ref = parse_quadrature_scheme(ref_facet, degree + interpolant_deg,
                                        quad_scheme)
        phis = poly_set.tabulate(Q_ref.get_points())[(0,) * dim]
        for entity in sorted(top[dim]):
            cur = len(nodes)
            Q_facet = FacetQuadratureRule(ref_el, dim, entity, Q_ref, avg=True)
            nodes.extend(functionals.IntegralMoment(ref_el, Q_facet, phi)
                         for phi in phis)
            entity_ids[dim][entity].extend(range(cur, len(nodes)))
        super().__init__(nodes, ref_el, entity_ids)


class Legendre(finite_element.CiarletElement):
    """Discontinuous modal Legendre element."""

    def __new__(cls, ref_el, degree, variant=None, quad_scheme=None):
        if degree == 0:
            splitting, variant, interpolant_deg = check_format_variant(variant, degree)
            if splitting is None and interpolant_deg == 0:
                return P0(ref_el)
        return super().__new__(cls)

    def __init__(self, ref_el, degree, variant=None, quad_scheme=None):
        splitting, variant, interpolant_deg = check_format_variant(variant, degree)
        if splitting is not None:
            ref_el = splitting(ref_el)
        poly_set = ONPolynomialSet(ref_el, degree)
        dual = LegendreDual(ref_el, degree, interpolant_deg=interpolant_deg,
                            quad_scheme=quad_scheme)
        formdegree = ref_el.get_spatial_dimension()
        super().__init__(poly_set, dual, degree, formdegree)


class IntegratedLegendreDual(DualSet):
    """Moments against L2-duals of the hierarchical C0 bubbles, entity by
    entity on symmetric reference facets."""

    def __init__(self, ref_el, degree, interpolant_deg=None, quad_scheme=None):
        if interpolant_deg is None:
            interpolant_deg = degree
        top = ref_el.get_topology()
        entity_ids = {dim: {e: [] for e in top[dim]} for dim in top}
        nodes = []

        for dim in sorted(top):
            if degree <= dim:
                continue
            ref_facet = symmetric_simplex(dim)
            Q_ref, phis = make_dual_bubbles(ref_facet, degree,
                                            interpolant_deg=interpolant_deg,
                                            quad_scheme=quad_scheme)
            for entity in sorted(top[dim]):
                cur = len(nodes)
                Q_facet = FacetQuadratureRule(ref_el, dim, entity, Q_ref, avg=True)
                nodes.extend(functionals.IntegralMoment(ref_el, Q_facet, phi)
                             for phi in phis)
                entity_ids[dim][entity].extend(range(cur, len(nodes)))
        super().__init__(nodes, ref_el, entity_ids)


class IntegratedLegendre(finite_element.CiarletElement):
    """Continuous hierarchical element with integrated Legendre basis."""

    def __init__(self, ref_el, degree, variant=None, quad_scheme=None):
        splitting, variant, interpolant_deg = check_format_variant(variant, degree)
        if splitting is not None:
            ref_el = splitting(ref_el)
        if degree < 1:
            raise ValueError("IntegratedLegendre elements only valid for k >= 1")
        poly_set = ONPolynomialSet(ref_el, degree, variant="bubble")
        dual = IntegratedLegendreDual(ref_el, degree,
                                      interpolant_deg=interpolant_deg,
                                      quad_scheme=quad_scheme)
        super().__init__(poly_set, dual, degree, 0)
