"""Discontinuous Taylor element (parity with
/root/reference/FIAT/discontinuous_taylor.py): cell average + midpoint
derivative jet."""

import numpy as np

from ..core import finite_element, functionals, polyset, quadrature
from ..core.dualset import DualSet
from ..core.expansions import mis
from .p0 import P0


class DiscontinuousTaylorDualSet(DualSet):
    def __init__(self, ref_el, degree):
        nodes = []
        dim = ref_el.get_spatial_dimension()
        Q = quadrature.make_quadrature(ref_el, 2 * (degree + 1))
        nodes.append(functionals.IntegralMoment(ref_el, Q, np.ones(len(Q.wts))))
        vertices = ref_el.get_vertices()
        midpoint = tuple(sum(np.asarray(vertices)) / len(vertices))
        for k in range(1, degree + 1):
            nodes.extend(functionals.PointDerivative(ref_el, midpoint, alpha)
                         for alpha in mis(dim, k))
        entity_ids = {d: {e: [] for e in ref_el.sub_entities[d]}
                      for d in range(dim + 1)}
        entity_ids[dim][0] = list(range(len(nodes)))
        super().__init__(nodes, ref_el, entity_ids)


class HigherOrderDiscontinuousTaylor(finite_element.CiarletElement):
    """Taylor basis for DG."""

    def __init__(self, ref_el, degree):
        poly_set = polyset.ONPolynomialSet(ref_el, degree)
        dual = DiscontinuousTaylorDualSet(ref_el, degree)
        formdegree = ref_el.get_spatial_dimension()
        super().__init__(poly_set, dual, degree, formdegree)


def DiscontinuousTaylor(ref_el, degree):
    if degree == 0:
        return P0(ref_el)
    return HigherOrderDiscontinuousTaylor(ref_el, degree)
