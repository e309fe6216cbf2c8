"""Morley element (parity with /root/reference/FIAT/morley.py):
codim-2 integral averages + facet-average normal derivatives."""

import math

import numpy as np

from ..core import cells as cl
from ..core import finite_element, functionals, polyset
from ..core.dualset import DualSet
from ..core.quadrature import FacetQuadratureRule
from ..core.quadrature_schemes import create_quadrature


class MorleyDualSet(DualSet):
    def __init__(self, ref_el, degree):
        top = ref_el.get_topology()
        sd = ref_el.get_spatial_dimension()
        entity_ids = {dim: {e: [] for e in top[dim]} for dim in top}
        nodes = []

        # codim-2: integral averages
        dim = sd - 2
        facet = ref_el.construct_subelement(dim)
        Q_ref = create_quadrature(facet, degree)
        scale = np.ones(Q_ref.get_weights().shape)
        for entity in sorted(top[dim]):
            cur = len(nodes)
            Q = FacetQuadratureRule(ref_el, dim, entity, Q_ref, avg=True)
            nodes.append(functionals.IntegralMoment(ref_el, Q, scale))
            entity_ids[dim][entity].extend(range(cur, len(nodes)))

        # codim-1: facet-average normal derivative
        dim = sd - 1
        facet = ref_el.construct_subelement(dim)
        Q_ref = create_quadrature(facet, degree - 1)
        scale = np.ones(Q_ref.get_weights().shape) / math.factorial(sd - 1)
        for entity in sorted(top[dim]):
            cur = len(nodes)
            nodes.append(functionals.IntegralMomentOfNormalDerivative(
                ref_el, entity, Q_ref, scale))
            entity_ids[dim][entity].extend(range(cur, len(nodes)))

        super().__init__(nodes, ref_el, entity_ids)


class Morley(finite_element.CiarletElement):
    """The Morley nonconforming plate element."""

    def __init__(self, ref_el, degree=2):
        if ref_el.get_shape() not in {cl.TRIANGLE, cl.TETRAHEDRON}:
            raise ValueError("Morley only defined on simplices of dimension >= 2")
        if degree != 2:
            raise ValueError("Morley only defined for degree == 2")
        poly_set = polyset.ONPolynomialSet(ref_el, degree)
        dual = MorleyDualSet(ref_el, degree)
        super().__init__(poly_set, dual, degree)
