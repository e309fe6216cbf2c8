"""P0: the piecewise-constant element (parity with /root/reference/FIAT/P0.py)."""

import numpy as np

from ..core import finite_element, functionals, polyset
from ..core.dualset import DualSet


class P0Dual(DualSet):
    def __init__(self, ref_el):
        sd = ref_el.get_dimension()
        top = ref_el.get_topology()
        if sd == 0:
            pts = [tuple() for _ in sorted(top[sd])]
        else:
            pts = [tuple(np.average(ref_el.get_vertices_of_subcomplex(top[sd][e]), 0))
                   for e in sorted(top[sd])]
        nodes = [functionals.PointEvaluation(ref_el, pt) for pt in pts]
        entity_ids = {}
        entity_permutations = {}
        for dim in sorted(top):
            sym_size = ref_el.symmetry_group_size(dim)
            num_points = 1 if dim == sd else 0
            if isinstance(dim, tuple):
                perms = {o: list(range(num_points)) for o in np.ndindex(sym_size)}
            else:
                perms = {o: list(range(num_points)) for o in range(sym_size)}
            entity_ids[dim] = {e: ([e] if dim == sd else []) for e in sorted(top[dim])}
            entity_permutations[dim] = {e: perms for e in sorted(top[dim])}
        super().__init__(nodes, ref_el, entity_ids, entity_permutations)


class P0(finite_element.CiarletElement):
    def __init__(self, ref_el):
        poly_set = polyset.ONPolynomialSet(ref_el, 0)
        dual = P0Dual(ref_el)
        formdegree = ref_el.get_spatial_dimension()
        super().__init__(poly_set, dual, 0, formdegree)
