"""DPC: discontinuous P_k on hypercubes (parity with
/root/reference/FIAT/discontinuous_pc.py): a simplex polynomial space
presented on the hypercube, with equispaced interior nodes."""

import numpy as np

from ..core import finite_element, functionals, polyset
from ..core.cells import (DefaultLine, Point, UFCHexahedron, UFCInterval,
                          UFCQuadrilateral, UFCTetrahedron, UFCTriangle,
                          flatten_reference_cube, make_affine_mapping)
from ..core.dualset import DualSet
from .p0 import P0Dual


def _simplex_for(flat_el):
    table = {Point: Point, DefaultLine: DefaultLine, UFCInterval: UFCInterval,
             UFCQuadrilateral: UFCTriangle, UFCHexahedron: UFCTetrahedron}
    return table[type(flat_el)]()


class DPC0(finite_element.CiarletElement):
    def __init__(self, ref_el):
        flat_el = flatten_reference_cube(ref_el)
        poly_set = polyset.ONPolynomialSet(_simplex_for(flat_el), 0)
        dual = P0Dual(ref_el)
        dual.entity_permutations = None
        formdegree = ref_el.get_spatial_dimension()
        super().__init__(poly_set=poly_set, dual=dual, order=0,
                         ref_complex=ref_el, formdegree=formdegree)


class DPCDualSet(DualSet):
    """Equispaced simplex-lattice points mapped into the hypercube; all
    DoFs on the cell interior."""

    def __init__(self, ref_el, flat_el, degree):
        nodes = []
        simplex = _simplex_for(flat_el)
        v_simplex = simplex.get_vertices()
        v_hypercube = flat_el.get_vertices()
        v_ = [v_hypercube[0], v_hypercube[int(-0.5 * len(v_hypercube))]]
        for d in range(1, flat_el.get_dimension()):
            v_.append(tuple(np.asarray(
                v_hypercube[flat_el.get_dimension() - d]
                + np.average(np.asarray(v_hypercube[::2]), axis=0))))
        A, b = make_affine_mapping(v_simplex, tuple(v_))

        top = simplex.get_topology()
        for dim in sorted(top):
            for entity in sorted(top[dim]):
                pts = simplex.make_points(dim, entity, degree)
                pts = [tuple(A @ np.asarray(x) + b) for x in pts]
                nodes.extend(functionals.PointEvaluation(flat_el, x) for x in pts)

        cube_topology = ref_el.get_topology()
        entity_ids = {dim: {e: [] for e in sorted(cube_topology[dim])}
                      for dim in sorted(cube_topology)}
        entity_ids[max(cube_topology)][0] = list(range(len(nodes)))
        super().__init__(nodes, ref_el, entity_ids)


class HigherOrderDPC(finite_element.CiarletElement):
    """The DPC element for degree >= 1."""

    def __init__(self, ref_el, degree):
        flat_el = flatten_reference_cube(ref_el)
        poly_set = polyset.ONPolynomialSet(_simplex_for(flat_el), degree)
        dual = DPCDualSet(ref_el, flat_el, degree)
        formdegree = flat_el.get_spatial_dimension()
        super().__init__(poly_set=poly_set, dual=dual, order=degree,
                         ref_complex=ref_el, formdegree=formdegree)


def DPC(ref_el, degree):
    if degree == 0:
        return DPC0(ref_el)
    return HigherOrderDPC(ref_el, degree)
