"""Quadratic Powell-Sabin C^1 macroelements (parity with
/root/reference/FIAT/powell_sabin.py): PS6 on the 6-way split (vertex
1-jets), PS12 on the 12-way split (+ edge normal-derivative averages)."""

from ..core import cells as cl
from ..core import finite_element
from ..core.dualset import DualSet
from ..core.expansions import mis
from ..core.functionals import (IntegralMomentOfNormalDerivative,
                                PointDerivative, PointEvaluation)
from ..core.jacobi import eval_jacobi_batch
from ..core.macro import AlfeldSplit, CkPolynomialSet, PowellSabin12Split, PowellSabinSplit
from ..core.quadrature_schemes import create_quadrature


def _vertex_jet_nodes(ref_el):
    top = ref_el.get_topology()
    verts = ref_el.get_vertices()
    sd = ref_el.get_spatial_dimension()
    entity_ids = {dim: {e: [] for e in sorted(top[dim])} for dim in sorted(top)}
    nodes = []
    alphas = mis(sd, 1)
    for v in sorted(top[0]):
        pt = verts[v]
        cur = len(nodes)
        nodes.append(PointEvaluation(ref_el, pt))
        nodes.extend(PointDerivative(ref_el, pt, alpha) for alpha in alphas)
        entity_ids[0][v].extend(range(cur, len(nodes)))
    return nodes, entity_ids


class QuadraticPowellSabin6DualSet(DualSet):
    def __init__(self, ref_complex, degree=2):
        if degree != 2:
            raise ValueError("PS6 only defined for degree = 2")
        ref_el = ref_complex.get_parent()
        if ref_el.get_shape() != cl.TRIANGLE:
            raise ValueError("PS6 only defined on triangles")
        nodes, entity_ids = _vertex_jet_nodes(ref_el)
        super().__init__(nodes, ref_el, entity_ids)


class QuadraticPowellSabin6(finite_element.CiarletElement):
    """C^1 quadratic on the 6-way Powell-Sabin split."""

    def __init__(self, ref_el, degree=2):
        if degree != 2:
            raise ValueError("PS6 only defined for degree = 2")
        ref_complex = PowellSabinSplit(ref_el)
        dual = QuadraticPowellSabin6DualSet(ref_complex, degree)
        poly_set = CkPolynomialSet(ref_complex, degree, order=1)
        super().__init__(poly_set, dual, degree)


class QuadraticPowellSabin12DualSet(DualSet):
    def __init__(self, ref_complex, degree=2):
        if degree != 2:
            raise ValueError("PS12 only defined for degree = 2")
        ref_el = ref_complex.get_parent()
        if ref_el.get_shape() != cl.TRIANGLE:
            raise ValueError("PS12 only defined on triangles")
        nodes, entity_ids = _vertex_jet_nodes(ref_el)
        top = ref_el.get_topology()

        rline = AlfeldSplit(cl.ufc_simplex(1))
        Q = create_quadrature(rline, degree - 1)
        x = 2.0 * Q.get_points() - 1
        phis = eval_jacobi_batch(1, 1, 0, x)
        for e in sorted(top[1]):
            cur = len(nodes)
            nodes.extend(IntegralMomentOfNormalDerivative(ref_el, e, Q, phi)
                         for phi in phis)
            entity_ids[1][e].extend(range(cur, len(nodes)))
        super().__init__(nodes, ref_el, entity_ids)


class QuadraticPowellSabin12(finite_element.CiarletElement):
    """C^1 quadratic on the 12-way Powell-Sabin split."""

    def __init__(self, ref_el, degree=2):
        if degree != 2:
            raise ValueError("PS12 only defined for degree = 2")
        ref_complex = PowellSabin12Split(ref_el)
        dual = QuadraticPowellSabin12DualSet(ref_complex, degree)
        poly_set = CkPolynomialSet(ref_complex, degree, order=1)
        super().__init__(poly_set, dual, degree)
