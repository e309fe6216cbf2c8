"""Cubic Hermite element (parity with /root/reference/FIAT/hermite.py):
vertex value + gradient jets, plus face-barycentre values."""

from ..core import finite_element, functionals, polyset
from ..core.dualset import DualSet


class CubicHermiteDualSet(DualSet):
    def __init__(self, ref_el):
        nodes = []
        entity_ids = {}
        top = ref_el.get_topology()
        verts = ref_el.get_vertices()
        sd = ref_el.get_spatial_dimension()

        entity_ids[0] = {}
        for v in sorted(top[0]):
            cur = len(nodes)
            nodes.append(functionals.PointEvaluation(ref_el, verts[v]))
            for i in range(sd):
                alpha = [0] * sd
                alpha[i] = 1
                nodes.append(functionals.PointDerivative(ref_el, verts[v], alpha))
            entity_ids[0][v] = list(range(cur, len(nodes)))

        entity_ids[1] = {i: [] for i in top[1]}

        if sd > 1:
            entity_ids[2] = {}
            for f in sorted(top[2]):
                cur = len(nodes)
                pt = ref_el.make_points(2, f, 3)[0]
                nodes.append(functionals.PointEvaluation(ref_el, pt))
                entity_ids[2][f] = list(range(cur, len(nodes)))
            for dim in range(3, sd + 1):
                entity_ids[dim] = {facet: [] for facet in top[dim]}

        super().__init__(nodes, ref_el, entity_ids)


class CubicHermite(finite_element.CiarletElement):
    """The cubic Hermite element."""

    def __init__(self, ref_el, deg=3):
        assert deg == 3
        poly_set = polyset.ONPolynomialSet(ref_el, 3)
        dual = CubicHermiteDualSet(ref_el)
        super().__init__(poly_set, dual, 3)
