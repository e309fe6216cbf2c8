"""Discontinuous Raviart-Thomas (parity with
/root/reference/FIAT/discontinuous_raviart_thomas.py): RT space with all
DoFs attached to the cell."""

from ..core import finite_element, functionals
from ..core.dualset import DualSet
from .raviart_thomas import RTSpace


class DRTDualSet(DualSet):
    """RT dual with every node topologically on the cell interior."""

    def __init__(self, ref_el, degree):
        nodes = []
        sd = ref_el.get_spatial_dimension()
        top = ref_el.get_topology()

        for i in range(len(top[sd - 1])):
            pts = ref_el.make_points(sd - 1, i, sd + degree - 1)
            nodes.extend(functionals.PointScaledNormalEvaluation(ref_el, i, pt)
                         for pt in pts)
        if degree > 1:
            pts = ref_el.make_points(sd, 0, sd + degree - 1)
            nodes.extend(functionals.ComponentPointEvaluation(ref_el, d, (sd,), pt)
                         for d in range(sd) for pt in pts)

        entity_ids = {i: {j: [] for j in range(len(top[i]))} for i in range(sd)}
        entity_ids[sd] = {0: list(range(len(nodes)))}
        super().__init__(nodes, ref_el, entity_ids)


class DiscontinuousRaviartThomas(finite_element.CiarletElement):
    """The discontinuous Raviart-Thomas element."""

    def __init__(self, ref_el, degree):
        poly_set = RTSpace(ref_el, degree)
        dual = DRTDualSet(ref_el, degree)
        super().__init__(poly_set, dual, degree, mapping="contravariant piola")
