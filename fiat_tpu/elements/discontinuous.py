"""DiscontinuousElement: same basis, all DoFs moved to the cell interior
(parity with /root/reference/FIAT/discontinuous.py)."""

from ..core.dualset import DualSet
from ..core.finite_element import CiarletElement, FiniteElement


class DiscontinuousElement(CiarletElement):
    """A copy of an element with every DoF associated to the cell."""

    def __init__(self, element):
        self._element = element
        ref_el = element.get_reference_element()
        ref_complex = element.get_reference_complex()
        mapping, = set(element.mapping())

        topology = ref_el.get_topology()
        new_entity_ids = {dim: {ent: [] for ent in sorted(topology[dim])}
                          for dim in sorted(topology)}
        top_dim = max(sorted(topology))
        new_entity_ids[top_dim][0] = list(range(element.space_dimension()))
        dual = DualSet(element.dual_basis(), ref_el, new_entity_ids)
        formdegree = ref_el.get_spatial_dimension()
        FiniteElement.__init__(self, ref_el, dual, element.get_order(),
                               formdegree=formdegree, mapping=mapping,
                               ref_complex=ref_complex)

    def degree(self):
        return self._element.degree()

    def get_nodal_basis(self):
        return self._element.get_nodal_basis()

    def get_coeffs(self):
        return self._element.get_coeffs()

    def num_sub_elements(self):
        return self._element.num_sub_elements()

    def tabulate(self, order, points, entity=None):
        return self._element.tabulate(order, points, entity)

    def value_shape(self):
        return self._element.value_shape()

    def dmats(self):
        return self._element.dmats()

    def get_num_members(self, arg):
        return self._element.get_num_members(arg)
