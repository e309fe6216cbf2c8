"""Mixed element: concatenated subelements with block-diagonal tabulation
(parity with /root/reference/FIAT/mixed.py)."""

import numpy as np

from ..core.dualset import DualSet
from ..core.finite_element import FiniteElement


def concatenate_entity_dofs(ref_el, elements):
    """Concatenate entity_dofs of elements with running DoF offsets."""
    entity_dofs = {dim: {i: [] for i in entities}
                   for dim, entities in ref_el.get_topology().items()}
    offsets = np.cumsum([0] + [e.space_dimension() for e in elements], dtype=int)
    for i, e in enumerate(elements):
        for dim, dofs in e.entity_dofs().items():
            for ent, off in dofs.items():
                entity_dofs[dim][ent] += [offsets[i] + dof for dof in off]
    return entity_dofs


class MixedElement(FiniteElement):
    """Concatenation of elements; tabulation is block-diagonal in the
    (dof, flattened component) plane."""

    def __init__(self, elements, ref_el=None):
        elements = tuple(elements)
        cells = set(e.get_reference_element() for e in elements)
        if ref_el is not None:
            cells.add(ref_el)
        ref_el, = cells

        # The concatenated nodes act on differently-shaped functions; they
        # are only coherent as labels, mirroring the reference behaviour.
        nodes = [L for e in elements for L in e.dual_basis()]
        entity_dofs = concatenate_entity_dofs(ref_el, elements)
        dual = DualSet(nodes, ref_el, entity_dofs)
        super().__init__(ref_el, dual, None, mapping=None)
        self._elements = elements

    def elements(self):
        return self._elements

    def num_sub_elements(self):
        return len(self._elements)

    def value_shape(self):
        return (sum(int(np.prod(e.value_shape(), dtype=int))
                    for e in self._elements),)

    def mapping(self):
        return [m for e in self._elements for m in e.mapping()]

    def get_nodal_basis(self):
        raise NotImplementedError("get_nodal_basis not implemented")

    def tabulate(self, order, points, entity=None):
        shape = (self.space_dimension(),) + self.value_shape() + (len(points),)
        output = {}
        irange = np.cumsum([0] + [e.space_dimension() for e in self._elements])
        crange = np.cumsum([0] + [int(np.prod(e.value_shape(), dtype=int))
                                  for e in self._elements])
        for i, e in enumerate(self._elements):
            table = e.tabulate(order, points, entity)
            for d, tab in table.items():
                if d not in output:
                    output[d] = np.zeros(shape, dtype=tab.dtype)
                tab = tab.reshape(irange[i + 1] - irange[i],
                                  crange[i + 1] - crange[i], -1)
                output[d][irange[i]:irange[i + 1], crange[i]:crange[i + 1]] = tab
        return output

    def is_nodal(self):
        return all(e.is_nodal() for e in self._elements)
