"""Enriched element: non-nodal direct sum of elements (parity with
/root/reference/FIAT/enriched.py)."""

from itertools import chain

import numpy as np

from ..core.dualset import DualSet
from ..core.finite_element import FiniteElement
from .mixed import concatenate_entity_dofs

__all__ = ["EnrichedElement"]


class EnrichedElement(FiniteElement):
    """Direct sum of the DoFs of compatible elements (same cell, mapping,
    value shape); primal/dual orthogonality is NOT restored (see
    NodalEnrichedElement for that)."""

    def __init__(self, *elements):
        if len(set(e.get_reference_element() for e in elements)) > 1:
            raise ValueError("Elements must share a reference element")
        if len(set(m for e in elements for m in e.mapping())) > 1:
            raise ValueError("Elements must share a mapping")
        if len(set(e.value_shape() for e in elements)) > 1:
            raise ValueError("Elements must share a value shape")

        order = max(e.get_order() for e in elements)
        if any(e.get_formdegree() is None for e in elements):
            formdegree = None
        else:
            formdegree = max(e.get_formdegree() for e in elements)
        ref_el, = set(e.get_reference_element() for e in elements)
        mapping, = set(m for e in elements for m in e.mapping())

        entity_ids = concatenate_entity_dofs(ref_el, elements)
        nodes = list(chain.from_iterable(e.dual_basis() for e in elements))
        dual = DualSet(nodes, ref_el, entity_ids)
        super().__init__(ref_el, dual, order, formdegree, mapping)
        self.polydegree = max(e.degree() for e in elements)
        self._elements = elements

    def elements(self):
        return self._elements

    def degree(self):
        return self.polydegree

    def get_nodal_basis(self):
        raise NotImplementedError("get_nodal_basis not implemented")

    def get_coeffs(self):
        raise NotImplementedError("get_coeffs not implemented")

    def tabulate(self, order, points, entity=None):
        num_components = int(np.prod(self.value_shape(), dtype=int))
        table = {}
        offset = 0
        for element in self._elements:
            etable = element.tabulate(order, points, entity)
            n = element.space_dimension()
            for d, tab in etable.items():
                if d not in table:
                    if num_components == 1:
                        shape = (self.space_dimension(), len(points))
                    else:
                        shape = (self.space_dimension(), num_components,
                                 len(points))
                    table[d] = np.zeros(shape, dtype=tab.dtype)
                table[d][offset:offset + n] = tab
            offset += n
        return table

    def value_shape(self):
        result, = set(e.value_shape() for e in self._elements)
        return result

    def dmats(self):
        raise NotImplementedError("dmats not implemented")

    def get_num_members(self, arg):
        raise NotImplementedError("get_num_members not implemented")
