"""Restriction of an element to a subset of its DoFs (parity with
/root/reference/FIAT/restricted.py)."""

from ..core.dualset import DualSet
from ..core.finite_element import CiarletElement


class RestrictedDualSet(DualSet):
    """A DualSet keeping only the given DoF indices."""

    def __init__(self, dual, indices):
        indices = sorted(indices)
        ref_el = dual.get_reference_element()
        nodes_old = dual.get_nodes()
        entity_ids = {}
        for d, entities in dual.get_entity_ids().items():
            entity_ids[d] = {e: [indices.index(dof) for dof in dofs if dof in indices]
                             for e, dofs in entities.items()}
        nodes = [nodes_old[i] for i in indices]
        self._dual = dual
        super().__init__(nodes, ref_el, entity_ids)

    def get_indices(self, restriction_domain, take_closure=True):
        return type(self._dual).get_indices(self, restriction_domain,
                                            take_closure=take_closure)


class RestrictedElement(CiarletElement):
    """Keep the DoFs in ``indices`` (or those supported on
    ``restriction_domain``)."""

    def __init__(self, element, indices=None, restriction_domain=None,
                 take_closure=True):
        if not (indices or restriction_domain):
            raise RuntimeError("Either indices or restriction_domain must be given")
        if not indices:
            indices = element.dual.get_indices(restriction_domain,
                                               take_closure=take_closure)
        if isinstance(indices, str):
            raise RuntimeError("'indices' was a string; forgot a keyword?")
        if len(indices) == 0:
            raise ValueError("No point in creating an empty RestrictedElement.")
        self._element = element
        self._indices = indices
        poly_set = element.get_nodal_basis().take(indices)
        dual = RestrictedDualSet(element.get_dual_set(), indices)
        mapping_old = element.mapping()
        mapping_new = [mapping_old[dof] for dof in indices]
        assert all(m == mapping_new[0] for m in mapping_new)
        super().__init__(poly_set, dual, element.degree(),
                         element.get_formdegree(), mapping_new[0])
