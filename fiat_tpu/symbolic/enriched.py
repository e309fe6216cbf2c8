"""Enriched element in the symbolic layer (parity with
/root/reference/finat/enriched.py): tabulations of the parts concatenate
along the (flattened) basis axis."""

from functools import partial
from itertools import chain
from operator import add, methodcaller

import numpy as np

from .. import elements as fe_numeric
from ..core.cells import max_complex
from .base import FiniteElementBase
from .point_set import _is_traced


class EnrichedElement(FiniteElementBase):
    """Union of the basis functions of several elements."""

    def __new__(cls, elements, is_nodal_enriched=None):
        elements = tuple(chain.from_iterable(
            e.elements if isinstance(e, EnrichedElement) else (e,)
            for e in elements))
        if len(elements) == 1:
            return elements[0]
        self = super().__new__(cls)
        self.elements = elements
        if is_nodal_enriched is None:
            is_nodal_enriched = all(
                is_orthogonal(elements[i], elements[j])
                for i in range(len(elements))
                for j in range(i + 1, len(elements)))
        self.is_nodal_enriched = is_nodal_enriched
        return self

    @property
    def cell(self):
        result, = set(elem.cell for elem in self.elements)
        return result

    @property
    def complex(self):
        return max_complex(set(elem.complex for elem in self.elements))

    @property
    def degree(self):
        return tree_map(max, *[elem.degree for elem in self.elements])

    @property
    def formdegree(self):
        ks = set(elem.formdegree for elem in self.elements)
        return None if None in ks else max(ks)

    def entity_dofs(self):
        return concatenate_entity_dofs(self.cell, self.elements,
                                       methodcaller("entity_dofs"))

    @property
    def entity_permutations(self):
        return concatenate_entity_permutations(self.elements)

    def entity_support_dofs(self):
        return concatenate_entity_dofs(self.cell, self.elements,
                                       methodcaller("entity_support_dofs"))

    def space_dimension(self):
        return sum(elem.space_dimension() for elem in self.elements)

    @property
    def index_shape(self):
        return (self.space_dimension(),)

    @property
    def value_shape(self):
        shape, = set(elem.value_shape for elem in self.elements)
        return shape

    @property
    def fiat_equivalent(self):
        if self.is_mixed:
            return fe_numeric.MixedElement(
                [e.element.fiat_equivalent for e in self.elements],
                ref_el=self.cell)
        return fe_numeric.EnrichedElement(
            *(e.fiat_equivalent for e in self.elements))

    @property
    def is_mixed(self):
        from .mixed import MixedSubElement
        return all(isinstance(e, MixedSubElement) for e in self.elements)

    def _compose_evaluations(self, results):
        keys, = set(map(frozenset, results))
        nval = len(self.value_shape)

        def merge(tables):
            tables = list(tables)
            xp = (np if not any(_is_traced(t) for t in tables)
                  else __import__("jax.numpy", fromlist=["x"]))
            flat = []
            for elem, table in zip(self.elements, tables):
                n_idx = len(elem.index_shape)
                flat.append(table.reshape((-1,) + table.shape[n_idx:]))
            return xp.concatenate(flat, axis=0)
        return {key: merge(result[key] for result in results)
                for key in keys}

    def basis_evaluation(self, order, ps, entity=None, coordinate_mapping=None):
        results = [element.basis_evaluation(
            order, ps, entity, coordinate_mapping=coordinate_mapping)
            for element in self.elements]
        return self._compose_evaluations(results)

    def point_evaluation(self, order, refcoords, entity=None,
                         coordinate_mapping=None):
        results = [element.point_evaluation(order, refcoords, entity,
                                            coordinate_mapping)
                   for element in self.elements]
        return self._compose_evaluations(results)

    @property
    def mapping(self):
        mappings = set(elem.mapping for elem in self.elements)
        if len(mappings) != 1:
            return None
        result, = mappings
        return result

    def dual_evaluation(self, argument, coordinate_mapping=None):
        if not self.is_nodal_enriched:
            raise NotImplementedError(
                f"Dual evaluation not defined for {type(self).__name__}")
        subs = [sub.dual_evaluation(argument,
                                    coordinate_mapping=coordinate_mapping)
                for sub in self.elements]
        xp = (np if not any(_is_traced(s) for s in subs)
              else __import__("jax.numpy", fromlist=["x"]))
        return xp.concatenate([s.reshape(-1) for s in subs])


def tree_map(f, *args):
    """map over tuple trees."""
    nonleaf, = set(isinstance(arg, tuple) for arg in args)
    if nonleaf:
        return tuple(tree_map(f, *subargs) for subargs in zip(*args))
    return f(*args)


def concatenate_entity_dofs(ref_el, elements, method):
    entity_dofs = {dim: {i: [] for i in entities}
                   for dim, entities in ref_el.get_topology().items()}
    offsets = np.cumsum([0] + [e.space_dimension() for e in elements],
                        dtype=int)
    for i, d in enumerate(map(method, elements)):
        for dim, dofs in d.items():
            for ent, off in dofs.items():
                entity_dofs[dim][ent] += list(map(partial(add, offsets[i]), off))
    return entity_dofs


def concatenate_entity_permutations(elements):
    permutations = {}
    for element in elements:
        for dim, e_o_p_map in element.entity_permutations.items():
            dim_permutations = permutations.setdefault(dim, {})
            for e, o_p_map in e_o_p_map.items():
                e_dim_permutations = dim_permutations.setdefault(e, {})
                for o, p in o_p_map.items():
                    lst = e_dim_permutations.setdefault(o, [])
                    offset = len(lst)
                    lst += [offset + q for q in p]
    return permutations


def is_orthogonal(A, B):
    """Whether two (wrapper) elements put values in disjoint components."""
    from .hdivcurl import HCurlElement, HDivElement
    if isinstance(A, (HCurlElement, HDivElement)) \
            and isinstance(B, (HCurlElement, HDivElement)):
        apos = {i for i, sel in enumerate(A.transform) if sel is not None}
        bpos = {i for i, sel in enumerate(B.transform) if sel is not None}
        return not (apos & bpos)
    return False
