"""Dual sets: the functionals of an element plus entity->DoF maps.

Covers /root/reference/FIAT/dual_set.py.  ``to_riesz`` (the batched
generalized-Vandermonde builder) delegates to the struct-of-arrays
segment-sum program in functionals.riesz_representers: one expansion
tabulation over the union of all functionals' points, then per-multi-index
segment-sums.
"""

from itertools import chain

import numpy as np

from . import functionals
from .cells import compute_unflattening_map


class DualSet:
    def __init__(self, nodes, ref_el, entity_ids, entity_permutations=None):
        if ref_el.get_dimension() != max(entity_ids):
            entity_ids = unflatten_entity_ids(ref_el, entity_ids)
        nodes, ref_el, entity_ids, entity_permutations = merge_entities(
            nodes, ref_el, entity_ids, entity_permutations)
        self.nodes = nodes
        self.ref_el = ref_el
        self.entity_ids = entity_ids
        self.entity_permutations = entity_permutations

        self.entity_closure_ids = make_entity_closure_ids(ref_el, entity_ids)

    def __iter__(self):
        return iter(self.nodes)

    def __len__(self):
        return len(self.nodes)

    def get_nodes(self):
        return self.nodes

    def get_entity_closure_ids(self):
        return self.entity_closure_ids

    def get_entity_ids(self):
        return self.entity_ids

    def get_entity_permutations(self):
        """{dim: {entity: {orientation: dof permutation}}} mapping entity-
        local DoF order to canonical order per orientation."""
        if self.entity_permutations is None:
            raise NotImplementedError(
                f"entity_permutations not yet implemented for {type(self)}")
        return self.entity_permutations

    def get_reference_element(self):
        return self.ref_el

    def to_riesz(self, poly_set):
        """Action of every functional on every expansion member:
        array (num_nodes, *target_shape, num_exp).

        One batched segment-sum program over the flattened term tables of
        all functionals (see functionals.riesz_representers)."""
        return functionals.riesz_representers(self.nodes, poly_set)

    def get_indices(self, restriction_domain, take_closure=True):
        """DoF indices supported on a restriction domain ('interior',
        'vertex', 'edge', 'face', 'facet', 'ridge')."""
        entity_dofs = self.get_entity_ids()
        if restriction_domain == "interior":
            entities = entity_dofs[max(entity_dofs.keys())]
            return list(chain(*(ids for _, ids in sorted_by_key(entities))))

        if restriction_domain == "vertex":
            dim = 0
        elif restriction_domain == "edge":
            dim = 1
        elif restriction_domain == "face":
            dim = 2
        elif restriction_domain == "facet":
            dim = self.get_reference_element().get_spatial_dimension() - 1
        elif restriction_domain == "ridge":
            dim = self.get_reference_element().get_spatial_dimension() - 2
        else:
            raise RuntimeError("Invalid restriction domain")

        is_prodcell = isinstance(max(entity_dofs.keys()), tuple)
        ldim = 0 if take_closure else dim
        indices = []
        for d in range(ldim, dim + 1):
            if is_prodcell:
                for edim in entity_dofs:
                    if sum(edim) == d:
                        for _, ids in sorted_by_key(entity_dofs[edim]):
                            indices.extend(ids)
            else:
                for _, ids in sorted_by_key(entity_dofs[d]):
                    indices.extend(ids)
        return indices


def sorted_by_key(mapping):
    def _key(item):
        return (type(item[0]).__name__, item[0])
    return sorted(mapping.items(), key=_key)


def make_entity_closure_ids(ref_el, entity_ids):
    entity_closure_ids = {}
    for dim, entities in ref_el.sub_entities.items():
        entity_closure_ids[dim] = {}
        for e, sub_entities in entities.items():
            ids = sorted(chain(*(entity_ids[d][se] for d, se in sub_entities)))
            entity_closure_ids[dim][e] = ids
    return entity_closure_ids


def unflatten_entity_ids(ref_el, entity_ids):
    """Re-key flat (integer-dim) entity ids onto a tensor-product topology."""
    unflattening_map = compute_unflattening_map(ref_el.get_topology())
    out = {dim: {} for dim in sorted(ref_el.get_topology())}
    for dim in sorted(entity_ids):
        for entity in sorted(entity_ids[dim]):
            d, e = unflattening_map[(dim, entity)]
            out[d][e] = entity_ids[dim][entity]
    return out


def lexsort_nodes(ref_el, nodes, entity=None, offset=0):
    """Order PointEvaluation nodes lexicographically by barycentric coords."""
    if len(nodes) > 1:
        pts = [tuple(node.points[0]) for node in nodes]
        bary = ref_el.compute_barycentric_coordinates(pts)
        return list(offset + np.lexsort(bary.T))
    return list(range(offset, offset + len(nodes)))


def merge_entities(nodes, ref_el, entity_ids, entity_permutations):
    """Collect DoFs of a split complex onto the parent cell's entities."""
    parent_cell = ref_el.get_parent()
    if parent_cell is None:
        return nodes, ref_el, entity_ids, entity_permutations
    parent_to_children = ref_el.get_parent_to_children()
    parent_ids = {}

    if all(isinstance(node, functionals.PointEvaluation) for node in nodes):
        # Lagrange-type: lexicographic reordering per parent entity
        parent_nodes = []
        for dim in sorted(parent_to_children):
            parent_ids[dim] = {}
            for entity in sorted(parent_to_children[dim]):
                cur = len(parent_nodes)
                for child_dim, child_entity in parent_to_children[dim][entity]:
                    parent_nodes.extend(nodes[i]
                                        for i in entity_ids[child_dim][child_entity])
                parent_ids[dim][entity] = lexsort_nodes(
                    parent_cell, parent_nodes[cur:], entity=(dim, entity), offset=cur)
    else:
        parent_nodes = nodes
        for dim in sorted(parent_to_children):
            parent_ids[dim] = {}
            for entity in sorted(parent_to_children[dim]):
                parent_ids[dim][entity] = []
                for child_dim, child_entity in parent_to_children[dim][entity]:
                    parent_ids[dim][entity].extend(entity_ids[child_dim][child_entity])

    return parent_nodes, parent_cell, parent_ids, None
