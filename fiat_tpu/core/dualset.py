"""Dual sets: the functionals of an element plus entity->DoF maps.

Parity with /root/reference/FIAT/dual_set.py.  ``to_riesz`` is the batched
generalized-Vandermonde builder: all functionals' evaluation points are
deduplicated, the expansion set is tabulated once per derivative order, and
weights are scatter-accumulated -- the same dataflow a device segment-sum
would use.
"""

from collections import defaultdict
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

        Batched: functional points are deduplicated so the expansion set is
        tabulated once for values and once for derivatives."""
        tshape = self.nodes[0].target_shape
        num_nodes = len(self.nodes)
        es = poly_set.get_expansion_set()
        ed = poly_set.get_embedded_degree()
        num_exp = es.get_num_members(ed)
        mat = np.zeros((num_nodes, *tshape, num_exp))

        # -- point-value part -------------------------------------------------
        pts_index = {}
        for node in self.nodes:
            for pt in node.pt_dict:
                pts_index.setdefault(pt, None)
        pts = sorted(pts_index)
        for j, pt in enumerate(pts):
            pts_index[pt] = j
        if pts:
            # wts[i, c..., j] scatter, then one dense contraction.
            wts = np.zeros((num_nodes, *tshape, len(pts)))
            for i, node in enumerate(self.nodes):
                for pt, wc_list in node.pt_dict.items():
                    j = pts_index[pt]
                    for (w, c) in wc_list:
                        wts[(i, *c, j)] += w
            expansion_values = es.tabulate(ed, pts)   # (num_exp, npts)
            mat += np.dot(wts, expansion_values.T)

        # -- derivative part ---------------------------------------------------
        max_order = max(node.max_deriv_order for node in self.nodes)
        if max_order > 0:
            dpts_index = {}
            for node in self.nodes:
                for pt in node.deriv_dict:
                    dpts_index.setdefault(pt, None)
            dpts = sorted(dpts_index)
            for j, pt in enumerate(dpts):
                dpts_index[pt] = j
            dvals = es._tabulate(ed, dpts, order=max_order)
            dwts = {alpha: np.zeros((num_nodes, *tshape, len(dpts)))
                    for alpha in dvals if sum(alpha) > 0}
            for i, node in enumerate(self.nodes):
                for pt, wac_list in node.deriv_dict.items():
                    j = dpts_index[pt]
                    for (w, alpha, c) in wac_list:
                        dwts[tuple(alpha)][(i, *c, j)] += w
            for alpha, wts in dwts.items():
                mat += np.dot(wts, dvals[alpha].T)
        return mat

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
        pts = [tuple(node.get_point_dict())[0] for node in nodes]
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
