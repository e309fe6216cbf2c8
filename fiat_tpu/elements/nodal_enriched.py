"""Nodal enriched element: direct sum re-orthogonalised to the merged dual
basis (parity with /root/reference/FIAT/nodal_enriched.py)."""

import math

import numpy as np

from ..core.barycentric import LagrangeLineExpansionSet
from ..core.dualset import DualSet
from ..core.expansions import polynomial_entity_ids
from ..core.finite_element import CiarletElement
from ..core.polyset import PolynomialSet
from ..core.quadrature_schemes import create_quadrature

__all__ = ["NodalEnrichedElement"]


class NodalEnrichedElement(CiarletElement):
    """Direct sum of nodal elements, with the primal basis re-nodalised
    against the concatenated dual basis."""

    def __init__(self, *elements):
        if not all(e.is_nodal() for e in elements):
            raise ValueError("NodalEnrichedElement requires nodal inputs")

        embedded_degrees = [e.degree() for e in elements]
        embedded_degree = max(embedded_degrees)
        order = max(e.get_order() for e in elements)
        formdegree = (None if any(e.get_formdegree() is None for e in elements)
                      else max(e.get_formdegree() for e in elements))

        elem = max(elements, key=lambda e: (e.get_reference_complex(), e.degree()))
        ref_el = elem.get_reference_complex()
        expansion_set = elem.get_nodal_basis().get_expansion_set()
        mapping = elem.mapping()[0]
        value_shape = elem.value_shape()

        assert all(e.get_reference_complex() <= ref_el for e in elements)
        assert all(set(e.mapping()) == {mapping} for e in elements)
        assert all(e.value_shape() == value_shape for e in elements)

        if (isinstance(expansion_set, LagrangeLineExpansionSet)
                and expansion_set.degree == embedded_degree):
            # interpolation onto the nodal 1D expansion
            points = expansion_set.get_points()
            coeffs = np.vstack([e.tabulate(0, points)[(0,)] for e in elements])
        elif all(e.get_nodal_basis().get_expansion_set() == expansion_set
                 for e in elements):
            coeffs = _merge_coeffs([e.get_coeffs() for e in elements],
                                   ref_el, embedded_degrees,
                                   expansion_set.continuity)
        else:
            # L2 projection onto the common expansion set
            sd = ref_el.get_spatial_dimension()
            Q = create_quadrature(ref_el, 2 * embedded_degree)
            qpts = Q.get_points()
            phis = expansion_set._tabulate(embedded_degree, qpts, 0)[(0,) * sd]
            PhiW = phis * Q.get_weights()
            M = np.tensordot(phis, PhiW, (-1, -1))
            MinvPhiW = np.linalg.solve(M, PhiW)
            tabulations = np.concatenate(
                [e.tabulate(0, qpts)[(0,) * sd] for e in elements], axis=0)
            coeffs = np.tensordot(tabulations, MinvPhiW, (-1, -1))
            assert coeffs.shape[1:-1] == value_shape

        poly_set = PolynomialSet(ref_el, embedded_degree, embedded_degree,
                                 expansion_set, coeffs)

        offsets = np.cumsum([0] + [e.space_dimension() for e in elements[:-1]])
        entity_ids = _merge_entity_ids((e.entity_dofs() for e in elements), offsets)
        nodes = [node for e in elements for node in e.dual_basis()]
        parent = ref_el.get_parent() or ref_el
        dual_set = DualSet(nodes, parent, entity_ids)
        super().__init__(poly_set, dual_set, order, formdegree=formdegree,
                         mapping=mapping)


def _merge_coeffs(coeffss, ref_el, degrees, continuity):
    """Zero-pad coefficient blocks into a common expansion set, respecting
    the per-entity layout of C0 (bubble) expansions."""
    entity_ids = polynomial_entity_ids(ref_el, max(degrees), continuity)
    total_dim = sum(c.shape[0] for c in coeffss)
    value_shape = coeffss[0].shape[1:-1]
    assert all(c.shape[1:-1] == value_shape for c in coeffss)
    max_expansion_dim = max(c.shape[-1] for c in coeffss)

    new_coeffs = np.zeros((total_dim, *value_shape, max_expansion_dim),
                          dtype=coeffss[0].dtype)
    counter = 0
    for c, degree in zip(coeffss, degrees):
        ids = []
        dims = (sorted(entity_ids) if continuity == "C0"
                else (ref_el.get_spatial_dimension(),))
        for dim in dims:
            dimPk = (math.comb(degree - 1, dim) if continuity == "C0"
                     else math.comb(degree + dim, dim))
            for entity in sorted(entity_ids[dim]):
                ids.extend(entity_ids[dim][entity][:dimPk])
        n = c.shape[0]
        new_coeffs[counter:counter + n, ..., ids] = c
        counter += n
    assert counter == total_dim
    return new_coeffs


def _merge_entity_ids(entity_ids, offsets):
    out = {}
    for i, ids in enumerate(entity_ids):
        for dim in ids:
            out.setdefault(dim, {})
            for entity in ids[dim]:
                out[dim].setdefault(entity, [])
                out[dim][entity].extend(offsets[i] + dof for dof in ids[dim][entity])
    return out
