"""Flattened hypercube presentation of TP elements (parity with
/root/reference/finat/cube.py)."""

from .. import elements as fe_numeric
from ..core.cells import (UFCHexahedron, UFCQuadrilateral,
                          compute_unflattening_map, flatten_entities,
                          flatten_permutations)
from .base import FiniteElementBase


class FlattenedDimensions(FiniteElementBase):
    """Wrap a tensor-product element, flattening its entity dimensions to
    quadrilateral/hexahedron numbering."""

    def __init__(self, element):
        super().__init__()
        self.product = element
        self._unflatten = compute_unflattening_map(
            element.cell.get_topology())

    @property
    def cell(self):
        dim = self.product.cell.get_spatial_dimension()
        if dim == 2:
            return UFCQuadrilateral()
        if dim == 3:
            return UFCHexahedron()
        raise NotImplementedError(f"Cannot guess cell for dimension {dim}")

    @property
    def complex(self):
        return self.product.complex

    @property
    def degree(self):
        unique_degree, = set(self.product.degree)
        return unique_degree

    @property
    def formdegree(self):
        return self.product.formdegree

    def entity_dofs(self):
        try:
            return self._entity_dofs_cache
        except AttributeError:
            self._entity_dofs_cache = flatten_entities(
                self.product.entity_dofs())
            return self._entity_dofs_cache

    def entity_support_dofs(self):
        return flatten_entities(self.product.entity_support_dofs())

    @property
    def entity_permutations(self):
        return flatten_permutations(self.product.entity_permutations)

    def space_dimension(self):
        return self.product.space_dimension()

    @property
    def fiat_equivalent(self):
        return fe_numeric.FlattenedDimensions(self.product.fiat_equivalent)

    def basis_evaluation(self, order, ps, entity=None, coordinate_mapping=None):
        if entity is None:
            entity = (self.cell.get_spatial_dimension(), 0)
        return self.product.basis_evaluation(order, ps, self._unflatten[entity])

    def point_evaluation(self, order, point, entity=None,
                         coordinate_mapping=None):
        if entity is None:
            entity = (self.cell.get_spatial_dimension(), 0)
        return self.product.point_evaluation(order, point,
                                             self._unflatten[entity],
                                             coordinate_mapping)

    @property
    def dual_basis(self):
        return self.product.dual_basis

    @property
    def index_shape(self):
        return self.product.index_shape

    @property
    def value_shape(self):
        return self.product.value_shape

    @property
    def mapping(self):
        return self.product.mapping

    def dual_evaluation(self, argument, coordinate_mapping=None):
        return self.product.dual_evaluation(argument, coordinate_mapping)
