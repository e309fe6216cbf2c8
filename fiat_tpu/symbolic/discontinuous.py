"""Discontinuous wrapper in the symbolic layer (parity with
/root/reference/finat/discontinuous.py)."""

from .. import elements as fe_numeric
from .base import FiniteElementBase


class DiscontinuousElement(FiniteElementBase):
    """Move all DoFs of a symbolic element onto the cell."""

    def __init__(self, element):
        super().__init__()
        self.element = element

    @property
    def cell(self):
        return self.element.cell

    @property
    def complex(self):
        return self.element.complex

    @property
    def degree(self):
        return self.element.degree

    @property
    def formdegree(self):
        return self.element.cell.get_spatial_dimension()

    def entity_dofs(self):
        try:
            return self._entity_dofs_cache
        except AttributeError:
            pass
        result = {dim: {i: [] for i in entities}
                  for dim, entities in self.cell.get_topology().items()}
        result[self.cell.get_dimension()][0].extend(
            range(self.space_dimension()))
        self._entity_dofs_cache = result
        return result

    @property
    def entity_permutations(self):
        if self.element.entity_dofs() == self.element.entity_closure_dofs():
            return self.element.entity_permutations
        raise NotImplementedError(
            f"entity_permutations not yet implemented for a general {type(self)}")

    def space_dimension(self):
        return self.element.space_dimension()

    @property
    def index_shape(self):
        return self.element.index_shape

    @property
    def value_shape(self):
        return self.element.value_shape

    @property
    def fiat_equivalent(self):
        return fe_numeric.DiscontinuousElement(self.element.fiat_equivalent)

    def basis_evaluation(self, order, ps, entity=None, coordinate_mapping=None):
        return self.element.basis_evaluation(order, ps, entity,
                                             coordinate_mapping=coordinate_mapping)

    def point_evaluation(self, order, refcoords, entity=None,
                         coordinate_mapping=None):
        return self.element.point_evaluation(order, refcoords, entity,
                                             coordinate_mapping)

    @property
    def dual_basis(self):
        return self.element.dual_basis

    @property
    def mapping(self):
        return self.element.mapping
