"""QuadratureElement: quadrature points pretending to be an element; the
tabulation at its own points is the identity (parity with
/root/reference/FIAT/quadrature_element.py)."""

import numpy as np

from ..core.dualset import DualSet
from ..core.finite_element import FiniteElement
from ..core.functionals import PointEvaluation


class QuadratureElement(FiniteElement):
    """Point evaluations at fixed quadrature points."""

    def __init__(self, ref_el, points, weights=None):
        entity_dofs = {dim: {entity: [] for entity in entities}
                       for dim, entities in ref_el.get_topology().items()}
        entity_dofs[ref_el.get_dimension()] = {0: list(range(len(points)))}
        nodes = [PointEvaluation(ref_el, tuple(point)) for point in points]
        dual = DualSet(nodes, ref_el, entity_dofs)
        super().__init__(ref_el, dual, order=None)
        self._points = points
        self._weights = weights

    def value_shape(self):
        return ()

    def tabulate(self, order, points, entity=None):
        if entity is not None and entity != (self.ref_el.get_dimension(), 0):
            raise ValueError('QuadratureElement does not "tabulate" on subentities.')
        if order:
            raise ValueError("Derivatives are not defined on a QuadratureElement.")
        if (len(points) != len(self._points)
                or abs(np.asarray(points) - self._points).max() > 1e-12):
            raise AssertionError("Mismatch of quadrature points!")
        dim = self.ref_el.get_spatial_dimension()
        return {(0,) * dim: np.eye(len(self._points))}

    @staticmethod
    def is_nodal():
        return True
