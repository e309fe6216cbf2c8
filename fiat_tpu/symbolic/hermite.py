"""Hermite element transformation (parity with
/root/reference/finat/hermite.py): vertex gradients map by the Jacobian."""

from .. import elements as fe
from .citations import cite
from .fiat_bridge import ScalarFiatElement
from .physically_mapped import PhysicallyMappedElement, identity


class Hermite(PhysicallyMappedElement, ScalarFiatElement):
    def __init__(self, cell, degree=3):
        cite("Ciarlet1972")
        super().__init__(fe.CubicHermite(cell))

    def basis_transformation(self, coordinate_mapping):
        Js = [coordinate_mapping.jacobian_at(vertex)
              for vertex in self.cell.get_vertices()]
        h = coordinate_mapping.cell_size()

        d = self.cell.get_dimension()
        M = identity(self.space_dimension())
        cur = 0
        for i in range(d + 1):
            cur += 1  # skip the vertex value
            J = Js[i]
            for j in range(d):
                for k in range(d):
                    M[cur + j, cur + k] = J[j, k] / h[i]
            cur += d
        return M
