"""Hsieh-Clough-Tocher transformations (parity with
/root/reference/finat/hct.py)."""

from copy import deepcopy
from math import comb

from .. import elements as fe
from .argyris import (_edge_transform, _normal_tangential_transform,
                      _vertex_transform)
from .citations import cite
from .fiat_bridge import ScalarFiatElement
from .physically_mapped import PhysicallyMappedElement, identity


class HsiehCloughTocher(PhysicallyMappedElement, ScalarFiatElement):
    def __init__(self, cell, degree=3, avg=False):
        cite("Clough1965")
        if degree > 3:
            cite("Groselj2022")
        self.avg = avg
        super().__init__(fe.HsiehCloughTocher(cell, degree))

    def basis_transformation(self, coordinate_mapping):
        V = identity(self.space_dimension())
        sd = self.cell.get_dimension()
        top = self.cell.get_topology()

        vorder = 1
        eorder = self.degree - 3
        voffset = comb(sd + vorder, vorder)
        _vertex_transform(V, vorder, self.cell, coordinate_mapping)
        _edge_transform(V, vorder, eorder, self.cell, coordinate_mapping,
                        avg=self.avg)

        h = coordinate_mapping.cell_size()
        for v in sorted(top[0]):
            s = voffset * v + 1
            V[:, s:s + sd] *= 1 / h[v]
        return V.T


class ReducedHsiehCloughTocher(PhysicallyMappedElement, ScalarFiatElement):
    def __init__(self, cell, degree=3):
        cite("Clough1965")
        super().__init__(fe.HsiehCloughTocher(cell, reduced=True))
        reduced_dofs = deepcopy(self._element.entity_dofs())
        sd = cell.get_spatial_dimension()
        for entity in reduced_dofs[sd - 1]:
            reduced_dofs[sd - 1][entity] = []
        self._entity_dofs = reduced_dofs

    def basis_transformation(self, coordinate_mapping):
        sd = self.cell.get_spatial_dimension()
        top = self.cell.get_topology()
        numbf = self._element.space_dimension()
        ndof = self.space_dimension()
        V = identity(numbf, ndof)

        vorder = 1
        voffset = comb(sd + vorder, vorder)
        _vertex_transform(V, vorder, self.cell, coordinate_mapping)

        bary, = self.cell.make_points(sd, 0, sd + 1)
        J = coordinate_mapping.jacobian_at(bary)
        detJ = coordinate_mapping.detJ_at(bary)
        for e in sorted(top[1]):
            s = len(top[0]) * voffset + e
            v0id, v1id = (v * voffset for v in top[1][e])
            Bnn, Bnt, Jt = _normal_tangential_transform(self.cell, J, detJ, e)
            V[s, v0id] = 1 / 5 * Bnt
            V[s, v1id] = -V[s, v0id]
            for i in range(sd):
                V[s, v1id + 1 + i] = 1 / 10 * Bnt * Jt[i]
                V[s, v0id + 1 + i] = V[s, v1id + 1 + i]

        h = coordinate_mapping.cell_size()
        for v in sorted(top[0]):
            s = voffset * v + 1
            V[:, s:s + sd] *= 1 / h[v]
        return V.T

    def entity_dofs(self):
        # FIAT reports 12 rows; the element has 9 DoFs.
        return self._entity_dofs

    def space_dimension(self):
        return 9
