"""Bell element transformation (parity with /root/reference/finat/bell.py):
vertex 2-jets plus edge constraint functionals (dropped from entity_dofs,
the element exposes 18 of FIAT's 21 rows)."""

from copy import deepcopy
from math import comb

from .. import elements as fe
from .argyris import _normal_tangential_transform, _vertex_transform
from .citations import cite
from .fiat_bridge import ScalarFiatElement
from .physically_mapped import PhysicallyMappedElement, identity


class Bell(PhysicallyMappedElement, ScalarFiatElement):
    def __init__(self, cell, degree=5):
        cite("Bell1969")
        super().__init__(fe.Bell(cell, degree=degree))
        reduced_dofs = deepcopy(self._element.entity_dofs())
        sd = cell.get_spatial_dimension()
        for entity in reduced_dofs[sd - 1]:
            reduced_dofs[sd - 1][entity] = []
        self._entity_dofs = reduced_dofs

    def basis_transformation(self, coordinate_mapping):
        sd = self.cell.get_spatial_dimension()
        top = self.cell.get_topology()
        bary, = self.cell.make_points(sd, 0, sd + 1)
        J = coordinate_mapping.jacobian_at(bary)
        detJ = coordinate_mapping.detJ_at(bary)

        numbf = self._element.space_dimension()
        ndof = self.space_dimension()
        # rectangular: tosses the constraint rows
        V = identity(numbf, ndof)

        vorder = 2
        _vertex_transform(V, vorder, self.cell, coordinate_mapping)

        voffset = comb(sd + vorder, vorder)
        for e in sorted(top[1]):
            s = len(top[0]) * voffset + e
            v0id, v1id = (v * voffset for v in top[1][e])
            Bnn, Bnt, Jt = _normal_tangential_transform(self.cell, J, detJ, e)

            V[s, v1id] = 1 / 21 * Bnt
            V[s, v0id] = -V[s, v1id]
            for i in range(sd):
                V[s, v1id + 1 + i] = -1 / 42 * Bnt * Jt[i]
                V[s, v0id + 1 + i] = V[s, v1id + 1 + i]
            tau = [Jt[0] * Jt[0], 2 * Jt[0] * Jt[1], Jt[1] * Jt[1]]
            for i in range(len(tau)):
                V[s, v1id + 3 + i] = 1 / 252 * Bnt * tau[i]
                V[s, v0id + 3 + i] = -V[s, v1id + 3 + i]

        # conditioning patch-up
        h = coordinate_mapping.cell_size()
        for v in sorted(top[0]):
            s = voffset * v + 1
            V[:, s:s + sd] *= 1 / h[v]
            V[:, s + sd:voffset * (v + 1)] *= 1 / (h[v] * h[v])

        return V.T

    def entity_dofs(self):
        # FIAT reports 21 rows; the element has 18 DoFs (the 3 extra rows
        # feed the transformation under the edge constraint).
        return self._entity_dofs

    def space_dimension(self):
        return 18
