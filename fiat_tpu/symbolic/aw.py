"""Arnold-Winther transformations (parity with /root/reference/finat/aw.py)."""

import numpy as np

from .. import elements as fe
from ..core.expansions import polynomial_dimension
from .citations import cite
from .fiat_bridge import FiatElement
from .physically_mapped import PhysicallyMappedElement, adjugate, identity
from .piola_mapped import normal_tangential_transform


def _facet_transform(fiat_cell, facet_moment_degree, coordinate_mapping):
    sd = fiat_cell.get_spatial_dimension()
    top = fiat_cell.get_topology()
    num_facets = len(top[sd - 1])
    dimPk_facet = polynomial_dimension(
        fiat_cell.construct_subelement(sd - 1), facet_moment_degree)
    dofs_per_facet = sd * dimPk_facet
    V = identity(num_facets * dofs_per_facet)

    bary, = fiat_cell.make_points(sd, 0, sd + 1)
    J = coordinate_mapping.jacobian_at(bary)
    detJ = coordinate_mapping.detJ_at(bary)
    for f in range(num_facets):
        Bnt, Btt = normal_tangential_transform(fiat_cell, J, detJ, f)
        for i in range(dimPk_facet):
            s = dofs_per_facet * f + i * sd
            ndof = s
            tdofs = list(range(s + 1, s + sd))
            V[tdofs, ndof] = Bnt
            V[tdofs, tdofs] = Btt
    return V


def _evaluation_transform(fiat_cell, coordinate_mapping):
    sd = fiat_cell.get_spatial_dimension()
    bary, = fiat_cell.make_points(sd, 0, sd + 1)
    J = coordinate_mapping.jacobian_at(bary)
    K = adjugate(np.asarray([[J[i, j] for j in range(sd)] for i in range(sd)],
                            dtype=object))

    indices = [(i, j) for i in range(sd) for j in range(i, sd)]
    ncomp = len(indices)
    W = np.zeros((ncomp, ncomp), dtype=object)
    for p, (i, j) in enumerate(indices):
        for q, (m, n) in enumerate(indices):
            W[p, q] = 0.5 * (K[i, m] * K[j, n] + K[j, m] * K[i, n])
    W[:, [i != j for i, j in indices]] *= 2
    return W


class ArnoldWintherNC(PhysicallyMappedElement, FiatElement):
    def __init__(self, cell, degree=2):
        cite("ArnoldWinther2002")
        super().__init__(fe.ArnoldWintherNC(cell, degree))

    def basis_transformation(self, coordinate_mapping):
        # the extra 3 rows are the constraints
        numbf = self._element.space_dimension()
        ndof = self.space_dimension()
        V = identity(numbf, ndof)
        V[:12, :12] = _facet_transform(self.cell, 1, coordinate_mapping)
        return V.T

    def entity_dofs(self):
        return {0: {0: [], 1: [], 2: []},
                1: {0: [0, 1, 2, 3], 1: [4, 5, 6, 7], 2: [8, 9, 10, 11]},
                2: {0: [12, 13, 14]}}

    def space_dimension(self):
        return 15


class ArnoldWinther(PhysicallyMappedElement, FiatElement):
    def __init__(self, cell, degree=3):
        cite("ArnoldWinther2002")
        super().__init__(fe.ArnoldWinther(cell, degree))

    def basis_transformation(self, coordinate_mapping):
        # the extra 6 rows are the constraints
        numbf = self._element.space_dimension()
        ndof = self.space_dimension()
        V = identity(numbf, ndof)

        sd = self.cell.get_spatial_dimension()
        W = _evaluation_transform(self.cell, coordinate_mapping)
        ncomp = W.shape[0]
        V[0:3, 0:3] = V[3:6, 3:6] = V[6:9, 6:9] = W
        num_verts = sd + 1
        cur = num_verts * ncomp

        Vsub = _facet_transform(self.cell, 1, coordinate_mapping)
        fdofs = Vsub.shape[0]
        V[cur:cur + fdofs, cur:cur + fdofs] = Vsub

        # conditioning rescale (edge moments already length-scaled by FIAT)
        h = coordinate_mapping.cell_size()
        for e in range(num_verts):
            V[:, ncomp * e:ncomp * (e + 1)] *= 1 / (h[e] * h[e])
        return V.T

    def entity_dofs(self):
        return {0: {0: [0, 1, 2], 1: [3, 4, 5], 2: [6, 7, 8]},
                1: {0: [9, 10, 11, 12], 1: [13, 14, 15, 16],
                    2: [17, 18, 19, 20]},
                2: {0: [21, 22, 23]}}

    def space_dimension(self):
        return 24
