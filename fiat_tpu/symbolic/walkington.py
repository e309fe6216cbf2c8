"""Walkington transformation (parity with
/root/reference/finat/walkington.py)."""

from copy import deepcopy
from itertools import chain

import numpy as np

from .. import elements as fe
from ..core.expansions import mis
from .argyris import _normal_tangential_transform, _vertex_transform
from .citations import cite
from .fiat_bridge import ScalarFiatElement
from .morley import morley_transform
from .physically_mapped import PhysicallyMappedElement, identity


class Walkington(PhysicallyMappedElement, ScalarFiatElement):
    def __init__(self, cell, degree=5):
        cite("Kirby2019zany")
        super().__init__(fe.Walkington(cell, degree=degree))
        reduced_dofs = deepcopy(self._element.entity_dofs())
        sd = cell.get_spatial_dimension()
        for entity in reduced_dofs[sd - 1]:
            reduced_dofs[sd - 1][entity] = reduced_dofs[sd - 1][entity][:1]
        self._entity_dofs = reduced_dofs

    def basis_transformation(self, coordinate_mapping):
        sd = self.cell.get_spatial_dimension()
        top = self.cell.get_topology()
        bary, = self.cell.make_points(sd, 0, sd + 1)
        J = coordinate_mapping.jacobian_at(bary)
        detJ = coordinate_mapping.detJ_at(bary)

        numbf = self._element.space_dimension()
        ndof = self.space_dimension()
        V = identity(numbf, ndof)
        vorder = 2
        _vertex_transform(V, vorder, self.cell, coordinate_mapping)

        entity_dofs = self._element.entity_dofs()
        edges = self.cell.get_connectivity()[(2, 1)]

        # nodal completion of the face constraints
        P = self._element.poly_set
        L = self._element.dual.nodal_completion
        coeffs = P.get_coeffs()
        tangential_dofs = np.dot(L.to_riesz(P), coeffs.T)
        tangential_dofs[abs(tangential_dofs) < 1e-10] = 0

        for f in entity_dofs[2]:
            Rnn, Rnt = morley_transform(self.cell, J, detJ, f)
            fdofs = entity_dofs[2][f]
            fid = fdofs[0]
            V[fid, fid] = Rnn
            for j, e in enumerate(edges[f]):
                Bnn, Bnt, Jt = _normal_tangential_transform(self.cell, J, detJ,
                                                            e, face=f)
                vid0, vid1 = (entity_dofs[0][v][0] for v in top[1][e])
                eid = fdofs[1 + j]

                V[fid, vid1] += Rnt[j]
                V[fid, vid0] += Rnt[j]
                V[eid, vid1] = 1 / 21 * Bnt
                V[eid, vid0] = -1 * V[eid, vid1]

                for i in range(sd):
                    R1 = 1 / 5 * Rnt[j] * Jt[i]
                    V[fid, vid1 + i + 1] -= R1
                    V[fid, vid0 + i + 1] += R1
                    V[eid, vid1 + i + 1] = -1 / 42 * Bnt * Jt[i]
                    V[eid, vid0 + i + 1] = V[eid, vid1 + 1 + i]

                for i, alpha in enumerate(mis(sd, 2), start=sd + 1):
                    ids = tuple(k for k, ak in enumerate(alpha) if ak)
                    a, b = ids[0], ids[-1]
                    tau = (1 + (a != b)) * Jt[a] * Jt[b]
                    R2 = 1 / 60 * Rnt[j] * tau
                    V[fid, vid1 + i] += R2
                    V[fid, vid0 + i] += R2
                    V[eid, vid1 + i] = 1 / 252 * Bnt * tau
                    V[eid, vid0 + i] = -1 * V[eid, vid1 + i]

            vids = list(chain.from_iterable(entity_dofs[0][v]
                                            for v in top[2][f]))
            # recombine with the nodal completion to satisfy the constraints
            C = tangential_dofs[L.entity_ids[2][f]]
            supp = np.unique(np.nonzero(C)[1])
            C = C.astype(object)
            C[C == 0] = 0.0

            CV = C[:, supp] @ V[np.ix_(supp, vids)]
            Gnt = np.asarray(Rnt[1:], dtype=object)
            c0, c1 = fdofs[-2:]
            V[c0, vids] = -1 * Gnt @ CV[[0, 1]]
            V[c1, vids] = -1 * Gnt @ CV[[1, 2]]

        # conditioning patch-up
        h = coordinate_mapping.cell_size()
        for v in sorted(entity_dofs[0]):
            vdofs = entity_dofs[0][v]
            V[:, vdofs[1:1 + sd]] *= 1 / h[v]
            V[:, vdofs[1 + sd:]] *= 1 / (h[v] * h[v])
        return V.T

    def entity_dofs(self):
        # FIAT reports 65 rows; the element has 45 DoFs.
        return self._entity_dofs

    def space_dimension(self):
        return 45
