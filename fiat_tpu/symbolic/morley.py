"""Morley element transformation (parity with
/root/reference/finat/morley.py)."""

import numpy as np

from .. import elements as fe
from .citations import cite
from .fiat_bridge import ScalarFiatElement
from .physically_mapped import PhysicallyMappedElement, identity


def morley_transform(cell, J, detJ, face):
    sd = cell.get_spatial_dimension()
    thats = cell.compute_tangents(sd - 1, face)
    nhat = np.cross(*thats)
    ahat = np.linalg.norm(nhat)
    nhat = nhat / np.dot(nhat, nhat)

    Jn = J @ nhat
    Jt = J @ thats.T
    Gnt = Jn.T @ Jt
    Gtt = Jt.T @ Jt
    detG = Gtt[0, 0] * Gtt[1, 1] - Gtt[0, 1] * Gtt[1, 0]
    area = detG ** 0.5

    Bnn = detJ / area * ahat
    # Bnt = Gnt @ adj(Gtt) / detG, written entrywise over scalars
    adj = [[Gtt[1, 1], -1 * Gtt[1, 0]], [-1 * Gtt[0, 1], Gtt[0, 0]]]
    Bnt = [sum(Gnt[i] * adj[i][j] for i in range(2)) / detG * ahat
           for j in range(2)]
    Bnt = (-1 * (Bnt[0] + Bnt[1]), Bnt[0], Bnt[1])
    return Bnn, Bnt


class Morley(PhysicallyMappedElement, ScalarFiatElement):
    def __init__(self, cell, degree=2):
        cite("Morley1971")
        super().__init__(fe.Morley(cell, degree=degree))

    def basis_transformation(self, coordinate_mapping):
        sd = self.cell.get_spatial_dimension()
        top = self.cell.get_topology()
        bary, = self.cell.make_points(sd, 0, sd + 1)
        J = coordinate_mapping.jacobian_at(bary)
        detJ = coordinate_mapping.detJ_at(bary)
        V = identity(self.space_dimension())

        offset = len(top[sd - 2])
        if sd == 2:
            pel = coordinate_mapping.physical_edge_lengths()
            pts = coordinate_mapping.physical_tangents()
            pns = coordinate_mapping.physical_normals()
            for e in top[sd - 1]:
                s = offset + e
                t = pts[e]
                n = pns[e]
                nhat = self.cell.compute_normal(e)
                Jn = J @ nhat
                Bnn = Jn @ n
                Bnt = Jn @ t
                V[s, s] = Bnn
                v = list(top[sd - 1][e])
                V[s, v] = Bnt / pel[e]
                V[s, v[0]] *= -1
        else:
            edges = self.cell.get_connectivity()[(sd - 1, sd - 2)]
            for face in top[sd - 1]:
                Bnn, Bnt = morley_transform(self.cell, J, detJ, face)
                fid = offset + face
                V[fid, fid] = Bnn
                V[fid, list(edges[face])] = Bnt

        # conditioning patch-up
        h = coordinate_mapping.cell_size()
        for face in top[sd - 1]:
            s = offset + face
            verts = top[sd - 1][face]
            havg = sum(h[v] for v in verts) / len(verts)
            V[:, s] *= 1 / havg

        return V.T
