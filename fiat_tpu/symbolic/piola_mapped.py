"""Shared Piola-mapped transformation helpers (parity with
/root/reference/finat/piola_mapped.py): inverse Piola evaluation blocks and
normal/tangential moment transforms, plus the PiolaBubbleElement base for
facet-bubble Stokes macroelements."""

from copy import deepcopy
from itertools import chain

import numpy as np

from .fiat_bridge import FiatElement
from .physically_mapped import (PhysicallyMappedElement, adjugate,
                                determinant, identity)


def piola_inverse(fiat_cell, J, detJ):
    """Inverse of the Piola transform at a point: adj(J)."""
    sd = fiat_cell.get_spatial_dimension()
    Jnp = np.asarray([[J[i, j] for j in range(sd)] for i in range(sd)],
                     dtype=object)
    return adjugate(Jnp)


def normal_tangential_edge_transform(fiat_cell, J, detJ, f):
    """Transformation of normal and tangential edge moments (2D)."""
    R = np.array([[0, 1], [-1, 0]])
    that = fiat_cell.compute_edge_tangent(f)
    that = that / np.linalg.norm(that)
    nhat = R @ that
    Jn = J @ nhat
    Jt = J @ that
    alpha = Jn @ Jt
    beta = Jt @ Jt
    # last row of inv([[1, 0], [alpha/detJ, beta/detJ]])
    return (-1 * alpha / beta, detJ / beta)


def normal_tangential_face_transform(fiat_cell, J, detJ, f):
    """Transformation of normal and tangential face moments (3D)."""
    thats = fiat_cell.compute_tangents(2, f)
    nhat = np.cross(*thats)
    nhat = nhat / np.dot(nhat, nhat)
    orths = np.cross(thats, nhat[None, :], axis=1)

    Jn = J @ nhat
    Jthats = J @ thats.T
    Jorths = J @ orths.T
    A_ = Jthats.T @ Jorths
    B_ = Jn @ Jthats
    A = np.asarray([[A_[i, j] for j in range(A_.shape[1])]
                    for i in range(A_.shape[0])], dtype=object)
    B = np.asarray([B_[i] for i in range(B_.shape[0])], dtype=object)

    Q = np.dot(thats, thats.T)
    beta = determinant(A)
    alpha = Q @ (adjugate(A) @ B)
    return (alpha / beta, detJ / beta)


def normal_tangential_transform(fiat_cell, J, detJ, f):
    """(Bnt, Btt) for facet normal/tangential moments."""
    if fiat_cell.get_spatial_dimension() == 2:
        return normal_tangential_edge_transform(fiat_cell, J, detJ, f)
    return normal_tangential_face_transform(fiat_cell, J, detJ, f)


class PiolaBubbleElement(PhysicallyMappedElement, FiatElement):
    """Transform Piola-mapped elements with normal facet bubbles: the
    tangential facet DoFs are constrained to zero and dropped."""

    def __init__(self, fiat_element):
        mapping, = set(fiat_element.mapping())
        if mapping != "contravariant piola":
            raise ValueError(
                f"{type(fiat_element).__name__} needs to be Piola mapped.")
        super().__init__(fiat_element)

        sd = self.cell.get_spatial_dimension()
        reduced_dofs = deepcopy(self._element.entity_dofs())
        reduced_dim = 0
        cur = reduced_dofs[sd - 1][0][0]
        for entity in sorted(reduced_dofs[sd - 1]):
            reduced_dim += len(reduced_dofs[sd - 1][entity][1:])
            reduced_dofs[sd - 1][entity] = [cur]
            cur += 1
        self._entity_dofs = reduced_dofs
        self._space_dimension = fiat_element.space_dimension() - reduced_dim

    def entity_dofs(self):
        return self._entity_dofs

    def space_dimension(self):
        return self._space_dimension

    def basis_transformation(self, coordinate_mapping):
        sd = self.cell.get_spatial_dimension()
        bary, = self.cell.make_points(sd, 0, sd + 1)
        J = coordinate_mapping.jacobian_at(bary)
        detJ = coordinate_mapping.detJ_at(bary)

        dofs = self.entity_dofs()
        bfs = self._element.entity_dofs()
        numdof = self.space_dimension()
        numbf = self._element.space_dimension()
        V = identity(numbf, numdof)

        # undo the Piola transform on non-facet-bubble functions
        nodes = self._element.get_dual_set().nodes
        Finv = piola_inverse(self.cell, J, detJ)
        for dim in dofs:
            if dim == sd - 1:
                continue
            for e in sorted(dofs[dim]):
                k = 0
                while k < len(dofs[dim][e]):
                    cur = dofs[dim][e][k]
                    if len(nodes[cur].deriv_dict) > 0:
                        V[cur, cur] = detJ
                        k += 1
                    else:
                        s = dofs[dim][e][k:k + sd]
                        V[np.ix_(s, s)] = Finv
                        k += sd

        # unpick the normal component of the facet bubbles
        for f in sorted(dofs[sd - 1]):
            Bnt, Btt = normal_tangential_transform(self.cell, J, detJ, f)
            ndof, *tdofs = dofs[sd - 1][f]
            nbf, *tbfs = bfs[sd - 1][f]
            V[tbfs, ndof] = Bnt
            if len(tdofs) > 0:
                V[tbfs, tdofs] = Btt

        # fix the normal/tangential moment discrepancy
        needs_facet_vertex_coupling = len(dofs[0][0]) > 0 and numbf > numdof
        if needs_facet_vertex_coupling:
            def perp(*t):
                if len(t) == 1:
                    return np.array([t[0][1], -t[0][0]])
                return np.cross(*t)

            dim = max(d for d in range(sd - 1) if len(dofs[d][0]) > 0)
            vdofs = chain.from_iterable(dofs[dim].values())
            vdofs = [i for i in vdofs if nodes[i].max_deriv_order == 0]
            fdofs = list(chain.from_iterable(dofs[sd - 1].values()))

            T = np.full((len(fdofs), len(vdofs)), 0.0, dtype=object)
            for f in sorted(dofs[sd - 1]):
                nhat = perp(*self.cell.compute_tangents(sd - 1, f))
                Tfv = ((-1 / sd) * nhat) @ Finv
                for v in self.cell.connectivity[(sd - 1, dim)][f]:
                    curvdofs = [vdofs.index(i) for i in dofs[dim][v]
                                if i in vdofs]
                    for fdof in dofs[sd - 1][f]:
                        T[fdofs.index(fdof), curvdofs] = Tfv
            V[numdof:, vdofs] += V[numdof:, fdofs] @ T
        return V.T
