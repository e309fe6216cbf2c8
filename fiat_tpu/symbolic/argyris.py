"""Argyris element transformation (parity with
/root/reference/finat/argyris.py), including the shared vertex-jet,
normal/tangential, and edge-moment transformation helpers used across the
scalar C1 zany families.  All algebra runs on (possibly traced) scalars in
numpy object matrices."""

from itertools import chain
from math import comb

import numpy as np

from .. import elements as fe
from .citations import cite
from .fiat_bridge import ScalarFiatElement
from .physically_mapped import PhysicallyMappedElement, identity


def _jet_transform(J, order):
    """Covariant transformation of a symmetric derivative jet of the given
    order (outer powers of the Jacobian contracted over symmetries)."""
    if order == 0:
        return identity(1)
    sd = J.shape[0]
    shape = (sd,) * order

    mapping = {}
    alphas = []
    for indices in np.ndindex(shape):
        alpha = [0] * sd
        for i in indices:
            alpha[i] += 1
        alpha = tuple(alpha)
        if alpha not in alphas:
            alphas.append(alpha)
        mapping[indices] = alphas.index(alpha)
    imapping = {v: k for k, v in mapping.items()}

    Jnp = np.asarray([[J[i, j] for j in range(sd)] for i in range(sd)],
                     dtype=object)
    Jprod = Jnp
    for _ in range(1, order):
        Jprod = Jprod[..., None, None] * Jnp

    B = np.full((len(alphas), len(alphas)), 0.0, dtype=object)
    for i, ii in imapping.items():
        for jj, j in mapping.items():
            B[i, j] = B[i, j] + Jprod[tuple(chain.from_iterable(zip(jj, ii)))]
    return B


def _vertex_transform(V, vorder, fiat_cell, coordinate_mapping):
    """Vertex-jet block transformation."""
    sd = fiat_cell.get_spatial_dimension()
    top = fiat_cell.get_topology()
    bary, = fiat_cell.make_points(sd, 0, sd + 1)
    J = coordinate_mapping.jacobian_at(bary)

    jet = [_jet_transform(J, k) for k in range(vorder + 1)]
    s = 0
    for v in sorted(top[0]):
        for B in jet:
            ndofs = len(B)
            V[s:s + ndofs, s:s + ndofs] = B
            s += ndofs
    return V


def _normal_tangential_transform(fiat_cell, J, detJ, edge, face=None):
    """(Bnn, Bnt, Jt) for edge normal-derivative transformations."""
    that = fiat_cell.compute_edge_tangent(edge)
    if fiat_cell.get_spatial_dimension() == 2:
        R = np.array([[0, 1], [-1, 0]])
        nhat = R @ that
    else:
        nface = fiat_cell.compute_scaled_normal(face)
        nface = nface / np.linalg.norm(nface)
        nhat = np.cross(that, nface)

    Jn = J @ nhat
    Jt = J @ that
    alpha = Jn @ Jt
    beta = Jt @ Jt
    Bnn = detJ / beta
    Bnt = alpha / beta

    Lhat = np.linalg.norm(that)
    Bnn = Bnn * Lhat
    Bnt = Bnt / Lhat
    return Bnn, Bnt, Jt


def _edge_transform(V, vorder, eorder, fiat_cell, coordinate_mapping, avg=False):
    """Edge-moment block transformation (normal derivative moments against
    Jacobi polynomials)."""
    sd = fiat_cell.get_spatial_dimension()
    bary, = fiat_cell.make_points(sd, 0, sd + 1)
    J = coordinate_mapping.jacobian_at(bary)
    detJ = coordinate_mapping.detJ_at(bary)
    pel = coordinate_mapping.physical_edge_lengths()

    voffset = comb(sd + vorder, vorder)
    eoffset = 2 * eorder + 1
    top = fiat_cell.get_topology()
    for e in sorted(top[1]):
        Bnn, Bnt, Jt = _normal_tangential_transform(fiat_cell, J, detJ, e)
        if avg:
            Bnn = Bnn * pel[e]

        v0id, v1id = (v * voffset for v in top[1][e])
        s0 = len(top[0]) * voffset + e * eoffset
        for k in range(eorder + 1):
            s = s0 + k
            P1 = comb(k + vorder, k)
            P0 = -(-1) ** k * P1
            V[s, s] = Bnn
            V[s, v1id] = P1 * Bnt
            V[s, v0id] = P0 * Bnt
            if k > 0:
                V[s, s + eorder] = -Bnt


class Argyris(PhysicallyMappedElement, ScalarFiatElement):
    """The physically-mapped Argyris element."""

    def __init__(self, cell, degree=5, variant=None, avg=False):
        cite("Argyris1968")
        if variant is None:
            variant = "integral"
        if variant == "point" and degree != 5:
            raise NotImplementedError(
                "Degree must be 5 for 'point' variant of Argyris")
        self.variant = variant
        self.avg = avg
        super().__init__(fe.Argyris(cell, degree, variant=variant))

    def basis_transformation(self, coordinate_mapping):
        sd = self.cell.get_spatial_dimension()
        top = self.cell.get_topology()
        V = identity(self.space_dimension())

        vorder = 2
        voffset = comb(sd + vorder, vorder)
        eorder = self.degree - 5

        _vertex_transform(V, vorder, self.cell, coordinate_mapping)
        if self.variant == "integral":
            _edge_transform(V, vorder, eorder, self.cell, coordinate_mapping,
                            avg=self.avg)
        else:
            bary, = self.cell.make_points(sd, 0, sd + 1)
            J = coordinate_mapping.jacobian_at(bary)
            detJ = coordinate_mapping.detJ_at(bary)
            pel = coordinate_mapping.physical_edge_lengths()
            for e in sorted(top[1]):
                s = len(top[0]) * voffset + e * (eorder + 1)
                v0id, v1id = (v * voffset for v in top[1][e])
                Bnn, Bnt, Jt = _normal_tangential_transform(self.cell, J,
                                                            detJ, e)
                V[s, s] = Bnn * pel[e]
                V[s, v1id] = 15 / 8 * Bnt
                V[s, v0id] = -V[s, v1id]
                for i in range(sd):
                    V[s, v1id + 1 + i] = -7 / 16 * Bnt * Jt[i]
                    V[s, v0id + 1 + i] = V[s, v1id + 1 + i]
                tau = [Jt[0] * Jt[0], 2 * Jt[0] * Jt[1], Jt[1] * Jt[1]]
                for i in range(len(tau)):
                    V[s, v1id + 3 + i] = 1 / 32 * Bnt * tau[i]
                    V[s, v0id + 3 + i] = -V[s, v1id + 3 + i]

        # conditioning patch-up
        h = coordinate_mapping.cell_size()
        for v in sorted(top[0]):
            s = voffset * v + 1
            V[:, s:s + sd] *= 1 / h[v]
            V[:, s + sd:voffset * (v + 1)] *= 1 / (h[v] * h[v])

        if self.variant == "point":
            eoffset = 2 * eorder + 1
            for e in sorted(top[1]):
                v0, v1 = top[1][e]
                s = len(top[0]) * voffset + e * eoffset
                V[:, s:s + eorder + 1] *= 2 / (h[v0] + h[v1])

        return V.T
