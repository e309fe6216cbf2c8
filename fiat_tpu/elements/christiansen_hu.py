"""Christiansen-Hu C0(Worsey-Farin) Stokes macroelement (parity with
/root/reference/FIAT/christiansen_hu.py): divergence-free C0 P1 on the WF
split + P0 x, augmented with rotated facet bubbles."""

import numpy as np

from ..core import finite_element, polyset
from ..core.macro import CkPolynomialSet, WorseyFarinSplit
from ..core.quadrature_schemes import create_quadrature
from .bernardi_raugel import BernardiRaugelDualSet


def ChristiansenHuSpace(ref_el, degree, reduced=False):
    """{v in C0 P1(WF)^d : div v = 0} + P0 x (+ rotated facet bubbles)."""
    sd = ref_el.get_spatial_dimension()
    ref_complex = WorseyFarinSplit(ref_el)
    C0 = CkPolynomialSet(ref_complex, degree, order=0, shape=(sd,), scale=1,
                         variant="bubble")
    Q = create_quadrature(ref_complex, degree - 1)
    tab = C0.tabulate(Q.get_points(), 1)
    divC0 = sum(tab[alpha][:, alpha.index(1), :]
                for alpha in tab if sum(alpha) == 1)

    nsp = polyset.spanning_basis(divC0.T, nullspace=True)
    coeffs = np.tensordot(nsp, C0.get_coeffs(), axes=(-1, 0))

    verts = np.asarray(ref_complex.get_vertices())
    WT = verts[-1]
    P0x_coeffs = np.transpose(verts - WT[None, :])
    coeffs = np.concatenate((coeffs, P0x_coeffs[None, ...]), axis=0)

    if not reduced:
        dual = BernardiRaugelDualSet(ref_el, degree, degree=degree,
                                     ref_complex=ref_complex, reduced=True)
        dualmat = dual.to_riesz(C0)
        V = np.tensordot(dualmat, coeffs, axes=((1, 2), (1, 2)))
        coeffs = np.tensordot(np.linalg.inv(V.T), coeffs, axes=(-1, 0))
        facet_bubbles = coeffs[-(sd + 1):]

        # rotate the facet bubbles onto the facet tangent space
        WF = verts[sd + 1:-1]
        top = ref_el.get_topology()
        ext = []
        for f in top[sd - 1]:
            ehat = WF[f] - WT
            FB = np.dot(ehat, facet_bubbles[f])
            thats = ref_el.compute_tangents(sd - 1, f)
            for that in thats:
                ext.append(that[:, None] * FB[None, :])
        coeffs = np.concatenate((coeffs, np.asarray(ext)), axis=0)

    return polyset.PolynomialSet(ref_complex, degree, degree,
                                 C0.get_expansion_set(), coeffs)


class ChristiansenHu(finite_element.CiarletElement):
    """Christiansen-Hu linear macroelement (paired with unsplit DG0)."""

    def __init__(self, ref_el, degree=1):
        if degree != 1:
            raise ValueError("Christiansen-Hu only defined for degree = 1")
        poly_set = ChristiansenHuSpace(ref_el, degree)
        ref_complex = poly_set.get_reference_element()
        dual = BernardiRaugelDualSet(ref_el, degree, degree=degree,
                                     ref_complex=ref_complex)
        formdegree = ref_el.get_spatial_dimension() - 1
        super().__init__(poly_set, dual, degree, formdegree,
                         mapping="contravariant piola")
