"""Arnold-Qin C0(Alfeld) Stokes macroelement (parity with
/root/reference/FIAT/arnold_qin.py): curl(HCT[-red]) + P0 x."""

import numpy as np

from ..core import cells as cl
from ..core import finite_element, polyset
from ..core.macro import CkPolynomialSet
from ..core.quadrature_schemes import create_quadrature
from .bernardi_raugel import BernardiRaugelDualSet
from .hct import HsiehCloughTocher


def ArnoldQinSpace(ref_el, degree, reduced=False):
    """curl(HCT-red) + P0 x (reduced) or curl(HCT) + P0 x."""
    if ref_el.get_shape() != cl.TRIANGLE:
        raise ValueError("Arnold-Qin only defined on triangles")
    if degree != 2:
        raise ValueError("Arnold-Qin only defined for degree = 2")
    sd = ref_el.get_spatial_dimension()
    HCT = HsiehCloughTocher(ref_el, degree + 1, reduced=True)
    ref_complex = HCT.get_reference_complex()
    Q = create_quadrature(ref_complex, 2 * degree)
    qpts, qwts = Q.get_points(), Q.get_weights()

    x = qpts.T
    bary = np.asarray(ref_el.make_points(sd, 0, sd + 1))
    P0x_at_qpts = x[None, :, :] - bary[:, :, None]

    tab = HCT.tabulate(1, qpts)
    curl_at_qpts = np.stack([tab[(0, 1)], -tab[(1, 0)]], axis=1)
    if reduced:
        curl_at_qpts = curl_at_qpts[:9]

    C0 = CkPolynomialSet(ref_complex, degree, order=0, scale=1, variant="bubble")
    C0_at_qpts = C0.tabulate(qpts)[(0,) * sd]
    duals = C0_at_qpts * qwts
    M = np.dot(duals, C0_at_qpts.T)
    duals = np.linalg.solve(M, duals)

    # swap the constant null mode for P0 x
    ids = [0, 3, 6]
    A = np.asarray([[1, 1, 1], [1, -1, 0], [0, -1, 1]])
    phis = curl_at_qpts
    phis[ids] = np.tensordot(A, phis[ids], axes=(-1, 0))
    phis[0] = P0x_at_qpts
    coeffs = np.tensordot(phis, duals, axes=(-1, -1))
    return polyset.PolynomialSet(ref_complex, degree, degree,
                                 C0.get_expansion_set(), coeffs)


class ArnoldQin(finite_element.CiarletElement):
    """Arnold-Qin C0(Alfeld) quadratic macroelement (divergence in P0)."""

    def __init__(self, ref_el, degree=2, reduced=False):
        poly_set = ArnoldQinSpace(ref_el, degree)
        if reduced:
            order = 1
            mapping = "contravariant piola"
        else:
            order = degree
            mapping = "affine"
        dual = BernardiRaugelDualSet(ref_el, order, degree=degree)
        formdegree = ref_el.get_spatial_dimension() - 1
        super().__init__(poly_set, dual, degree, formdegree, mapping=mapping)
