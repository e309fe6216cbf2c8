"""Parity tests for element zoo wave 2: C1/C2 plates, macro elements,
elasticity tensors, spectral/FDM, misc families."""

import numpy as np
import pytest

from fiat_tpu.core import cells as cl


def _pts(dim, npts=9, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random((npts, dim)) / dim


def assert_parity(R, M, dim, order=1, tol=2e-9, npts=9, rows=None,
                  check_ids=True, signed=False):
    pts = _pts(dim, npts)
    assert R.space_dimension() == M.space_dimension()
    if check_ids:
        assert R.entity_dofs() == M.entity_dofs()
    rt, mt = R.tabulate(order, pts), M.tabulate(order, pts)
    assert set(rt) == set(mt)
    signs = 1.0
    if signed:
        v, w = rt[(0,) * dim], np.asarray(mt[(0,) * dim])
        signs = np.sign(np.einsum("ip,ip->i", v, w))[:, None]
    for a in rt:
        r, m = rt[a], signs * np.asarray(mt[a])
        if rows is not None:
            r, m = r[:rows], m[:rows]
        assert abs(r - m).max() < tol, (a, abs(r - m).max())


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_hermite(dim):
    import FIAT
    from fiat_tpu.elements.hermite import CubicHermite
    assert_parity(FIAT.CubicHermite(FIAT.ufc_simplex(dim)),
                  CubicHermite(cl.ufc_simplex(dim)), dim, order=2)


@pytest.mark.parametrize("dim", [2, 3])
def test_morley(dim):
    import FIAT
    from fiat_tpu.elements.morley import Morley
    assert_parity(FIAT.Morley(FIAT.ufc_simplex(dim)),
                  Morley(cl.ufc_simplex(dim)), dim, order=2)


@pytest.mark.parametrize("degree", [5, 6])
@pytest.mark.parametrize("variant", [None, "point"])
def test_argyris(degree, variant):
    import FIAT
    from fiat_tpu.elements.argyris import Argyris
    assert_parity(FIAT.Argyris(FIAT.ufc_simplex(2), degree, variant=variant),
                  Argyris(cl.ufc_simplex(2), degree, variant=variant), 2, order=2)


def test_bell():
    import FIAT
    from fiat_tpu.elements.bell import Bell
    assert_parity(FIAT.Bell(FIAT.ufc_simplex(2)), Bell(cl.ufc_simplex(2)), 2,
                  order=2)


@pytest.mark.parametrize("degree,reduced", [(3, False), (4, False), (3, True)])
def test_hct(degree, reduced):
    import FIAT
    from fiat_tpu.elements.hct import HsiehCloughTocher
    assert_parity(FIAT.HsiehCloughTocher(FIAT.ufc_simplex(2), degree, reduced=reduced),
                  HsiehCloughTocher(cl.ufc_simplex(2), degree, reduced=reduced),
                  2, npts=25)


def test_powell_sabin():
    import FIAT
    from FIAT.powell_sabin import (QuadraticPowellSabin6 as RPS6,
                                   QuadraticPowellSabin12 as RPS12)
    from fiat_tpu.elements.powell_sabin import (QuadraticPowellSabin6,
                                                QuadraticPowellSabin12)
    assert_parity(RPS6(FIAT.ufc_simplex(2)),
                  QuadraticPowellSabin6(cl.ufc_simplex(2)), 2, npts=25)
    assert_parity(RPS12(FIAT.ufc_simplex(2)),
                  QuadraticPowellSabin12(cl.ufc_simplex(2)), 2, npts=25)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("degree", [0, 1, 2])
def test_regge_hhj(dim, degree):
    import FIAT
    from fiat_tpu.elements.hellan_herrmann_johnson import HellanHerrmannJohnson
    from fiat_tpu.elements.regge import Regge
    T, U = FIAT.ufc_simplex(dim), cl.ufc_simplex(dim)
    assert_parity(FIAT.Regge(T, degree), Regge(U, degree), dim)
    assert_parity(FIAT.HellanHerrmannJohnson(T, degree),
                  HellanHerrmannJohnson(U, degree), dim)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("degree", [1, 2])
def test_nedelec_second_kind(dim, degree):
    import FIAT
    from fiat_tpu.elements.nedelec_second_kind import NedelecSecondKind
    assert_parity(FIAT.NedelecSecondKind(FIAT.ufc_simplex(dim), degree),
                  NedelecSecondKind(cl.ufc_simplex(dim), degree), dim)


def test_aw():
    import FIAT
    from fiat_tpu.elements.arnold_winther import ArnoldWinther, ArnoldWintherNC
    T, U = FIAT.ufc_simplex(2), cl.ufc_simplex(2)
    assert_parity(FIAT.ArnoldWinther(T), ArnoldWinther(U), 2)
    assert_parity(FIAT.ArnoldWintherNC(T), ArnoldWintherNC(U), 2)


def test_hu_zhang():
    import FIAT
    from fiat_tpu.elements.hu_zhang import HuZhang
    for variant in (None, "point"):
        assert_parity(FIAT.HuZhang(FIAT.ufc_simplex(2), 3, variant=variant),
                      HuZhang(cl.ufc_simplex(2), 3, variant=variant), 2)


@pytest.mark.parametrize("dim", [2, 3])
def test_mtw_jm(dim):
    import FIAT
    from FIAT.johnson_mercier import JohnsonMercier as RJM
    from fiat_tpu.elements.johnson_mercier import JohnsonMercier
    from fiat_tpu.elements.mardal_tai_winther import MardalTaiWinther
    T, U = FIAT.ufc_simplex(dim), cl.ufc_simplex(dim)
    assert_parity(FIAT.MardalTaiWinther(T), MardalTaiWinther(U), dim)
    assert_parity(RJM(T), JohnsonMercier(U), dim)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("degree", [1, 2])
def test_gls(dim, degree):
    import FIAT
    from FIAT.gopalakrishnan_lederer_schoberl import (
        GopalakrishnanLedererSchoberlFirstKind as RGLS1,
        GopalakrishnanLedererSchoberlSecondKind as RGLS2)
    from fiat_tpu.elements.gopalakrishnan_lederer_schoberl import (
        GopalakrishnanLedererSchoberlFirstKind,
        GopalakrishnanLedererSchoberlSecondKind)
    T, U = FIAT.ufc_simplex(dim), cl.ufc_simplex(dim)
    assert_parity(RGLS1(T, degree), GopalakrishnanLedererSchoberlFirstKind(U, degree), dim)
    assert_parity(RGLS2(T, degree), GopalakrishnanLedererSchoberlSecondKind(U, degree), dim)


@pytest.mark.parametrize("dim", [1, 2, 3])
@pytest.mark.parametrize("degree", [1, 2, 4])
def test_bernstein(dim, degree):
    import FIAT
    from fiat_tpu.elements.bernstein import Bernstein
    assert_parity(FIAT.Bernstein(FIAT.ufc_simplex(dim), degree),
                  Bernstein(cl.ufc_simplex(dim), degree), dim, order=2)


@pytest.mark.parametrize("dim,degree", [(1, 3), (2, 2), (2, 5), (3, 3)])
def test_kmv(dim, degree):
    import FIAT
    from fiat_tpu.elements.kong_mulder_veldhuizen import KongMulderVeldhuizen
    assert_parity(FIAT.KongMulderVeldhuizen(FIAT.ufc_simplex(dim), degree),
                  KongMulderVeldhuizen(cl.ufc_simplex(dim), degree), dim)


def test_kmv_mass_lumping():
    """Invariant: the KMV mass matrix under the lumped rule is diagonal."""
    from fiat_tpu.elements.kong_mulder_veldhuizen import (
        KongMulderVeldhuizen, kmv_quadrature)
    for dim, degree in [(2, 2), (2, 3), (3, 2)]:
        U = cl.ufc_simplex(dim)
        el = KongMulderVeldhuizen(U, degree)
        Q = kmv_quadrature(U, degree)
        phi = el.tabulate(0, Q.get_points())[(0,) * dim]
        Mmat = np.einsum("ip,jp,p->ij", phi, phi, Q.get_weights())
        off = Mmat - np.diag(np.diag(Mmat))
        assert abs(off).max() < 1e-12


@pytest.mark.parametrize("cellname", ["quadrilateral", "hexahedron"])
@pytest.mark.parametrize("degree", [0, 1, 2])
def test_dpc(cellname, degree):
    import FIAT
    from FIAT.reference_element import UFCHexahedron as RHx
    from FIAT.reference_element import UFCQuadrilateral as RQ
    from FIAT.discontinuous_pc import DPC as RDPC
    from fiat_tpu.elements.discontinuous_pc import DPC
    RC = RQ() if cellname == "quadrilateral" else RHx()
    MC = cl.ufc_cell(cellname)
    assert_parity(RDPC(RC, degree), DPC(MC, degree),
                  MC.get_spatial_dimension())


@pytest.mark.parametrize("degree", [0, 1, 3])
def test_histopolation(degree):
    import FIAT
    from FIAT.histopolation import Histopolation as RH
    from fiat_tpu.elements.histopolation import Histopolation
    assert_parity(RH(FIAT.ufc_simplex(1), degree),
                  Histopolation(cl.ufc_simplex(1), degree), 1)


def test_fdm_elements():
    import FIAT
    from FIAT import fdm_element as rf
    from fiat_tpu.elements import fdm_element as mf
    I, J = FIAT.ufc_simplex(1), cl.ufc_simplex(1)
    pairs = [(rf.FDMLagrange, mf.FDMLagrange, (3, 5)),
             (rf.FDMDiscontinuousLagrange, mf.FDMDiscontinuousLagrange, (3, 5)),
             (rf.FDMQuadrature, mf.FDMQuadrature, (3, 5)),
             (rf.FDMBrokenH1, mf.FDMBrokenH1, (3, 5)),
             (rf.FDMBrokenL2, mf.FDMBrokenL2, (3, 5)),
             (rf.FDMHermite, mf.FDMHermite, (3,))]
    for RC, MC, degs in pairs:
        for deg in degs:
            # eigenfunction signs are a LAPACK convention: compare up to sign
            assert_parity(RC(I, deg), MC(J, deg), 1, signed=True, tol=1e-8)


def test_c2_elements():
    import FIAT
    from FIAT.c2_elements import AlfeldC2 as RAC2
    from FIAT.c2_elements import BrambleZlamalC2 as RBZ
    from fiat_tpu.elements.c2_elements import AlfeldC2, BrambleZlamalC2
    assert_parity(RBZ(FIAT.ufc_simplex(2)), BrambleZlamalC2(cl.ufc_simplex(2)),
                  2, tol=2e-8)
    assert_parity(RAC2(FIAT.ufc_simplex(2)), AlfeldC2(cl.ufc_simplex(2)), 2,
                  tol=2e-7, npts=25)


def test_walkington():
    import FIAT
    from FIAT.walkington import Walkington as RW
    from fiat_tpu.elements.walkington import Walkington
    # the 45 true basis functions match; the 20 trailing constraint
    # functionals depend on the (non-unique) null-space basis rotation
    assert_parity(RW(FIAT.ufc_simplex(3)), Walkington(cl.ufc_simplex(3)), 3,
                  rows=45, tol=2e-8, npts=16)
