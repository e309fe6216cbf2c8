"""Macro-element layer tests (reference strategy: test/FIAT/unit/
test_macro.py): split topologies and child-parent maps vs the
reference, macro quadrature exactness, and C^k continuity of constrained
polynomial sets via jump tabulation."""

import numpy as np
import pytest

from fiat_tpu.core import cells as cl
from fiat_tpu.core.macro import (AlfeldSplit, CkPolynomialSet, IsoSplit,
                                 MacroQuadratureRule, PowellSabin12Split,
                                 PowellSabinSplit, WorseyFarinSplit)
from fiat_tpu.core.quadrature_schemes import create_quadrature


def _ref_split(name, dim):
    import FIAT
    from FIAT import macro as ref_macro
    return getattr(ref_macro, name)(FIAT.ufc_simplex(dim))


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("name", ["AlfeldSplit", "IsoSplit",
                                  "WorseyFarinSplit"])
def test_split_topology_parity(name, dim):
    mine = {"AlfeldSplit": AlfeldSplit, "IsoSplit": IsoSplit,
            "WorseyFarinSplit": WorseyFarinSplit}[name](cl.ufc_simplex(dim))
    ref = _ref_split(name, dim)
    assert np.allclose(np.asarray(mine.get_vertices()),
                       np.asarray(ref.get_vertices()))
    mt, rt = mine.get_topology(), ref.get_topology()
    assert {d: {e: tuple(v) for e, v in ents.items()}
            for d, ents in mt.items()} == \
        {d: {e: tuple(v) for e, v in ents.items()}
         for d, ents in rt.items()}
    for d in mt:
        assert mine.get_child_to_parent()[d] == \
            ref.get_child_to_parent()[d]


def test_powell_sabin_splits():
    T = cl.ufc_simplex(2)
    ps6 = PowellSabinSplit(T)
    ps12 = PowellSabin12Split(T)
    assert len(ps6.get_topology()[2]) == 6
    assert len(ps12.get_topology()[2]) == 12
    import FIAT
    from FIAT.macro import PowellSabin12Split as RefPS12
    ref = RefPS12(FIAT.ufc_simplex(2))
    assert np.allclose(np.asarray(ps12.get_vertices()),
                       np.asarray(ref.get_vertices()))


@pytest.mark.parametrize("dim", [2, 3])
def test_macro_quadrature_exactness(dim):
    """Composite rule on the split integrates polynomials exactly over
    the parent cell."""
    from fiat_tpu.core.quadrature import make_quadrature
    T = cl.ufc_simplex(dim)
    split = AlfeldSplit(T)
    degree = 4
    Q = MacroQuadratureRule(split, create_quadrature(
        split.construct_subelement(dim), degree))
    pts = np.asarray(Q.get_points())
    wts = np.asarray(Q.get_weights())
    assert abs(wts.sum() - T.volume()) < 1e-13
    ref_Q = create_quadrature(T, degree)
    rp, rw = np.asarray(ref_Q.get_points()), np.asarray(ref_Q.get_weights())
    rng = np.random.default_rng(0)
    for _ in range(3):
        c = rng.random(dim)
        f = lambda x: (x @ c) ** degree
        assert abs(wts @ f(pts) - rw @ f(rp)) < 1e-12


@pytest.mark.parametrize("order", [0, 1])
def test_ck_polynomial_set_continuity(order):
    """C^k-constrained sets have (numerically) zero jumps across
    interior facets up to derivative order k."""
    T = cl.ufc_simplex(2)
    split = AlfeldSplit(T)
    degree = 3
    ck = CkPolynomialSet(split, degree, order=order, variant=None)
    es = ck.get_expansion_set()
    coeffs = np.asarray(ck.get_coeffs())
    # evaluate the constrained basis on both sides of an interior facet
    # (barycenter split: interior facets run vertex -> barycenter)
    rng = np.random.default_rng(1)
    bary = np.asarray(T.get_vertices()).mean(axis=0)
    v0 = np.asarray(T.get_vertices()[0])
    t = bary - v0
    s = rng.random(5)[:, None]
    line = v0 + s * t
    eps = 1e-7
    nrm = np.array([-t[1], t[0]])
    nrm = nrm / np.linalg.norm(nrm)
    plus = es.tabulate(degree, line + eps * nrm)
    minus = es.tabulate(degree, line - eps * nrm)
    vals_plus = coeffs @ plus
    vals_minus = coeffs @ minus
    assert np.abs(vals_plus - vals_minus).max() < 50 * eps


def test_ck_size_parity():
    import FIAT
    from FIAT.macro import AlfeldSplit as RefAlfeld
    from FIAT.macro import CkPolynomialSet as RefCk
    T = cl.ufc_simplex(2)
    for degree, order in [(2, 0), (3, 1), (4, 1)]:
        mine = CkPolynomialSet(AlfeldSplit(T), degree, order=order,
                               variant=None)
        ref = RefCk(RefAlfeld(FIAT.ufc_simplex(2)), degree, order=order,
                    variant=None)
        assert mine.get_num_members() == ref.get_num_members(), \
            (degree, order)


def test_iso_lagrange_variant():
    """P1 on an Iso(2) split == P2 iso element: parity vs reference."""
    import FIAT
    mine = __import__("fiat_tpu").Lagrange(cl.ufc_simplex(2), 1,
                                           variant="equispaced,iso(2)")
    ref = FIAT.Lagrange(FIAT.ufc_simplex(2), 1,
                        variant="equispaced,iso(2)")
    rng = np.random.default_rng(3)
    pts = rng.random((6, 2)) / 2
    t = mine.tabulate(0, pts)[(0, 0)]
    rt = ref.tabulate(0, pts)[(0, 0)]
    assert np.allclose(t, rt, atol=1e-10)
