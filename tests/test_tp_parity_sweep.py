"""Tensor-product / hypercube parity sweep vs the live reference.

Extends the simplex parity sweep (test_parity_sweep.py) to the
compositional TP layer: products of interval elements, flattened
quad/hex presentations, H(div)/H(curl) component embeddings, and DPC —
values + first derivatives + entity dofs at 1e-10.
"""

import numpy as np
import pytest

from fiat_tpu.core import cells as cl
from fiat_tpu import elements as fe

RNG = np.random.default_rng(21)
I = cl.ufc_simplex(1)
T = cl.ufc_simplex(2)


def _fiat():
    import FIAT
    return FIAT


def _assert_parity(mine, ref, dim, order=1, atol=1e-10, pts=None):
    if pts is None:
        pts = RNG.random((8, dim)) * 0.8
    table = mine.tabulate(order, pts)
    ref_table = ref.tabulate(order, pts)
    assert set(table) == set(ref_table)
    for alpha in ref_table:
        a = np.asarray(table[alpha], dtype=float)
        b = np.asarray(ref_table[alpha], dtype=float)
        assert a.shape == b.shape, alpha
        assert np.allclose(a, b, atol=atol), (alpha, np.abs(a - b).max())
    assert {d: {e: list(v) for e, v in ent.items()}
            for d, ent in mine.entity_dofs().items()} == ref.entity_dofs()


_FACTORIES = {
    "CG": lambda m, c, p: m.Lagrange(c, p),
    "DG": lambda m, c, p: m.DiscontinuousLagrange(c, p),
    "GLL": lambda m, c, p: m.GaussLobattoLegendre(c, p),
    "GL": lambda m, c, p: m.GaussLegendre(c, p),
}

TP_CASES = [(fa, pa, fb, pb)
            for fa, pa in (("CG", 1), ("CG", 3), ("DG", 2), ("GLL", 4))
            for fb, pb in (("CG", 2), ("DG", 1), ("GL", 3))]


@pytest.mark.parametrize("fa,pa,fb,pb", TP_CASES,
                         ids=[f"{a}{p}x{b}{q}" for a, p, b, q in TP_CASES])
def test_interval_product_parity(fa, pa, fb, pb):
    FIAT = _fiat()
    rI = FIAT.ufc_simplex(1)
    mine = fe.TensorProductElement(_FACTORIES[fa](fe, I, pa),
                                   _FACTORIES[fb](fe, I, pb))
    ref = FIAT.TensorProductElement(_FACTORIES[fa](FIAT, rI, pa),
                                    _FACTORIES[fb](FIAT, rI, pb))
    _assert_parity(mine, ref, 2)


@pytest.mark.parametrize("family,degree", [("CG", 1), ("CG", 2), ("CG", 3),
                                           ("DG", 1), ("DG", 2), ("GLL", 3)])
@pytest.mark.parametrize("dim", [2, 3])
def test_flattened_hypercube_parity(family, degree, dim):
    FIAT = _fiat()
    from FIAT.tensor_product import FlattenedDimensions as RefFlat
    rI = FIAT.ufc_simplex(1)

    def build(m, cell1, flat):
        el = _FACTORIES[family](m, cell1, degree)
        tp = (m.TensorProductElement if m is fe
              else FIAT.TensorProductElement)
        prod = tp(el, _FACTORIES[family](m, cell1, degree))
        if dim == 3:
            prod = tp(prod, _FACTORIES[family](m, cell1, degree))
        return flat(prod)
    mine = build(fe, I, fe.FlattenedDimensions)
    ref = build(FIAT, rI, RefFlat)
    _assert_parity(mine, ref, dim)


@pytest.mark.parametrize("degree", [1, 2, 3])
@pytest.mark.parametrize("kind", ["hdiv", "hcurl"])
def test_hdivcurl_wrapper_parity(kind, degree):
    FIAT = _fiat()
    from FIAT.hdivcurl import Hcurl as RefHcurl, Hdiv as RefHdiv
    rI = FIAT.ufc_simplex(1)
    k0, k1 = (degree, degree - 1) if kind == "hdiv" else (degree - 1, degree)
    mine_tp = fe.TensorProductElement(
        fe.DiscontinuousLagrange(I, k1) if kind == "hdiv"
        else fe.Lagrange(I, max(k0, 1)),
        fe.Lagrange(I, degree) if kind == "hdiv"
        else fe.DiscontinuousLagrange(I, k1))
    ref_tp = FIAT.TensorProductElement(
        FIAT.DiscontinuousLagrange(rI, k1) if kind == "hdiv"
        else FIAT.Lagrange(rI, max(k0, 1)),
        FIAT.Lagrange(rI, degree) if kind == "hdiv"
        else FIAT.DiscontinuousLagrange(rI, k1))
    wrap_mine = fe.Hdiv if kind == "hdiv" else fe.Hcurl
    wrap_ref = RefHdiv if kind == "hdiv" else RefHcurl
    _assert_parity(wrap_mine(mine_tp), wrap_ref(ref_tp), 2)


@pytest.mark.parametrize("degree", [0, 1, 2, 3])
@pytest.mark.parametrize("dim", [2, 3])
def test_dpc_parity(degree, dim):
    FIAT = _fiat()
    mine = fe.DPC(cl.ufc_hypercube(dim), degree)
    ref = FIAT.DPC(FIAT.ufc_cell("quadrilateral" if dim == 2
                                 else "hexahedron"), degree)
    _assert_parity(mine, ref, dim)


@pytest.mark.parametrize("degree", [2, 3, 4, 5])
def test_simplex_times_interval_parity(degree):
    """Prism-like cells: triangle x interval products."""
    FIAT = _fiat()
    rT, rI = FIAT.ufc_simplex(2), FIAT.ufc_simplex(1)
    mine = fe.TensorProductElement(fe.Lagrange(T, degree - 1),
                                   fe.Lagrange(I, degree))
    ref = FIAT.TensorProductElement(FIAT.Lagrange(rT, degree - 1),
                                    FIAT.Lagrange(rI, degree))
    _assert_parity(mine, ref, 3)
