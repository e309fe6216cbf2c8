"""Entity support dofs on extruded (tensor-product) elements
(reference strategy: test/FIAT/unit/test_facet_support_dofs.py --
expected support sets for quad/prism H1/L2/H(div)/H(curl) layouts)."""

import pytest

import fiat_tpu.elements as fe
from fiat_tpu.core.cells import UFCInterval, UFCTriangle
from fiat_tpu.core.finite_element import entity_support_dofs


@pytest.mark.parametrize(
    ("base", "extr", "horiz_expected", "vert_expected"),
    [(("DiscontinuousLagrange", 0), ("DiscontinuousLagrange", 0),
      {0: [0], 1: [0]}, {0: [0], 1: [0]}),
     (("DiscontinuousLagrange", 1), ("DiscontinuousLagrange", 1),
      {0: [0, 2], 1: [1, 3]}, {0: [0, 1], 1: [2, 3]}),
     (("Lagrange", 1), ("Lagrange", 1),
      {0: [0, 2], 1: [1, 3]}, {0: [0, 1], 1: [2, 3]}),
     (("DiscontinuousLagrange", 0), ("Lagrange", 1),
      {0: [0], 1: [1]}, {0: [0, 1], 1: [0, 1]}),
     (("Lagrange", 1), ("DiscontinuousLagrange", 0),
      {0: [0, 1], 1: [0, 1]}, {0: [0], 1: [1]})])
def test_quad(base, extr, horiz_expected, vert_expected):
    elem = fe.TensorProductElement(
        getattr(fe, base[0])(UFCInterval(), base[1]),
        getattr(fe, extr[0])(UFCInterval(), extr[1]))
    assert horiz_expected == entity_support_dofs(elem, (1, 0))
    assert vert_expected == entity_support_dofs(elem, (0, 1))


@pytest.mark.parametrize(
    ("base", "extr", "horiz_expected", "vert_expected"),
    [(("DiscontinuousLagrange", 0), ("DiscontinuousLagrange", 0),
      {0: [0], 1: [0]}, {0: [0], 1: [0], 2: [0]}),
     (("DiscontinuousLagrange", 1), ("DiscontinuousLagrange", 1),
      {0: [0, 2, 4], 1: [1, 3, 5]},
      {0: [2, 3, 4, 5], 1: [0, 1, 4, 5], 2: [0, 1, 2, 3]}),
     (("Lagrange", 1), ("Lagrange", 1),
      {0: [0, 2, 4], 1: [1, 3, 5]},
      {0: [2, 3, 4, 5], 1: [0, 1, 4, 5], 2: [0, 1, 2, 3]}),
     (("Lagrange", 1), ("DiscontinuousLagrange", 0),
      {0: [0, 1, 2], 1: [0, 1, 2]},
      {0: [1, 2], 1: [0, 2], 2: [0, 1]})])
def test_prism(base, extr, horiz_expected, vert_expected):
    elem = fe.TensorProductElement(
        getattr(fe, base[0])(UFCTriangle(), base[1]),
        getattr(fe, extr[0])(UFCInterval(), extr[1]))
    assert horiz_expected == entity_support_dofs(elem, (2, 0))
    assert vert_expected == entity_support_dofs(elem, (1, 1))


def _rtcf_like(space_h, cell):
    """The enriched Hdiv TP layout of the reference's RTCF/prism tests."""
    degree = 1
    W0 = fe.Hdiv(fe.TensorProductElement(
        space_h(cell, degree),
        fe.DiscontinuousLagrange(UFCInterval(), degree - 1)))
    W1 = fe.Hdiv(fe.TensorProductElement(
        fe.DiscontinuousLagrange(cell, degree - 1),
        fe.Lagrange(UFCInterval(), degree)))
    return fe.EnrichedElement(W0, W1)


def test_quad_rtcf():
    elem = _rtcf_like(fe.Lagrange, UFCInterval())
    assert {0: [0, 1, 2], 1: [0, 1, 3]} == entity_support_dofs(elem, (1, 0))
    assert {0: [0, 2, 3], 1: [1, 2, 3]} == entity_support_dofs(elem, (0, 1))


@pytest.mark.parametrize(
    ("space", "horiz_expected", "vert_expected"),
    [("RaviartThomas",
      {0: [0, 1, 2, 3], 1: [0, 1, 2, 4]},
      {0: list(range(5)), 1: list(range(5)), 2: list(range(5))}),
     ("BrezziDouglasMarini",
      {0: [0, 1, 2, 3, 4, 5, 6], 1: [0, 1, 2, 3, 4, 5, 7]},
      {0: list(range(8)), 1: list(range(8)), 2: list(range(8))})])
def test_prism_hdiv(space, horiz_expected, vert_expected):
    elem = _rtcf_like(getattr(fe, space), UFCTriangle())
    assert horiz_expected == entity_support_dofs(elem, (2, 0))
    assert vert_expected == entity_support_dofs(elem, (1, 1))


@pytest.mark.parametrize(
    ("space", "horiz_expected", "vert_expected"),
    [("RaviartThomas",
      {0: [0, 1, 2, 3, 5, 7], 1: [0, 1, 2, 4, 6, 8]},
      {0: [1, 2] + list(range(3, 9)),
       1: [0, 2] + list(range(3, 9)),
       2: [0, 1] + list(range(3, 9))}),
     ("BrezziDouglasMarini",
      {0: list(range(3)) + list(range(3, 15, 2)),
       1: list(range(3)) + list(range(4, 15, 2))},
      {0: [1, 2] + list(range(3, 15)),
       1: [0, 2] + list(range(3, 15)),
       2: [0, 1] + list(range(3, 15))})])
def test_prism_hcurl(space, horiz_expected, vert_expected):
    degree = 1
    W0 = fe.Hcurl(fe.TensorProductElement(
        fe.Lagrange(UFCTriangle(), degree),
        fe.DiscontinuousLagrange(UFCInterval(), degree - 1)))
    W1 = fe.Hcurl(fe.TensorProductElement(
        getattr(fe, space)(UFCTriangle(), degree),
        fe.Lagrange(UFCInterval(), degree)))
    elem = fe.EnrichedElement(W0, W1)
    assert horiz_expected == entity_support_dofs(elem, (2, 0))
    assert vert_expected == entity_support_dofs(elem, (1, 1))


def test_discontinuous_element():
    elem = fe.DiscontinuousElement(fe.Lagrange(UFCTriangle(), 3))
    assert entity_support_dofs(elem, 1) == {0: [1, 2, 3, 4],
                                            1: [0, 2, 5, 6],
                                            2: [0, 1, 7, 8]}
