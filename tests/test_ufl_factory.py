"""Tests for the element-description layer (fiat_tpu.ufl) and the
element factory (reference strategy: test/finat/test_create_element.py
and ufl's element tests)."""

import numpy as np
import pytest

import fiat_tpu.ufl as ufl
from fiat_tpu import symbolic as sym
from fiat_tpu.factory import (as_fiat_cell, create_base_element,
                              create_element, supported_elements)


def test_cells():
    tri = ufl.as_cell("triangle")
    assert tri.topological_dimension == 2
    assert tri == ufl.triangle
    tpc = ufl.TensorProductCell(ufl.interval, ufl.interval)
    assert tpc.topological_dimension == 2
    assert as_fiat_cell(tri).get_spatial_dimension() == 2
    assert as_fiat_cell(tpc).get_spatial_dimension() == 2


def test_canonical_description_aliases():
    e = ufl.FiniteElement("P", "triangle", 2)
    assert e.family() == "Lagrange"
    e = ufl.FiniteElement("N1div", "tetrahedron", 1)
    assert e.family() == "Raviart-Thomas"
    with pytest.raises(ValueError):
        ufl.FiniteElement("NoSuchFamily", "triangle", 1)
    with pytest.raises(ValueError):
        ufl.FiniteElement("Morley", "triangle", 3)  # degree out of range


def test_sobolev_ordering():
    assert ufl.H2 < ufl.H1 < ufl.L2
    assert max([ufl.H1, ufl.L2]) == ufl.L2
    mixed = ufl.FiniteElement("CG", "triangle", 1) * \
        ufl.FiniteElement("DG", "triangle", 0)
    assert mixed.sobolev_space == ufl.L2


def test_value_shapes():
    rt = ufl.FiniteElement("RT", "triangle", 1)
    assert rt.reference_value_shape == (2,)
    assert rt.value_shape() == (2,)
    v = ufl.VectorElement("CG", "triangle", 2)
    assert v.value_shape() == (2,)
    t = ufl.TensorElement("CG", "triangle", 1, symmetry=True)
    assert t.reference_value_shape == (3,)
    assert t.value_shape() == (2, 2)
    assert t.symmetry() == {(1, 0): (0, 1)}


def test_operators_build_compositions():
    cg = ufl.FiniteElement("CG", "triangle", 1)
    b = ufl.FiniteElement("B", "triangle", 3)
    assert isinstance(cg + b, ufl.EnrichedElement)
    assert isinstance(cg * b, ufl.MixedElement)
    assert isinstance(cg["facet"], ufl.RestrictedElement)


def test_create_element_default_variants():
    # default variant is spectral: CG -> GLL, DG -> GL
    el = create_element(ufl.FiniteElement("CG", "interval", 5))
    assert isinstance(el, sym.GaussLobattoLegendre)
    el = create_element(ufl.FiniteElement("DG", "interval", 3))
    assert isinstance(el, sym.GaussLegendre)
    el = create_element(
        ufl.FiniteElement("CG", "triangle", 2, variant="equispaced"))
    assert isinstance(el, sym.Lagrange)


def test_create_element_zoo():
    cases = [
        (("RT", "triangle", 2), sym.RaviartThomas, 8),
        (("N1curl", "tetrahedron", 1), sym.Nedelec, 6),
        (("BDM", "triangle", 1), sym.BrezziDouglasMarini, 6),
        (("Morley", "triangle", 2), sym.Morley, 6),
        (("Hermite", "triangle", 3), sym.Hermite, 10),
        (("Argyris", "triangle", 5), sym.Argyris, 21),
        (("HCT", "triangle", 3), sym.HsiehCloughTocher, 12),
        (("Regge", "triangle", 0), sym.Regge, 3),
        (("CR", "triangle", 1), sym.CrouzeixRaviart, 3),
        (("KMV", "triangle", 2), sym.KongMulderVeldhuizen, 7),
    ]
    for (family, cellname, degree), cls, ndof in cases:
        el = create_element(ufl.FiniteElement(family, cellname, degree))
        assert isinstance(el, cls), family
        assert el.space_dimension() == ndof, family


def test_create_element_quad_flattening():
    el = create_element(ufl.FiniteElement("Q", "quadrilateral", 2))
    assert isinstance(el, sym.FlattenedDimensions)
    assert el.space_dimension() == 9
    el = create_element(ufl.FiniteElement("DQ", "quadrilateral", 1))
    assert el.space_dimension() == 4
    el = create_element(ufl.FiniteElement("RTCF", "quadrilateral", 1))
    assert el.space_dimension() == 4
    assert el.mapping == "contravariant piola"
    el = create_element(ufl.FiniteElement("RTCE", "quadrilateral", 1))
    assert el.space_dimension() == 4
    assert el.mapping == "covariant piola"
    el = create_element(ufl.FiniteElement("S", "quadrilateral", 2))
    assert isinstance(el, sym.Serendipity)


def test_create_element_hex():
    el = create_element(ufl.FiniteElement("Q", "hexahedron", 1))
    assert el.space_dimension() == 8
    el = create_element(ufl.FiniteElement("NCF", "hexahedron", 1))
    assert el.space_dimension() == 6
    assert el.mapping == "contravariant piola"
    el = create_element(ufl.FiniteElement("NCE", "hexahedron", 1))
    assert el.space_dimension() == 12
    assert el.mapping == "covariant piola"


def test_create_element_compositions():
    v = ufl.VectorElement("CG", "triangle", 2)
    el = create_element(v)
    assert isinstance(el, sym.TensorFiniteElement)
    assert el.index_shape == (6, 2)
    base = create_base_element(v)
    assert isinstance(base, sym.GaussLobattoLegendre) or \
        base.space_dimension() == 6

    th = v * ufl.FiniteElement("CG", "triangle", 1)
    el = create_element(th)
    # MixedElement is a factory returning an enrichment of offset parts
    assert isinstance(el, sym.EnrichedElement)
    assert el.space_dimension() == 15
    assert el.value_shape == (3,)

    broken = ufl.BrokenElement(ufl.FiniteElement("CG", "triangle", 2))
    el = create_element(broken)
    assert isinstance(el, sym.DiscontinuousElement)
    assert el.entity_dofs()[2][0] == list(range(6))

    restr = ufl.FiniteElement("CG", "triangle", 3)["facet"]
    assert create_element(restr).space_dimension() == 9


def test_create_element_tensor_product():
    tp = ufl.TensorProductElement(
        ufl.FiniteElement("CG", "triangle", 2),
        ufl.FiniteElement("DG", "interval", 1))
    el = create_element(tp)
    assert isinstance(el, sym.TensorProductElement)
    assert el.space_dimension() == 12
    hdiv = ufl.HDivElement(ufl.TensorProductElement(
        ufl.FiniteElement("CG", "interval", 1),
        ufl.FiniteElement("DG", "interval", 0)))
    el = create_element(hdiv)
    assert isinstance(el, sym.HDivElement)
    assert el.value_shape == (2,)


def test_create_element_caching():
    e1 = ufl.FiniteElement("Lagrange", "triangle", 3)
    e2 = ufl.FiniteElement("Lagrange", "triangle", 3)
    assert e1 == e2 and hash(e1) == hash(e2)
    assert create_element(e1) is create_element(e2)
    # different parameters -> different elements
    v = ufl.VectorElement("CG", "triangle", 1)
    a = create_element(v, shape_innermost=True)
    b = create_element(v, shape_innermost=False)
    assert a is not b


def test_feec_notation():
    e = ufl.FiniteElement("P- Lambda", "triangle", 1, form_degree=1)
    assert e.family() == "Nedelec 1st kind H(curl)"
    e = ufl.FiniteElement("P Lambda", "tetrahedron", 2, form_degree=3)
    assert e.family() == "Discontinuous Lagrange"
    assert e.degree() == 2


def test_quadrature_element_factory():
    qe = ufl.FiniteElement("Quadrature", "triangle", 3,
                           quad_scheme="default")
    el = create_element(qe)
    assert el.space_dimension() > 0
    with pytest.raises(ValueError):
        create_element(ufl.FiniteElement("Quadrature", "triangle", None,
                                         quad_scheme="default"))


def test_supported_elements_coverage():
    """Every directly-constructible family in the registry resolves."""
    present = [k for k, v in supported_elements.items() if v is not None]
    assert len(present) >= 55


def test_pullbacks():
    rt = ufl.FiniteElement("RT", "triangle", 1)
    assert rt.pullback is ufl.contravariant_piola
    assert rt.pullback.physical_value_shape(rt) == (2,)
    cg = ufl.FiniteElement("CG", "triangle", 1)
    assert cg.pullback is ufl.identity_pullback
    t = ufl.TensorElement("CG", "triangle", 1, symmetry=True)
    assert t.pullback.physical_value_shape(t) == (2, 2)
    v = ufl.VectorElement("N1curl", "tetrahedron", 1)
    assert v.pullback.name == "covariant Piola"
    m = cg * rt
    assert m.pullback.physical_value_shape(m) == (3,)


def test_factory_corner_cases():
    el = create_element(ufl.FiniteElement("Bernstein", "quadrilateral", 2))
    assert el.space_dimension() == 9
    el = create_element(ufl.FiniteElement("Boundary Quadrature",
                                          "triangle", 2,
                                          quad_scheme="default"))
    assert el.space_dimension() > 0
    el = create_element(ufl.FiniteElement("Real", "quadrilateral", 0))
    assert el.space_dimension() == 1
    el = create_element(ufl.FiniteElement("DQ L2", "quadrilateral", 1))
    assert el.space_dimension() == 4


def test_create_broken_element():
    """BrokenElement descriptions convert to DiscontinuousElement with
    all dofs on the cell (reference strategy:
    test/finat/test_create_broken_element.py)."""
    from fiat_tpu import ufl as fufl
    from fiat_tpu.factory import create_element
    from fiat_tpu.symbolic import DiscontinuousElement

    inner = fufl.FiniteElement("Lagrange", fufl.triangle, 2)
    broken = create_element(fufl.BrokenElement(inner))
    assert isinstance(broken, DiscontinuousElement)
    smooth = create_element(inner)
    assert broken.space_dimension() == smooth.space_dimension()
    dofs = broken.entity_dofs()
    assert dofs[2][0] == list(range(broken.space_dimension()))
    assert all(not v for d, ent in dofs.items() if d != 2
               for v in ent.values())


# ---------------------------------------------------------------------------
# Full-registry factory sweep (reference strategy:
# test/finat/test_create_finat_element.py:1-172, widened to every family
# in the description-layer registry x its supported base cells).
# ---------------------------------------------------------------------------

_SWEEP_CELLS = ["interval", "triangle", "tetrahedron", "quadrilateral",
                "hexahedron"]

#: families the REFERENCE factory cannot convert either (they are absent
#: from finat/element_factory.py supported_elements: runtime-tabulated
#: Themis variants, hex Arnold-Awanou, direct-serendipity H(div)) -- the
#: factory raises KeyError on the family name, like the reference
_UNCONVERTIBLE = {
    "AAE", "AAF", "Direct Serendipity Full H(div)",
    "Direct Serendipity Reduced H(div)", "Extended-Gauss-Legendre",
    "Extended-Gauss-Legendre Edge", "Extended-Gauss-Legendre Edge L2",
    "Gauss-Lobatto-Legendre Edge", "Gauss-Lobatto-Legendre Edge L2",
    "Radau", "Undefined",
}

#: (family, cell) pairs where the registry's minimum degree is not a
#: valid instance and the reference raises the same documented error
_INVALID_AT_KMIN = {
    ("Bubble", "triangle"): (RuntimeError, 3),
    ("Bubble", "tetrahedron"): (RuntimeError, 4),
    ("FacetBubble", "tetrahedron"): (RuntimeError, 3),
    # reference: NotImplementedError "Trace element on a UFCHexahedron"
    ("HDiv Trace", "hexahedron"): (NotImplementedError, None),
}


def _registry_families():
    from fiat_tpu.ufl.elementlist import ufl_elements
    seen, out = set(), []
    for data in ufl_elements.values():
        if data[0] not in seen:
            seen.add(data[0])
            out.append(data)
    return out


@pytest.mark.parametrize(
    "data", _registry_families(), ids=lambda d: d[0])
def test_registry_factory_sweep(data):
    """Every registry family x supported base cell either converts (and
    its entity dofs tile the space) or raises the same documented error
    as the reference factory."""
    family, short, rank, sob, mapping, (kmin, kmax), cells = data
    converted = 0
    for cell in _SWEEP_CELLS:
        if cell not in cells:
            continue
        degree = kmin if kmin is not None else 1
        if kmax is not None:
            degree = min(degree, kmax)
        kw = {}
        if family in ("Quadrature", "Boundary Quadrature"):
            kw["quad_scheme"] = "default"
            degree = max(degree, 1)

        if family in _UNCONVERTIBLE:
            with pytest.raises(KeyError):
                create_element(ufl.FiniteElement(family, cell, degree, **kw))
            continue
        if (family, cell) in _INVALID_AT_KMIN:
            exc, good_degree = _INVALID_AT_KMIN[(family, cell)]
            with pytest.raises(exc):
                create_element(ufl.FiniteElement(family, cell, degree, **kw))
            if good_degree is None:
                continue
            degree = good_degree

        el = create_element(ufl.FiniteElement(family, cell, degree, **kw))
        n = el.space_dimension()
        assert n > 0, (family, cell)
        tiled = sum(len(ids) for ent in el.entity_dofs().values()
                    for ids in ent.values())
        assert tiled == n, (family, cell)
        converted += 1
    if family not in _UNCONVERTIBLE:
        assert converted > 0 or not any(c in cells for c in _SWEEP_CELLS)


def test_element_hash_properties():
    """Hashes: equal for equal descriptions, different across variants,
    and stable ACROSS PYTHON INVOCATIONS (reference strategy:
    test/finat/test_hash.py -- downstream disk caches key on these)."""
    import subprocess
    import sys
    dg = ufl.FiniteElement("DG", "triangle", 2)
    assert hash(dg) == hash(ufl.FiniteElement("DG", "triangle", 2))
    assert hash(dg) != hash(ufl.FiniteElement("DG", "triangle", 2,
                                              variant="gll"))
    code = ("import sys; sys.path.insert(0, {p!r}); "
            "import fiat_tpu.ufl as ufl; "
            "print(hash(ufl.FiniteElement('DG', 'triangle', 2)))").format(
                p=str(__import__('pathlib').Path(__file__).parents[1]))
    runs = {subprocess.run([sys.executable, "-c", code], check=True,
                           capture_output=True).stdout.strip()
            for _ in range(2)}
    assert len(runs) == 1, runs


@pytest.mark.parametrize("shape", [1, 2, (2, 3)], ids=("1", "2", "(2,3)"))
@pytest.mark.parametrize("sub", [("CG", "triangle", 1),
                                 ("BDM", "triangle", 2)],
                         ids=("CG1", "BDM2"))
def test_create_restricted_vector_or_tensor_element(shape, sub):
    """RestrictedElement nests INSIDE vector/tensor wrappers (reference:
    test/finat/test_create_restricted_element.py)."""
    elem = ufl.FiniteElement(*sub)
    wrap = ((lambda e: ufl.VectorElement(e, dim=shape))
            if isinstance(shape, int)
            else (lambda e: ufl.TensorElement(e, shape=shape)))
    assert (ufl.RestrictedElement(wrap(elem), "interior")
            == wrap(ufl.RestrictedElement(elem, "interior")))


def test_create_restricted_mixed_element():
    subs = [ufl.FiniteElement("CG", "triangle", 1),
            ufl.FiniteElement("BDM", "triangle", 2)]
    assert (ufl.MixedElement(subs)["facet"]
            == ufl.MixedElement([e["facet"] for e in subs]))
