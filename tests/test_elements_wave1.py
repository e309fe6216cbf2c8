"""Parity + property tests for element zoo wave 1 (reference strategy:
test/FIAT/unit/test_fiat.py parametrised element sweep)."""

import numpy as np
import pytest

from fiat_tpu.core import cells as cl
from fiat_tpu.elements.brezzi_douglas_marini import BrezziDouglasMarini
from fiat_tpu.elements.bubble import Bubble, FacetBubble
from fiat_tpu.elements.crouzeix_raviart import CrouzeixRaviart
from fiat_tpu.elements.discontinuous_lagrange import DiscontinuousLagrange
from fiat_tpu.elements.nedelec import Nedelec
from fiat_tpu.elements.p0 import P0
from fiat_tpu.elements.raviart_thomas import RaviartThomas
from fiat_tpu.elements.restricted import RestrictedElement
from fiat_tpu.elements.lagrange import Lagrange
from fiat_tpu.elements.spectral import (GaussLegendre, GaussLobattoLegendre,
                                        GaussRadau)


def assert_parity(R, M, dim, order=1, tol=2e-10, npts=8):
    rng = np.random.default_rng(0)
    pts = rng.random((npts, dim)) / dim
    assert R.space_dimension() == M.space_dimension()
    assert R.entity_dofs() == M.entity_dofs()
    assert R.entity_closure_dofs() == M.entity_closure_dofs()
    assert R.mapping() == M.mapping()
    assert R.get_formdegree() == M.get_formdegree()
    rt, mt = R.tabulate(order, pts), M.tabulate(order, pts)
    assert set(rt) == set(mt)
    for a in rt:
        assert abs(rt[a] - np.asarray(mt[a])).max() < tol


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_p0_and_dg(dim):
    import FIAT
    T, U = FIAT.ufc_simplex(dim), cl.ufc_simplex(dim)
    assert_parity(FIAT.P0(T), P0(U), dim)
    for deg in (1, 3):
        for v in ("equispaced", "gl", "gll"):
            assert_parity(FIAT.DiscontinuousLagrange(T, deg, variant=v),
                          DiscontinuousLagrange(U, deg, variant=v), dim)
        assert (FIAT.DiscontinuousLagrange(T, deg).entity_permutations()
                == DiscontinuousLagrange(U, deg).entity_permutations())


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_spectral(dim):
    import FIAT
    T, U = FIAT.ufc_simplex(dim), cl.ufc_simplex(dim)
    assert_parity(FIAT.GaussLobattoLegendre(T, 3), GaussLobattoLegendre(U, 3), dim)
    assert_parity(FIAT.GaussLegendre(T, 3), GaussLegendre(U, 3), dim)


def test_gauss_radau():
    import FIAT
    assert_parity(FIAT.GaussRadau(FIAT.ufc_simplex(1), 3),
                  GaussRadau(cl.ufc_simplex(1), 3), 1)


@pytest.mark.parametrize("dim", [2, 3])
def test_cr_bubble(dim):
    import FIAT
    T, U = FIAT.ufc_simplex(dim), cl.ufc_simplex(dim)
    assert_parity(FIAT.CrouzeixRaviart(T, 1), CrouzeixRaviart(U, 1), dim)
    assert_parity(FIAT.Bubble(T, dim + 1), Bubble(U, dim + 1), dim)
    assert_parity(FIAT.FacetBubble(T, dim), FacetBubble(U, dim), dim)


def test_high_order_cr():
    import FIAT
    T, U = FIAT.ufc_simplex(2), cl.ufc_simplex(2)
    for variant in (None, "integral"):
        assert_parity(FIAT.CrouzeixRaviart(T, 3, variant=variant),
                      CrouzeixRaviart(U, 3, variant=variant), 2)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("degree", [1, 2, 3])
@pytest.mark.parametrize("variant", [None, "point", "integral", "integral(1)"])
def test_hdiv_hcurl(dim, degree, variant):
    import FIAT
    T, U = FIAT.ufc_simplex(dim), cl.ufc_simplex(dim)
    assert_parity(FIAT.RaviartThomas(T, degree, variant=variant),
                  RaviartThomas(U, degree, variant=variant), dim)
    assert_parity(FIAT.Nedelec(T, degree, variant=variant),
                  Nedelec(U, degree, variant=variant), dim)
    assert_parity(FIAT.BrezziDouglasMarini(T, degree, variant=variant),
                  BrezziDouglasMarini(U, degree, variant=variant), dim)


@pytest.mark.parametrize("dim", [2, 3])
def test_rt_normal_property(dim):
    """Mathematical invariant: the normal component of RT1 basis fn i is
    zero on every facet j != i and constant-nonzero on facet i."""
    from fiat_tpu.core.quadrature_schemes import create_quadrature
    U = cl.ufc_simplex(dim)
    RT = RaviartThomas(U, 1)
    for f in range(dim + 1):
        Q = create_quadrature(U.construct_subelement(dim - 1), 3)
        transform = U.get_entity_transform(dim - 1, f)
        pts = transform(Q.get_points())
        n = U.compute_scaled_normal(f)
        vals = RT.tabulate(0, pts)[(0,) * dim]
        vn = np.einsum("ijk,j->ik", vals, n)      # (nbf, npts) normal traces
        off = np.delete(vn, f, axis=0)
        assert abs(off).max() < 1e-12
        assert abs(vn[f] - vn[f][0]).max() < 1e-12
        assert abs(vn[f][0]) > 0.1


def test_restricted_element():
    import FIAT
    from FIAT.restricted import RestrictedElement as RRE
    T, U = FIAT.ufc_simplex(2), cl.ufc_simplex(2)
    R = RRE(FIAT.Lagrange(T, 3), restriction_domain="facet")
    M = RestrictedElement(Lagrange(U, 3), restriction_domain="facet")
    assert_parity(R, M, 2)
