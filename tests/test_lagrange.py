"""End-to-end element tests for Lagrange (the minimum slice of SURVEY §7):
nodality, parity with the reference, entity maps and permutations."""

import numpy as np
import pytest

from fiat_tpu.core import cells as cl
from fiat_tpu.core.finite_element import entity_support_dofs
from fiat_tpu.elements.lagrange import Lagrange


@pytest.mark.parametrize("dim", [1, 2, 3])
@pytest.mark.parametrize("degree", [1, 2, 4])
@pytest.mark.parametrize("variant", ["equispaced", "gll"])
def test_nodality(dim, degree, variant):
    L = Lagrange(cl.ufc_simplex(dim), degree, variant=variant)
    pts = [tuple(n.get_point_dict())[0] for n in L.dual_basis()]
    V = L.tabulate(0, pts)[(0,) * dim]
    assert abs(V - np.eye(L.space_dimension())).max() < 1e-12


@pytest.mark.parametrize("dim", [1, 2, 3])
@pytest.mark.parametrize("degree", [1, 3, 5])
@pytest.mark.parametrize("variant", ["equispaced", "gll", "spectral", "chebyshev"])
def test_parity(dim, degree, variant):
    import FIAT
    rng = np.random.default_rng(11)
    pts = rng.random((12, dim)) / dim
    R = FIAT.Lagrange(FIAT.ufc_simplex(dim), degree, variant=variant)
    M = Lagrange(cl.ufc_simplex(dim), degree, variant=variant)
    assert R.entity_dofs() == M.entity_dofs()
    assert R.entity_closure_dofs() == M.entity_closure_dofs()
    assert R.entity_permutations() == M.entity_permutations()
    assert R.mapping() == M.mapping()
    rt, mt = R.tabulate(2, pts), M.tabulate(2, pts)
    assert set(rt) == set(mt)
    for alpha in rt:
        assert abs(rt[alpha] - np.asarray(mt[alpha])).max() < 1e-10


@pytest.mark.parametrize("dim", [2, 3])
def test_entity_tabulation(dim):
    import FIAT
    rng = np.random.default_rng(5)
    R = FIAT.Lagrange(FIAT.ufc_simplex(dim), 3)
    M = Lagrange(cl.ufc_simplex(dim), 3)
    for edim in range(dim):
        for entity in range(len(M.ref_el.get_topology()[edim])):
            pts = rng.random((4, edim)) / (edim + 1)
            rt = R.tabulate(1, pts, entity=(edim, entity))
            mt = M.tabulate(1, pts, entity=(edim, entity))
            for alpha in rt:
                assert abs(rt[alpha] - np.asarray(mt[alpha])).max() < 1e-11


def test_entity_support_dofs():
    import FIAT
    from FIAT.finite_element import entity_support_dofs as ref_esd
    for dim in (2, 3):
        R = FIAT.Lagrange(FIAT.ufc_simplex(dim), 4)
        M = Lagrange(cl.ufc_simplex(dim), 4)
        for edim in range(dim + 1):
            assert ref_esd(R, edim) == entity_support_dofs(M, edim)


def test_partition_of_unity():
    for dim in (1, 2, 3):
        L = Lagrange(cl.ufc_simplex(dim), 3)
        rng = np.random.default_rng(2)
        pts = rng.random((10, dim)) / dim
        vals = L.tabulate(0, pts)[(0,) * dim]
        assert np.allclose(vals.sum(axis=0), 1.0, atol=1e-12)
        grads = L.tabulate(1, pts)
        for alpha in grads:
            if sum(alpha) == 1:
                assert abs(grads[alpha].sum(axis=0)).max() < 1e-10
