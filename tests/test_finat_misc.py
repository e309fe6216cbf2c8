"""Miscellaneous symbolic-layer behaviors mirrored from the reference's
finat test suite: dual-point dedupe (test_dual_basis.py), description
hashing (test_hash.py), restriction (test_restriction.py), facet support
dofs (test_facet_support_dofs.py)."""

import numpy as np
import pytest

import fiat_tpu.ufl as ufl_desc
from fiat_tpu.core import cells as cl
from fiat_tpu import symbolic as sym


def test_dual_point_dedupe():
    """Duals sharing evaluation points collapse to unique points."""
    T = cl.ufc_simplex(2)
    el = sym.Lagrange(T, 3)
    Q, ps = el.dual_basis
    pts = np.asarray(ps.points)
    uniq = np.unique(np.round(pts, decimals=7), axis=0)
    assert len(pts) == len(uniq)
    # Lagrange: one point per dof
    assert len(pts) == el.space_dimension()


def test_enriched_dual_evaluation():
    """dual_evaluation on a (nodal) enrichment of restrictions of one
    space reproduces the identity interpolation."""
    T = cl.ufc_simplex(2)
    base = sym.Lagrange(T, 3)
    inner = sym.RestrictedElement(base, "interior")
    facet = sym.RestrictedElement(base, "facet")
    enriched = sym.NodalEnrichedElement([facet, inner])
    assert enriched.space_dimension() == base.space_dimension()

    def one(ps):
        return np.ones(ps.points.shape[:-1])

    dofs = np.asarray(enriched.dual_evaluation(one))
    # interpolating the constant 1 in a P3 nodal basis gives all-ones
    assert dofs.shape == (10,)
    assert np.allclose(dofs, 1.0, atol=1e-11)


def test_description_hashes():
    """Stable, discriminating hashes on element descriptions
    (md5-of-repr, so stable across processes too)."""
    cg1 = ufl_desc.FiniteElement("Lagrange", "triangle", 1)
    cg2 = ufl_desc.FiniteElement("Lagrange", "triangle", 1)
    dg = ufl_desc.FiniteElement("DG", "triangle", 2)
    dg_gll = ufl_desc.FiniteElement("DG", "triangle", 2, variant="gll")
    assert hash(cg1) == hash(cg2) and cg1 == cg2
    assert hash(cg1) != hash(dg)
    assert hash(dg) != hash(dg_gll)
    v1 = ufl_desc.VectorElement("CG", "triangle", 1)
    v2 = ufl_desc.VectorElement("CG", "triangle", 1, dim=3)
    assert hash(v1) != hash(v2)


@pytest.mark.parametrize("domain,expected", [
    ("vertex", 3), ("facet", 9), ("interior", 1)])
def test_restriction_domains(domain, expected):
    T = cl.ufc_simplex(2)
    el = sym.RestrictedElement(sym.Lagrange(T, 3), domain)
    assert el.space_dimension() == expected


def test_restriction_tabulation_subset():
    """Restricted tabulation rows equal the corresponding rows of the
    unrestricted element."""
    from fiat_tpu.symbolic.point_set import PointSet
    T = cl.ufc_simplex(2)
    full = sym.Lagrange(T, 3)
    restr = sym.RestrictedElement(full, "facet")
    rng = np.random.default_rng(0)
    pts = rng.random((5, 2)) / 2
    ps = PointSet(pts)
    t_full = np.asarray(full.basis_evaluation(0, ps)[(0, 0)])
    t_restr = np.asarray(restr.basis_evaluation(0, ps)[(0, 0)])
    idx = [i for d in (0, 1)
           for ent in sorted(full.entity_dofs()[d])
           for i in full.entity_dofs()[d][ent]]
    assert np.allclose(t_restr, t_full[idx], atol=1e-12)


@pytest.mark.parametrize("dim", [2, 3])
def test_facet_support_dofs(dim):
    """entity_support_dofs on facets match the numeric-layer answer
    (reference: test_facet_support_dofs.py)."""
    from fiat_tpu.core.finite_element import entity_support_dofs
    T = cl.ufc_simplex(dim)
    for el in (sym.Lagrange(T, 2), sym.RaviartThomas(T, 1)):
        esd = el.entity_support_dofs()[dim - 1]
        ref = entity_support_dofs(el.fiat_equivalent, dim - 1)
        assert esd == ref


def test_hdiv_trace_support():
    """HDivTrace: every dof is supported on exactly one facet."""
    T = cl.ufc_simplex(2)
    el = sym.HDivTrace(T, 2)
    ed = el.entity_dofs()
    facet_dofs = [ed[1][f] for f in sorted(ed[1])]
    all_dofs = sorted(d for fd in facet_dofs for d in fd)
    assert all_dofs == list(range(el.space_dimension()))
