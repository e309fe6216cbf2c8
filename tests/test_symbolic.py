"""Tests for the symbolic element layer: array tabulations (static and
traced), dual evaluation, tensor products, wrappers, spectral deltas
(reference strategy: test/finat/*)."""

import numpy as np
import pytest

from fiat_tpu.core import cells as cl
from fiat_tpu import symbolic as sym
from fiat_tpu.symbolic.point_set import PointSet, UnknownPointSet
from fiat_tpu.symbolic.quadrature import make_quadrature


def test_fiat_bridge_matches_numeric():
    T = cl.ufc_simplex(2)
    el = sym.Lagrange(T, 3)
    rng = np.random.default_rng(0)
    pts = rng.random((7, 2)) / 2
    ps = PointSet(pts)
    tables = el.basis_evaluation(1, ps)
    ref = el.fiat_equivalent.tabulate(1, pts)
    for alpha in ref:
        assert np.allclose(tables[alpha], ref[alpha], atol=1e-12)


def test_traced_tabulation_under_jit():
    import jax
    import jax.numpy as jnp
    T = cl.ufc_simplex(2)
    el = sym.Lagrange(T, 4)
    rng = np.random.default_rng(1)
    pts = rng.random((32, 2)) / 2

    @jax.jit
    def tab(p):
        ps = UnknownPointSet(p)
        return el.basis_evaluation(1, ps)[(1, 0)]

    host = el.fiat_equivalent.tabulate(1, pts)[(1, 0)]
    assert np.allclose(np.asarray(tab(jnp.asarray(pts))), host, atol=1e-12)


def test_dual_evaluation_interpolation():
    """dual_evaluation(f) of a polynomial in the space returns its DoFs:
    tabulating with those DoFs reproduces the function."""
    T = cl.ufc_simplex(2)
    el = sym.Lagrange(T, 3)

    def f(ps):
        x = ps.points
        return x[:, 0] ** 3 - 2.0 * x[:, 0] * x[:, 1] + 1.0

    dofs = el.dual_evaluation(f)
    rng = np.random.default_rng(3)
    pts = rng.random((6, 2)) / 2
    vals = el.basis_evaluation(0, PointSet(pts))[(0, 0)]
    recon = dofs @ vals
    expect = pts[:, 0] ** 3 - 2.0 * pts[:, 0] * pts[:, 1] + 1.0
    assert np.allclose(recon, expect, atol=1e-11)


def test_spectral_delta():
    T = cl.ufc_simplex(1)
    el = sym.GaussLobattoLegendre(T, 4)
    Q = make_quadrature(T, 7)  # GL points: no delta
    tab = el.basis_evaluation(0, Q.point_set)[(0,)]
    assert tab.shape == (5, 4)
    # GLL x GLL: delta fires
    from fiat_tpu.symbolic.point_set import GaussLobattoLegendrePointSet
    from fiat_tpu.core.quadrature import GaussLobattoLegendreQuadratureLineRule
    rule = GaussLobattoLegendreQuadratureLineRule(T, 5)
    ps = GaussLobattoLegendrePointSet(rule.get_points())
    tab = el.basis_evaluation(0, ps)[(0,)]
    assert np.array_equal(tab, np.eye(5))


def test_tensor_product_element():
    I = cl.ufc_simplex(1)
    A = sym.Lagrange(I, 2)
    B = sym.DiscontinuousLagrange(I, 1)
    tp = sym.TensorProductElement([A, B])
    assert tp.space_dimension() == 6
    fiat_tp = tp.fiat_equivalent
    rng = np.random.default_rng(5)
    pts = rng.random((5, 2))
    ps = PointSet(pts)
    tables = tp.basis_evaluation(1, ps)
    ref = fiat_tp.tabulate(1, pts)
    for alpha in ref:
        mine = np.asarray(tables[alpha]).reshape(ref[alpha].shape)
        assert np.allclose(mine, ref[alpha], atol=1e-12), alpha


def test_tensor_product_factored_points():
    """TensorPointSet evaluation keeps per-factor point axes."""
    I = cl.ufc_simplex(1)
    A = sym.GaussLobattoLegendre(I, 2)
    tp = sym.TensorProductElement([A, A])
    q = make_quadrature(tp.cell, (3, 3))
    tables = tp.basis_evaluation(0, q.point_set)
    tab = tables[(0, 0)]
    assert tab.shape == (3, 3, 2, 2)  # (nbf1, nbf2, npts1, npts2)
    # against flattened evaluation
    flat_ps = PointSet(q.point_set.points)
    flat = tp.basis_evaluation(0, flat_ps)[(0, 0)]
    assert np.allclose(tab.reshape(3, 3, 4), flat, atol=1e-12)


def test_flattened_dimensions_quad():
    I = cl.ufc_simplex(1)
    A = sym.GaussLobattoLegendre(I, 2)
    el = sym.FlattenedDimensions(sym.TensorProductElement([A, A]))
    assert el.cell.get_shape() == cl.QUADRILATERAL
    fiat_el = el.fiat_equivalent
    assert el.entity_dofs() == fiat_el.entity_dofs()
    rng = np.random.default_rng(6)
    pts = rng.random((4, 2))
    tables = el.basis_evaluation(1, PointSet(pts))
    ref = fiat_el.tabulate(1, pts)
    for alpha in ref:
        mine = np.asarray(tables[alpha]).reshape(ref[alpha].shape)
        assert np.allclose(mine, ref[alpha], atol=1e-12)


def test_tensor_finite_element():
    T = cl.ufc_simplex(2)
    base = sym.Lagrange(T, 2)
    vec = sym.TensorFiniteElement(base, (2,))
    assert vec.index_shape == (6, 2)
    assert vec.value_shape == (2, )
    rng = np.random.default_rng(7)
    pts = rng.random((5, 2)) / 2
    tab = vec.basis_evaluation(0, PointSet(pts))[(0, 0)]
    assert tab.shape == (6, 2, 2, 5)
    base_tab = base.basis_evaluation(0, PointSet(pts))[(0, 0)]
    for i in range(6):
        for a in range(2):
            for g in range(2):
                expect = base_tab[i] if a == g else 0.0
                assert np.allclose(tab[i, a, g], expect)


def test_hdiv_wrapper():
    I = cl.ufc_simplex(1)
    A = sym.Lagrange(I, 2)
    B = sym.DiscontinuousLagrange(I, 1)
    tp = sym.TensorProductElement([A, B])
    hdiv = sym.HDivElement(tp)
    assert hdiv.mapping == "contravariant piola"
    fiat_el = hdiv.fiat_equivalent
    rng = np.random.default_rng(8)
    pts = rng.random((5, 2))
    tables = hdiv.basis_evaluation(0, PointSet(pts))
    ref = fiat_el.tabulate(0, pts)
    for alpha in ref:
        mine = np.asarray(tables[alpha]).reshape(ref[alpha].shape)
        assert np.allclose(mine, ref[alpha], atol=1e-12)


def test_enriched_and_mixed():
    T = cl.ufc_simplex(2)
    lag = sym.Lagrange(T, 1)
    bub = sym.Bubble(T, 3)
    mini = sym.EnrichedElement([lag, bub])
    assert mini.space_dimension() == 4
    rng = np.random.default_rng(9)
    pts = rng.random((5, 2)) / 2
    tab = mini.basis_evaluation(0, PointSet(pts))[(0, 0)]
    ref = mini.fiat_equivalent.tabulate(0, pts)[(0, 0)]
    assert np.allclose(tab, ref, atol=1e-12)

    mixed = sym.MixedElement([sym.Lagrange(T, 1), sym.RaviartThomas(T, 1)])
    assert mixed.value_shape == (3,)
    tab = mixed.basis_evaluation(0, PointSet(pts))[(0, 0)]
    ref = mixed.fiat_equivalent.tabulate(0, pts)[(0, 0)]
    assert np.allclose(tab.reshape(ref.shape), ref, atol=1e-12)


def test_entity_support_dofs_symbolic():
    from fiat_tpu.core.finite_element import entity_support_dofs as numeric_esd
    T = cl.ufc_simplex(2)
    el = sym.Lagrange(T, 3)
    assert el.entity_support_dofs()[1] == numeric_esd(el.fiat_equivalent, 1)


def test_restricted_symbolic():
    T = cl.ufc_simplex(2)
    el = sym.RestrictedElement(sym.Lagrange(T, 3), "facet")
    assert el.space_dimension() == 9


def test_quadrature_element_symbolic():
    T = cl.ufc_simplex(2)
    el = sym.make_quadrature_element(T, 3)
    ps = el._point_set
    n = el.space_dimension()
    tab = el.basis_evaluation(0, ps)[(0, 0)]
    assert np.array_equal(np.asarray(tab), np.eye(n))


def test_runtime_tabulated():
    import jax.numpy as jnp
    I = cl.ufc_simplex(1)
    tables = {}

    def provider(name, shape):
        return tables.setdefault(name, jnp.zeros(shape) + 0.5)

    el = sym.RuntimeTabulated(I, 2, variant="mgd", table_provider=provider)
    ps = PointSet(np.array([[0.3], [0.7]]))
    tab = el.basis_evaluation(0, ps)[(0,)]
    assert tab.shape == (3, 2)
    assert "rt_mgd_2_0_0_c_" in tables


def test_traced_macro_tabulation_under_jit():
    """Macro elements (Alfeld-split HCT) tabulate with traced points via
    shape-static partition-of-unity masks."""
    import jax
    import jax.numpy as jnp
    from fiat_tpu import elements as fe
    from fiat_tpu.symbolic.fiat_bridge import FiatElement
    T = cl.ufc_simplex(2)
    el = FiatElement(fe.HsiehCloughTocher(T, 3))
    rng = np.random.default_rng(2)
    pts = rng.random((16, 2)) / 2

    @jax.jit
    def tab(p):
        return el.basis_evaluation(1, UnknownPointSet(p))[(0, 1)]

    host = el.fiat_equivalent.tabulate(1, pts)[(0, 1)]
    assert np.allclose(np.asarray(tab(jnp.asarray(pts))), host, atol=1e-11)


def test_point_evaluation():
    """point_evaluation at a single (static or traced) coordinate
    (reference strategy: test/finat/test_point_evaluation.py)."""
    import jax
    import jax.numpy as jnp
    T = cl.ufc_simplex(2)
    el = sym.Lagrange(T, 3)
    x = np.array([0.31, 0.27])
    tables = el.point_evaluation(1, x)
    host = el.fiat_equivalent.tabulate(1, x[None, :])
    for alpha in host:
        mine = np.asarray(tables[alpha]).reshape(host[alpha].shape)
        assert np.allclose(mine, host[alpha], atol=1e-12)

    @jax.jit
    def peval(p):
        return el.point_evaluation(0, p)[(0, 0)]

    traced = np.asarray(peval(jnp.asarray(x)))
    assert np.allclose(traced.ravel(), host[(0, 0)].ravel(), atol=1e-12)


def test_spectral_mass_conditioning():
    """GLL mass matrices at matching quadrature are diagonal (the
    spectral delta shortcut; reference: test_mass_conditioning.py)."""
    from fiat_tpu.core.quadrature import GaussLobattoLegendreQuadratureLineRule
    from fiat_tpu.symbolic.point_set import GaussLobattoLegendrePointSet
    I = cl.ufc_simplex(1)
    for degree in (3, 5):
        el = sym.GaussLobattoLegendre(I, degree)
        rule = GaussLobattoLegendreQuadratureLineRule(I, degree + 1)
        ps = GaussLobattoLegendrePointSet(rule.get_points())
        phi = np.asarray(el.basis_evaluation(0, ps)[(0,)])
        w = np.asarray(rule.get_weights())
        M = phi @ np.diag(w) @ phi.T
        off = M - np.diag(np.diag(M))
        assert np.abs(off).max() < 1e-14
        assert np.linalg.cond(M) < 10 ** degree


def test_gll_hex_sum_factorised():
    """BASELINE config 2: order-8 GLL spectral on hex via
    tensor-product sum-factorised tabulation -- per-factor point axes
    stay factored, and at matching GLL nodes every factor table is the
    identity (diagonal mass for free)."""
    from fiat_tpu.core.quadrature import (
        GaussLobattoLegendreQuadratureLineRule)
    from fiat_tpu.symbolic.point_set import (
        GaussLobattoLegendrePointSet, TensorPointSet)
    I = cl.ufc_simplex(1)
    A = sym.GaussLobattoLegendre(I, 8)
    tp = sym.TensorProductElement([A, A, A])
    # factored quadrature: points_shape stays (5, 5, 5)
    q = make_quadrature(tp.cell, (9, 9, 9))
    tab = np.asarray(tp.basis_evaluation(0, q.point_set)[(0, 0, 0)])
    assert tab.shape == (9, 9, 9, 5, 5, 5)
    # delta shortcut at matching GLL nodes
    rule = GaussLobattoLegendreQuadratureLineRule(I, 9)
    ps1 = GaussLobattoLegendrePointSet(rule.get_points())
    tab2 = np.asarray(tp.basis_evaluation(
        0, TensorPointSet([ps1, ps1, ps1]))[(0, 0, 0)])
    assert np.allclose(tab2.reshape(9 ** 3, 9 ** 3), np.eye(9 ** 3))


def test_order8_lagrange_tet():
    """BASELINE config 2 (other half): order-8 Lagrange on tet
    tabulates on device to reference accuracy."""
    import jax.numpy as jnp
    from fiat_tpu import elements as fe
    from fiat_tpu.ops.tabulate import ElementTabulator
    T = cl.ufc_simplex(3)
    el = fe.Lagrange(T, 8)
    tab = ElementTabulator(el, order=1)
    rng = np.random.default_rng(4)
    pts = rng.random((60, 3)) / 3
    dev = tab(jnp.asarray(pts))
    host = el.tabulate(1, pts)
    for alpha in host:
        err = np.abs(np.asarray(dev[alpha]) - host[alpha]).max()
        assert err < 1e-10, (alpha, err)


def test_unconcatenate_mixed_roundtrip():
    """gem/unconcatenate.py analogue: a MixedElement evaluation splits
    back into the per-subelement evaluations exactly."""
    from fiat_tpu.symbolic.mixed import MixedElement, split_mixed_evaluation
    from fiat_tpu import ir
    tri = cl.ufc_simplex(2)
    a = sym.Lagrange(tri, 2)
    b = sym.RaviartThomas(tri, 1)
    m = MixedElement([a, b])
    ps = PointSet(np.random.default_rng(0).random((5, 2)) / 2)
    tab = {k: np.asarray(v) for k, v in m.basis_evaluation(0, ps).items()}
    parts = split_mixed_evaluation(m, tab)
    for el, part in zip((a, b), parts):
        exact = el.basis_evaluation(0, ps)
        for k, v in exact.items():
            v = np.asarray(v)
            assert part[k].shape == v.shape and np.allclose(part[k], v), k
    fused = np.arange(24.0).reshape(6, 4)
    out = ir.unconcatenate([(("M", [(0, 2), (2, 6, (2, 2))]), fused)])
    assert out[0][0] == ("M", 0) and out[0][1].shape == (2, 4)
    assert out[1][1].shape == (2, 2, 4)
