"""Cross-engine sweep: mixed element zoos through BOTH device engines
(XLA BatchedTabulator and the fused Pallas pipeline in interpret mode)
against the host tabulation -- variants, 1D/2D/3D cells, second
derivatives, macro mixes, degree-0 members."""

import numpy as np
import pytest

import jax.numpy as jnp

from fiat_tpu.core.cells import ufc_simplex
from fiat_tpu import elements as fe
from fiat_tpu.ops.tabulate import BatchedTabulator
from fiat_tpu.ops.pallas_multiword import FusedZooTabulator

T1, T2, T3 = ufc_simplex(1), ufc_simplex(2), ufc_simplex(3)
RNG = np.random.default_rng(3)

CASES = {
    "1d_mix": ([lambda: fe.Lagrange(T1, 1),
                lambda: fe.GaussLobattoLegendre(T1, 4),
                lambda: fe.Legendre(T1, 3),
                lambda: fe.CubicHermite(T1)], 1),
    "gll_variant": ([lambda: fe.Lagrange(T2, 3, variant="gll"),
                     lambda: fe.Lagrange(T2, 5)], 1),
    "order2_zany": ([lambda: fe.Argyris(T2, 5), lambda: fe.Bell(T2),
                     lambda: fe.Lagrange(T2, 2)], 2),
    "tet_order2": ([lambda: fe.Lagrange(T3, 3),
                    lambda: fe.Nedelec(T3, 2)], 2),
    "macro_order2": ([lambda: fe.Lagrange(T2, 3),
                      lambda: fe.HsiehCloughTocher(T2, 3),
                      lambda: fe.QuadraticPowellSabin12(T2)], 2),
    "spectral_dg": ([lambda: fe.GaussLegendre(T2, 3),
                     lambda: fe.DiscontinuousLagrange(T2, 2)], 1),
    "degree0": ([lambda: fe.P0(T2),
                 lambda: fe.DiscontinuousLagrange(T2, 0),
                 lambda: fe.Lagrange(T2, 3)], 1),
    "hierarchical": ([lambda: fe.IntegratedLegendre(T2, 4),
                      lambda: fe.Legendre(T2, 3)], 1),
    "bdfm_mtw_tet": ([lambda: fe.BrezziDouglasFortinMarini(T3, 2),
                      lambda: fe.MardalTaiWinther(T3, 2)], 1),
    "regge_hhj": ([lambda: fe.Regge(T2, 2),
                   lambda: fe.HellanHerrmannJohnson(T2, 2)], 1),
    "order3_jets": ([lambda: fe.Lagrange(T2, 4),
                     lambda: fe.CubicHermite(T2)], 3),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_engines_match_host(case):
    makers, order = CASES[case]
    els = [m() for m in makers]
    sd = els[0].get_reference_element().get_spatial_dimension()
    pts = RNG.random((30, sd)) * 0.4
    bt = BatchedTabulator(els, order=order)
    per = bt.unpack({a: np.asarray(v) for a, v in bt(jnp.asarray(pts)).items()})
    for el, tab in zip(els, per):
        host = el.tabulate(order, pts)
        for a in host:
            assert np.allclose(np.asarray(tab[a]).reshape(np.shape(host[a])),
                               host[a], atol=1e-10), (case, type(el).__name__, a)
    fz = FusedZooTabulator(bt, interpret=True, row_block=256, point_tile=128)
    per2 = fz.unpack({a: [np.asarray(x) for x in v]
                      for a, v in fz.block_tables(jnp.asarray(pts)).items()})
    for el, tab in zip(els, per2):
        host = el.tabulate(order, pts)
        for a in host:
            # interpret mode runs without the error-free-transform path
            # (XLA:CPU FMA contraction), hence the looser tolerance
            assert np.allclose(np.asarray(tab[a]).reshape(np.shape(host[a])),
                               host[a], atol=2e-5), (case, type(el).__name__, a)
