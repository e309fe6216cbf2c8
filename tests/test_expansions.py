"""Expansion-set parity and property tests (reference strategy: regression
tabulations + orthonormality; here checked live against the reference)."""

import numpy as np
import pytest

from fiat_tpu.core import cells as cl
from fiat_tpu.core import expansions as exp
from fiat_tpu.core.quadrature_schemes import create_quadrature


def _interior_points(rng, dim, n=20):
    pts = rng.random((n, dim))
    return pts / (pts.sum(axis=1)[:, None] + 0.5)


@pytest.mark.parametrize("dim", [1, 2, 3])
@pytest.mark.parametrize("variant", [None, "bubble", "dual"])
@pytest.mark.parametrize("degree", [1, 2, 4, 7])
def test_expansion_parity(dim, variant, degree):
    from FIAT import expansions as rexp
    from FIAT import reference_element as rref
    rng = np.random.default_rng(42)
    pts = _interior_points(rng, dim)
    R = rexp.ExpansionSet(rref.ufc_simplex(dim), variant=variant)
    M = exp.ExpansionSet(cl.ufc_simplex(dim), variant=variant)
    rt = R._tabulate(degree, pts, order=2)
    mt = M._tabulate(degree, pts, order=2)
    assert set(rt) == set(mt)
    for alpha in rt:
        scale = max(1.0, abs(rt[alpha]).max())
        assert abs(np.asarray(mt[alpha]) - rt[alpha]).max() / scale < 1e-13


@pytest.mark.parametrize("dim", [1, 2])
def test_high_order_derivatives(dim):
    """Jet-based derivatives beyond order 2 match the reference's
    dmats-chain fallback."""
    from FIAT import expansions as rexp
    from FIAT import reference_element as rref
    rng = np.random.default_rng(3)
    pts = _interior_points(rng, dim, n=6)
    R = rexp.ExpansionSet(rref.ufc_simplex(dim))
    M = exp.ExpansionSet(cl.ufc_simplex(dim))
    rt = R._tabulate(4, pts, order=4)
    mt = M._tabulate(4, pts, order=4)
    for alpha in rt:
        scale = max(1.0, abs(rt[alpha]).max())
        assert abs(np.asarray(mt[alpha]) - rt[alpha]).max() / scale < 1e-12


@pytest.mark.parametrize("dim", [1, 2, 3])
@pytest.mark.parametrize("degree", [2, 5])
def test_orthonormality(dim, degree):
    """Expansion members are orthonormal against the default-cell measure."""
    T = cl.default_simplex(dim)
    M = exp.ExpansionSet(T)
    Q = create_quadrature(T, 2 * degree)
    phi = M.tabulate(degree, Q.get_points())
    G = np.einsum("ip,jp,p->ij", phi, phi, Q.get_weights())
    assert abs(G - np.eye(len(G))).max() < 1e-12


def test_dmats_parity():
    from FIAT import expansions as rexp
    from FIAT import reference_element as rref
    for dim in (1, 2, 3):
        R = rexp.ExpansionSet(rref.ufc_simplex(dim))
        M = exp.ExpansionSet(cl.ufc_simplex(dim))
        assert np.allclose(np.asarray(M.get_dmats(3)), np.asarray(R.get_dmats(3)),
                           atol=1e-12)


def test_jit_tabulation_matches_host():
    """The same tabulation path traces under jax.jit."""
    import jax
    import jax.numpy as jnp
    T = cl.ufc_simplex(2)
    M = exp.ExpansionSet(T)
    rng = np.random.default_rng(7)
    pts = _interior_points(rng, 2, n=32)

    @jax.jit
    def tab(p):
        return M._tabulate_on_cell(4, p, order=1)[(1, 0)]

    host = M._tabulate_on_cell(4, pts, order=1)[(1, 0)]
    dev = tab(jnp.asarray(pts))
    assert np.allclose(host, np.asarray(dev), atol=1e-12)
