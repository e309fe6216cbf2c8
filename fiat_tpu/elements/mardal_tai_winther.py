"""Mardal-Tai-Winther element (parity with
/root/reference/FIAT/mardal_tai_winther.py): BDM(order) + curl of bubble
vector fields, with facet normal/tangential moments."""

import numpy as np

from ..core import expansions, finite_element, polyset
from ..core.dualset import DualSet
from ..core.functionals import FrobeniusIntegralMoment
from ..core.quadrature import FacetQuadratureRule
from ..core.quadrature_schemes import create_quadrature
from ..core.variants import parse_quadrature_scheme
from .nedelec import Nedelec


def curl(tabulation):
    """Curl (skew gradient) of a vector field, or rot of a scalar in 2D,
    from a first-order tabulation dict."""
    grad_u = {alpha.index(1): tabulation[alpha]
              for alpha in tabulation if sum(alpha) == 1}
    shp = grad_u[0].shape[1:-1]
    if shp == ():
        curl_u = [grad_u[1], -grad_u[0]]
    else:
        d = len(grad_u)
        indices = ((i, j) for i in reversed(range(d))
                   for j in reversed(range(i + 1, d)))
        curl_u = [((-1) ** k) * (grad_u[j][:, i, :] - grad_u[i][:, j, :])
                  for k, (i, j) in enumerate(indices)]
    return np.transpose(curl_u, (1, 0, 2))


def MardalTaiWintherSpace(ref_el, order=1):
    """BDM(order) + curl(B [P1]^d), projected onto degree sd+1."""
    sd = ref_el.get_spatial_dimension()
    k = sd + 1
    assert order < k
    Pk = polyset.ONPolynomialSet(ref_el, k, shape=(sd,), scale="orthonormal")

    dimP1 = expansions.polynomial_dimension(ref_el, order)
    dimPk = expansions.polynomial_dimension(ref_el, k)
    ids = [i + dimPk * j for i in range(dimP1) for j in range(sd)]
    BDM = Pk.take(ids)

    shape = () if sd == 2 else ((sd * (sd - 1)) // 2,)
    BP1 = polyset.make_bubbles(ref_el, k + 1, shape=shape)

    Q = create_quadrature(ref_el, 2 * k)
    qpts, qwts = Q.get_points(), Q.get_weights()
    Pk_at_qpts = Pk.tabulate(qpts)
    BP1_at_qpts = BP1.tabulate(qpts, 1)

    def inner(u, v):
        return np.tensordot(u, v * qwts, axes=(range(1, u.ndim),) * 2)

    C = inner(curl(BP1_at_qpts), Pk_at_qpts[(0,) * sd])
    coeffs = np.tensordot(C, Pk.get_coeffs(), axes=(1, 0))
    curlBP1 = polyset.PolynomialSet(ref_el, k, k, Pk.get_expansion_set(), coeffs)
    return polyset.polynomial_set_union_normalized(BDM, curlBP1)


class MardalTaiWintherDual(DualSet):
    """Facet: u.n against P_order and u x n against lowest-order RT;
    interior (order > 1): moments against Nedelec(order-1)."""

    def __init__(self, ref_el, order, quad_scheme):
        sd = ref_el.get_spatial_dimension()
        top = ref_el.get_topology()
        entity_ids = {dim: {e: [] for e in top[dim]} for dim in top}
        nodes = []
        degree = sd + 1

        ref_facet = ref_el.get_facet_element()
        Q = parse_quadrature_scheme(ref_facet, degree + order, quad_scheme)
        P1 = polyset.ONPolynomialSet(ref_facet, order)
        P1_at_qpts = P1.tabulate(Q.get_points())[(0,) * (sd - 1)]
        if sd == 2:
            RT_at_qpts = P1_at_qpts[:1, None, :]
        else:
            RT_at_qpts = np.zeros((3, sd - 1, P1_at_qpts.shape[-1]))
            RT_at_qpts[0, 0, :] = P1_at_qpts[0, None, :]
            RT_at_qpts[1, 1, :] = P1_at_qpts[0, None, :]
            RT_at_qpts[2, 0, :] = P1_at_qpts[1, None, :]
            RT_at_qpts[2, 1, :] = P1_at_qpts[2, None, :]

        for f in sorted(top[sd - 1]):
            cur = len(nodes)
            n = ref_el.compute_scaled_normal(f)
            Qf = FacetQuadratureRule(ref_el, sd - 1, f, Q, avg=True)
            nodes.extend(FrobeniusIntegralMoment(ref_el, Qf, np.outer(n, phi))
                         for phi in P1_at_qpts)
            Jf = Qf.jacobian()
            phis = np.tensordot(Jf, RT_at_qpts.transpose(1, 0, 2),
                                (1, 0)).transpose(1, 0, 2)
            if sd == 3:
                phis = np.cross(n[None, :, None], phis, axis=1)
            nodes.extend(FrobeniusIntegralMoment(ref_el, Qf, phi) for phi in phis)
            entity_ids[sd - 1][f].extend(range(cur, len(nodes)))

        if order > 1:
            Q = parse_quadrature_scheme(ref_el, degree + order - 1, quad_scheme)
            Ned = Nedelec(ref_el, order - 1)
            phis = Ned.tabulate(0, Q.get_points())[(0,) * sd]
            cur = len(nodes)
            nodes.extend(FrobeniusIntegralMoment(ref_el, Q, phi) for phi in phis)
            entity_ids[sd][0] = list(range(cur, len(nodes)))

        super().__init__(nodes, ref_el, entity_ids)


class MardalTaiWinther(finite_element.CiarletElement):
    """The Mardal-Tai-Winther Stokes/Darcy element."""

    def __init__(self, ref_el, order=1, quad_scheme=None):
        sd = ref_el.get_spatial_dimension()
        if sd not in (2, 3):
            raise ValueError("MTW only defined in dimension 2 and 3.")
        if not ref_el.is_simplex():
            raise ValueError("MTW only defined on simplices.")
        if order >= sd:
            raise ValueError("MTW only defined for 1 <= order < dim.")
        dual = MardalTaiWintherDual(ref_el, order, quad_scheme)
        poly_set = MardalTaiWintherSpace(ref_el, order)
        super().__init__(poly_set, dual, order, sd - 1,
                         mapping="contravariant piola")
