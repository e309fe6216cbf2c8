"""1D Histopolation element (parity with
/root/reference/FIAT/histopolation.py): discontinuous element whose DoFs are
integral moments against window functions matching subinterval averages on
the GLL subgrid."""

import numpy as np

from ..core import cells as cl
from ..core import finite_element, functionals, quadrature
from ..core.barycentric import LagrangePolynomialSet, get_lagrange_points
from ..core.dualset import DualSet
from ..core.orientation import make_entity_permutations_simplex
from .spectral import GaussLobattoLegendre


class HistopolationDualSet(DualSet):
    """Moments against window functions w_j with
    int w_j v = (1/h_j) int_{[x_j, x_{j+1}]} v for v in P_k."""

    def __init__(self, ref_el, degree):
        entity_ids = {0: {0: [], 1: []},
                      1: {0: list(range(degree + 1))}}

        fe = GaussLobattoLegendre(ref_el, degree + 1)
        points = get_lagrange_points(fe.dual_basis())
        h = np.diff(np.reshape(points, (-1,)))
        B = np.diag(1.0 / h[:-1], k=-1)
        np.fill_diagonal(B, -1.0 / h)

        rule = quadrature.GaussLegendreQuadratureLineRule(ref_el, degree + 1)
        self.rule = rule

        phi = fe.tabulate(1, rule.get_points())
        wts = rule.get_weights()
        D = phi[(1,)][:-1]
        A = np.dot(D * wts, D.T)
        C = np.linalg.solve(A, B)
        F = np.dot(C.T, D)
        nodes = [functionals.IntegralMoment(ref_el, rule, f) for f in F]

        entity_permutations = {
            0: {0: {0: []}, 1: {0: []}},
            1: {0: make_entity_permutations_simplex(1, degree + 1)}}
        super().__init__(nodes, ref_el, entity_ids, entity_permutations)


class Histopolation(finite_element.CiarletElement):
    """1D discontinuous element with subinterval-average DoFs."""

    def __init__(self, ref_el, degree):
        if ref_el.shape != cl.LINE:
            raise ValueError("Histopolation elements are only defined in 1D.")
        dual = HistopolationDualSet(ref_el, degree)
        poly_set = LagrangePolynomialSet(ref_el, dual.rule.pts)
        formdegree = ref_el.get_spatial_dimension()
        super().__init__(poly_set, dual, degree, formdegree)
