"""Spectral point-variant elements (parity with
/root/reference/FIAT/gauss_lobatto_legendre.py, gauss_legendre.py,
gauss_radau.py): (D)Lagrange at GLL/GL/Radau nodes."""

from ..core import cells as cl
from ..core import finite_element, functionals, polyset
from ..core.dualset import DualSet
from ..core.quadrature import RadauQuadratureLineRule
from .discontinuous_lagrange import DiscontinuousLagrange
from .lagrange import Lagrange


class GaussLobattoLegendre(Lagrange):
    """Continuous element at recursive Gauss-Lobatto-Legendre points."""

    def __init__(self, ref_el, degree):
        super().__init__(ref_el, degree, variant="gll", sort_entities=True)


class GaussLegendre(DiscontinuousLagrange):
    """Discontinuous element at recursive Gauss-Legendre points."""

    def __init__(self, ref_el, degree):
        super().__init__(ref_el, degree, variant="gl")


class GaussRadauDualSet(DualSet):
    """Point evaluations at the Gauss-Radau points (DG connectivity)."""

    def __init__(self, ref_el, degree, right=True):
        entity_ids = {0: {0: [], 1: []},
                      1: {0: list(range(degree + 1))}}
        rule = RadauQuadratureLineRule(ref_el, degree + 1, right)
        nodes = [functionals.PointEvaluation(ref_el, x) for x in rule.pts]
        super().__init__(nodes, ref_el, entity_ids)


class GaussRadau(finite_element.CiarletElement):
    """1D discontinuous element at Gauss-Radau points."""

    def __init__(self, ref_el, degree):
        if ref_el.shape != cl.LINE:
            raise ValueError("Gauss-Radau elements are only defined in 1D.")
        poly_set = polyset.ONPolynomialSet(ref_el, degree)
        dual = GaussRadauDualSet(ref_el, degree)
        formdegree = ref_el.get_spatial_dimension()
        super().__init__(poly_set, dual, degree, formdegree)
