"""Bell element (parity with /root/reference/FIAT/bell.py): vertex 2-jets
plus edge moments of the normal derivative against the degree-4 Legendre
polynomial (used as constraint functionals in the transformation theory)."""

from ..core import cells as cl
from ..core import finite_element, functionals, polyset
from ..core.expansions import mis
from ..core.dualset import DualSet
from ..core.jacobi import eval_jacobi
from ..core.quadrature_schemes import create_quadrature


class BellDualSet(DualSet):
    def __init__(self, ref_el, degree):
        top = ref_el.get_topology()
        sd = ref_el.get_spatial_dimension()
        entity_ids = {dim: {e: [] for e in top[dim]} for dim in top}
        nodes = []

        for v in sorted(top[0]):
            cur = len(nodes)
            x, = ref_el.make_points(0, v, degree)
            nodes.append(functionals.PointEvaluation(ref_el, x))
            nodes.extend(functionals.PointDerivative(ref_el, x, alpha)
                         for i in (1, 2) for alpha in mis(sd, i))
            entity_ids[0][v].extend(range(cur, len(nodes)))

        facet = ref_el.construct_subelement(1)
        Q_ref = create_quadrature(facet, 2 * (degree - 1))
        x = facet.compute_barycentric_coordinates(Q_ref.get_points())
        leg4_at_qpts = eval_jacobi(0, 0, 4, x[:, 1] - x[:, 0])

        for e in sorted(top[1]):
            cur = len(nodes)
            nodes.append(functionals.IntegralMomentOfNormalDerivative(
                ref_el, e, Q_ref, leg4_at_qpts))
            entity_ids[1][e].extend(range(cur, len(nodes)))

        super().__init__(nodes, ref_el, entity_ids)


class Bell(finite_element.CiarletElement):
    """The Bell element (degree 5 on triangles)."""

    def __init__(self, ref_el, degree=5):
        if ref_el.get_shape() != cl.TRIANGLE:
            raise ValueError("Bell only defined on triangles")
        if degree != 5:
            raise ValueError("Bell only defined for degree = 5.")
        poly_set = polyset.ONPolynomialSet(ref_el, degree)
        dual = BellDualSet(ref_el, degree)
        super().__init__(poly_set, dual, degree)
