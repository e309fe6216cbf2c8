"""Walkington C1 macroelement on the tetrahedron (parity with
/root/reference/FIAT/walkington.py): quintic C1 on the Alfeld split with
vertex 2-jets, face normal-derivative averages, barycentre value, and
trailing constraint functionals used by the transformation theory."""

import numpy as np

from ..core import cells as cl
from ..core import finite_element, polyset
from ..core.dualset import DualSet
from ..core.expansions import mis, polynomial_dimension
from ..core.functionals import (IntegralMomentOfDerivative, PointDerivative,
                                PointEvaluation)
from ..core.jacobi import eval_jacobi
from ..core.macro import AlfeldSplit, CkPolynomialSet
from ..core.quadrature import FacetQuadratureRule, QuadratureRule
from ..core.quadrature_schemes import create_quadrature


def face_constraint(ref_face):
    """A cubic density supported at a few quadrature points, used to test
    that the normal derivative restricted to a face is cubic."""
    k = 3
    sd = ref_face.get_spatial_dimension()
    Q = create_quadrature(ref_face, 2 * k)
    dimPkm1 = polynomial_dimension(ref_face, k - 1)

    pts = list(Q.get_points()[:3])
    pts.append(Q.get_points()[-1])
    P = polyset.ONPolynomialSet(ref_face, k)
    Pk = P.tabulate(pts)[(0,) * sd][dimPkm1:]
    c = np.linalg.solve(Pk.T, [0, 0, 0, 1])
    Pk = P.tabulate(Q.get_points())[(0,) * sd][dimPkm1:]
    phi = np.dot(c, Pk)

    supp = abs(phi) > 1e-12
    Q = QuadratureRule(ref_face, Q.get_points()[supp], Q.get_weights()[supp])
    return Q, phi[supp]


class WalkingtonDualSet(DualSet):
    def __init__(self, ref_el, degree):
        top = ref_el.get_topology()
        sd = ref_el.get_spatial_dimension()
        entity_ids = {dim: {e: [] for e in top[dim]} for dim in top}
        nodes = []

        for v in sorted(top[0]):
            cur = len(nodes)
            x, = ref_el.make_points(0, v, degree)
            nodes.append(PointEvaluation(ref_el, x))
            nodes.extend(PointDerivative(ref_el, x, alpha)
                         for i in (1, 2) for alpha in mis(sd, i))
            entity_ids[0][v].extend(range(cur, len(nodes)))

        ref_face = ref_el.construct_subelement(2)
        Q_face = create_quadrature(ref_face, degree - 1)
        f_at_qpts = np.ones(Q_face.get_weights().shape)
        for face in sorted(top[2]):
            cur = len(nodes)
            Q = FacetQuadratureRule(ref_el, 2, face, Q_face, avg=True)
            n = ref_el.compute_normal(face)
            nodes.append(IntegralMomentOfDerivative(ref_el, Q, f_at_qpts, n))
            entity_ids[2][face].extend(range(cur, len(nodes)))

        for entity in top[sd]:
            cur = len(nodes)
            x, = ref_el.make_points(sd, entity, sd + 1)
            nodes.append(PointEvaluation(ref_el, x))
            entity_ids[sd][entity].extend(range(cur, len(nodes)))

        # Constraint dofs
        edges = ref_el.get_connectivity()[(2, 1)]
        ref_edge = ref_el.construct_subelement(1)
        Q_edge = create_quadrature(ref_edge, 2 * (degree - 1))
        x = ref_edge.compute_barycentric_coordinates(Q_edge.get_points())
        leg4_at_qpts = eval_jacobi(0, 0, 4, x[:, 1] - x[:, 0])
        Q_face, phi = face_constraint(ref_face)

        extra_entity_ids = {dim: {e: [] for e in top[dim]} for dim in top}
        extra_nodes = []
        for face in sorted(top[2]):
            cur = len(nodes)
            thats = ref_el.compute_tangents(sd - 1, face)
            nface = -np.cross(*thats)
            nface /= np.linalg.norm(nface)

            for e in sorted(edges[face]):
                Q = FacetQuadratureRule(ref_el, 1, e, Q_edge, avg=True)
                te = ref_el.compute_edge_tangent(e)
                nfe = np.cross(te, nface)
                nfe /= np.linalg.norm(nfe)
                nodes.append(IntegralMomentOfDerivative(ref_el, Q, leg4_at_qpts, nfe))

            Q = FacetQuadratureRule(ref_el, 2, face, Q_face, avg=True)
            nodes.extend(IntegralMomentOfDerivative(ref_el, Q, phi, nface, t)
                         for t in thats)
            entity_ids[2][face].extend(range(cur, len(nodes)))

            cur = len(extra_nodes)
            extra_nodes.extend(
                IntegralMomentOfDerivative(ref_el, Q, phi, thats[i], thats[j])
                for i in range(2) for j in range(i, 2))
            extra_entity_ids[2][face].extend(range(cur, len(extra_nodes)))

        self.nodal_completion = DualSet(extra_nodes, ref_el, extra_entity_ids)
        super().__init__(nodes, ref_el, entity_ids)


class Walkington(finite_element.CiarletElement):
    """The Walkington C1 quintic macroelement."""

    def __init__(self, ref_el, degree=5):
        if ref_el.get_shape() != cl.TETRAHEDRON:
            raise ValueError("Walkington only defined on tetrahedra")
        if degree != 5:
            raise ValueError("Walkington only defined for degree=5.")
        dual = WalkingtonDualSet(ref_el, degree)
        ref_complex = AlfeldSplit(ref_el)
        poly_set = CkPolynomialSet(ref_complex, degree, order=1, vorder=4,
                                   variant="bubble")
        super().__init__(poly_set, dual, degree)
