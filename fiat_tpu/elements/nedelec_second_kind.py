"""Second-kind Nedelec H(curl) elements (parity with
/root/reference/FIAT/nedelec_second_kind.py): full (P_k)^d with edge
tangent evaluations and facet/cell RT moments."""

import numpy as np

from ..core.dualset import DualSet
from ..core.finite_element import CiarletElement
from ..core.functionals import (FrobeniusIntegralMoment,
                                PointEdgeTangentEvaluation)
from ..core.polyset import ONPolynomialSet
from ..core.quadrature import FacetQuadratureRule
from ..core.variants import check_format_variant, parse_quadrature_scheme
from .raviart_thomas import RaviartThomas


class NedelecSecondKindDual(DualSet):
    """Edges: tangential point values (or RT-style moments for the integral
    variant); faces (3D) and cells: moments against Piola-mapped RT."""

    def __init__(self, cell, degree, variant, interpolant_deg, quad_scheme):
        dofs, ids = self._generate(cell, degree, variant, interpolant_deg,
                                   quad_scheme)
        super().__init__(dofs, cell, ids)

    def _generate(self, cell, degree, variant, interpolant_deg, quad_scheme):
        dofs = []
        ids = {}
        d = cell.get_spatial_dimension()
        if d not in (2, 3):
            raise ValueError("Second-kind Nedelecs only implemented in 2/3D.")
        ids[0] = {i: [] for i in sorted(cell.topology[0])}

        edge_dofs, ids[1] = self._edge_dofs(cell, degree, 0, variant,
                                            interpolant_deg, quad_scheme)
        dofs.extend(edge_dofs)
        if d == 3:
            face_dofs, ids[d - 1] = self._facet_dofs(
                d - 1, cell, degree, len(dofs), variant, interpolant_deg,
                quad_scheme)
            dofs.extend(face_dofs)
        cell_dofs, ids[d] = self._facet_dofs(d, cell, degree, len(dofs),
                                             variant, interpolant_deg,
                                             quad_scheme)
        dofs.extend(cell_dofs)
        return dofs, ids

    def _edge_dofs(self, cell, degree, offset, variant, interpolant_deg,
                   quad_scheme):
        if variant == "integral":
            return self._facet_dofs(1, cell, degree, offset, variant,
                                    interpolant_deg, quad_scheme)
        dofs = []
        ids = {}
        for edge in range(len(cell.get_topology()[1])):
            points = cell.make_points(1, edge, degree + 2)
            dofs.extend(PointEdgeTangentEvaluation(cell, edge, point)
                        for point in points)
            i = len(points) * edge
            ids[edge] = list(range(offset + i, offset + i + len(points)))
        return dofs, ids

    def _facet_dofs(self, dim, cell, degree, offset, variant, interpolant_deg,
                    quad_scheme):
        num_facets = len(cell.get_topology()[dim])
        dofs = []
        ids = {i: [] for i in range(num_facets)}
        rt_degree = degree - dim + 1
        if rt_degree < 1:
            return dofs, ids
        if interpolant_deg is None:
            interpolant_deg = degree

        ref_facet = cell.construct_subelement(dim)
        Q_ref = parse_quadrature_scheme(ref_facet, interpolant_deg + rt_degree,
                                        quad_scheme)
        if dim == 1:
            Phi = ONPolynomialSet(ref_facet, rt_degree, (dim,))
        else:
            Phi = RaviartThomas(ref_facet, rt_degree, variant).get_nodal_basis()

        Phis = Phi.tabulate(Q_ref.get_points())[(0,) * dim]
        Phis = np.transpose(Phis, (0, 2, 1))

        cur = offset
        for facet in range(num_facets):
            Q_facet = FacetQuadratureRule(cell, dim, facet, Q_ref)
            piola_map = Q_facet.jacobian() / Q_facet.jacobian_determinant()
            phis = np.transpose(np.dot(Phis, piola_map.T), (0, 2, 1))
            dofs.extend(FrobeniusIntegralMoment(cell, Q_facet, phi)
                        for phi in phis)
            ids[facet].extend(range(cur, cur + len(phis)))
            cur += len(phis)
        return dofs, ids


class NedelecSecondKind(CiarletElement):
    """Second-kind Nedelec element (covariant Piola)."""

    def __init__(self, ref_el, degree, variant=None, quad_scheme=None):
        splitting, variant, interpolant_deg = check_format_variant(variant, degree)
        if splitting is not None:
            ref_el = splitting(ref_el)
        if degree < 1:
            raise ValueError("Second-kind Nedelecs start at 1!")
        d = ref_el.get_spatial_dimension()
        if ref_el.is_macrocell():
            from ..core.macro import MacroPolynomialSet
            base_element = type(self)(ref_el.get_parent(), degree)
            poly_set = MacroPolynomialSet(ref_el, base_element)
        else:
            poly_set = ONPolynomialSet(ref_el, degree, (d,))
        dual = NedelecSecondKindDual(ref_el, degree, variant, interpolant_deg,
                                     quad_scheme)
        super().__init__(poly_set, dual, degree, 1, mapping="covariant piola")
