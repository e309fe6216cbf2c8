"""HDivTrace: the facet-only DG trace element (parity with
/root/reference/FIAT/hdiv_trace.py).  Tabulation is only defined on facets;
cell-interior or derivative tabulation yields ``TraceError`` markers (or
NaN tables when facet identification fails)."""

from collections import defaultdict

import numpy as np

from ..core import cells as cl
from ..core.barycentric import get_lagrange_points
from ..core.dualset import DualSet
from ..core.expansions import mis
from ..core.finite_element import FiniteElement
from ..core.functionals import IntegralMoment, PointEvaluation
from ..core.quadrature import FacetQuadratureRule
from .discontinuous_lagrange import DiscontinuousLagrange
from .hierarchical import Legendre
from .tensor_product import TensorProductElement

epsilon = 1e-10


class TraceError(Exception):
    """Raised/embedded when tabulating a trace element where it is not
    mathematically defined (cell interiors, derivatives)."""

    def __init__(self, msg):
        super().__init__(msg)
        self.msg = msg


class HDivTrace(FiniteElement):
    """The trace of an H(div) element: a DG field on the facets."""

    def __init__(self, ref_el, degree, variant=None):
        sd = ref_el.get_spatial_dimension()
        if sd == 0:
            raise ValueError("Cannot take the trace of a 0-dim cell.")

        if ref_el.get_shape() == cl.TENSORPRODUCT:
            try:
                degree = tuple(degree)
            except TypeError:
                degree = (degree,) * len(ref_el.cells)
            assert len(ref_el.cells) == len(degree)
        else:
            if ref_el.get_shape() not in [cl.LINE, cl.TRIANGLE, cl.TETRAHEDRON,
                                          cl.QUADRILATERAL]:
                raise NotImplementedError(
                    f"Trace element on a {type(ref_el)} not implemented")
            if isinstance(degree, tuple):
                raise ValueError(
                    "Need a tensor product cell for multiple degrees")

        facet_sd = sd - 1
        topology = ref_el.get_topology()
        entity_dofs = {dim: {e: [] for e in topology[dim]} for dim in topology}

        dg_elements = {}
        for dim in topology:
            fdim = sum(dim) if isinstance(dim, tuple) else dim
            if fdim == facet_sd:
                cell = ref_el.construct_subelement(dim)
                dg_elements[dim] = construct_dg_element(cell, degree, variant)

        nodes = []
        for facet_dim in sorted(dg_elements):
            element = dg_elements[facet_dim]
            facet_nodes = element.dual_basis()
            for i in sorted(topology[facet_dim]):
                cur = len(nodes)
                nodes.extend(transform_nodes(facet_nodes, ref_el, facet_dim, i))
                entity_dofs[facet_dim][i] = list(range(cur, len(nodes)))

        dual = DualSet(nodes, ref_el, entity_dofs)
        deg = max(e.degree() for e in dg_elements.values())
        super().__init__(ref_el, dual, order=deg, formdegree=facet_sd,
                         mapping="affine")
        self.dg_elements = dg_elements
        self.polydegree = deg

    def degree(self):
        return self.polydegree

    def get_nodal_basis(self):
        raise NotImplementedError("get_nodal_basis not implemented for traces.")

    def get_coeffs(self):
        raise NotImplementedError("get_coeffs not implemented for traces.")

    def tabulate(self, order, points, entity=None):
        """Tabulate on a facet (by entity id, or by geometric binning when
        ``entity`` is None); non-facet requests yield TraceError/NaN."""
        sd = self.ref_el.get_spatial_dimension()
        facet_sd = sd - 1
        evalkey = (0,) * sd

        phivals = {}
        for i in range(order + 1):
            for alpha in mis(sd, i):
                phivals[alpha] = np.zeros((self.space_dimension(), len(points)))
                if alpha != evalkey:
                    phivals[alpha] = TraceError(
                        "Gradients on trace elements are not well-defined.")

        if entity is None or entity == (sd, 0):
            if self.ref_el.get_shape() not in [cl.LINE, cl.TRIANGLE,
                                               cl.TETRAHEDRON]:
                raise NotImplementedError(
                    "Entity-free tabulation is only supported on simplices")
            points = np.asarray(points)
            vertices = self.ref_el.vertices
            coordinates = barycentric_coordinates(points, vertices)
            facet_to_pts, success = extract_facets(coordinates)
            if not success:
                for key in phivals:
                    if entity is None:
                        phivals[key].fill(np.nan)
                    else:
                        phivals[key] = TraceError(
                            "The HDivTrace element can only be tabulated on facets.")
                return phivals

            element = self.dg_elements[facet_sd]
            nf = element.space_dimension()
            for facet, ipts in facet_to_pts.items():
                new_points = map_to_reference_facet(points[ipts], vertices, facet)
                nonzerovals = element.tabulate(order, new_points)[(0,) * facet_sd]
                phivals[evalkey][nf * facet:nf * (facet + 1), ipts] = nonzerovals
            return phivals

        entity_dim, _ = entity
        if entity_dim not in self.dg_elements:
            for key in phivals:
                phivals[key] = TraceError(
                    "The HDivTrace element can only be tabulated on facets.")
            return phivals

        offset = 0
        for facet_dim in sorted(self.dg_elements):
            element = self.dg_elements[facet_dim]
            nf = element.space_dimension()
            for i in sorted(self.ref_el.get_topology()[facet_dim]):
                if (facet_dim, i) == entity:
                    nonzerovals = element.tabulate(0, points)[(0,) * facet_sd]
                    indices = slice(offset, offset + nf)
                offset += nf
        phivals[evalkey][indices] = nonzerovals
        return phivals

    def value_shape(self):
        return ()

    def dmats(self):
        raise NotImplementedError("dmats not implemented for traces.")

    def get_num_members(self, arg):
        raise NotImplementedError("get_num_members not implemented for traces.")

    @staticmethod
    def is_nodal():
        return True


def construct_dg_element(ref_el, degree, variant):
    """The DG element living on a facet cell."""
    DG = Legendre if (variant and variant.startswith("integral")) \
        else DiscontinuousLagrange
    if ref_el.get_shape() in [cl.POINT, cl.LINE, cl.TRIANGLE]:
        if variant is None:
            return DG(ref_el, degree)
        return DG(ref_el, degree, variant)
    if ref_el.get_shape() == cl.QUADRILATERAL:
        dg_line = (DG(cl.ufc_simplex(1), degree) if variant is None
                   else DG(cl.ufc_simplex(1), degree, variant))
        return TensorProductElement(dg_line, dg_line)
    if ref_el.get_shape() == cl.TENSORPRODUCT:
        assert len(degree) == len(ref_el.cells)
        sub_elements = [construct_dg_element(c, d, variant)
                        for c, d in zip(ref_el.cells, degree)
                        if c.get_shape() != cl.POINT]
        if len(sub_elements) > 1:
            return TensorProductElement(*sub_elements)
        element, = sub_elements
        return element
    raise NotImplementedError(
        f"Reference cells of type {type(ref_el)} not currently supported")


def transform_nodes(ells, ref_el, facet_dim, facet_id):
    """Map facet functionals onto the cell."""
    try:
        facet_pts = get_lagrange_points(ells)
        transform = ref_el.get_entity_transform(facet_dim, facet_id)
        for pt in transform(facet_pts):
            yield PointEvaluation(ref_el, pt)
    except ValueError:
        Q_ref, = set(ell.Q for ell in ells)
        Q = FacetQuadratureRule(ref_el, facet_dim, facet_id, Q_ref)
        for ell in ells:
            yield IntegralMoment(ref_el, Q, ell.f_at_qpts)


def extract_facets(coordinates, tolerance=epsilon):
    """Bin barycentric points to facets ({} and False if any point is not
    on a facet)."""
    facet_to_pts = defaultdict(list)
    for ipt, c in enumerate(coordinates):
        on_facet = set(i for i, l in enumerate(c) if abs(l) < tolerance)
        try:
            f, = on_facet
        except ValueError:
            return ({}, False)
        facet_to_pts[f].append(ipt)

    if len(coordinates[0]) == 2:
        # interval: vertex i IS facet i, not the excluded one
        facet_to_pts[0], facet_to_pts[1] = facet_to_pts[1], facet_to_pts[0]
    return (facet_to_pts, True)


def barycentric_coordinates(points, vertices):
    """Barycentric coordinates of points in the simplex of ``vertices``."""
    T = (np.asarray(vertices[:-1]) - vertices[-1]).T
    invT = np.linalg.inv(T)
    points = np.asarray(points)
    bary = np.einsum("ij,kj->ki", invT, points - vertices[-1])
    last = 1 - bary.sum(axis=1)
    return np.concatenate([bary, last[..., np.newaxis]], axis=1)


def map_from_reference_facet(point, vertices):
    """Physical coordinate of a reference-facet point."""
    reference_simplex = cl.ufc_simplex(len(vertices) - 1)
    coords = barycentric_coordinates([point], reference_simplex.get_vertices())[0]
    return tuple(sum(np.asarray(vertices[j]) * coords[j]
                     for j in range(len(coords))))


def map_to_reference_facet(points, vertices, facet):
    """Map on-facet points of an n-simplex to the (n-1) reference simplex."""
    all_coords = barycentric_coordinates(points, vertices)
    reference_vertices = cl.ufc_simplex(len(vertices) - 2).get_vertices()
    reference_points = []
    for coords in all_coords:
        new_coords = [coords[j] for j in range(len(coords)) if j != facet]
        reference_points.append(sum(np.asarray(reference_vertices[j]) * new_coords[j]
                                    for j in range(len(new_coords))))
    return reference_points
