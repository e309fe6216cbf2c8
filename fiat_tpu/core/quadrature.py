"""Quadrature rules on reference cells.

Behavioural parity with /root/reference/FIAT/quadrature.py: Gauss-Jacobi /
Gauss-Lobatto-Legendre / Gauss-Radau line rules (with intrinsic-orientation
point permutation maps), collapsed (Duffy) simplex rules, mapped facet
rules, and tensor products.  Rule construction is tiny host-side float64;
points/weights are handed to device kernels as arrays.
"""

import itertools
import math

import numpy as np

from . import cells as cl
from .orientation import make_entity_permutations_simplex
from .recursive_nodes import (collapsed_gauss_simplex, gauss_jacobi_rule,
                              gauss_lobatto_jacobi_rule)


def pseudo_determinant(A):
    return np.sqrt(abs(np.linalg.det(A.T @ A)))


def map_quadrature(pts_ref, wts_ref, source_cell, target_cell, jacobian=False, avg=False):
    """Map points/weights from source_cell onto target_cell by the affine
    vertex map, scaling weights by the pseudo-determinant."""
    while source_cell.get_parent():
        source_cell = source_cell.get_parent()
    A, b = cl.make_affine_mapping(source_cell.get_vertices(),
                                  target_cell.get_vertices())
    pts_ref = np.asarray(pts_ref)
    if pts_ref.ndim != 2:
        pts_ref = pts_ref.reshape(-1, A.shape[1])
    pts = pts_ref @ A.T + b
    wts = np.asarray(wts_ref) if avg else np.asarray(wts_ref) * pseudo_determinant(A)
    pts = tuple(map(tuple, pts))
    wts = tuple(wts.flat)
    if jacobian:
        return pts, wts, A
    return pts, wts


class QuadratureRule:
    """Integration over a reference cell as a weighted point sum."""

    def __init__(self, ref_el, pts, wts):
        if len(wts) != len(pts):
            raise ValueError(f"Have {len(wts)} weights, but {len(pts)} points")
        self.ref_el = ref_el
        self.pts = pts
        self.wts = wts
        self._intrinsic_orientation_permutation_map_tuple = (None,)

    def get_points(self):
        return np.asarray(self.pts)

    def get_weights(self):
        return np.asarray(self.wts)

    def integrate(self, f):
        return sum(w * f(x) for x, w in zip(self.pts, self.wts))

    @property
    def extrinsic_orientation_permutation_map(self):
        return self.ref_el.extrinsic_orientation_permutation_map

    @property
    def intrinsic_orientation_permutation_map_tuple(self):
        if any(m is None for m in self._intrinsic_orientation_permutation_map_tuple):
            raise ValueError("intrinsic orientation permutation maps not set")
        return self._intrinsic_orientation_permutation_map_tuple


class GaussJacobiQuadratureLineRule(QuadratureRule):
    """m-point Gauss-Jacobi rule for weights (a, b) on an interval."""

    def __init__(self, ref_el, m, a=0, b=0):
        x, w = gauss_jacobi_rule(m, a, b)
        pts, wts = map_quadrature(x, w, cl.DefaultLine(), ref_el)
        super().__init__(ref_el, pts, wts)
        perm = np.zeros((math.factorial(2), m), dtype=int)
        for io, p in make_entity_permutations_simplex(1, m).items():
            perm[io, p] = range(m)
        self._intrinsic_orientation_permutation_map_tuple = (perm,)


class GaussLegendreQuadratureLineRule(GaussJacobiQuadratureLineRule):
    def __init__(self, ref_el, m):
        super().__init__(ref_el, m)


class GaussLobattoLegendreQuadratureLineRule(QuadratureRule):
    """m-point GLL rule (endpoints included, exact to degree 2m-3)."""

    def __init__(self, ref_el, m):
        if m < 2:
            raise ValueError("GLL quadrature needs at least 2 points")
        x, w = gauss_lobatto_jacobi_rule(m, 0, 0)
        pts, wts = map_quadrature(x, w, cl.DefaultLine(), ref_el)
        super().__init__(ref_el, pts, wts)


class RadauQuadratureLineRule(QuadratureRule):
    """m-point Gauss-Radau rule with a fixed endpoint (exact to 2m-2)."""

    def __init__(self, ref_el, m, right=True):
        if m < 1:
            raise ValueError("Radau quadrature needs at least 1 point")
        right = int(right)
        x0 = ref_el.vertices[right]
        volume = ref_el.volume()
        if m > 1:
            inner = GaussJacobiQuadratureLineRule(ref_el, m - 1, right, 1 - right)
            x = inner.get_points().reshape(-1)
            hat = (2.0 / volume) * abs(x0[0] - x)
            wts = inner.get_weights() / hat
            pts = inner.pts
        else:
            wts, pts = (), ()
        w0 = volume - sum(wts)
        xs = (*pts, x0) if right else (x0, *pts)
        ws = (*wts, w0) if right else (w0, *wts)
        super().__init__(ref_el, xs, ws)


class CollapsedQuadratureSimplexRule(QuadratureRule):
    """Karniadakis & Sherwin collapsed rule: Duffy image of a Gauss-Jacobi
    product grid, mapped from the default simplex."""

    def __init__(self, ref_el, m):
        dim = ref_el.get_spatial_dimension()
        x, w = collapsed_gauss_simplex(dim, m)
        pts, wts = map_quadrature(x, w, cl.default_simplex(dim), ref_el)
        super().__init__(ref_el, pts, wts)


class CollapsedQuadratureTriangleRule(CollapsedQuadratureSimplexRule):
    pass


class CollapsedQuadratureTetrahedronRule(CollapsedQuadratureSimplexRule):
    pass


class FacetQuadratureRule(QuadratureRule):
    """A reference rule pushed forward onto a facet of a cell."""

    def __init__(self, ref_el, entity_dim, entity_id, Q_ref, avg=False):
        facet = ref_el.construct_subelement(entity_dim)
        facet_topology = ref_el.get_topology()[entity_dim][entity_id]
        facet.vertices = ref_el.get_vertices_of_subcomplex(facet_topology)
        pts, wts, J = map_quadrature(Q_ref.get_points(), Q_ref.get_weights(),
                                     Q_ref.ref_el, facet, jacobian=True, avg=avg)
        super().__init__(facet, pts, wts)
        self._J = J
        self._reference_rule = Q_ref

    def reference_rule(self):
        return self._reference_rule

    def jacobian(self):
        return self._J

    def jacobian_determinant(self):
        return pseudo_determinant(self._J)


def make_quadrature(ref_el, m):
    """Collapsed-quadrature rule with m points per direction."""
    min_m = min(m) if isinstance(m, tuple) else m
    if min_m <= 0:
        raise ValueError("Need at least one quadrature point per direction")
    shape = ref_el.get_shape()
    if shape == cl.POINT:
        return QuadratureRule(ref_el, [()], [1])
    if shape == cl.LINE:
        return GaussJacobiQuadratureLineRule(ref_el, m)
    if shape == cl.TRIANGLE:
        return CollapsedQuadratureTriangleRule(ref_el, m)
    if shape == cl.TETRAHEDRON:
        return CollapsedQuadratureTetrahedronRule(ref_el, m)
    if shape == cl.QUADRILATERAL:
        line = GaussJacobiQuadratureLineRule(ref_el.construct_subelement(1), m)
        return make_tensor_product_quadrature(line, line)
    if shape == cl.HEXAHEDRON:
        line = GaussJacobiQuadratureLineRule(ref_el.construct_subelement(1), m)
        return make_tensor_product_quadrature(line, line, line)
    raise ValueError(f"Unable to make quadrature for cell {ref_el}")


def make_tensor_product_quadrature(*quad_rules):
    """Product rule on the TensorProductCell of the factors."""
    ref_el = cl.TensorProductCell(*[q.ref_el for q in quad_rules])
    pts = [tuple(itertools.chain(*pt)) for pt in
           itertools.product(*[q.pts for q in quad_rules])]
    wts = [float(np.prod(w)) for w in itertools.product(*[q.wts for q in quad_rules])]
    return QuadratureRule(ref_el, pts, wts)
