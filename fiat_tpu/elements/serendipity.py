"""Serendipity S_k elements on quads/hexes (parity with
/root/reference/FIAT/serendipity.py, after Arnold & Awanou): the basis is
constructed symbolically (host-side sympy) from vertex/edge/face/interior
lambda functions, tabulation by lambdified numpy, and the dual recovered
pointwise at unisolvent lattice points."""

import numbers
from itertools import chain

import numpy as np
import sympy
from sympy import Array, diff, lambdify, legendre, symbols

from ..core.cells import flatten_reference_cube, make_lattice
from ..core.dualset import DualSet
from ..core.expansions import mis
from ..core.finite_element import FiniteElement
from ..core.pointwise_dual import compute_pointwise_dual
from .lagrange import Lagrange

x, y, z = symbols("x y z")
variables = (x, y, z)
leg = legendre


def tr(n):
    return ((n - 3) * (n - 2)) // 2 if n > 1 else 0


def _symbolize_numbers(polynomials):
    """Replace bare numbers in the Array with symbols (numpy>=1.24
    lambdify workaround)."""
    extra_vars = {}
    out = []
    for poly in polynomials.tolist():
        if isinstance(poly, numbers.Real):
            if poly not in extra_vars:
                extra_vars[poly] = symbols(f"num_{len(extra_vars)}")
            out.append(extra_vars[poly])
        elif isinstance(poly, sympy.core.Expr):
            out.append(poly)
        else:
            raise TypeError(f"Unexpected type: {type(poly)}")
    return Array(out), extra_vars


class Serendipity(FiniteElement):
    """The serendipity element S_k."""

    def __new__(cls, ref_el, degree):
        dim = ref_el.get_spatial_dimension()
        if dim == 1:
            return Lagrange(ref_el, degree)
        if dim == 0:
            raise IndexError("reference element cannot be dimension 0")
        return super().__new__(cls)

    def __init__(self, ref_el, degree):
        flat_el = flatten_reference_cube(ref_el)
        dim = flat_el.get_spatial_dimension()
        flat_topology = flat_el.get_topology()
        verts = flat_el.get_vertices()

        dx = ((verts[-1][0] - x) / (verts[-1][0] - verts[0][0]),
              (x - verts[0][0]) / (verts[-1][0] - verts[0][0]))
        dy = ((verts[-1][1] - y) / (verts[-1][1] - verts[0][1]),
              (y - verts[0][1]) / (verts[-1][1] - verts[0][1]))
        x_mid = 2 * x - (verts[-1][0] + verts[0][0])
        y_mid = 2 * y - (verts[-1][1] + verts[0][1])
        if dim == 3:
            dz = ((verts[-1][2] - z) / (verts[-1][2] - verts[0][2]),
                  (z - verts[0][2]) / (verts[-1][2] - verts[0][2]))
            z_mid = 2 * z - (verts[-1][2] + verts[0][2])
        else:
            dz = None
            z_mid = None

        entity_ids = {d: {e: [] for e in ents}
                      for d, ents in flat_topology.items()}
        cur = 0
        for j in sorted(flat_topology[0]):
            entity_ids[0][j] = [cur]
            cur += 1
        for j in sorted(flat_topology[1]):
            entity_ids[1][j] = list(range(cur, cur + degree - 1))
            cur += degree - 1
        for j in sorted(flat_topology[2]):
            entity_ids[2][j] = list(range(cur, cur + tr(degree)))
            cur += tr(degree)

        if dim == 3:
            IL = i_lambda_0(degree, dx, dy, dz, x_mid, y_mid, z_mid)
            entity_ids[3] = {0: list(range(cur, cur + len(IL)))}
            cur += len(IL)
        else:
            IL = []

        VL = v_lambda_0(dim, dx, dy, dz)
        EL = e_lambda_0(degree, dim, dx, dy, dz, x_mid, y_mid, z_mid)
        FL = f_lambda_0(degree, dim, dx, dy, dz, x_mid, y_mid, z_mid)
        s_list = list(chain(VL, EL, FL, IL))
        assert len(s_list) == cur

        self.basis = {(0,) * dim: Array(s_list)}
        polynomials, extra_vars = _symbolize_numbers(Array(s_list))
        self.basis_callable = {(0,) * dim: [
            lambdify(variables[:dim], polynomials, modules="numpy", dummify=True),
            extra_vars]}

        self.flat_el = flat_el
        dual = DualSet([None] * cur, ref_el, entity_ids)
        super().__init__(ref_el=ref_el, dual=dual, order=degree, formdegree=0)
        self.dual = compute_pointwise_dual(self, unisolvent_pts(ref_el, degree))

    def degree(self):
        return self.order + 1

    def get_coeffs(self):
        raise NotImplementedError("get_coeffs not implemented for Serendipity")

    def tabulate(self, order, points, entity=None):
        if entity is None:
            entity = (self.ref_el.get_dimension(), 0)
        entity_dim, entity_id = entity
        transform = self.ref_el.get_entity_transform(entity_dim, entity_id)
        points = np.asarray(transform(points))

        dim = self.ref_el.get_spatial_dimension()
        if dim <= 1 or dim >= 4:
            raise NotImplementedError(
                "Serendipity tabulation only supports dimensions 2 and 3")
        npoints, pointdim = points.shape
        phivals = {}
        for o in range(order + 1):
            for alpha in mis(dim, o):
                try:
                    fn, extra_vars = self.basis_callable[alpha]
                except KeyError:
                    polynomials = diff(self.basis[(0,) * dim],
                                       *zip(variables, alpha))
                    polynomials, extra_vars = _symbolize_numbers(polynomials)
                    fn = lambdify(variables[:dim] + tuple(extra_vars.values()),
                                  polynomials, modules="numpy", dummify=True)
                    self.basis[alpha] = polynomials
                    self.basis_callable[alpha] = [fn, extra_vars]
                extra = [np.ones(npoints, dtype=points.dtype) * float(key)
                         for key in extra_vars]
                phivals[alpha] = fn(*([points[:, i] for i in range(pointdim)]
                                      + extra))
        return phivals

    def value_shape(self):
        return ()


def v_lambda_0(dim, dx, dy, dz):
    if dim == 2:
        return [a * b for a in dx for b in dy]
    return [a * b * c for a in dx for b in dy for c in dz]


def e_lambda_0(i, dim, dx, dy, dz, x_mid, y_mid, z_mid):
    if dim == 2:
        return tuple(
            [-leg(j, y_mid) * dy[0] * dy[1] * a for a in dx for j in range(i - 1)]
            + [-leg(j, x_mid) * dx[0] * dx[1] * b for b in dy for j in range(i - 1)])
    return tuple(
        [-leg(j, z_mid) * dz[0] * dz[1] * a * b
         for b in dx for a in dy for j in range(i - 1)]
        + [-leg(j, y_mid) * dy[0] * dy[1] * a * c
           for a in dx for c in dz for j in range(i - 1)]
        + [-leg(j, x_mid) * dx[0] * dx[1] * b * c
           for c in dy for b in dz for j in range(i - 1)])


def f_lambda_0(i, dim, dx, dy, dz, x_mid, y_mid, z_mid):
    if dim == 2:
        return tuple(
            [leg(j, x_mid) * leg(k - 4 - j, y_mid) * dx[0] * dx[1] * dy[0] * dy[1]
             for k in range(4, i + 1) for j in range(k - 3)])
    return tuple(
        [leg(j, y_mid) * leg(k - 4 - j, z_mid) * dy[0] * dy[1] * dz[0] * dz[1] * a
         for a in dx for k in range(4, i + 1) for j in range(k - 3)]
        + [leg(j, z_mid) * leg(k - 4 - j, x_mid) * dx[0] * dx[1] * dz[0] * dz[1] * b
           for b in dy for k in range(4, i + 1) for j in range(k - 3)]
        + [leg(j, x_mid) * leg(k - 4 - j, y_mid) * dx[0] * dx[1] * dy[0] * dy[1] * c
           for c in dz for k in range(4, i + 1) for j in range(k - 3)])


def i_lambda_0(i, dx, dy, dz, x_mid, y_mid, z_mid):
    return tuple(
        [-leg(l - 6 - j, x_mid) * leg(j - k, y_mid) * leg(k, z_mid)
         * dx[0] * dx[1] * dy[0] * dy[1] * dz[0] * dz[1]
         for l in range(6, i + 1) for j in range(l - 5) for k in range(j + 1)])


def unisolvent_pts(K, deg):
    flat_el = flatten_reference_cube(K)
    dim = flat_el.get_spatial_dimension()
    if dim == 2:
        return unisolvent_pts_quad(flat_el, deg)
    if dim == 3:
        return unisolvent_pts_hex(flat_el, deg)
    raise ValueError("Serendipity only defined for quads and hexes")


def unisolvent_pts_quad(K, deg):
    """Unisolvent (not dual) points for quad serendipity."""
    L = K.construct_subelement(1)
    vs = np.asarray(K.vertices)
    pts = [pt for pt in K.vertices]
    Lpts = make_lattice(L.vertices, deg, 1)
    for e in K.topology[1]:
        Fmap = K.get_entity_transform(1, e)
        pts.extend(tuple(Fmap(pt)) for pt in Lpts)
    if deg > 3:
        dx0 = (vs[1, :] - vs[0, :]) / (deg - 2)
        dx1 = (vs[2, :] - vs[0, :]) / (deg - 2)
        pts.extend(tuple(vs[0, :] + dx0 * i + dx1 * j)
                   for i in range(1, deg - 2)
                   for j in range(1, deg - 1 - i))
    return pts


def unisolvent_pts_hex(K, deg):
    """Unisolvent (not dual) points for hex serendipity."""
    L = K.construct_subelement(1)
    F = K.construct_subelement(2)
    vs = np.asarray(K.vertices)
    pts = [pt for pt in K.vertices]
    Lpts = make_lattice(L.vertices, deg, 1)
    for e in K.topology[1]:
        Fmap = K.get_entity_transform(1, e)
        pts.extend(tuple(Fmap(pt)) for pt in Lpts)
    if deg > 3:
        fvs = np.asarray(F.vertices)
        dx0 = (fvs[1, :] - fvs[0, :]) / (deg - 2)
        dx1 = (fvs[2, :] - fvs[0, :]) / (deg - 2)
        Fpts = [tuple(fvs[0, :] + dx0 * i + dx1 * j)
                for i in range(1, deg - 2)
                for j in range(1, deg - 1 - i)]
        for f in K.topology[2]:
            Fmap = K.get_entity_transform(2, f)
            pts.extend(tuple(Fmap(pt)) for pt in Fpts)
    if deg > 5:
        dx0 = np.asarray([1.0, 0, 0]) / (deg - 4)
        dx1 = np.asarray([0, 1.0, 0]) / (deg - 4)
        dx2 = np.asarray([0, 0, 1.0]) / (deg - 4)
        pts.extend(tuple(vs[0, :] + dx0 * i + dx1 * j + dx2 * k)
                   for i in range(1, deg - 4)
                   for j in range(1, deg - 3 - i)
                   for k in range(1, deg - 2 - i - j))
    return pts
