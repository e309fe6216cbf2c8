"""Orthogonal (Dubiner) expansion bases on simplices, TPU-native.

Behavioural parity with /root/reference/FIAT/expansions.py (Kirby 2010
singularity-free recurrence; Karniadakis & Sherwin collapsed coordinates),
redesigned for JAX:

* the *value* recurrence is written once over generic array arithmetic, so
  it runs vectorised in numpy on host (construction paths) and traces under
  ``jax.jit``/``vmap`` on device;
* ALL derivative orders come from forward-mode AD (nested ``jax.jvp``)
  instead of the reference's hand-written order<=2 recurrence plus
  dmats-chain fallback (expansions.py:329-366) -- exact, any order, and
  XLA-fusable;
* tabulations over many points are whole-batch array programs (points are a
  trailing batch axis), never per-point Python loops.
"""

import math
from itertools import chain

import numpy as np
import jax
import jax.numpy as jnp

from . import cells as cl
from ..utils.jets import Jet, taylor_seeds, multiindices


def _is_traced(x):
    return isinstance(x, (jax.core.Tracer, jax.Array)) and not isinstance(x, np.ndarray)


def _stack_rows(rows, npts, traced):
    """Stack per-member rows (arrays / scalars / None) to (m, npts)."""
    xp = jnp if traced or any(_is_traced(r) for r in rows) else np
    out = []
    for r in rows:
        if r is None:
            out.append(xp.zeros(npts))
        elif hasattr(r, "shape") and r.shape != ():
            out.append(r)
        else:
            out.append(xp.broadcast_to(xp.asarray(r, dtype=xp.float64), (npts,))
                       if xp is jnp else np.broadcast_to(np.float64(r), (npts,)))
    return xp.stack(out)

# ---------------------------------------------------------------------------
# Multi-index orderings (shared with the reference's morton convention)

def morton_index2(p, q=0):
    return (p + q) * (p + q + 1) // 2 + q


def morton_index3(p, q=0, r=0):
    return ((p + q + r) * (p + q + r + 1) * (p + q + r + 2) // 6
            + (q + r) * (q + r + 1) // 2 + r)


def _morton(dim):
    return (lambda p: p, morton_index2, morton_index3)[dim - 1]


def jacobi_recurrence_coeffs(a, b, n):
    """(a_n, b_n, c_n) of the three-term Jacobi recurrence (python floats)."""
    an = (2 * n + 1 + a + b) * (2 * n + 2 + a + b) / (2 * (n + 1) * (n + 1 + a + b))
    bn = (a + b) * (a - b) * (2 * n + 1 + a + b) / (2 * (n + 1) * (n + 1 + a + b) * (2 * n + a + b))
    cn = (n + a) * (n + b) * (2 * n + 2 + a + b) / ((n + 1) * (n + 1 + a + b) * (2 * n + a + b))
    return an, bn, cn


def integrated_jacobi_recurrence_coeffs(a, b, n):
    if n == 1:
        return (a + b + 2) / 2, (a - 3 * b - 2) / 2, 0.0
    return jacobi_recurrence_coeffs(a - 1, b + 1, n - 1)


# ---------------------------------------------------------------------------
# The value recurrence (generic over numpy / traced jnp arrays)

def dubiner_values(dim, n, ref_pts, scale, variant=None):
    """Values of the degree-n Dubiner basis at points on the default
    (-1,1)-vertex dim-simplex.

    :arg ref_pts: sequence of ``dim`` coordinate arrays (any common batch
        shape; plain numpy or traced jnp).
    :arg scale: scalar setting the constant member.
    :arg variant: None | 'bubble' (integrated Jacobi) | 'dual'.
    :returns: list of ``comb(n+dim, dim)`` batch-shaped arrays, ordered by
        the morton multi-index convention of the reference.
    """
    if variant not in (None, "bubble", "dual"):
        raise ValueError(f"Invalid expansion variant {variant!r}")
    if variant == "bubble":
        scale = -scale

    num_members = math.comb(n + dim, dim)
    # zero of the right batch shape/dtype
    zero = sum((ref_pts[i] - ref_pts[i] for i in range(dim)), 0.0) if dim else 0.0
    phi = [None] * num_members
    phi[0] = zero + scale
    if dim == 0 or n == 0:
        return phi
    if dim > 3:
        raise ValueError("Only dim <= 3 simplices supported")

    X = tuple(ref_pts) + (-1.0,) * (dim + 2 - dim)
    beta = 1 if variant == "dual" else 0
    coeffs = (integrated_jacobi_recurrence_coeffs if variant == "bubble"
              else jacobi_recurrence_coeffs)
    idx = _morton(dim)

    for codim in range(dim):
        x, y, z = X[codim], X[codim + 1], X[codim + 2]
        fb = 0.5 * (y + z)
        fa = x + fb + 1.0
        fc = fb * fb
        for sub in cl.lattice_iter(0, n, codim):
            icur, inext = idx(*sub, 0), idx(*sub, 1)
            if variant == "bubble":
                alpha = 2 * sum(sub)
                a1, b1 = -0.5, -0.5
            else:
                alpha = 2 * sum(sub) + len(sub)
                if variant == "dual":
                    alpha += 1 + len(sub)
                a1 = 0.5 * (alpha + beta) + 1.0
                b1 = 0.5 * (alpha - beta)
            phi[inext] = (a1 * fa - b1 * fb) * phi[icur]
            for i in range(1, n - sum(sub)):
                iprev, icur, inext = icur, inext, idx(*sub, i + 1)
                a, b, c = coeffs(alpha, beta, i)
                phi[inext] = (a * fa - b * fb) * phi[icur] - (c * fc) * phi[iprev]

        # orthonormalisation scaling after extending to dimension d
        d = codim + 1
        shift = 1 if variant == "dual" else 0
        for index in cl.lattice_iter(0, n + 1, d):
            if variant is not None:
                p = index[-1] + shift
                al = 2 * (sum(index[:-1]) + d * shift) - 1
                norm2 = (0.5 + d) / d
                if p > 0 and p + al > 0:
                    norm2 *= (p + al) * (2 * p + al) / p
            else:
                norm2 = (2 * sum(index) + d) / d
            phi[idx(*index)] = phi[idx(*index)] * math.sqrt(norm2)
    return phi


def c0_reorder(dim, n, phi):
    """Turn a 'bubble' (integrated-Jacobi) tabulation into the C0 hierarchy:
    recover facet bubbles by differencing, then renumber vertex/edge/face/
    interior blocks in reference order.  Purely index algebra on the member
    list; works for numpy and traced arrays."""
    idx = _morton(dim)
    phi = list(phi)
    phi[0] = -phi[0]
    for i in range(1, dim + 1):
        phi[0] = phi[0] - phi[i]
    if dim == 2:
        for i in range(2, n + 1):
            phi[idx(0, i)] = phi[idx(0, i)] - phi[idx(1, i - 1)]
    elif dim == 3:
        for i in range(2, n + 1):
            for j in range(0, n + 1 - i):
                phi[idx(0, i, j)] = phi[idx(0, i, j)] - phi[idx(1, i - 1, j)]
            icur = idx(0, 0, i)
            phi[icur] = phi[icur] - phi[idx(0, 1, i - 1)]
            phi[icur] = phi[icur] - phi[idx(1, 0, i - 1)]

    order = list(range(dim + 1))
    if dim == 1:
        order.extend(range(2, n + 1))
    elif dim == 2:
        order.extend(idx(1, i - 1) for i in range(2, n + 1))
        order.extend(idx(0, i) for i in range(2, n + 1))
        order.extend(idx(i, 0) for i in range(2, n + 1))
        order.extend(idx(i, j) for j in range(1, n + 1) for i in range(2, n - j + 1))
    elif dim == 3:
        order.extend(idx(0, 1, i - 1) for i in range(2, n + 1))
        order.extend(idx(1, 0, i - 1) for i in range(2, n + 1))
        order.extend(idx(1, i - 1, 0) for i in range(2, n + 1))
        order.extend(idx(0, 0, i) for i in range(2, n + 1))
        order.extend(idx(0, i, 0) for i in range(2, n + 1))
        order.extend(idx(i, 0, 0) for i in range(2, n + 1))
        order.extend(idx(1, i - 1, j) for j in range(1, n + 1) for i in range(2, n - j + 1))
        order.extend(idx(0, i, j) for j in range(1, n + 1) for i in range(2, n - j + 1))
        order.extend(idx(i, 0, j) for j in range(1, n + 1) for i in range(2, n - j + 1))
        order.extend(idx(i, j, 0) for j in range(1, n + 1) for i in range(2, n - j + 1))
        order.extend(idx(i, j, k) for k in range(1, n + 1)
                     for j in range(1, n - k + 1) for i in range(2, n - j - k + 1))
    return [phi[i] for i in order]


def mis(m, n):
    """All m-tuples of nonnegative integers summing to n (reference order)."""
    if m == 1:
        return [(n,)]
    if n == 0:
        return [(0,) * m]
    return [(n - i,) + rest for i in range(n + 1) for rest in mis(m - 1, i)]


# ---------------------------------------------------------------------------
# Expansion sets

class ExpansionSet:
    """Dubiner expansion set over a simplicial complex.

    Tabulations run through a single generic recurrence: numpy-evaluated on
    host for order-0 construction paths, JAX-evaluated (eager or jitted)
    whenever derivatives are requested or tracing is active.
    """

    def __new__(cls, *args, **kwargs):
        if cls is not ExpansionSet:
            return super().__new__(cls)
        ref_el = args[0]
        table = {cl.POINT: PointExpansionSet,
                 cl.LINE: LineExpansionSet,
                 cl.TRIANGLE: TriangleExpansionSet,
                 cl.TETRAHEDRON: TetrahedronExpansionSet}
        try:
            sub = table[ref_el.get_shape()]
        except KeyError:
            raise ValueError("Invalid reference element type.")
        return sub(*args, **kwargs)

    def __init__(self, ref_el, scale=None, variant=None):
        self.ref_el = ref_el
        self.variant = variant
        sd = ref_el.get_spatial_dimension()
        top = ref_el.get_topology()
        base = cl.default_simplex(sd)
        base_verts = base.get_vertices()
        self.affine_mappings = [
            cl.make_affine_mapping(ref_el.get_vertices_of_subcomplex(top[sd][cell]),
                                   base_verts)
            for cell in top[sd]]
        if scale is None:
            scale = math.sqrt(1.0 / base.volume())
        self.scale = scale
        self.continuity = "C0" if variant == "bubble" else None
        self.recurrence_order = 2
        self._dmats_cache = {}
        self._cell_node_map_cache = {}

    def reconstruct(self, ref_el=None, scale=None, variant=None):
        return ExpansionSet(ref_el or self.ref_el,
                            scale=scale or self.scale,
                            variant=variant or self.variant)

    def get_scale(self, n, cell=0):
        scale = self.scale
        sd = self.ref_el.get_spatial_dimension()
        if isinstance(scale, str):
            vol = self.ref_el.volume_of_subcomplex(sd, cell)
            name = scale.lower()
            if name == "orthonormal":
                scale = math.sqrt(1.0 / vol)
            elif name == "l2 piola":
                scale = 1.0 / vol
        elif n == 0 and sd > 1 and len(self.affine_mappings) == 1:
            # Reference quirk: constant member is exactly 1 on single cells.
            scale = 1
        return scale

    def get_num_members(self, n):
        return polynomial_dimension(self.ref_el, n, self.continuity)

    def get_cell_node_map(self, n):
        try:
            return self._cell_node_map_cache[n]
        except KeyError:
            cnm = polynomial_cell_node_map(self.ref_el, n, self.continuity)
            return self._cell_node_map_cache.setdefault(n, cnm)

    # -- core tabulation ------------------------------------------------------

    def _tabulate_on_cell(self, n, pts, order=0, cell=0, direction=None):
        """dict alpha -> array (m, npts) of D^alpha phi_i(pts_j).

        Runs the value recurrence on truncated Taylor jets: plain arrays for
        order 0, jets in the cell coordinates (or a single jet variable when
        ``direction`` is given) otherwise.  Works on numpy arrays (host) and
        on traced jnp arrays (inside jit)."""
        sd = self.ref_el.get_spatial_dimension()
        traced = _is_traced(pts)
        if not traced:
            pts = np.asarray(pts, dtype=np.float64).reshape(-1, sd)
        A, b = self.affine_mappings[cell]
        scale = self.get_scale(n, cell=cell)
        ref = pts @ A.T + b                          # (npts, sd), default simplex
        vals = [ref[..., i] for i in range(sd)]
        npts = pts.shape[0] if hasattr(pts, "shape") else len(pts)

        if order == 0:
            phi = dubiner_values(sd, n, vals, scale, variant=self.variant)
            if self.continuity == "C0":
                phi = c0_reorder(sd, n, phi)
            return {(0,) * sd: _stack_rows(phi, npts, traced)}

        if direction is None:
            nvars, jac = sd, A
            alpha_of = lambda a: a
        else:
            nvars = 1
            jac = (A @ np.asarray(direction, dtype=np.float64)).reshape(sd, 1)
            alpha_of = lambda a: a + (0,) * (sd - 1)

        coords = taylor_seeds(vals, jac, nvars, order)
        phi = dubiner_values(sd, n, coords, scale, variant=self.variant)
        if self.continuity == "C0":
            phi = c0_reorder(sd, n, phi)

        result = {}
        for alpha in multiindices(nvars, order):
            rows = [p.derivative(alpha) if isinstance(p, Jet)
                    else (p if sum(alpha) == 0 else None)
                    for p in phi]
            result[alpha_of(alpha)] = _stack_rows(rows, npts, traced)
        return result

    def _tabulate(self, n, pts, order=0):
        """Tabulate on the whole complex (single-cell case is the identity
        assembly; macro complexes bin points to subcells)."""
        pts = np.asarray(pts, dtype=np.float64)
        unique = self.continuity is not None and order == 0
        cell_point_map = compute_cell_point_map(self.ref_el, pts, unique=unique)
        phis = {c: self._tabulate_on_cell(n, pts[ipts if ipts is not Ellipsis else slice(None)],
                                          order, cell=c)
                for c, ipts in cell_point_map.items()}
        if not self.ref_el.is_macrocell():
            return phis[0]

        if not unique:
            mult = np.zeros(pts.shape[:-1])
            for c, ipts in cell_point_map.items():
                mult[ipts] += 1
            for c, ipts in cell_point_map.items():
                for alpha in phis[c]:
                    phis[c][alpha] /= mult[None, ipts]

        num_phis = self.get_num_members(n)
        cell_node_map = self.get_cell_node_map(n)
        result = {}
        probe = next(iter(phis.values()))
        for alpha in probe:
            out = np.zeros((num_phis, *pts.shape[:-1]), dtype=probe[alpha].dtype)
            for c in cell_point_map:
                ibfs = cell_node_map[c]
                ipts = cell_point_map[c]
                if ipts is Ellipsis:
                    out[ibfs, ...] += phis[c][alpha]
                else:
                    out[np.ix_(ibfs, ipts)] += phis[c][alpha]
            result[alpha] = out
        return result

    def tabulate(self, n, pts):
        if len(pts) == 0:
            return np.array([])
        sd = self.ref_el.get_spatial_dimension()
        return self._tabulate(n, pts)[(0,) * sd]

    def tabulate_derivatives(self, n, pts):
        vals = self._tabulate(n, pts, order=1)
        sd = self.ref_el.get_spatial_dimension()
        v = vals[(0,) * sd]
        dv = [vals[alpha] for alpha in mis(sd, 1)]
        return [[(v[i, j], [vi[i, j] for vi in dv])
                 for j in range(v.shape[1])]
                for i in range(v.shape[0])]

    def tabulate_jet(self, n, pts, order=1):
        vals = self._tabulate(n, pts, order=order)
        sd = self.ref_el.get_spatial_dimension()
        v0 = vals[(0,) * sd]
        data = [v0]
        for r in range(1, order + 1):
            vr = np.zeros((sd,) * r + v0.shape, dtype=v0.dtype)
            for index in np.ndindex(vr.shape[:r]):
                vr[index] = vals[tuple(map(index.count, range(sd)))]
            data.append(vr.transpose((r, r + 1) + tuple(range(r))))
        return data

    # -- jumps on macro complexes ---------------------------------------------

    def tabulate_normal_jumps(self, n, ref_pts, facet, order=0):
        """Normal-derivative jumps of the expansion at reference points of a
        facet of the complex."""
        sd = self.ref_el.get_spatial_dimension()
        transform = self.ref_el.get_entity_transform(sd - 1, facet)
        pts = np.asarray(transform(ref_pts))
        cell_point_map = compute_cell_point_map(self.ref_el, pts, unique=False)
        cell_node_map = self.get_cell_node_map(n)
        num_phis = self.get_num_members(n)
        results = np.zeros((order + 1, num_phis, *pts.shape[:-1]))
        for c, ipts in cell_point_map.items():
            normal = self.ref_el.compute_normal(facet, cell=c)
            side = np.dot(normal, self.ref_el.compute_normal(facet))
            sel = slice(None) if ipts is Ellipsis else ipts
            phi = self._tabulate_on_cell(n, pts[sel], order, cell=c)
            v0 = phi[(0,) * sd]
            ibfs = cell_node_map[c]
            for r in range(order + 1):
                vr = np.zeros((sd,) * r + v0.shape, dtype=v0.dtype)
                for index in np.ndindex(vr.shape[:r]):
                    vr[index] = phi[tuple(map(index.count, range(sd)))]
                for _ in range(r):
                    vr = np.tensordot(normal, vr, axes=(0, 0))
                indices = np.ix_(ibfs, np.arange(pts.shape[0])[sel])
                if r % 2 == 0 and side < 0:
                    results[r][indices] -= vr
                else:
                    results[r][indices] += vr
        return results

    def tabulate_jumps(self, n, points, order=0):
        """Derivative jumps across interior facets of the complex."""
        sd = self.ref_el.get_spatial_dimension()
        num_members = self.get_num_members(n)
        cell_node_map = self.get_cell_node_map(n)
        points = np.asarray(points, dtype=np.float64)
        cell_point_map = compute_cell_point_map(self.ref_el, points, unique=False)

        num_jumps = 0
        facet_point_map = {}
        for facet in self.ref_el.get_interior_facets(sd - 1):
            cells_ = self.ref_el.connectivity[(sd - 1, sd)][facet]
            ipts = list(set.intersection(*(set(np.atleast_1d(cell_point_map[c]))
                                           for c in cells_ if c in cell_point_map)))
            if ipts:
                facet_point_map[facet] = ipts
                num_jumps += len(ipts)

        derivs = {c: self._tabulate_on_cell(n, points, order=order, cell=c)
                  for c in cell_point_map}
        jumps = {}
        for r in range(order + 1):
            cur = 0
            alphas = mis(sd, r)
            jumps[r] = np.zeros((num_members, len(alphas) * num_jumps))
            for facet, ipts in facet_point_map.items():
                c0, c1 = self.ref_el.connectivity[(sd - 1, sd)][facet]
                for alpha in alphas:
                    ijump = range(cur, cur + len(ipts))
                    jumps[r][np.ix_(cell_node_map[c1], ijump)] += derivs[c1][alpha][:, ipts]
                    jumps[r][np.ix_(cell_node_map[c0], ijump)] -= derivs[c0][alpha][:, ipts]
                    cur += len(ipts)
        return jumps

    # -- spectral differentiation matrices --------------------------------------

    def get_dmats(self, degree, cell=0):
        """dmat[k, j, i]: coefficients of d(phi_j)/dx_k in the expansion
        basis, from a collocation solve at a Gauss-Legendre lattice."""
        key = (degree, cell)
        try:
            return self._dmats_cache[key]
        except KeyError:
            pass
        sd = self.ref_el.get_spatial_dimension()
        if degree == 0:
            return self._dmats_cache.setdefault(key, np.zeros((sd, 1, 1)))
        top = self.ref_el.get_topology()
        verts = self.ref_el.get_vertices_of_subcomplex(top[sd][cell])
        pts = cl.make_lattice(verts, degree, variant="gl")
        v = self._tabulate_on_cell(degree, pts, order=1, cell=cell)
        dv = [np.transpose(v[alpha]) for alpha in mis(sd, 1)]
        dmats = np.linalg.solve(np.transpose(v[(0,) * sd]), dv)
        return self._dmats_cache.setdefault(key, dmats)

    def __eq__(self, other):
        return (type(self) is type(other) and self.ref_el == other.ref_el
                and self.continuity == other.continuity)

    def __hash__(self):
        return hash((type(self), self.ref_el, self.continuity))


class PointExpansionSet(ExpansionSet):
    def __init__(self, ref_el, **kwargs):
        if ref_el.get_spatial_dimension() != 0:
            raise ValueError("Must have a point")
        super().__init__(ref_el, **kwargs)

    def _tabulate_on_cell(self, n, pts, order=0, cell=0, direction=None):
        assert n == 0 and order == 0
        return {(): np.ones((1, len(pts)))}


class LineExpansionSet(ExpansionSet):
    def __init__(self, ref_el, **kwargs):
        if ref_el.get_spatial_dimension() != 1:
            raise ValueError("Must have a line")
        super().__init__(ref_el, **kwargs)


class TriangleExpansionSet(ExpansionSet):
    def __init__(self, ref_el, **kwargs):
        if ref_el.get_spatial_dimension() != 2:
            raise ValueError("Must have a triangle")
        super().__init__(ref_el, **kwargs)


class TetrahedronExpansionSet(ExpansionSet):
    def __init__(self, ref_el, **kwargs):
        if ref_el.get_spatial_dimension() != 3:
            raise ValueError("Must have a tetrahedron")
        super().__init__(ref_el, **kwargs)


# ---------------------------------------------------------------------------
# Complex-wide numbering helpers

def polynomial_dimension(ref_el, n, continuity=None):
    if ref_el.get_shape() == cl.POINT:
        if n > 0:
            raise ValueError("Only degree-0 polynomials on a point")
        return 1
    top = ref_el.get_topology()
    if isinstance(continuity, dict):
        return sum(len(continuity[dim][0]) * len(top[dim]) for dim in top)
    if continuity == "C0":
        return sum(math.comb(n - 1, dim) * len(top[dim]) for dim in top)
    dim = ref_el.get_spatial_dimension()
    return math.comb(n + dim, dim) * len(top[dim])


def polynomial_entity_ids(ref_el, n, continuity=None):
    top = ref_el.get_topology()
    sd = ref_el.get_spatial_dimension()
    entity_ids = {}
    cur = 0
    for dim in sorted(top):
        if isinstance(continuity, dict):
            dofs, = set(len(continuity[dim][e]) for e in continuity[dim])
        elif continuity == "C0":
            dofs = math.comb(n - 1, dim)
        else:
            dofs = math.comb(n + dim, dim) if dim == sd else 0
        entity_ids[dim] = {e: list(range(cur + i * dofs, cur + (i + 1) * dofs))
                           for i, e in enumerate(sorted(top[dim]))}
        cur += dofs * len(top[dim])
    return entity_ids


def polynomial_cell_node_map(ref_el, n, continuity=None):
    top = ref_el.get_topology()
    sd = ref_el.get_spatial_dimension()
    entity_ids = polynomial_entity_ids(ref_el, n, continuity)
    ref_ids = polynomial_entity_ids(ref_el.construct_subelement(sd), n, continuity)
    num_cells = len(top[sd])
    dofs_per_cell = sum(len(ref_ids[dim][e]) for dim in ref_ids for e in ref_ids[dim])
    cell_node_map = np.zeros((num_cells, dofs_per_cell), dtype=int)
    conn = ref_el.get_cell_connectivity()
    for c in top[sd]:
        for dim in top:
            for ref_e, e in enumerate(conn[c][dim]):
                cell_node_map[c, ref_ids[dim][ref_e]] = entity_ids[dim][e]
    return cell_node_map


def compute_cell_point_map(ref_el, pts, unique=True, tol=1e-12):
    """Bin points to the nearest subcell of a complex.  Returns
    {cell: point-index-array or Ellipsis}."""
    top = ref_el.get_topology()
    sd = ref_el.get_spatial_dimension()
    if len(top[sd]) == 1:
        return {0: Ellipsis}
    pts = np.asarray(pts)
    best = ref_el.get_parent().distance_to_point_l1(pts, rescale=True)
    tol = best + tol
    out = {}
    for c in sorted(top[sd]):
        near = ref_el.distance_to_point_l1(pts, entity=(sd, c), rescale=True) < tol
        if near.ndim == 0:
            if near:
                out[c] = Ellipsis
                if unique:
                    break
        else:
            if unique:
                for other in out.values():
                    near[other] = False
            ipts = np.where(near)[0]
            if len(ipts) > 0:
                out[c] = ipts
    return out


def partition_of_unity_masks(ref_el, pts, unique=True, tol=1e-12):
    """Traceable analogue of the reference's symbolic partition-of-unity
    (expansions.py:732): per-subcell {0,1} masks over a point batch, for
    shape-static macro tabulation on device."""
    top = ref_el.get_topology()
    sd = ref_el.get_spatial_dimension()
    best = ref_el.get_parent().distance_to_point_l1(pts, rescale=True)
    masks = []
    taken = 0.0
    for c in sorted(top[sd]):
        near = (ref_el.distance_to_point_l1(pts, entity=(sd, c), rescale=True)
                <= best + tol)
        m = jnp.where(near, 1.0, 0.0)
        if unique:
            m = m * (1.0 - taken)
            taken = jnp.maximum(taken, m)
        masks.append(m)
    if not unique:
        total = sum(masks)
        masks = [m / total for m in masks]
    return masks
