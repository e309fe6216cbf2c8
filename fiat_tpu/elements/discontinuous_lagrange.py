"""Discontinuous Lagrange (parity with
/root/reference/FIAT/discontinuous_lagrange.py): all DoFs attached to the
cell interior; points either on the full boundary-including lattice
('broken' numbering with geometric DG orientation permutations) or on
interior point families (gl/gc)."""

import math

import numpy as np

from ..core import cells as cl
from ..core import finite_element, functionals, polyset
from ..core.barycentric import LagrangePolynomialSet, get_lagrange_points
from ..core.dualset import DualSet
from ..core.expansions import mis
from ..core.orientation import make_entity_permutations_simplex
from ..core.variants import parse_lagrange_variant
from .p0 import P0
from itertools import permutations as _permutations


def make_entity_permutations(dim, npoints):
    """Orientation permutations for broken (DG) DoFs, numbered first by
    entity dimension, then entity id, then lexicographically -- so they
    geometrically coincide with the CG DoFs of the same lattice."""
    if npoints <= 0:
        return {o: [] for o in range(math.factorial(dim + 1))}
    a = np.array(sorted(mis(dim + 1, npoints - 1)), dtype=int)[:, ::-1]

    # group key 0: dimension of the entity each lattice point lives on
    g0 = dim - (a == 0).astype(int).sum(axis=1)
    # group key 1: entity id (FIAT numbers facets opposite vertex d as d;
    # vertices run in the opposite order)
    g1 = np.zeros_like(g0)
    for d in range(dim + 1):
        g1 += d * (a[:, d] == 0).astype(int)
    g1[g0 == 0] = -g1[g0 == 0]

    dg_to_lattice = np.lexsort(np.transpose(np.concatenate(
        (a, g1.reshape(-1, 1), g0.reshape(-1, 1)), axis=1)))
    lattice_to_dg = np.empty_like(dg_to_lattice)
    lattice_to_dg[dg_to_lattice] = np.arange(len(dg_to_lattice))

    perms = {}
    for o, index_perm in enumerate(sorted(_permutations(range(dim + 1)))):
        perm = np.lexsort(np.transpose(a[:, index_perm]))
        perms[o] = lattice_to_dg[perm][dg_to_lattice].tolist()
    return perms


class BrokenLagrangeDualSet(DualSet):
    """Lagrange points with every DoF attached to the cell interior."""

    def __init__(self, ref_el, degree, point_variant="equispaced"):
        nodes = []
        entity_ids = {}
        entity_permutations = {}
        top = ref_el.get_topology()
        for dim in sorted(top):
            entity_ids[dim] = {}
            perms = make_entity_permutations(
                dim, degree + 1 if dim == len(top) - 1 else -1)
            entity_permutations[dim] = {}
            for entity in sorted(top[dim]):
                pts = ref_el.make_points(dim, entity, degree, variant=point_variant)
                nodes.extend(functionals.PointEvaluation(ref_el, x) for x in pts)
                entity_ids[dim][entity] = []
                entity_permutations[dim][entity] = perms
        entity_ids[dim][0] = list(range(len(nodes)))
        super().__init__(nodes, ref_el, entity_ids, entity_permutations)


class DiscontinuousLagrangeDualSet(DualSet):
    """Interior point families (gl/gc): one lattice per cell."""

    def __init__(self, ref_el, degree, point_variant="equispaced"):
        nodes = []
        entity_ids = {}
        entity_permutations = {}
        sd = ref_el.get_dimension()
        top = ref_el.get_topology()
        for dim in sorted(top):
            perms = make_entity_permutations_simplex(
                dim, degree + 1 if dim == sd else -1)
            entity_ids[dim] = {e: [] for e in sorted(top[dim])}
            entity_permutations[dim] = {e: perms for e in sorted(top[dim])}
        for entity in top[sd]:
            cur = len(nodes)
            pts = cl.make_lattice(ref_el.get_vertices_of_subcomplex(top[sd][entity]),
                                  degree, variant=point_variant)
            nodes.extend(functionals.PointEvaluation(ref_el, x) for x in pts)
            entity_ids[sd][entity] = list(range(cur, len(nodes)))
        super().__init__(nodes, ref_el, entity_ids, entity_permutations)


class DiscontinuousLagrange(finite_element.CiarletElement):
    """Discontinuous Lagrange; degree 0 degenerates to P0."""

    def __new__(cls, ref_el, degree, variant="equispaced"):
        if degree == 0:
            splitting, _ = parse_lagrange_variant(variant, discontinuous=True)
            if splitting is None and not ref_el.is_macrocell():
                return P0(ref_el)
        return super().__new__(cls)

    def __init__(self, ref_el, degree, variant="equispaced"):
        splitting, point_variant = parse_lagrange_variant(variant, discontinuous=True)
        if splitting is not None:
            ref_el = splitting(ref_el)
        if point_variant in ("equispaced", "gll", "lgc"):
            dual = BrokenLagrangeDualSet(ref_el, degree, point_variant=point_variant)
        else:
            dual = DiscontinuousLagrangeDualSet(ref_el, degree,
                                                point_variant=point_variant)
        if ref_el.shape == cl.LINE:
            points = get_lagrange_points(dual)
            poly_set = LagrangePolynomialSet(ref_el, points)
        else:
            poly_set = polyset.ONPolynomialSet(ref_el, degree)
        formdegree = ref_el.get_spatial_dimension()
        super().__init__(poly_set, dual, degree, formdegree)
