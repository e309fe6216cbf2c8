"""Bernstein element (parity with /root/reference/FIAT/bernstein.py):
non-Ciarlet element whose basis functions are the Bernstein polynomials in
barycentric coordinates; the dual is recovered pointwise."""

import math

import numpy as np

from ..core.cells import make_lattice
from ..core.dualset import DualSet
from ..core.expansions import mis
from ..core.finite_element import FiniteElement
from ..core.pointwise_dual import compute_pointwise_dual


class BernsteinDualSet(DualSet):
    """Entity layout of the Bernstein DoFs (by barycentric multi-index
    support); the nodes themselves are filled by the pointwise dual."""

    def __init__(self, ref_el, degree):
        topology = ref_el.get_topology()
        entity_ids = {dim: {e: [] for e in entities}
                      for dim, entities in topology.items()}
        inverse_topology = {vertices: (dim, e)
                            for dim, entities in topology.items()
                            for e, vertices in entities.items()}
        dim = ref_el.get_spatial_dimension()
        nodes = []
        for i, ks in enumerate(mis(dim + 1, degree)):
            vertices, = np.nonzero(ks)
            entity_dim, entity_i = inverse_topology[tuple(vertices)]
            entity_ids[entity_dim][entity_i].append(i)
            nodes.append(None)
        super().__init__(nodes, ref_el, entity_ids)


class Bernstein(FiniteElement):
    """The Bernstein basis element."""

    def __init__(self, ref_el, degree):
        dual = BernsteinDualSet(ref_el, degree)
        super().__init__(ref_el, dual, degree, 0)
        pts = make_lattice(ref_el.vertices, degree, variant="gll")
        self.dual = compute_pointwise_dual(self, pts)

    def degree(self):
        return self.get_order()

    def value_shape(self):
        return ()

    def tabulate(self, order, points, entity=None):
        ref_el = self.get_reference_element()
        dim = ref_el.get_spatial_dimension()
        if entity is None:
            entity = (dim, 0)
        entity_dim, entity_id = entity
        transform = ref_el.get_entity_transform(entity_dim, entity_id)
        points = np.asarray(points)
        cell_points = transform(points)

        # Cartesian -> barycentric
        vs = np.asarray(ref_el.get_vertices())
        B2R = np.vstack([vs.T, np.ones(len(vs))])
        R2B = np.linalg.inv(B2R)
        B = np.concatenate(
            [cell_points, np.ones((*cell_points.shape[:-1], 1))], axis=-1) @ R2B.T

        deg = self.degree()
        raw = {(alpha, i): vec
               for i, ks in enumerate(mis(dim + 1, deg))
               for o in range(order + 1)
               for alpha, vec in bernstein_Dx(B, ks, o, R2B).items()}

        space_dim = self.space_dimension()
        dtype = np.asarray(list(raw.values())).dtype
        result = {alpha: np.zeros((space_dim, *points.shape[:-1]), dtype=dtype)
                  for o in range(order + 1) for alpha in mis(dim, o)}
        for (alpha, i), vec in raw.items():
            result[alpha][i] = vec
        return result


def bernstein_db(points, ks, alpha=None):
    """Barycentric-derivative D^alpha of the Bernstein monomial B_ks at
    barycentric points."""
    points = np.asarray(points)
    ks = np.asarray(tuple(ks))
    *shp, d_1 = points.shape
    assert d_1 == len(ks)
    if alpha is None:
        alpha = np.zeros(d_1)
    else:
        alpha = np.asarray(tuple(alpha))
    ls = ks - alpha
    if any(k < 0 for k in ls):
        return np.zeros(len(points))
    if all(k == 0 for k in ls):
        return np.ones(len(points))
    coeff = math.factorial(ks.sum())
    for k in ls:
        coeff //= math.factorial(k)
    return coeff * np.prod(points ** ls, axis=-1)


def bernstein_Dx(points, ks, order, R2B):
    """Reference-coordinate derivatives of order ``order`` of the Bernstein
    monomial B_ks, via the chain rule through R2B."""
    points = np.asarray(points)
    ks = tuple(ks)
    *shp, d_1 = points.shape
    assert d_1 == len(ks)

    Db_map = {alpha: bernstein_db(points, ks, alpha)
              for alpha in mis(d_1, order)}
    dtype = np.asarray(list(Db_map.values())).dtype
    Db_shape = (d_1,) * order
    Db_tensor = np.empty(Db_shape + tuple(shp), dtype=dtype)
    for ds in np.ndindex(Db_shape):
        alpha = tuple(map(ds.count, range(d_1)))
        Db_tensor[ds] = Db_map[alpha]

    result = {}
    for alpha in mis(d_1 - 1, order):
        values = Db_tensor
        for d, k in enumerate(alpha):
            for _ in range(k):
                values = R2B[:, d].dot(values)
        result[alpha] = values
    return result
