"""Physical-geometry-aware ("zany") element machinery.

Role parity with /root/reference/finat/physically_mapped.py, TPU-first:
the basis transformation matrix M is assembled as a numpy OBJECT array
whose entries are scalars — python floats for constants, traced jnp
scalars for geometry-dependent entries (the geometry callbacks return
arrays, traced under jit).  Once assembled it is densified and applied
as one dense matmul that XLA folds/fuses; likewise the dual
transformation inverts the *dense* matrix with real linalg.  The
reference needs symbolic cofactor/block-partition inversion because gem
has no linalg; here arrays are values, so only the tiny Jacobian-sized
object matrices (built before densification) keep scalar-level algebra,
done by Leibniz expansion.
"""

from abc import ABCMeta, abstractmethod
from collections.abc import Mapping
from itertools import permutations

import numpy as np

from .citations import cite


def _is_traced(x):
    return type(x).__module__.startswith("jax")


def to_dense(M):
    """Densify an object matrix of (possibly traced) scalars: numpy f64 if
    every entry is static, stacked jnp otherwise.  Real arrays pass
    through untouched."""
    if _is_traced(M):
        return M
    M = np.asarray(M)
    if M.dtype != object:
        return M.astype(np.float64)
    if any(_is_traced(v) for v in M.flat):
        import jax.numpy as jnp
        return jnp.stack([jnp.stack([jnp.asarray(v, dtype=jnp.float64)
                                     for v in row]) for row in M])
    return M.astype(np.float64)


class NeedsCoordinateMappingElement(metaclass=ABCMeta):
    """Elements that require physical information to map or construct
    their basis."""

    def dual_transformation(self, Q, coordinate_mapping=None):
        raise NotImplementedError(
            f"Dual evaluation for {type(self).__name__} is not implemented.")


class MappedTabulation(Mapping):
    """Lazy tabulation view applying a (dense, row-restricted) basis
    transformation per requested derivative table."""

    def __init__(self, M, ref_tabulation, indices=None):
        M = to_dense(M)
        self.M = M if indices is None else M[list(indices)]
        self.tables = ref_tabulation
        self._cache = {}

    def __getitem__(self, alpha):
        if alpha not in self._cache:
            table = self.tables[alpha]
            xp = np
            if _is_traced(table) or _is_traced(self.M):
                import jax.numpy as xp
            self._cache[alpha] = xp.tensordot(self.M, xp.asarray(table),
                                              axes=(1, 0))
        return self._cache[alpha]

    def __iter__(self):
        return iter(self.tables)

    def __len__(self):
        return len(self.tables)


class PhysicallyMappedElement(NeedsCoordinateMappingElement):
    """Mixin applying a physical basis transformation to tabulations."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        for paper in ("Kirby2018zany", "Kirby2019zany"):
            cite(paper)
        self.restriction_indices = None

    @abstractmethod
    def basis_transformation(self, coordinate_mapping):
        """Object matrix M (entries: floats or traced scalars)."""

    def map_tabulation(self, ref_tabulation, coordinate_mapping):
        assert coordinate_mapping is not None
        return MappedTabulation(self.basis_transformation(coordinate_mapping),
                                ref_tabulation,
                                indices=self.restriction_indices)

    def basis_evaluation(self, order, ps, entity=None, coordinate_mapping=None):
        return self.map_tabulation(
            super().basis_evaluation(order, ps, entity=entity),
            coordinate_mapping)

    def dual_transformation(self, Q, coordinate_mapping=None):
        """Dual weights transform by inv(M).T — computed densely: constrained
        columns (beyond the square part) drop first, then one real matrix
        inverse instead of the reference's symbolic block inversion."""
        M = to_dense(self.basis_transformation(coordinate_mapping))
        square = M[:, :M.shape[0]]
        if _is_traced(square):
            import jax.numpy as xp
        else:
            xp = np
        M_dual = xp.linalg.inv(xp.transpose(square))
        keep = self.restriction_indices
        if keep is not None:
            M_dual = M_dual[list(keep)][:, list(keep)]
        return MappedTabulation(M_dual, {None: Q})[None]


class DirectlyDefinedElement(NeedsCoordinateMappingElement):
    """Elements defined directly in physical space (direct serendipity)."""


class PhysicalGeometry(metaclass=ABCMeta):
    """Geometry callback protocol: each method returns an ARRAY (numpy for
    static geometry, traced jnp under jit)."""

    @abstractmethod
    def cell_size(self):
        """Cell size at each vertex, shape (nvertex,)."""

    @abstractmethod
    def jacobian_at(self, point):
        """Jacobian of physical coordinates at a reference point,
        shape (gdim, tdim)."""

    @abstractmethod
    def detJ_at(self, point):
        """Jacobian determinant at a reference point (scalar)."""

    @abstractmethod
    def reference_normals(self):
        """Unit reference facet normals, shape (nfacet, tdim)."""

    @abstractmethod
    def physical_normals(self):
        """Unit physical facet normals, shape (nfacet, gdim)."""

    @abstractmethod
    def physical_tangents(self):
        """Unit physical facet tangents, shape (nfacet, gdim)."""

    @abstractmethod
    def physical_edge_lengths(self):
        """Physical edge lengths, shape (nfacet,)."""

    @abstractmethod
    def physical_points(self, point_set, entity=None):
        """Physical locations of reference points, shape
        points_shape + (gdim,)."""

    @abstractmethod
    def physical_vertices(self):
        """Physical vertex locations, shape (nvertex, gdim)."""

    def normalized_reference_edge_tangents(self):
        """Unit reference edge tangents, shape (nedge, tdim)."""
        raise NotImplementedError(
            f"normalized_reference_edge_tangents not provided by {type(self)}")


# -- scalar-level algebra for tiny (Jacobian-sized) object matrices ----------
#
# Only determinants/adjugates of 2x2 and 3x3 geometry matrices are ever
# formed symbolically (inside basis_transformation assembly, before
# densification), so Leibniz expansion over signed permutations is both
# the simplest and an exactly-sized algorithm.

def identity(*shape):
    V = np.empty(shape * 2 if len(shape) == 1 else shape, dtype=object)
    for ij in np.ndindex(V.shape):
        V[ij] = 1.0 if ij[0] == ij[1] else 0.0
    return V


def _signed_perms(n):
    for p in permutations(range(n)):
        inversions = sum(a > b for k, a in enumerate(p) for b in p[k + 1:])
        yield (-1.0) ** inversions, p


def determinant(A):
    """det(A) by Leibniz expansion (entries are scalars, n is tiny)."""
    n = A.shape[0]
    det = 1.0 if n == 0 else 0.0
    for sgn, p in _signed_perms(n):
        term = sgn
        for row, col in enumerate(p):
            term = term * A[row, col]
        det = det + term
    return det


def adjugate(A):
    """adj(A), via the entrywise derivative of the Leibniz sum:
    d det / dA[i, j] is the (i, j) cofactor, i.e. adj(A)[j, i]."""
    n = A.shape[0]
    C = np.full((n, n), 0.0, dtype=object)
    for sgn, p in _signed_perms(n):
        for hole in range(n):
            term = sgn
            for row, col in enumerate(p):
                if row != hole:
                    term = term * A[row, col]
            C[p[hole], hole] = C[p[hole], hole] + term
    return C
