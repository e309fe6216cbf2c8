"""Physical-geometry-aware ("zany") element machinery.

Parity with /root/reference/finat/physically_mapped.py, TPU-first: the
basis transformation matrix M is built as a numpy OBJECT array whose
entries are scalars -- python floats for constants, traced jnp scalars for
geometry-dependent entries (the geometry callbacks return arrays, traced
under jit).  Applying M to a tabulation is then one dense matmul that XLA
folds/fuses; the reference's hand-rolled sparse matvec over gem nodes is
unnecessary on the MXU.
"""

from abc import ABCMeta, abstractmethod
from collections.abc import Mapping

import numpy as np

from .citations import cite


def _is_traced(x):
    return type(x).__module__.startswith("jax")


def _is_zero(x):
    return isinstance(x, (int, float)) and x == 0


def to_dense(M):
    """Convert an object matrix of (possibly traced) scalars into a dense
    array: numpy if all entries are static, stacked jnp otherwise."""
    M = np.asarray(M, dtype=object)
    if any(_is_traced(v) for v in M.flat):
        import jax.numpy as jnp
        rows = [jnp.stack([jnp.asarray(v, dtype=jnp.float64) for v in row])
                for row in M]
        return jnp.stack(rows)
    return M.astype(np.float64)


class NeedsCoordinateMappingElement(metaclass=ABCMeta):
    """Elements that require physical information to map or construct
    their basis."""

    def dual_transformation(self, Q, coordinate_mapping=None):
        raise NotImplementedError(
            f"Dual evaluation for {type(self).__name__} is not implemented.")


class MappedTabulation(Mapping):
    """Lazy tabulation dict applying the basis transformation per requested
    derivative: result[alpha] = M @ ref[alpha] (a dense [n x n] matmul)."""

    def __init__(self, M, ref_tabulation, indices=None):
        self.M = to_dense(M)
        self.ref_tabulation = ref_tabulation
        if indices is None:
            indices = list(range(self.M.shape[0]))
        self.indices = indices
        self._cache = {}

    def matvec(self, table):
        M = self.M[self.indices]
        if _is_traced(table) or _is_traced(M):
            import jax.numpy as jnp
            return jnp.tensordot(M, jnp.asarray(table), (1, 0))
        return np.tensordot(M, table, (1, 0))

    def __getitem__(self, alpha):
        try:
            return self._cache[alpha]
        except KeyError:
            result = self.matvec(self.ref_tabulation[alpha])
            return self._cache.setdefault(alpha, result)

    def __iter__(self):
        return iter(self.ref_tabulation)

    def __len__(self):
        return len(self.ref_tabulation)


class PhysicallyMappedElement(NeedsCoordinateMappingElement):
    """Mixin applying a physical basis transformation to tabulations."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        cite("Kirby2018zany")
        cite("Kirby2019zany")
        self.restriction_indices = None

    @abstractmethod
    def basis_transformation(self, coordinate_mapping):
        """Object matrix M (entries: floats or traced scalars)."""

    def map_tabulation(self, ref_tabulation, coordinate_mapping):
        assert coordinate_mapping is not None
        M = self.basis_transformation(coordinate_mapping)
        return MappedTabulation(M, ref_tabulation,
                                indices=self.restriction_indices)

    def basis_evaluation(self, order, ps, entity=None, coordinate_mapping=None):
        result = super().basis_evaluation(order, ps, entity=entity)
        return self.map_tabulation(result, coordinate_mapping)

    def dual_transformation(self, Q, coordinate_mapping=None):
        M = np.asarray(self.basis_transformation(coordinate_mapping),
                       dtype=object)
        if M.shape[1] > M.shape[0]:
            M = M[:, :M.shape[0]]
        M_dual = inverse(M.T)
        if self.restriction_indices is not None:
            indices = self.restriction_indices
            M_dual = M_dual[np.ix_(indices, indices)]
        key = None
        return MappedTabulation(M_dual, {key: Q})[key]


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


# -- object-matrix linear algebra over (possibly traced) scalars -------------

def identity(*shape):
    V = np.eye(*shape, dtype=object)
    for idx in np.ndindex(V.shape):
        V[idx] = 0.0 if V[idx] == 0 else 1.0
    return V


def determinant(A):
    """Determinant by cofactor expansion (entries are scalars)."""
    n = A.shape[0]
    if n == 0:
        return 1
    if n == 1:
        return A[0, 0]
    if n == 2:
        return A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    detA = A[0, 0] * determinant(A[1:, 1:])
    cols = np.ones(A.shape[1], dtype=bool)
    for j in range(1, n):
        cols[j] = False
        detA += (-1) ** j * A[0, j] * determinant(A[1:][:, cols])
        cols[j] = True
    return detA


def adjugate(A):
    A = np.asarray(A)
    C = np.zeros_like(A)
    rows = np.ones(A.shape[0], dtype=bool)
    cols = np.ones(A.shape[1], dtype=bool)
    for i in range(A.shape[0]):
        rows[i] = False
        for j in range(A.shape[1]):
            cols[j] = False
            C[j, i] = (-1) ** (i + j) * determinant(A[rows, :][:, cols])
            cols[j] = True
        rows[i] = True
    return C


def inverse(A):
    """Inverse of an object matrix, exploiting block-diagonal structure
    with repeated blocks (symbolic sparsity on the zero entries)."""
    m, n = A.shape
    if m != n:
        raise ValueError("A must be square.")
    M = A.copy()
    candidates = set(range(m))
    while candidates:
        seed = {min(candidates)}
        while True:
            ids = set(seed)
            for i in seed:
                ids.update(j for j in candidates if not _is_zero(M[j, i]))
                ids.update(j for j in candidates if not _is_zero(M[i, j]))
            if len(ids) == len(seed):
                break
            seed = ids
        candidates -= ids
        ids = sorted(ids)
        Mii = M[np.ix_(ids, ids)]
        Minv = adjugate(Mii) / determinant(Mii)
        M[np.ix_(ids, ids)] = Minv
    return M
