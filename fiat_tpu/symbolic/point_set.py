"""Point set abstractions for the symbolic element layer.

Role parity with /root/reference/finat/point_set.py, TPU-first: where
FInAT attaches GEM free indices and expressions, a fiat_tpu point set
carries an ARRAY of points — static numpy for compile-time-known points,
or a traced jnp array (``UnknownPointSet``) for runtime points inside
``jax.jit``.  The "expression" of a point set is the array itself;
structure (tensor product, facet batches) lives in ``points_shape``.

Design notes vs the reference: equality/matching goes through one
``almost_equal`` protocol on the base class with a per-subclass
``_matches`` hook; the tensor-product point grid is built by iterated
kron-style repeat/tile instead of a python cartesian product; the tagged
spectral point families are stamped out from a name list."""

import abc
import zlib
from functools import cached_property

import numpy as np


def _is_traced(x):
    """Is x a traced/jax array (as opposed to host numpy)?"""
    return type(x).__module__.startswith("jax")


def flat_points(ps):
    """The (N, dim) flattened point array of any point set."""
    pts = ps.points
    # explicit leading size: reshape(-1, 0) is ambiguous for 0-dim cells
    npts = int(np.prod(pts.shape[:-1], dtype=int))
    return pts.reshape(npts, pts.shape[-1])


class AbstractPointSet(abc.ABC):
    """A set of evaluation points, possibly structured.

    ``points`` has shape points_shape + (dimension,)."""

    @abc.abstractmethod
    def __repr__(self):
        pass

    def __hash__(self):
        # deterministic across processes (feeds persistent cache keys)
        return zlib.crc32(repr(self).encode())

    @property
    @abc.abstractmethod
    def points(self):
        """Array of points, shape (num points, point dimension)."""

    @property
    def dimension(self):
        return self.points.shape[-1]

    @property
    def points_shape(self):
        """The structural shape of the point batch (excluding the
        coordinate axis); tabulations carry these as trailing axes."""
        return self.points.shape[:-1]

    @property
    def expression(self):
        """The points array itself (the TPU-native 'symbolic' form)."""
        return self.points

    def almost_equal(self, other, tolerance=1e-12):
        """Same structure and (numerically) the same points."""
        return type(self) is type(other) and self._matches(other, tolerance)

    def _matches(self, other, tol):
        mine, theirs = self.points, other.points
        return (mine.shape == theirs.shape
                and not _is_traced(mine) and not _is_traced(theirs)
                and np.allclose(mine, theirs, rtol=0, atol=tol))


class PointSingleton(AbstractPointSet):
    """A single point; tabulations have no point axis."""

    def __init__(self, point):
        if not _is_traced(point):
            point = np.asarray(point)
        assert point.ndim == 1
        self.point = point

    def __repr__(self):
        return f"{type(self).__name__}({self.point!r})"

    @cached_property
    def points(self):
        return self.point.reshape(1, -1)

    points_shape = ()


class PointSet(AbstractPointSet):
    """An unstructured vector of known points."""

    def __init__(self, points):
        if not _is_traced(points):
            points = np.asarray(points)
        assert points.ndim == 2
        self._points = points

    def __repr__(self):
        return f"{type(self).__name__}({self._points!r})"

    @property
    def points(self):
        return self._points


class UnknownPointSet(PointSet):
    """Runtime points: a traced jnp array flowing through jit.  Tabulating
    an element on an UnknownPointSet builds the XLA graph for tabulation at
    runtime points (the role of FInAT's runtime gem.Variable points)."""

    def __init__(self, points_expr):
        assert points_expr.ndim == 2
        self._points = points_expr

    def __repr__(self):
        return f"{type(self).__name__}(shape={self._points.shape})"

    def almost_equal(self, other, tolerance=1e-12):
        return self is other


class KMVPointSet(PointSet):
    """Tagged KMV lumped points on a simplex."""


class _IntervalPointSet(PointSet):
    """Tagged 1D point family (spectral-identity shortcut marker)."""

    def __init__(self, points):
        super().__init__(points)
        assert self.dimension == 1


class GaussLegendrePointSet(_IntervalPointSet):
    """Tagged interval Gauss-Legendre points (spectral DG shortcut)."""


class GaussLobattoLegendrePointSet(_IntervalPointSet):
    """Tagged interval GLL points (spectral CG shortcut)."""


class TensorPointSet(AbstractPointSet):
    """Product-structured points: the TP tabulation path evaluates each
    factor on its own axis (explicit sum factorisation)."""

    def __init__(self, factors):
        self.factors = tuple(factors)

    def __repr__(self):
        return f"{type(self).__name__}({self.factors!r})"

    @cached_property
    def points(self):
        """Full grid by iterated repeat/tile: rows of the running grid
        repeat over each new factor's rows, coordinates concatenate."""
        grid = np.zeros((1, 0))
        for factor in self.factors:
            rows = flat_points(factor)
            grid = np.hstack([np.repeat(grid, len(rows), axis=0),
                              np.tile(rows, (len(grid), 1))])
        return grid

    @property
    def points_shape(self):
        return sum((f.points_shape for f in self.factors), ())

    def _matches(self, other, tol):
        return (len(self.factors) == len(other.factors)
                and all(a.almost_equal(b, tolerance=tol)
                        for a, b in zip(self.factors, other.factors)))


class FacetPointSet(AbstractPointSet):
    """A reference point set mapped onto every same-dimension facet;
    tabulations get a leading facet axis in their point shape."""

    def __init__(self, cell, ps):
        self.cell = cell
        self.ps = ps

    def __repr__(self):
        return f"{type(self).__name__}({self.ps!r})"

    @cached_property
    def entities(self):
        """All (dim, entity) of the cell whose dimension matches the
        reference points (TP dims count by their sum)."""
        want = self.ps.dimension
        return [(dim, ent)
                for dim, ents in sorted(self.cell.topology.items())
                for ent in sorted(ents)
                if (sum(dim) if isinstance(dim, tuple) else dim) == want]

    @cached_property
    def points(self):
        ref = self.ps.points
        return np.concatenate([self.cell.get_entity_transform(*e)(ref)
                               for e in self.entities])

    @property
    def points_shape(self):
        return (len(self.entities),) + self.ps.points_shape

    def _matches(self, other, tol):
        return (self.cell == other.cell
                and self.ps.almost_equal(other.ps, tolerance=tol))
