"""Point set abstractions for the symbolic element layer.

Parity with /root/reference/finat/point_set.py, TPU-first: where FInAT
attaches GEM free indices and expressions, a fiat_tpu point set carries an
ARRAY of points -- static numpy for compile-time-known points, or a traced
jnp array (``UnknownPointSet``) for runtime points inside ``jax.jit``.  The
"expression" of a point set is the array itself; structure (tensor product,
facet batches) lives in ``points_shape``.
"""

import abc
import hashlib
from functools import cached_property
from itertools import chain, product

import numpy as np


class AbstractPointSet(abc.ABC):
    """A set of evaluation points, possibly structured.

    ``points`` has shape points_shape + (dimension,)."""

    def __hash__(self):
        return int.from_bytes(hashlib.md5(repr(self).encode()).digest(),
                              byteorder="big")

    @abc.abstractmethod
    def __repr__(self):
        pass

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


class PointSingleton(AbstractPointSet):
    """A single point; tabulations have no point axis."""

    def __init__(self, point):
        point = np.asarray(point) if not _is_traced(point) else point
        assert len(point.shape) == 1
        self.point = point

    def __repr__(self):
        return f"{type(self).__name__}({self.point!r})"

    @cached_property
    def points(self):
        return self.point.reshape(1, -1)

    @property
    def points_shape(self):
        return ()


class PointSet(AbstractPointSet):
    """An unstructured vector of known points."""

    def __init__(self, points):
        points = np.asarray(points) if not _is_traced(points) else points
        assert len(points.shape) == 2
        self._points = points

    def __repr__(self):
        return f"{type(self).__name__}({self._points!r})"

    @property
    def points(self):
        return self._points

    def almost_equal(self, other, tolerance=1e-12):
        return (type(self) is type(other)
                and self.points.shape == other.points.shape
                and not _is_traced(self.points) and not _is_traced(other.points)
                and np.allclose(self.points, other.points, rtol=0, atol=tolerance))


class UnknownPointSet(PointSet):
    """Runtime points: a traced jnp array flowing through jit.  Tabulating
    an element on an UnknownPointSet builds the XLA graph for tabulation at
    runtime points (the role of FInAT's runtime gem.Variable points)."""

    def __init__(self, points_expr):
        assert len(points_expr.shape) == 2
        self._points = points_expr

    def __repr__(self):
        return f"{type(self).__name__}(shape={self._points.shape})"

    def almost_equal(self, other, tolerance=1e-12):
        return self is other


class GaussLegendrePointSet(PointSet):
    """Tagged interval Gauss-Legendre points (spectral DG shortcut)."""

    def __init__(self, points):
        super().__init__(points)
        assert self.points.shape[1] == 1


class GaussLobattoLegendrePointSet(PointSet):
    """Tagged interval GLL points (spectral CG shortcut)."""

    def __init__(self, points):
        super().__init__(points)
        assert self.points.shape[1] == 1


class KMVPointSet(PointSet):
    """Tagged KMV lumped points on a simplex."""


class TensorPointSet(AbstractPointSet):
    """Product-structured points: the TP tabulation path evaluates each
    factor on its own axis (explicit sum factorisation)."""

    def __init__(self, factors):
        self.factors = tuple(factors)

    def __repr__(self):
        return f"{type(self).__name__}({self.factors!r})"

    @cached_property
    def points(self):
        return np.asarray([list(chain(*pt_tuple))
                           for pt_tuple in product(*[ps.points
                                                     for ps in self.factors])])

    @property
    def points_shape(self):
        return tuple(chain(*[ps.points_shape for ps in self.factors]))

    def almost_equal(self, other, tolerance=1e-12):
        return (type(self) is type(other)
                and len(self.factors) == len(other.factors)
                and all(s.almost_equal(o, tolerance=tolerance)
                        for s, o in zip(self.factors, other.factors)))


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
        def to_int(x):
            return sum(x) if isinstance(x, tuple) else x
        top = self.cell.topology
        return [(dim, entity)
                for dim in sorted(top)
                for entity in sorted(top[dim])
                if to_int(dim) == self.ps.dimension]

    @cached_property
    def points(self):
        ref_pts = self.ps.points
        pts = [self.cell.get_entity_transform(dim, entity)(ref_pts)
               for dim, entity in self.entities]
        return np.concatenate(pts)

    @property
    def points_shape(self):
        return (len(self.entities),) + self.ps.points_shape

    def almost_equal(self, other, tolerance=1e-12):
        return (type(self) is type(other) and self.cell == other.cell
                and self.ps.almost_equal(other.ps, tolerance=tolerance))


def _is_traced(x):
    """Is x a traced/jax array (as opposed to host numpy)?"""
    return type(x).__module__.startswith("jax")


def flat_points(ps):
    """The (N, dim) flattened point array of any point set."""
    pts = ps.points
    # explicit leading size: reshape(-1, 0) is ambiguous for 0-dim cells
    npts = int(np.prod(pts.shape[:-1], dtype=int))
    return pts.reshape(npts, pts.shape[-1])
