"""Quadrature for the symbolic layer (parity with
/root/reference/finat/quadrature.py): tensor-product aware rule
construction with spectrally-tagged point sets; weights are plain arrays
(product-structured for TP rules)."""

import hashlib
from abc import ABCMeta, abstractmethod
from functools import cached_property, reduce

import numpy as np

from ..core import cells as cl
from ..core.quadrature import GaussLegendreQuadratureLineRule
from ..core.quadrature_schemes import create_quadrature as fiat_scheme
from .point_set import (GaussLegendrePointSet, GaussLobattoLegendrePointSet,
                        KMVPointSet, PointSet, TensorPointSet)


def make_quadrature(ref_el, degree, scheme="default"):
    """A rule exact to ``degree`` with the appropriately tagged point set
    (tensor products of rules on tensor-product cells)."""
    if ref_el.get_shape() == cl.TENSORPRODUCT:
        try:
            degree = tuple(degree)
        except TypeError:
            degree = (degree,) * len(ref_el.cells)
        assert len(ref_el.cells) == len(degree)
        quad_rules = [make_quadrature(c, d, scheme)
                      for c, d in zip(ref_el.cells, degree)]
        return TensorProductQuadratureRule(quad_rules, ref_el=ref_el)

    if ref_el.get_shape() == cl.QUADRILATERAL:
        return make_quadrature(ref_el.product, degree, scheme)

    if degree < 0:
        raise ValueError(f"Need positive degree, not {degree}")

    if scheme.lower() in {"kmv", "lump"}:
        fiat_rule = fiat_scheme(ref_el, degree, "KMV")
        if ref_el.get_shape() == cl.LINE:
            point_set = GaussLobattoLegendrePointSet(fiat_rule.get_points())
        else:
            point_set = KMVPointSet(fiat_rule.get_points())
    elif ref_el.get_shape() == cl.LINE and not ref_el.is_macrocell():
        num_points = (degree + 2) // 2
        fiat_rule = GaussLegendreQuadratureLineRule(ref_el, num_points)
        point_set = GaussLegendrePointSet(fiat_rule.get_points())
    else:
        fiat_rule = fiat_scheme(ref_el, degree, scheme)
        point_set = PointSet(fiat_rule.get_points())

    return QuadratureRule(
        point_set, fiat_rule.get_weights(), ref_el=ref_el,
        io_ornt_map_tuple=fiat_rule._intrinsic_orientation_permutation_map_tuple)


class AbstractQuadratureRule(metaclass=ABCMeta):
    """A point set plus weights."""

    def __hash__(self):
        return int.from_bytes(hashlib.md5(repr(self).encode()).digest(),
                              byteorder="big")

    def __eq__(self, other):
        return type(other) is type(self) and repr(other) == repr(self)

    @abstractmethod
    def __repr__(self):
        pass

    @property
    @abstractmethod
    def point_set(self):
        pass

    @property
    @abstractmethod
    def weight_expression(self):
        """Weights array, shaped like the point set's points_shape."""

    @cached_property
    def extrinsic_orientation_permutation_map(self):
        if self.ref_el is None:
            raise ValueError("Must set ref_el")
        return self.ref_el.extrinsic_orientation_permutation_map

    @cached_property
    def intrinsic_orientation_permutation_map_tuple(self):
        if any(m is None for m in self._intrinsic_orientation_permutation_map_tuple):
            raise ValueError("intrinsic orientation maps not set")
        return self._intrinsic_orientation_permutation_map_tuple


class QuadratureRule(AbstractQuadratureRule):
    """An unstructured rule."""

    def __init__(self, point_set, weights, ref_el=None, io_ornt_map_tuple=(None,)):
        weights = np.asarray(weights)
        assert len(point_set.points) == len(weights)
        self.ref_el = ref_el
        self.point_set = point_set
        self.weights = weights
        self._intrinsic_orientation_permutation_map_tuple = io_ornt_map_tuple

    def __repr__(self):
        return (f"{type(self).__name__}({self.point_set!r}, {self.weights!r}, "
                f"{self.ref_el!r})")

    @cached_property
    def point_set(self):
        pass  # set at initialisation

    @property
    def weight_expression(self):
        return self.weights


class TensorProductQuadratureRule(AbstractQuadratureRule):
    """A product of rules; weights stay factored (outer product applied
    lazily, so integrations can ride the factored structure)."""

    def __init__(self, factors, ref_el=None):
        self.ref_el = ref_el
        self.factors = tuple(factors)
        self._intrinsic_orientation_permutation_map_tuple = tuple(
            m for factor in factors
            for m in factor._intrinsic_orientation_permutation_map_tuple)

    def __repr__(self):
        return f"{type(self).__name__}({self.factors!r}, {self.ref_el!r})"

    @cached_property
    def point_set(self):
        return TensorPointSet(q.point_set for q in self.factors)

    @property
    def weight_expression(self):
        """Dense outer product of the factor weights (points_shape)."""
        ws = [np.asarray(q.weight_expression) for q in self.factors]
        return reduce(np.multiply.outer, ws)

    @property
    def factor_weights(self):
        """The factored weights, one vector per factor."""
        return tuple(q.weight_expression for q in self.factors)
