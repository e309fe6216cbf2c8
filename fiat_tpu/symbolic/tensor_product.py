"""Symbolic tensor-product elements (parity with
/root/reference/finat/tensor_product.py).

THE sum-factorisation structure: each factor tabulates on its own point
axis and the merged tabulation is a single einsum outer product.  Written
as whole-array contractions, XLA keeps the factored form when the
tabulation is consumed inside jit (the role of FInAT's gem products +
TSFC's sum factorisation)."""

from itertools import chain, product
from operator import methodcaller

import numpy as np

from .. import elements as fe_numeric
from ..core.cells import TensorProductCell
from ..core.expansions import mis
from ..core.orientation import make_entity_permutations_tensorproduct
from .base import FiniteElementBase
from .point_set import PointSet, PointSingleton, TensorPointSet, _is_traced


def _xp(*arrays):
    if any(_is_traced(a) for a in arrays):
        import jax.numpy as jnp
        return jnp
    return np


class TensorProductElement(FiniteElementBase):

    def __init__(self, factors):
        super().__init__()
        self.factors = tuple(factors)
        shapes = [fe.value_shape for fe in self.factors if fe.value_shape != ()]
        if len(shapes) == 0:
            self._value_shape = ()
        elif len(shapes) == 1:
            self._value_shape = shapes[0]
        else:
            raise NotImplementedError("Only one nonscalar factor permitted!")

    @property
    def cell(self):
        return TensorProductCell(*(fe.cell for fe in self.factors))

    @property
    def complex(self):
        return TensorProductCell(*(fe.complex for fe in self.factors))

    @property
    def degree(self):
        return tuple(fe.degree for fe in self.factors)

    @property
    def formdegree(self):
        if any(fe.formdegree is None for fe in self.factors):
            return None
        return sum(fe.formdegree for fe in self.factors)

    def entity_dofs(self):
        try:
            return self._entity_dofs_cache
        except AttributeError:
            self._entity_dofs_cache = productise(self.factors,
                                                 methodcaller("entity_dofs"))
            return self._entity_dofs_cache

    def entity_support_dofs(self):
        return productise(self.factors, methodcaller("entity_support_dofs"))

    @property
    def entity_permutations(self):
        return compose_permutations(self.factors)

    def space_dimension(self):
        return int(np.prod([fe.space_dimension() for fe in self.factors]))

    @property
    def index_shape(self):
        return tuple(chain.from_iterable(fe.index_shape for fe in self.factors))

    @property
    def value_shape(self):
        return self._value_shape

    @property
    def fiat_equivalent(self):
        A, B = self.factors
        return fe_numeric.TensorProductElement(A.fiat_equivalent,
                                               B.fiat_equivalent)

    def _factor_entity(self, entity):
        if entity is None:
            entity = (self.cell.get_dimension(), 0)
        entity_dim, entity_id = entity
        assert isinstance(entity_dim, tuple)
        assert len(entity_dim) == len(self.factors)
        shape = tuple(len(c.get_topology()[d])
                      for c, d in zip(self.cell.cells, entity_dim))
        return list(zip(entity_dim, np.unravel_index(entity_id, shape)))

    def _merge_evaluations(self, factor_results, shared_points):
        """Outer-product the factor tabulations.

        :arg shared_points: True when all factors were evaluated at the SAME
            point axis (unstructured points split by coordinate); False for
            a TensorPointSet (each factor has its own point axis)."""
        dimension = self.cell.get_spatial_dimension()
        order = max(map(sum, chain(*factor_results)))
        dim_slices = TensorProductCell._split_slices(
            [c.get_spatial_dimension() for c in self.cell.cells])

        n_idx = [len(fe.index_shape) for fe in self.factors]
        n_val = [len(fe.value_shape) for fe in self.factors]

        result = {}
        for derivative in range(order + 1):
            for Delta in mis(dimension, derivative):
                deltas = [Delta[s] for s in dim_slices]
                tabs = [fr[delta] for fr, delta in zip(factor_results, deltas)]
                result[Delta] = _outer_merge(tabs, n_idx, n_val, shared_points)
        return result

    def basis_evaluation(self, order, ps, entity=None, coordinate_mapping=None):
        entities = self._factor_entity(entity)
        entity_dim, _ = zip(*entities)
        ps_factors = factor_point_set(self.cell, entity_dim, ps)
        shared_points = not (isinstance(ps, TensorPointSet)
                             and len(self.cell.cells) == len(ps.factors))
        factor_results = [fe.basis_evaluation(order, ps_, e)
                          for fe, ps_, e in zip(self.factors, ps_factors,
                                                entities)]
        return self._merge_evaluations(factor_results, shared_points)

    def point_evaluation(self, order, point, entity=None,
                         coordinate_mapping=None):
        entities = self._factor_entity(entity)
        entity_dim, _ = zip(*entities)
        point_dims = [cell.construct_subelement(dim).get_spatial_dimension()
                      for cell, dim in zip(self.cell.cells, entity_dim)]
        assert point.shape == (sum(point_dims),)
        slices = TensorProductCell._split_slices(point_dims)
        factor_results = [fe.point_evaluation(order, point[s], e)
                          for fe, s, e in zip(self.factors, slices, entities)]
        return self._merge_evaluations(factor_results, shared_points=True)

    @property
    def dual_basis(self):
        qs, pss = zip(*(factor.dual_basis for factor in self.factors))
        ps = TensorPointSet(pss)
        # Q factors have shape (idx_f..., npts_f, vshape_f...); merged
        # Q: (idx..., npts..., vshape...)
        xp = _xp(*qs)
        n_idx = [len(fe.index_shape) for fe in self.factors]
        n_val = [len(fe.value_shape) for fe in self.factors]
        letters = iter("abcdefghijklmnopqrstuvwxyz")
        specs, out_idx, out_pts, out_val = [], [], [], []
        for q, ni, nv, fss in zip(qs, n_idx, n_val, pss):
            npts_axes = len(fss.points_shape)
            idx = [next(letters) for _ in range(ni)]
            pts = [next(letters) for _ in range(npts_axes)]
            val = [next(letters) for _ in range(nv)]
            specs.append("".join(idx + pts + val))
            out_idx += idx
            out_pts += pts
            out_val += val
        spec = ",".join(specs) + "->" + "".join(out_idx + out_pts + out_val)
        Q = xp.einsum(spec, *qs)
        return Q, ps

    @property
    def mapping(self):
        mappings = [fe.mapping for fe in self.factors if fe.mapping != "affine"]
        if len(mappings) == 0:
            return "affine"
        if len(mappings) == 1:
            return mappings[0]
        return None


def _outer_merge(tabs, n_idx, n_val, shared_points):
    """einsum the factor tables (idx_f..., val_f..., pts_f...) into
    (idx..., val..., pts...)."""
    xp = _xp(*tabs)
    letters = iter("abcdefghijklmnopqrstuvwxyz")
    shared = next(letters) if shared_points else None
    specs, out_idx, out_val, out_pts = [], [], [], []
    for tab, ni, nv in zip(tabs, n_idx, n_val):
        n_pts_axes = len(tab.shape) - ni - nv
        idx = [next(letters) for _ in range(ni)]
        val = [next(letters) for _ in range(nv)]
        if shared_points:
            assert n_pts_axes in (0, 1)
            pts = [shared] * n_pts_axes
        else:
            pts = [next(letters) for _ in range(n_pts_axes)]
            out_pts += pts
        specs.append("".join(idx + val + pts))
        out_idx += idx
        out_val += val
    if shared_points:
        # the point axis is shared across factors (may be absent for
        # PointSingleton tabs)
        out_pts = [shared] if any(s.endswith(shared) for s in specs) else []
    spec = ",".join(specs) + "->" + "".join(out_idx + out_val + out_pts)
    return xp.einsum(spec, *tabs)


def productise(factors, method):
    """Tensor-product entity-dof maps across factors."""
    shape = tuple(fe.space_dimension() for fe in factors)
    dofs = {}
    for dim in product(*[fe.cell.get_topology().keys() for fe in factors]):
        dim_dofs = []
        topds = [method(fe)[d] for fe, d in zip(factors, dim)]
        for tuple_ei in product(*[sorted(topd) for topd in topds]):
            tuple_vs = list(product(*[topd[ei]
                                      for topd, ei in zip(topds, tuple_ei)]))
            if tuple_vs:
                vs = list(np.ravel_multi_index(np.transpose(tuple_vs), shape))
                dim_dofs.append((tuple_ei, vs))
            else:
                dim_dofs.append((tuple_ei, []))
        dofs[dim] = dict(enumerate(v for k, v in sorted(dim_dofs)))
    return dofs


def compose_permutations(factors):
    """Compose factor orientation-permutation maps (extrinsic axis swaps x
    intrinsic factor orientations)."""
    permutations = {}
    cells = [fe.cell for fe in factors]
    for dim in product(*[cell.get_topology().keys() for cell in cells]):
        dim_permutations = []
        e_o_p_maps = [fe.entity_permutations[d] for fe, d in zip(factors, dim)]
        for e_tuple in product(*[sorted(m) for m in e_o_p_maps]):
            o_p_maps = [m[e] for m, e in zip(e_o_p_maps, e_tuple)]
            o_tuple_perm_map = make_entity_permutations_tensorproduct(
                cells, dim, o_p_maps)
            dim_permutations.append((e_tuple, o_tuple_perm_map))
        permutations[dim] = dict(enumerate(v for k, v in
                                           sorted(dim_permutations)))
    return permutations


def factor_point_set(product_cell, product_dim, point_set):
    """Split a point set across the factor cells."""
    assert len(product_cell.cells) == len(product_dim)
    point_dims = [cell.construct_subelement(dim).get_spatial_dimension()
                  for cell, dim in zip(product_cell.cells, product_dim)]

    if isinstance(point_set, TensorPointSet) and \
            len(product_cell.cells) == len(point_set.factors):
        assert all(ps.dimension == dim
                   for ps, dim in zip(point_set.factors, point_dims))
        return point_set.factors

    assert point_set.dimension == sum(point_dims)
    slices = TensorProductCell._split_slices(point_dims)
    if isinstance(point_set, PointSingleton):
        return [PointSingleton(point_set.point[s]) for s in slices]
    if isinstance(point_set, (PointSet, TensorPointSet)):
        pts = point_set.points
        return [PointSet(pts[:, s]) for s in slices]
    raise NotImplementedError(
        f"How to tabulate TensorProductElement on {type(point_set).__name__}?")
