"""H(div)/H(curl) wrapper elements for TP elements in the symbolic layer
(parity with /root/reference/finat/hdivcurl.py): component transformers
embed the TP values as normal/tangential vector components."""

import numpy as np

from .. import elements as fe_numeric
from ..core import cells as cl
from .base import FiniteElementBase
from .point_set import _is_traced
from .tensor_product import TensorProductElement


def _xp(t):
    return np if not _is_traced(t) else __import__("jax.numpy", fromlist=["x"])


class WrapperElementBase(FiniteElementBase):
    """Common base for H(div) and H(curl) wrappers."""

    def __init__(self, wrappee, transform):
        super().__init__()
        self.wrappee = wrappee
        self.transform = transform

    @property
    def cell(self):
        return self.wrappee.cell

    @property
    def complex(self):
        return self.wrappee.complex

    @property
    def degree(self):
        return self.wrappee.degree

    def entity_dofs(self):
        return self.wrappee.entity_dofs()

    @property
    def entity_permutations(self):
        return self.wrappee.entity_permutations

    def entity_closure_dofs(self):
        return self.wrappee.entity_closure_dofs()

    def entity_support_dofs(self):
        return self.wrappee.entity_support_dofs()

    def space_dimension(self):
        return self.wrappee.space_dimension()

    @property
    def index_shape(self):
        return self.wrappee.index_shape

    @property
    def value_shape(self):
        return (self.cell.get_spatial_dimension(),)

    def _transform_evaluation(self, core_eval):
        n_idx = len(self.wrappee.index_shape)
        n_val = len(self.wrappee.value_shape)
        result = {}
        for alpha, table in core_eval.items():
            xp = _xp(table)
            idx_shape = table.shape[:n_idx]
            val_shape = table.shape[n_idx:n_idx + n_val]
            pts_shape = table.shape[n_idx + n_val:]

            def comp(sel):
                """Either a component of the table, or zeros."""
                if sel is None:
                    return xp.zeros(idx_shape + pts_shape)
                factor, index = sel
                if index == ():
                    v = table
                else:
                    v = table[(slice(None),) * n_idx + index]
                return factor * v

            rows = [comp(sel) for sel in self.transform]
            out = xp.stack(rows, axis=n_idx)
            result[alpha] = out
        return result

    def basis_evaluation(self, order, ps, entity=None, coordinate_mapping=None):
        return self._transform_evaluation(
            self.wrappee.basis_evaluation(order, ps, entity))

    def point_evaluation(self, order, refcoords, entity=None,
                         coordinate_mapping=None):
        return self._transform_evaluation(
            self.wrappee.point_evaluation(order, refcoords, entity))

    @property
    def dual_basis(self):
        Q, x = self.wrappee.dual_basis
        xp = _xp(Q)
        n_idx = len(self.wrappee.index_shape)
        npt = len(x.points_shape)
        n_val = len(self.wrappee.value_shape)
        idx_pts = Q.shape[:n_idx + npt]

        def comp(sel):
            if sel is None:
                return xp.zeros(idx_pts)
            factor, index = sel
            if index == ():
                v = Q
            else:
                v = Q[(slice(None),) * (n_idx + npt) + index]
            return factor * v

        rows = [comp(sel) for sel in self.transform]
        return xp.stack(rows, axis=len(idx_pts)), x


#: transform entries: None (zero component) or (sign, component index tuple)
def select_hdiv_transformer(element):
    assert len(element.factors) == 2
    assert element.factors[1].cell.get_shape() == cl.LINE
    ks = tuple(fe.formdegree for fe in element.factors)
    if ks == (0, 1):
        return [(-1.0, ()), None]
    if ks == (1, 0):
        return [None, (1.0, ())]
    if ks == (2, 0):
        return [None, None, (1.0, ())]
    if ks == (1, 1):
        if element.mapping == "contravariant piola":
            return [(1.0, (0,)), (1.0, (1,)), None]
        if element.mapping == "covariant piola":
            return [(1.0, (1,)), (-1.0, (0,)), None]
        raise AssertionError("Unexpected original mapping!")
    raise AssertionError("Unexpected form degree combination!")


def select_hcurl_transformer(element):
    assert len(element.factors) == 2
    assert element.factors[1].cell.get_shape() == cl.LINE
    dim = element.cell.get_spatial_dimension()
    ks = tuple(fe.formdegree for fe in element.factors)
    if element.mapping == "affine":
        if ks == (1, 0):
            return [(1.0, ()), None]
        if ks == (0, 1):
            return [None] * (dim - 1) + [(1.0, ())]
        raise AssertionError
    if element.mapping == "covariant piola":
        return [(1.0, (0,)), (1.0, (1,)), None]
    if element.mapping == "contravariant piola":
        return [(-1.0, (1,)), (1.0, (0,)), None]
    raise AssertionError("Unexpected original mapping!")


class HDivElement(WrapperElementBase):
    """H(div) wrapper for TP elements."""

    def __init__(self, wrappee):
        assert isinstance(wrappee, TensorProductElement)
        if any(fe.formdegree is None for fe in wrappee.factors):
            raise ValueError("Form degree of subelement is None, cannot H(div)!")
        formdegree = sum(fe.formdegree for fe in wrappee.factors)
        if formdegree != wrappee.cell.get_spatial_dimension() - 1:
            raise ValueError("H(div) requires (n-1)-form element!")
        super().__init__(wrappee, select_hdiv_transformer(wrappee))

    @property
    def formdegree(self):
        return self.cell.get_spatial_dimension() - 1

    @property
    def fiat_equivalent(self):
        return fe_numeric.Hdiv(self.wrappee.fiat_equivalent)

    @property
    def mapping(self):
        return "contravariant piola"


class HCurlElement(WrapperElementBase):
    """H(curl) wrapper for TP elements."""

    def __init__(self, wrappee):
        assert isinstance(wrappee, TensorProductElement)
        if any(fe.formdegree is None for fe in wrappee.factors):
            raise ValueError("Form degree of subelement is None, cannot H(curl)!")
        formdegree = sum(fe.formdegree for fe in wrappee.factors)
        if formdegree != 1:
            raise ValueError("H(curl) requires 1-form element!")
        super().__init__(wrappee, select_hcurl_transformer(wrappee))

    @property
    def formdegree(self):
        return 1

    @property
    def fiat_equivalent(self):
        return fe_numeric.Hcurl(self.wrappee.fiat_equivalent)

    @property
    def mapping(self):
        return "covariant piola"
