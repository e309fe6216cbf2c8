"""Tensor-product elements (parity with
/root/reference/FIAT/tensor_product.py): product cell, product DoFs (B
fastest), dual product by functional-type case analysis, and tabulation as
outer products of factor tabulations -- written as single einsum
contractions per derivative multi-index (the explicit sum-factorised
structure the TPU batched tabulator consumes)."""

import numpy as np

from ..core import functionals
from ..core.cells import (TensorProductCell, UFCHexahedron, UFCQuadrilateral,
                          compute_unflattening_map, flatten_entities)
from ..core.dualset import DualSet
from ..core.expansions import mis
from ..core.finite_element import FiniteElement


def _first_point(node):
    return tuple(node.points[0])


def _extrude_node(Anode, Bnode, ref_el, name, pad_component):
    """Lift a vector functional A onto the product cell: every A point is
    extended by B's (single) point, and term components are optionally
    padded with a zero-weight slot in the new (last) direction so the dual
    keeps the full product-cell component stencil."""
    Bpoint = _first_point(Bnode)
    if len(Bpoint) > 1:
        raise NotImplementedError(f"{name} x PointEval needs a 1D second factor")
    sd = ref_el.get_spatial_dimension()
    points = np.hstack([Anode.points,
                        np.tile(Bpoint, (Anode.points.shape[0], 1))])
    n = Anode.weights.shape[0]
    npad = points.shape[0] if pad_component else 0
    return functionals.Functional(
        ref_el, (sd,), name, points,
        pt_ids=np.concatenate([Anode.pt_ids, np.arange(npad)]),
        weights=np.concatenate([Anode.weights, np.zeros(npad)]),
        comps=np.concatenate([Anode.comps, np.full(npad, sd - 1, np.intp)]))


def _product_node(Anode, Bnode, ref_el):
    """The product functional of two factor functionals, where defined;
    a placeholder 'Undefined' functional otherwise."""
    undefined = functionals.Functional(None, (), "Undefined", np.zeros((1, 0)))
    if isinstance(Anode, functionals.PointEvaluation):
        if isinstance(Bnode, functionals.PointEvaluation):
            return functionals.PointEvaluation(
                ref_el, _first_point(Anode) + _first_point(Bnode))
        return undefined
    if isinstance(Anode, functionals.PointScaledNormalEvaluation):
        if isinstance(Bnode, functionals.PointEvaluation):
            return _extrude_node(Anode, Bnode, ref_el,
                                 "PointScaledNormalEval", True)
        raise NotImplementedError("unsupported functional type")
    if isinstance(Anode, functionals.PointEdgeTangentEvaluation):
        if isinstance(Bnode, functionals.PointEvaluation):
            return _extrude_node(Anode, Bnode, ref_el, "PointEdgeTangent", True)
        raise NotImplementedError("unsupported functional type")
    if isinstance(Anode, functionals.ComponentPointEvaluation):
        if isinstance(Bnode, functionals.PointEvaluation):
            sd = ref_el.get_spatial_dimension()
            return functionals.ComponentPointEvaluation(
                ref_el, Anode.comp, (sd,), _first_point(Anode) + _first_point(Bnode))
        raise NotImplementedError("unsupported functional type")
    if isinstance(Anode, functionals.FrobeniusIntegralMoment):
        if isinstance(Bnode, functionals.PointEvaluation):
            return _extrude_node(Anode, Bnode, ref_el,
                                 "FrobeniusIntegralMoment", True)
        raise NotImplementedError("unsupported functional type")
    if isinstance(Anode, functionals.IntegralMoment):
        if isinstance(Bnode, functionals.PointEvaluation):
            return _extrude_node(Anode, Bnode, ref_el, "IntegralMoment", False)
        raise NotImplementedError("unsupported functional type")
    if isinstance(Anode, functionals.Functional):
        return undefined
    raise NotImplementedError("unsupported functional type")


class TensorProductElement(FiniteElement):
    """The tensor product of two elements on the product cell."""

    def __init__(self, A, B):
        order = min(A.get_order(), B.get_order())
        if A.get_formdegree() is None or B.get_formdegree() is None:
            formdegree = None
        else:
            formdegree = A.get_formdegree() + B.get_formdegree()
        ref_el = TensorProductCell(A.get_reference_element(),
                                   B.get_reference_element())

        mapA, mapB = A.mapping()[0], B.mapping()[0]
        if mapA != "affine" and mapB == "affine":
            mapping = mapA
        elif mapB != "affine" and mapA == "affine":
            mapping = mapB
        elif mapA == mapB == "affine":
            mapping = "affine"
        else:
            raise ValueError("at least one factor must have an affine mapping")

        # product entity ids: B's dofs run fastest
        Adofs, Bdofs = A.entity_dofs(), B.entity_dofs()
        Bsdim = B.space_dimension()
        entity_ids = {}
        for dimA in Adofs:
            for dimB in Bdofs:
                entity_ids[(dimA, dimB)] = {}
                cur = 0
                for eA in Adofs[dimA]:
                    for eB in Bdofs[dimB]:
                        entity_ids[(dimA, dimB)][cur] = [
                            x * Bsdim + y
                            for x in Adofs[dimA][eA] for y in Bdofs[dimB][eB]]
                        cur += 1

        nodes = [_product_node(Anode, Bnode, ref_el)
                 for Anode in A.dual_basis() for Bnode in B.dual_basis()]
        dual = DualSet(nodes, ref_el, entity_ids)
        super().__init__(ref_el, dual, order, formdegree, mapping)
        self.A = A
        self.B = B
        self.polydegree = max(A.degree(), B.degree())

    def degree(self):
        return self.polydegree

    def get_nodal_basis(self):
        raise NotImplementedError("get_nodal_basis not implemented")

    def get_coeffs(self):
        raise NotImplementedError("get_coeffs not implemented")

    def tabulate(self, order, points, entity=None):
        """Tabulate as an outer product of the factor tabulations: one
        einsum per derivative multi-index."""
        if entity is None:
            entity = (self.ref_el.get_dimension(), 0)
        entity_dim, entity_id = entity

        shape = tuple(len(c.get_topology()[d])
                      for c, d in zip(self.ref_el.cells, entity_dim))
        idA, idB = np.unravel_index(entity_id, shape)
        entityA = (entity_dim[0], idA)
        entityB = (entity_dim[1], idB)

        pdimA, pdimB = [c.get_spatial_dimension()
                        for c in self.ref_el.construct_subelement(entity_dim).cells]
        points = np.asarray(points)
        pointsA = points[..., :pdimA]
        pointsB = points[..., pdimA:pdimA + pdimB]

        Asdim = self.A.ref_el.get_spatial_dimension()
        Bsdim = self.B.ref_el.get_spatial_dimension()
        Atab = self.A.tabulate(order, pointsA, entityA)
        Btab = self.B.tabulate(order, pointsB, entityB)

        nA = len(self.A.value_shape())
        nB = len(self.B.value_shape())
        if nA + nB > 1:
            raise NotImplementedError(
                "tabulate does not support two vector-valued factors")
        npts = len(points)
        result = {}
        for i in range(order + 1):
            for alpha in mis(Asdim + Bsdim, i):
                a, b = Atab[alpha[:Asdim]], Btab[alpha[Asdim:]]
                if nA == 0 and nB == 0:
                    out = np.einsum("ap,bp->abp", a, b).reshape(-1, npts)
                elif nA == 1:
                    d = a.shape[1]
                    out = (np.einsum("adp,bp->abdp", a, b)
                           .reshape(-1, d, npts))
                else:
                    d = b.shape[1]
                    out = (np.einsum("ap,bdp->abdp", a, b)
                           .reshape(-1, d, npts))
                result[alpha] = out
        return result

    def value_shape(self):
        shpA, shpB = self.A.value_shape(), self.B.value_shape()
        if len(shpA) == 0 and len(shpB) == 0:
            return ()
        if len(shpA) == 1 and len(shpB) == 0:
            return (shpA[0],)
        if len(shpA) == 0 and len(shpB) == 1:
            return (shpB[0],)
        raise NotImplementedError("value_shape not implemented")

    def dmats(self):
        raise NotImplementedError("dmats not implemented")

    def get_num_members(self, arg):
        raise NotImplementedError("get_num_members not implemented")

    def is_nodal(self):
        return self.A.is_nodal() and self.B.is_nodal()


class FlattenedDimensions(FiniteElement):
    """Present a tensor-product-of-intervals element with flattened
    (quadrilateral/hexahedron) entity dimensions."""

    def __init__(self, element):
        nodes = element.dual.nodes
        dim = element.ref_el.get_spatial_dimension()
        if dim == 2:
            ref_el = UFCQuadrilateral()
        elif dim == 3:
            ref_el = UFCHexahedron()
        else:
            raise ValueError(f"Illegal element dimension {dim}")
        flat_entity_ids = flatten_entities(element.dual.entity_ids)
        dual = DualSet(nodes, ref_el, flat_entity_ids)
        super().__init__(ref_el, dual, element.get_order(),
                         element.get_formdegree(), element._mapping)
        self.element = element
        self.unflattening_map = compute_unflattening_map(
            element.ref_el.get_topology())

    def degree(self):
        return self.element.degree()

    def tabulate(self, order, points, entity=None):
        if entity is None:
            entity = (self.get_reference_element().get_spatial_dimension(), 0)
        entity_dim, entity_id = entity
        product_entity = self.unflattening_map[(entity_dim, entity_id)]
        return self.element.tabulate(order, points, product_entity)

    def value_shape(self):
        return self.element.value_shape()

    def get_nodal_basis(self):
        return self.element.get_nodal_basis()

    def get_coeffs(self):
        return self.element.get_coeffs()

    def dmats(self):
        return self.element.dmats()

    def get_num_members(self, arg):
        return self.element.get_num_members(arg)

    def is_nodal(self):
        return self.element.is_nodal()
