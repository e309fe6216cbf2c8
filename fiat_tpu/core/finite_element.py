"""Finite element base classes.

Parity with /root/reference/FIAT/finite_element.py: ``FiniteElement`` is the
non-nodal ABC; ``CiarletElement`` solves the generalized Vandermonde system
V c = B (host-side float64, singularity-guarded) for the nodal basis.  The
nodal coefficients are the static per-element data consumed by the TPU
tabulation engine (fiat_tpu.ops.tabulate).
"""

import numpy as np

from .dualset import DualSet
from .polyset import PolynomialSet
from .quadrature_schemes import create_quadrature


class FiniteElement:
    """Template for finite element families; non-nodal unless a
    CiarletElement."""

    def __init__(self, ref_el, dual, order, formdegree=None, mapping="affine",
                 ref_complex=None):
        self.ref_el = ref_el
        self.dual = dual
        self.order = order
        self.formdegree = formdegree
        self.ref_complex = ref_complex or ref_el
        self._mapping = mapping

    def get_reference_element(self):
        return self.ref_el

    def get_reference_complex(self):
        return self.ref_complex

    def get_dual_set(self):
        return self.dual

    def get_order(self):
        return self.order

    def dual_basis(self):
        return self.dual.get_nodes()

    def entity_dofs(self):
        return self.dual.get_entity_ids()

    def entity_closure_dofs(self):
        return self.dual.get_entity_closure_ids()

    def entity_permutations(self):
        return self.dual.get_entity_permutations()

    def get_formdegree(self):
        return self.formdegree

    def mapping(self):
        """Pullback type per basis function."""
        return [self._mapping] * self.space_dimension()

    def num_sub_elements(self):
        return 1

    def space_dimension(self):
        return len(self.get_dual_set())

    def tabulate(self, order, points, entity=None):
        raise NotImplementedError(
            "Must be specified in the element subclass of FiniteElement.")

    @staticmethod
    def is_nodal():
        return False

    def is_macroelement(self):
        return self.ref_el is not self.ref_complex


class CiarletElement(FiniteElement):
    """A nodal element: (cell, polynomial set, dual set), with the nodal
    basis obtained by the generalized Vandermonde solve."""

    def __init__(self, poly_set, dual, order, formdegree=None, mapping="affine",
                 ref_complex=None):
        ref_el = dual.get_reference_element()
        ref_complex = ref_complex or poly_set.get_reference_element()
        super().__init__(ref_el, dual, order, formdegree, mapping, ref_complex)

        if len(poly_set) != len(dual):
            raise ValueError(
                f"Dimension of function space is {len(poly_set)}, "
                f"but got {len(dual)} nodes.")

        old_coeffs = poly_set.get_coeffs()
        dualmat = dual.to_riesz(poly_set)

        shp = dualmat.shape
        A = dualmat.reshape((shp[0], -1))
        B = old_coeffs.reshape((shp[0], -1))
        V = A @ B.T
        self.V = V

        # Solve V^T x = B with an explicit conditioning guard (the reference
        # escalates scipy's ill-conditioning warning to LinAlgError).
        new_coeffs_flat = np.linalg.solve(V.T, B)
        if not np.all(np.isfinite(new_coeffs_flat)):
            raise np.linalg.LinAlgError("Singular Vandermonde matrix")
        resid = V.T @ new_coeffs_flat - B
        if np.linalg.norm(resid, np.inf) > 1e-6 * max(1.0, np.linalg.norm(B, np.inf)):
            raise np.linalg.LinAlgError("Singular Vandermonde matrix")

        new_coeffs = new_coeffs_flat.reshape(new_coeffs_flat.shape[:1] + shp[1:])
        self.poly_set = PolynomialSet(poly_set.get_reference_element(),
                                      poly_set.get_degree(),
                                      poly_set.get_embedded_degree(),
                                      poly_set.get_expansion_set(),
                                      new_coeffs)

    def degree(self):
        """Degree of the embedding polynomial space."""
        return self.poly_set.get_embedded_degree()

    def get_nodal_basis(self):
        return self.poly_set

    def get_coeffs(self):
        return self.poly_set.get_coeffs()

    def tabulate(self, order, points, entity=None):
        """dict alpha -> D^alpha tabulation (num_bfs[, components], npts) at
        ``points`` (optionally given on a subentity)."""
        if entity is None:
            entity = (self.ref_el.get_spatial_dimension(), 0)
        entity_dim, entity_id = entity
        transform = self.ref_el.get_entity_transform(entity_dim, entity_id)
        return self.poly_set.tabulate(transform(points), order)

    def value_shape(self):
        return self.poly_set.get_shape()

    def dmats(self):
        return self.get_nodal_basis().get_dmats()

    def get_num_members(self, arg):
        return self.get_nodal_basis().get_expansion_set().get_num_members(arg)

    @staticmethod
    def is_nodal():
        return True


def entity_support_dofs(elem, entity_dim):
    """{entity id: dofs whose basis functions are nonzero on the entity}."""
    if not hasattr(elem, "_entity_support_dofs"):
        elem._entity_support_dofs = {}
    cache = elem._entity_support_dofs
    try:
        return cache[entity_dim]
    except KeyError:
        pass

    ref_el = elem.get_reference_element()
    dim = ref_el.get_spatial_dimension()
    entity_cell = ref_el.construct_subelement(entity_dim)
    quad = create_quadrature(entity_cell, max(2 * elem.degree(), 1))
    weights = quad.get_weights()
    eps = 1e-8

    result = {}
    for f in elem.entity_dofs()[entity_dim]:
        entity_transform = ref_el.get_entity_transform(entity_dim, f)
        points = entity_transform(quad.get_points())
        vals = elem.tabulate(0, points)[(0,) * dim]
        if elem.value_shape():
            ints = np.dot(np.einsum("...ij,...ij->...j", vals, vals), weights)
        else:
            ints = np.dot(vals ** 2, weights)
        result[f] = [dof for dof, i in enumerate(ints) if i > eps]

    cache[entity_dim] = result
    return result
