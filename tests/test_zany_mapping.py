"""THE verification pattern for physically mapped elements (reference:
test/finat/test_zany_mapping.py): build the element with the plain
numerical zoo on a distorted physical cell, build the symbolic element on
the reference cell, and check that the basis transformation matrix maps the
(Piola-mapped) reference tabulation onto the physical tabulation."""

import numpy as np
import pytest

from fiat_tpu.core import cells as cl
from fiat_tpu.core.cells import make_affine_mapping
from fiat_tpu.symbolic.physically_mapped import (PhysicalGeometry,
                                                 PhysicallyMappedElement,
                                                 to_dense)


class MyMapping(PhysicalGeometry):
    """Affine physical geometry for a distorted simplex (numpy arrays)."""

    def __init__(self, ref_cell, phys_cell):
        self.ref_cell = ref_cell
        self.phys_cell = phys_cell
        self.A, self.b = make_affine_mapping(ref_cell.vertices,
                                             phys_cell.vertices)

    def cell_size(self):
        return np.ones((len(self.ref_cell.vertices),))

    def detJ_at(self, point):
        return np.linalg.det(self.A)

    def jacobian_at(self, point):
        return self.A

    def reference_normals(self):
        sd = self.ref_cell.get_spatial_dimension()
        top = self.ref_cell.get_topology()
        return np.asarray([self.ref_cell.compute_normal(i)
                           for i in sorted(top[sd - 1])])

    def physical_normals(self):
        sd = self.phys_cell.get_spatial_dimension()
        top = self.phys_cell.get_topology()
        return np.asarray([self.phys_cell.compute_normal(i)
                           for i in sorted(top[sd - 1])])

    def physical_tangents(self):
        top = self.phys_cell.get_topology()
        return np.asarray([self.phys_cell.compute_normalized_edge_tangent(i)
                           for i in sorted(top[1])])

    def physical_edge_lengths(self):
        top = self.phys_cell.get_topology()
        return np.asarray([self.phys_cell.volume_of_subcomplex(1, i)
                           for i in sorted(top[1])])

    def physical_points(self, ps, entity=None):
        return np.asarray([self.A @ x + self.b for x in ps.points])

    def physical_vertices(self):
        return np.asarray(self.phys_cell.vertices)

    def normalized_reference_edge_tangents(self):
        top = self.ref_cell.get_topology()
        return np.asarray([self.ref_cell.compute_normalized_edge_tangent(i)
                           for i in sorted(top[1])])


def _distorted_cells(dim):
    ref_cell = cl.ufc_simplex(dim)
    if dim == 2:
        phys_verts = ((0.0, 0.1), (1.17, -0.09), (0.15, 1.84))
    else:
        phys_verts = ((0, 0, 0.1), (1.17, -0.09, 0.0),
                      (0.15, 1.84, -0.02), (0.11, 0.17, 1.19))
    # mutate vertices in place (as the reference test suite does) so the
    # physical cell keeps the UFC class and its normal conventions
    phys_cell = cl.ufc_simplex(dim)
    phys_cell.vertices = phys_verts
    return ref_cell, phys_cell


def make_unisolvent_points(element, interior=False):
    degree = element.degree()
    ref_complex = element.get_reference_complex()
    top = ref_complex.get_topology()
    pts = []
    if interior:
        dim = ref_complex.get_spatial_dimension()
        for entity in top[dim]:
            pts.extend(ref_complex.make_points(dim, entity, degree + dim + 1,
                                               variant="gll"))
    else:
        for dim in top:
            for entity in top[dim]:
                pts.extend(ref_complex.make_points(dim, entity, degree,
                                                   variant="gll"))
    return pts


def check_zany_mapping(element_cls, dim, *args, **kwargs):
    ref_cell, phys_cell = _distorted_cells(dim)
    mapping = MyMapping(ref_cell, phys_cell)

    finat_element = element_cls(ref_cell, *args, **kwargs)
    phys_element = element_cls(phys_cell, *args, **kwargs).fiat_equivalent
    ref_element = finat_element._element

    sd = ref_cell.get_spatial_dimension()
    shape = ref_element.value_shape()
    ref_pts = make_unisolvent_points(ref_element, interior=True)
    ref_vals = ref_element.tabulate(0, ref_pts)[(0,) * sd]
    phys_pts = make_unisolvent_points(phys_element, interior=True)
    phys_vals = phys_element.tabulate(0, phys_pts)[(0,) * sd]

    map_name = ref_element.mapping()[0]
    if map_name == "affine":
        ref_vals_piola = ref_vals
    else:
        J, b = make_affine_mapping(ref_cell.vertices, phys_cell.vertices)
        K = []
        if "covariant" in map_name:
            K.append(np.linalg.inv(J).T)
        if "contravariant" in map_name:
            K.append(J / np.linalg.det(J))
        if len(shape) == 2:
            piola = lambda x: K[0] @ x @ K[-1].T
        else:
            piola = lambda x: K[0] @ x
        ref_vals_piola = np.zeros(ref_vals.shape)
        for i in range(ref_vals.shape[0]):
            for k in range(ref_vals.shape[-1]):
                ref_vals_piola[i, ..., k] = piola(ref_vals[i, ..., k])

    num_bfs = phys_element.space_dimension()
    num_dofs = finat_element.space_dimension()
    if isinstance(finat_element, PhysicallyMappedElement):
        M = np.asarray(to_dense(finat_element.basis_transformation(mapping)))
        ref_vals_zany = np.tensordot(M, ref_vals_piola, (-1, 0))
    else:
        ref_vals_zany = ref_vals_piola

    # physical values must be reproduced exactly
    assert np.allclose(ref_vals_zany, phys_vals[:num_dofs], atol=1e-9), \
        abs(ref_vals_zany - phys_vals[:num_dofs]).max()


@pytest.mark.parametrize("name,dim,args,kwargs", [
    ("Hermite", 2, (), {}),
    ("Hermite", 3, (), {}),
    ("Morley", 2, (), {}),
    ("Morley", 3, (), {}),
    ("Bell", 2, (), {}),
    ("Argyris", 2, (5,), {"avg": True}),
    ("Argyris", 2, (6,), {"avg": True}),
    ("Argyris", 2, (5,), {"variant": "point"}),
    ("HsiehCloughTocher", 2, (3,), {"avg": True}),
    ("HsiehCloughTocher", 2, (4,), {"avg": True}),
    ("ReducedHsiehCloughTocher", 2, (), {}),
    ("QuadraticPowellSabin6", 2, (), {}),
    ("QuadraticPowellSabin12", 2, (), {"avg": True}),
    ("WuXuH3NC", 2, (), {}),
    ("WuXuRobustH3NC", 2, (), {}),
    ("BrambleZlamalC2", 2, (), {}),
    ("AlfeldC2", 2, (), {}),
    ("Walkington", 3, (), {}),
])
def test_zany_scalar(name, dim, args, kwargs):
    from fiat_tpu import symbolic
    check_zany_mapping(getattr(symbolic, name), dim, *args, **kwargs)


@pytest.mark.parametrize("name,dim,args,kwargs", [
    ("ArnoldWinther", 2, (), {}),
    ("ArnoldWintherNC", 2, (), {}),
    ("HuZhang", 2, (3,), {}),
    ("HuZhang", 2, (4,), {}),
    ("MardalTaiWinther", 2, (), {}),
    ("MardalTaiWinther", 3, (), {}),
    ("JohnsonMercier", 2, (), {}),
    ("JohnsonMercier", 3, (), {}),
    ("BernardiRaugel", 2, (), {}),
    ("BernardiRaugel", 3, (), {}),
    ("ChristiansenHu", 2, (), {}),
    ("ChristiansenHu", 3, (), {}),
    ("AlfeldSorokina", 2, (), {}),
    ("AlfeldSorokina", 3, (), {}),
    ("ReducedArnoldQin", 2, (), {}),
    ("GuzmanNeilanFirstKindH1", 2, (), {}),
    ("GuzmanNeilanFirstKindH1", 3, (), {}),
    ("GuzmanNeilanSecondKindH1", 2, (), {}),
    ("GuzmanNeilanH1div", 2, (), {}),
])
def test_zany_piola(name, dim, args, kwargs):
    from fiat_tpu import symbolic
    check_zany_mapping(getattr(symbolic, name), dim, *args, **kwargs)


class ScaledMapping(MyMapping):
    """Uniformly scaled physical cell; cell_size is the circumdiameter
    (what Firedrake feeds the transformation), found from the
    circumcenter's linear system in any dimension."""

    def cell_size(self):
        verts = np.asarray(self.phys_cell.vertices)
        A = 2 * (verts[1:] - verts[0])
        b = (verts[1:] ** 2).sum(axis=1) - (verts[0] ** 2).sum()
        R = np.linalg.norm(np.linalg.solve(A, b) - verts[0])
        return np.full(len(verts), 2 * R)


@pytest.mark.parametrize("name,dim,args,kwargs", [
    ("Hermite", 2, (), {}),
    ("QuadraticPowellSabin6", 2, (), {}),
    ("QuadraticPowellSabin12", 2, (), {}),
    ("ReducedHsiehCloughTocher", 2, (), {}),
    ("HsiehCloughTocher", 2, (3,), {}),
    ("HsiehCloughTocher", 2, (4,), {}),
    ("Bell", 2, (), {}),
    ("Argyris", 2, (5,), {"variant": "point"}),
    ("Argyris", 2, (5,), {}),
    ("Argyris", 2, (6,), {}),
    ("WuXuH3NC", 2, (), {}),
    ("WuXuRobustH3NC", 2, (), {}),
    ("BrambleZlamalC2", 2, (9,), {}),
    ("AlfeldC2", 2, (5,), {}),
    ("Walkington", 3, (), {}),
])
def test_mass_scaling(name, dim, args, kwargs):
    """Zany transformations must keep the physical mass matrix's
    conditioning mesh-size independent (reference strategy:
    test/finat/test_mass_conditioning.py): the cell_size-aware scaling
    of the derivative DoFs is exactly what removes the h-dependence."""
    from fiat_tpu import symbolic
    from fiat_tpu.core.quadrature_schemes import create_quadrature

    ref_cell = cl.ufc_simplex(dim)
    finat_element = getattr(symbolic, name)(ref_cell, *args, **kwargs)
    ref_element = finat_element._element
    degree = ref_element.degree()
    sd = ref_cell.get_spatial_dimension()
    Q = create_quadrature(finat_element._element.get_reference_complex(),
                          2 * degree)
    qpts, qwts = Q.get_points(), Q.get_weights()
    phi_ref = ref_element.tabulate(0, qpts)[(0,) * sd]

    kappa = []
    for k in range(3):
        phys_cell = cl.ufc_simplex(dim)
        phys_cell.vertices = tuple(
            map(tuple, 0.5 ** k * np.asarray(phys_cell.vertices)))
        mapping = ScaledMapping(ref_cell, phys_cell)
        M = np.asarray(to_dense(finat_element.basis_transformation(mapping)))
        phis = np.tensordot(M, phi_ref, (-1, 0))
        detJ = abs(np.linalg.det(mapping.A))
        mass = (phis * (qwts * detJ)) @ phis.T
        kappa.append(np.linalg.cond(mass))
    ratios = np.asarray(kappa[1:]) / np.asarray(kappa[:-1])
    assert np.allclose(ratios, 1, atol=0.1), (name, kappa)
