"""Reference-cell geometry/topology parity with the reference oracle
(test/FIAT/unit/test_reference_element.py territory): topology dicts,
sub-entity closures, connectivity, entity transforms, normals/tangents,
lattice point variants, and hypercube flattening."""

import numpy as np
import pytest

import FIAT
from FIAT import reference_element as ref

from fiat_tpu.core import cells as cl

CELLS = [
    (cl.ufc_simplex(1), FIAT.ufc_simplex(1)),
    (cl.ufc_simplex(2), FIAT.ufc_simplex(2)),
    (cl.ufc_simplex(3), FIAT.ufc_simplex(3)),
    (cl.ufc_cell("quadrilateral"), FIAT.ufc_cell("quadrilateral")),
    (cl.ufc_cell("hexahedron"), FIAT.ufc_cell("hexahedron")),
]
IDS = ["interval", "triangle", "tet", "quad", "hex"]


@pytest.mark.parametrize("mine,ref_el", CELLS, ids=IDS)
def test_topology_parity(mine, ref_el):
    assert np.allclose(np.asarray(mine.get_vertices()),
                       np.asarray(ref_el.get_vertices()))
    t1, t2 = mine.get_topology(), ref_el.get_topology()
    assert set(t1) == set(t2)
    for dim in t1:
        assert {e: tuple(v) for e, v in t1[dim].items()} == \
               {e: tuple(v) for e, v in t2[dim].items()}, dim


@pytest.mark.parametrize("mine,ref_el", CELLS[:3], ids=IDS[:3])
def test_sub_entities_and_connectivity(mine, ref_el):
    sd = mine.get_spatial_dimension()
    for dim in range(sd + 1):
        for e in mine.get_topology()[dim]:
            assert sorted(mine.sub_entities[dim][e]) == \
                sorted(ref_el.sub_entities[dim][e]), (dim, e)
    assert mine.get_connectivity().keys() == ref_el.get_connectivity().keys()
    for key in mine.get_connectivity():
        assert list(map(tuple, mine.get_connectivity()[key])) == \
            list(map(tuple, ref_el.get_connectivity()[key])), key


@pytest.mark.parametrize("mine,ref_el", CELLS[:3], ids=IDS[:3])
def test_entity_transforms(mine, ref_el):
    """Entity transforms push facet-local points to the same cell
    coordinates as the reference."""
    sd = mine.get_spatial_dimension()
    for dim in range(1, sd + 1):
        sub = cl.ufc_simplex(dim)
        pts = np.asarray(sub.make_points(dim, 0, dim + 2) or
                         [sub.get_vertices()[0]])
        for e in mine.get_topology()[dim]:
            f1 = mine.get_entity_transform(dim, e)
            f2 = ref_el.get_entity_transform(dim, e)
            assert np.allclose(np.asarray(f1(pts)),
                               np.asarray([f2(p) for p in pts]))


@pytest.mark.parametrize("mine,ref_el", CELLS[:3], ids=IDS[:3])
def test_normals_tangents(mine, ref_el):
    sd = mine.get_spatial_dimension()
    top = mine.get_topology()
    for f in top[sd - 1]:
        assert np.allclose(mine.compute_normal(f), ref_el.compute_normal(f))
        assert np.allclose(mine.compute_scaled_normal(f),
                           ref_el.compute_scaled_normal(f))
        for t1, t2 in zip(mine.compute_tangents(sd - 1, f),
                          ref_el.compute_tangents(sd - 1, f)):
            assert np.allclose(t1, t2)
    if sd >= 2:
        for e in top[1]:
            assert np.allclose(
                mine.compute_normalized_edge_tangent(e),
                ref_el.compute_normalized_edge_tangent(e))


@pytest.mark.parametrize("variant", (None, "equispaced", "gll", "gl"))
@pytest.mark.parametrize("mine,ref_el", CELLS[:3], ids=IDS[:3])
def test_make_points_variants(mine, ref_el, variant):
    sd = mine.get_spatial_dimension()
    for dim in range(sd + 1):
        for e in mine.get_topology()[dim]:
            kw = {} if variant is None else {"variant": variant}
            p1 = mine.make_points(dim, e, 4, **kw)
            p2 = ref_el.make_points(dim, e, 4, **kw)
            assert np.allclose(np.asarray(p1).reshape(len(p1), -1),
                               np.asarray(p2).reshape(len(p2), -1)), (dim, e)


def test_distance_to_point_parity():
    for mine, ref_el in CELLS[:3]:
        sd = mine.get_spatial_dimension()
        rng = np.random.default_rng(5)
        pts = rng.random((40, sd)) * 2.0 - 0.5
        d1 = np.asarray(mine.distance_to_point_l1(pts, rescale=True))
        d2 = np.asarray([ref_el.distance_to_point_l1(p, rescale=True)
                         for p in pts]).reshape(d1.shape)
        assert np.allclose(d1, d2)


def test_quad_flattening_roundtrip():
    """flatten_reference_cube presents TP(interval^2) with the UFC quad
    topology; entity maps agree with the reference's flattening."""
    tp_mine = cl.TensorProductCell(cl.ufc_simplex(1), cl.ufc_simplex(1))
    flat = cl.flatten_reference_cube(tp_mine)
    quad = cl.ufc_cell("quadrilateral")
    assert flat.get_topology() == quad.get_topology()
    rtp = ref.TensorProductCell(FIAT.ufc_simplex(1), FIAT.ufc_simplex(1))
    rflat = ref.flatten_reference_cube(rtp)
    assert flat.get_topology() == rflat.get_topology()


def test_cell_complex_queries():
    """Simplicial-complex queries on a macro split: child/parent entity
    maps are mutually inverse and cover the topology."""
    from fiat_tpu.core.macro import AlfeldSplit
    T = cl.ufc_simplex(2)
    A = AlfeldSplit(T)
    cp = A.get_child_to_parent()
    top = A.get_topology()
    for dim in top:
        for e in top[dim]:
            pdim, pent = cp[dim][e]
            assert pdim <= 2 and pent in A.get_parent().get_topology()[pdim]
