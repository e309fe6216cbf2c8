"""Direct serendipity tests (reference strategy:
test/finat/test_direct_serendipity.py): Kronecker property at nodes on a
distorted physical quad, plus traced evaluation."""

import numpy as np
import pytest

from fiat_tpu.core import cells as cl
from fiat_tpu.core.cells import make_lattice
from fiat_tpu.symbolic import DirectSerendipity
from fiat_tpu.symbolic.physically_mapped import PhysicalGeometry
from fiat_tpu.symbolic.point_set import PointSet, UnknownPointSet

VERTS = np.asarray(((0.0, 0.0), (1.0, 0.0), (0.1, 1.1), (0.95, 1.01)))


class QuadMapping(PhysicalGeometry):
    """Bilinear map from the UFC reference square to a convex quad."""

    def __init__(self, cell, verts, xp=np):
        self.cell = cell
        self.verts = np.asarray(verts)
        self.xp = xp

    def cell_size(self):
        raise NotImplementedError

    def jacobian_at(self, point):
        raise NotImplementedError

    def detJ_at(self, point):
        raise NotImplementedError

    def reference_normals(self):
        raise NotImplementedError

    def physical_normals(self):
        raise NotImplementedError

    def physical_tangents(self):
        raise NotImplementedError

    def physical_edge_lengths(self):
        raise NotImplementedError

    def physical_points(self, ps, entity=None):
        assert entity is None
        p = ps.points
        v = self.verts
        sx = p[..., 0:1]
        sy = p[..., 1:2]
        return (v[0] * (1 - sx) * (1 - sy) + v[1] * (1 - sx) * sy
                + v[2] * sx * (1 - sy) + v[3] * sx * sy)

    def physical_vertices(self):
        return self.verts


def ref_nodes(cell, deg):
    """Reference positions of the DS nodes (map to physical nodes under
    the bilinear map for deg <= 4)."""
    pts = [pt for pt in cell.vertices]
    L = cell.construct_subelement(1)
    Lpts = make_lattice(L.vertices, deg, 1)
    for e in cell.topology[1]:
        Fmap = cell.get_entity_transform(1, e)
        pts.extend(tuple(Fmap(pt)) for pt in Lpts)
    vs = np.asarray(cell.vertices)
    if deg > 3:
        dx0 = (vs[1] - vs[0]) / (deg - 2)
        dx1 = (vs[2] - vs[0]) / (deg - 2)
        pts.extend(tuple(vs[0] + dx0 * i + dx1 * j)
                   for i in range(1, deg - 2)
                   for j in range(1, deg - 1 - i))
    return np.asarray(pts)


@pytest.mark.parametrize("degree", [1, 2, 3, 4])
def test_kronecker(degree):
    cell = cl.ufc_cell("quadrilateral")
    element = DirectSerendipity(cell, degree)
    pts = PointSet(ref_nodes(cell, degree))
    mapping = QuadMapping(cell, VERTS)
    vals = element.basis_evaluation(0, pts,
                                    coordinate_mapping=mapping)[(0, 0)]
    vals = np.asarray(vals)
    assert vals.shape[0] == element.space_dimension()
    assert np.allclose(vals, np.eye(*vals.shape), atol=1e-10)


@pytest.mark.parametrize("degree", [1, 2, 3])
def test_parity_with_reference_construction(degree):
    """Values match the reference's symbolic construction evaluated with
    concrete vertices (finat/direct_serendipity.py ds_sym)."""
    import importlib
    import sys
    import types
    if "finat" not in sys.modules:
        pkg = types.ModuleType("finat")
        pkg.__path__ = ["/root/reference/finat"]
        sys.modules["finat"] = pkg
    ds_ref = importlib.import_module("finat.direct_serendipity")
    import sympy

    cell = cl.ufc_cell("quadrilateral")
    vs, xx, phis_ref = ds_ref.ds_sym(cell.get_topology(), degree,
                                     vs=VERTS, sp=sympy)

    element = DirectSerendipity(cell, degree)
    mapping = QuadMapping(cell, VERTS)
    rng = np.random.default_rng(11)
    eval_ref = rng.random((5, 2))
    eval_phys = np.asarray(mapping.physical_points(PointSet(eval_ref)))
    tab = np.asarray(element.basis_evaluation(
        0, PointSet(eval_ref), coordinate_mapping=mapping)[(0, 0)])

    expect = np.array([[float(phi.subs({xx[0]: p[0], xx[1]: p[1]}))
                        for p in eval_phys] for phi in phis_ref])
    assert np.allclose(tab, expect, atol=1e-10)


def test_traced_evaluation():
    """Evaluation works under jit with traced points and vertices."""
    import jax
    import jax.numpy as jnp
    cell = cl.ufc_cell("quadrilateral")
    element = DirectSerendipity(cell, 2)
    ref_pts = np.asarray([[0.2, 0.3], [0.7, 0.6]])

    @jax.jit
    def tab(verts, pts):
        mapping = QuadMapping(cell, np.empty((4, 2)))
        mapping.verts = verts
        ps = UnknownPointSet(pts)
        return element.basis_evaluation(
            0, ps, coordinate_mapping=mapping)[(0, 0)]

    out = np.asarray(tab(jnp.asarray(VERTS), jnp.asarray(ref_pts)))
    mapping = QuadMapping(cell, VERTS)
    expect = np.asarray(element.basis_evaluation(
        0, PointSet(ref_pts), coordinate_mapping=mapping)[(0, 0)])
    assert np.allclose(out, expect, atol=1e-12)


def test_entity_dofs_and_dim():
    cell = cl.ufc_cell("quadrilateral")
    for degree, dim in [(1, 4), (2, 8), (3, 12), (4, 17)]:
        el = DirectSerendipity(cell, degree)
        assert el.space_dimension() == dim
        ed = el.entity_dofs()
        assert sum(len(v) for d in ed.values() for v in d.values()) == dim
