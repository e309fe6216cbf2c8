"""Bridge from the numerical element zoo to the symbolic layer.

Role parity with /root/reference/finat/fiat_elements.py, restructured
around this package's array encodings:

* ``FiatElement`` wraps a core (Ciarlet) element.  Its reference-query
  API is *generated* from one delegation table rather than written out
  per attribute — the core element is the single source of truth.
* ``basis_evaluation`` packs tabulations as arrays shaped
  ``(space_dim, *value_shape, *points_shape)``.  With a static point set
  this is host numpy; with an ``UnknownPointSet`` (traced points inside
  jit) the tabulation runs through the member-vectorized jet recurrence
  and returns traced arrays — the XLA graph IS the symbolic tabulation.
* ``dual_basis`` flattens the whole dual set's struct-of-arrays term
  encoding (core.functionals) into one dense weight tensor Q over a
  merged point set, using the same lexsort-group point merging idiom as
  ``core.macro``'s composite quadrature.
* the ~30 per-family wrapper classes the reference spells out by hand
  are stamped out from name tables at module import.

Derivative tables beyond the polynomial degree are exact zeros (the
reference marks them structurally with gem.Zero; here XLA constant-folds
the zero arrays)."""

import abc
from functools import cached_property

import numpy as np

from .. import elements as fe
from .base import FiniteElementBase
from .point_set import PointSet, _is_traced, flat_points


class FiatElement(FiniteElementBase):
    """Wrap a core element for symbolic consumption."""

    def __init__(self, fiat_element):
        super().__init__()
        self._element = fiat_element

    @property
    def fiat_equivalent(self):
        return self._element

    @property
    def index_shape(self):
        return (self._element.space_dimension(),)

    @property
    def mapping(self):
        kinds = set(self._element.mapping())
        return kinds.pop() if len(kinds) == 1 else None

    def basis_evaluation(self, order, ps, entity=None, coordinate_mapping=None):
        """{alpha: array (space_dim [+ value axes] + points_shape)}.

        Constrained elements (e.g. Bell) tabulate more rows than the
        space dimension; all rows are kept here and the physically-mapped
        layer restricts after transformation."""
        pts = flat_points(ps)
        tabulate = (self._traced_tabulate if _is_traced(pts)
                    else lambda o, p, e: self._element.tabulate(o, p, e))
        vshape = self.value_shape

        def pack(table):
            if isinstance(table, Exception):
                return table
            return table.reshape(table.shape[:1] + vshape + ps.points_shape)

        return {alpha: pack(t)
                for alpha, t in tabulate(order, pts, entity).items()}

    def _traced_tabulate(self, order, pts, entity):
        """Tabulation with traced points: affine entity transform + the
        traceable expansion recurrence + the nodal-coefficient matmul."""
        import jax.numpy as jnp
        element = self._element
        ref_el = element.get_reference_element()
        if entity is None:
            entity = (ref_el.get_spatial_dimension(), 0)
        cell_pts = ref_el.get_entity_transform(*entity)(pts)

        poly_set = element.get_nodal_basis()
        raw = poly_set.get_expansion_set()._tabulate(
            poly_set.get_embedded_degree(), cell_pts, order=order)
        coeffs = jnp.asarray(np.asarray(poly_set.get_coeffs()))
        lead = coeffs.shape[:-1]
        flat = coeffs.reshape(-1, coeffs.shape[-1])
        return {alpha: (flat @ tab).reshape(lead + tab.shape[-1:])
                for alpha, tab in raw.items()}

    @cached_property
    def _dual_basis(self):
        """(Q dense weights (nnodes, npts, *value_shape), merged points).

        Rides the struct-of-arrays functional encoding: every value term
        of every node is one (node, point-row, component, weight) tuple;
        coincident points across nodes are merged by lexsort grouping and
        Q is built with a single scatter-add."""
        nodes = self._element.dual_basis()[:self._element.space_dimension()]
        if any(n.max_deriv_order for n in nodes):
            raise NotImplementedError(
                "Dual bases with derivative nodes have no pointwise dual")

        counts = [n.weights.size for n in nodes]
        pts = np.concatenate([n.points[n.pt_ids] for n in nodes], axis=0)
        node_of = np.repeat(np.arange(len(nodes)), counts)
        comp_of = np.concatenate([n.comps for n in nodes])
        w = np.concatenate([n.weights for n in nodes])

        # Merge numerically-coincident term points: lexsort rows, open a
        # new group wherever consecutive sorted rows differ beyond atol,
        # then renumber groups in first-occurrence order so the merged
        # point list is stable against node ordering.
        order = np.lexsort(pts.T[::-1])
        sorted_pts = pts[order]
        breaks = np.abs(np.diff(sorted_pts, axis=0)).max(axis=1) > 1e-12
        gid = np.empty(len(pts), dtype=np.intp)
        gid[order] = np.concatenate(([0], np.cumsum(breaks)))
        first_row = np.full(gid.max() + 1, len(pts), dtype=np.intp)
        np.minimum.at(first_row, gid, np.arange(len(pts)))
        rank = np.empty_like(first_row)
        rank[np.argsort(first_row, kind="stable")] = np.arange(len(first_row))
        point_of = rank[gid]
        merged = pts[np.sort(first_row)]

        ncomp = max(int(np.prod(self.value_shape, dtype=int)), 1)
        Q = np.zeros((len(nodes), len(merged), ncomp))
        np.add.at(Q, (node_of, point_of, comp_of), w)
        return Q.reshape(len(nodes), len(merged), *self.value_shape), merged

    @property
    def dual_basis(self):
        Q, pts = self._dual_basis
        return Q, PointSet(pts)


class ScalarFiatElement(FiatElement):
    value_shape = ()


class VectorFiatElement(FiatElement):
    @property
    def value_shape(self):
        return (self.cell.get_spatial_dimension(),)


# The wrapped element answers every reference query; generate the
# pass-throughs instead of hand-writing them.
def _delegate(attr, call, as_property):
    def fwd(self):
        return getattr(self._element, attr)() if call \
            else getattr(self._element, attr)
    fwd.__name__ = attr
    return property(fwd) if as_property else fwd


for _name, _attr in [("cell", "get_reference_element"),
                     ("complex", "get_reference_complex"),
                     ("degree", "degree"),
                     ("formdegree", "get_formdegree"),
                     ("entity_permutations", "entity_permutations"),
                     ("value_shape", "value_shape")]:
    setattr(FiatElement, _name, _delegate(_attr, call=True, as_property=True))
for _name in ["entity_dofs", "entity_closure_dofs", "space_dimension"]:
    setattr(FiatElement, _name, _delegate(_name, call=True, as_property=False))
for _cls in (FiatElement, ScalarFiatElement, VectorFiatElement):
    abc.update_abstractmethods(_cls)


# -- family wrappers (names match the reference finat API), stamped out
#    from name tables: symbolic family == core family + packing policy.

def _stamp(base, families):
    for name in families:
        core_cls = getattr(fe, name)

        def __init__(self, cell, degree, _cls=core_cls, **kwargs):
            FiatElement.__init__(self, _cls(cell, degree, **kwargs))

        globals()[name] = type(name, (base,), {
            "__init__": __init__, "__module__": __name__,
            "__doc__": f"Symbolic wrapper over elements.{name}."})


_stamp(FiatElement, [
    "Regge", "HellanHerrmannJohnson",
    "GopalakrishnanLedererSchoberlFirstKind",
    "GopalakrishnanLedererSchoberlSecondKind",
])
_stamp(ScalarFiatElement, [
    "Bernstein", "Bubble", "FacetBubble", "CrouzeixRaviart", "Lagrange",
    "DiscontinuousLagrange", "Histopolation", "Serendipity", "DPC",
    "DiscontinuousTaylor", "HDivTrace",
])
_stamp(VectorFiatElement, [
    "RaviartThomas", "BrezziDouglasMarini", "TrimmedSerendipityEdge",
    "TrimmedSerendipityFace", "TrimmedSerendipityDiv",
    "TrimmedSerendipityCurl", "BrezziDouglasMariniCubeEdge",
    "BrezziDouglasMariniCubeFace", "BrezziDouglasFortinMarini",
    "Nedelec", "NedelecSecondKind",
])


class Real(DiscontinuousLagrange):  # noqa: F821
    ...
