"""Bridge from the numerical element zoo to the symbolic layer.

Parity with /root/reference/finat/fiat_elements.py: ``FiatElement`` wraps a
core (Ciarlet) element; ``basis_evaluation`` packs tabulations as arrays of
shape index_shape + value_shape + points_shape.  With a static point set
this is host numpy; with an ``UnknownPointSet`` (traced points inside jit)
the tabulation runs through the member-vectorized jet recurrence and
returns traced arrays -- the XLA graph IS the symbolic tabulation.

Derivative tables beyond the polynomial degree are exact zeros (the
reference marks them structurally with gem.Zero; here XLA constant-folds
the zero arrays)."""

from functools import cached_property

import numpy as np

from .. import elements as fe
from ..core import cells as cl
from .base import FiniteElementBase
from .point_set import PointSet, _is_traced, flat_points


class FiatElement(FiniteElementBase):
    """Wrap a core element for symbolic consumption."""

    def __init__(self, fiat_element):
        super().__init__()
        self._element = fiat_element

    @property
    def cell(self):
        return self._element.get_reference_element()

    @property
    def complex(self):
        return self._element.get_reference_complex()

    @property
    def degree(self):
        return self._element.degree()

    @property
    def formdegree(self):
        return self._element.get_formdegree()

    def entity_dofs(self):
        return self._element.entity_dofs()

    def entity_closure_dofs(self):
        return self._element.entity_closure_dofs()

    @property
    def entity_permutations(self):
        return self._element.entity_permutations()

    def space_dimension(self):
        return self._element.space_dimension()

    @property
    def index_shape(self):
        return (self.space_dimension(),)

    @property
    def value_shape(self):
        return self._element.value_shape()

    @property
    def fiat_equivalent(self):
        return self._element

    def basis_evaluation(self, order, ps, entity=None, coordinate_mapping=None):
        """{alpha: array (space_dim [+ value axes] + points_shape)}."""
        pts = flat_points(ps)
        if _is_traced(pts):
            tables = self._traced_tabulate(order, pts, entity)
        else:
            tables = self._element.tabulate(order, pts, entity)

        # NOTE: for constrained elements (e.g. Bell) FIAT reports more basis
        # functions than the element's space dimension; keep all rows here
        # (the physically-mapped layer restricts after transformation).
        value_shape = self.value_shape
        result = {}
        for alpha, table in tables.items():
            if isinstance(table, Exception):
                result[alpha] = table
                continue
            shaped = table.reshape(table.shape[:1] + value_shape + ps.points_shape)
            result[alpha] = shaped
        return result

    def _traced_tabulate(self, order, pts, entity):
        """Tabulation with traced points: affine entity transform + the
        traceable expansion recurrence + the nodal-coefficient matmul."""
        element = self._element
        ref_el = element.get_reference_element()
        if entity is None:
            entity = (ref_el.get_spatial_dimension(), 0)
        entity_dim, entity_id = entity
        transform = ref_el.get_entity_transform(entity_dim, entity_id)
        cell_pts = transform(pts)

        poly_set = element.get_nodal_basis()
        base = poly_set.get_expansion_set()._tabulate(
            poly_set.get_embedded_degree(), cell_pts, order=order)
        import jax.numpy as jnp
        coeffs = jnp.asarray(np.asarray(poly_set.get_coeffs()))
        flat = coeffs.reshape(-1, coeffs.shape[-1])
        out = {}
        for alpha, tab in base.items():
            vals = flat @ tab
            out[alpha] = vals.reshape(coeffs.shape[:-1] + tab.shape[-1:])
        return out

    @cached_property
    def _dual_basis(self):
        """(Q dense weights (nnodes, npts, *value_shape), unique points)."""
        fiat_dual_basis = self._element.dual_basis()
        if len(fiat_dual_basis) > self.space_dimension():
            # throw away constrained degrees of freedom
            fiat_dual_basis = fiat_dual_basis[:self.space_dimension()]

        seen = {}
        allpts = []
        for dual in fiat_dual_basis:
            if len(dual.deriv_dict) != 0:
                raise NotImplementedError(
                    "Dual bases with derivative nodes have no pointwise dual")
            pts = tuple(sorted(dual.get_point_dict().keys()))
            if pts not in seen:
                kstart = len(allpts)
                seen[pts] = (kstart, kstart + len(pts))
                allpts.extend(pts)

        # dedupe numerically coincident points
        unique_points = []
        unique_indices = [None] * len(allpts)
        atol = 1e-12
        for i in range(len(allpts)):
            for j in reversed(range(len(unique_points))):
                if np.allclose(unique_points[j], allpts[i], atol=atol):
                    unique_indices[i] = j
                    break
            if unique_indices[i] is None:
                unique_indices[i] = len(unique_points)
                unique_points.append(allpts[i])

        npts = len(unique_points)
        Q = np.zeros((len(fiat_dual_basis), npts, *self.value_shape))
        for i, dual in enumerate(fiat_dual_basis):
            point_dict = dual.get_point_dict()
            pts = tuple(sorted(point_dict.keys()))
            kstart, kend = seen[pts]
            for p, k in zip(pts, unique_indices[kstart:kend]):
                for weight, cmp in point_dict[p]:
                    Q[(i, k, *cmp)] += weight
        return Q, np.asarray(unique_points)

    @property
    def dual_basis(self):
        Q, pts = self._dual_basis
        return Q, PointSet(pts)

    @property
    def mapping(self):
        mappings = set(self._element.mapping())
        if len(mappings) != 1:
            return None
        result, = mappings
        return result


class ScalarFiatElement(FiatElement):
    @property
    def value_shape(self):
        return ()


class VectorFiatElement(FiatElement):
    @property
    def value_shape(self):
        return (self.cell.get_spatial_dimension(),)


# -- thin family wrappers (names match the reference finat API) -------------

class Regge(FiatElement):
    def __init__(self, cell, degree, **kwargs):
        super().__init__(fe.Regge(cell, degree, **kwargs))


class HellanHerrmannJohnson(FiatElement):
    def __init__(self, cell, degree, **kwargs):
        super().__init__(fe.HellanHerrmannJohnson(cell, degree, **kwargs))


class GopalakrishnanLedererSchoberlFirstKind(FiatElement):
    def __init__(self, cell, degree, **kwargs):
        super().__init__(fe.GopalakrishnanLedererSchoberlFirstKind(cell, degree,
                                                                   **kwargs))


class GopalakrishnanLedererSchoberlSecondKind(FiatElement):
    def __init__(self, cell, degree, **kwargs):
        super().__init__(fe.GopalakrishnanLedererSchoberlSecondKind(cell, degree,
                                                                    **kwargs))


class Bernstein(ScalarFiatElement):
    def __init__(self, cell, degree):
        super().__init__(fe.Bernstein(cell, degree))


class Bubble(ScalarFiatElement):
    def __init__(self, cell, degree, **kwargs):
        super().__init__(fe.Bubble(cell, degree, **kwargs))


class FacetBubble(ScalarFiatElement):
    def __init__(self, cell, degree, **kwargs):
        super().__init__(fe.FacetBubble(cell, degree, **kwargs))


class CrouzeixRaviart(ScalarFiatElement):
    def __init__(self, cell, degree, **kwargs):
        super().__init__(fe.CrouzeixRaviart(cell, degree, **kwargs))


class Lagrange(ScalarFiatElement):
    def __init__(self, cell, degree, **kwargs):
        super().__init__(fe.Lagrange(cell, degree, **kwargs))


class DiscontinuousLagrange(ScalarFiatElement):
    def __init__(self, cell, degree, **kwargs):
        super().__init__(fe.DiscontinuousLagrange(cell, degree, **kwargs))


class Histopolation(ScalarFiatElement):
    def __init__(self, cell, degree):
        super().__init__(fe.Histopolation(cell, degree))


class Real(DiscontinuousLagrange):
    ...


class Serendipity(ScalarFiatElement):
    def __init__(self, cell, degree):
        super().__init__(fe.Serendipity(cell, degree))


class DPC(ScalarFiatElement):
    def __init__(self, cell, degree):
        super().__init__(fe.DPC(cell, degree))


class DiscontinuousTaylor(ScalarFiatElement):
    def __init__(self, cell, degree):
        super().__init__(fe.DiscontinuousTaylor(cell, degree))


class HDivTrace(ScalarFiatElement):
    def __init__(self, cell, degree, **kwargs):
        super().__init__(fe.HDivTrace(cell, degree, **kwargs))


class RaviartThomas(VectorFiatElement):
    def __init__(self, cell, degree, **kwargs):
        super().__init__(fe.RaviartThomas(cell, degree, **kwargs))


class BrezziDouglasMarini(VectorFiatElement):
    def __init__(self, cell, degree, **kwargs):
        super().__init__(fe.BrezziDouglasMarini(cell, degree, **kwargs))


class TrimmedSerendipityEdge(VectorFiatElement):
    def __init__(self, cell, degree, **kwargs):
        super().__init__(fe.TrimmedSerendipityEdge(cell, degree, **kwargs))


class TrimmedSerendipityFace(VectorFiatElement):
    def __init__(self, cell, degree, **kwargs):
        super().__init__(fe.TrimmedSerendipityFace(cell, degree, **kwargs))


class TrimmedSerendipityDiv(VectorFiatElement):
    def __init__(self, cell, degree, **kwargs):
        super().__init__(fe.TrimmedSerendipityDiv(cell, degree, **kwargs))


class TrimmedSerendipityCurl(VectorFiatElement):
    def __init__(self, cell, degree, **kwargs):
        super().__init__(fe.TrimmedSerendipityCurl(cell, degree, **kwargs))


class BrezziDouglasMariniCubeEdge(VectorFiatElement):
    def __init__(self, cell, degree, **kwargs):
        super().__init__(fe.BrezziDouglasMariniCubeEdge(cell, degree,
                                                        **kwargs))


class BrezziDouglasMariniCubeFace(VectorFiatElement):
    def __init__(self, cell, degree, **kwargs):
        super().__init__(fe.BrezziDouglasMariniCubeFace(cell, degree,
                                                        **kwargs))


class BrezziDouglasFortinMarini(VectorFiatElement):
    def __init__(self, cell, degree, **kwargs):
        super().__init__(fe.BrezziDouglasFortinMarini(cell, degree, **kwargs))


class Nedelec(VectorFiatElement):
    def __init__(self, cell, degree, **kwargs):
        super().__init__(fe.Nedelec(cell, degree, **kwargs))


class NedelecSecondKind(VectorFiatElement):
    def __init__(self, cell, degree, **kwargs):
        super().__init__(fe.NedelecSecondKind(cell, degree, **kwargs))
