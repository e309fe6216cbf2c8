"""Johnson-Mercier macroelement (parity with
/root/reference/FIAT/johnson_mercier.py): H(div;S)-conforming symmetric
tensors on the Alfeld split with facet nn/nt moments."""

import numpy as np

from ..core import finite_element, polyset
from ..core.dualset import DualSet
from ..core.functionals import TensorBidirectionalIntegralMoment
from ..core.macro import AlfeldSplit, HDivSymPolynomialSet
from ..core.quadrature import FacetQuadratureRule
from ..core.variants import parse_quadrature_scheme


class JohnsonMercierDualSet(DualSet):
    def __init__(self, ref_complex, degree, variant=None, quad_scheme=None):
        if degree != 1:
            raise ValueError("Johnson-Mercier only defined for degree=1")
        if variant is not None:
            raise ValueError(f"Johnson-Mercier does not have the {variant} variant")
        ref_el = ref_complex.get_parent()
        top = ref_el.get_topology()
        sd = ref_el.get_spatial_dimension()
        entity_ids = {dim: {e: [] for e in sorted(top[dim])} for dim in sorted(top)}
        nodes = []

        dim = sd - 1
        R = np.array([[0, 1], [-1, 0]])
        ref_facet = ref_el.construct_subelement(dim)
        Qref = parse_quadrature_scheme(ref_facet, 2 * degree, quad_scheme)
        P = polyset.ONPolynomialSet(ref_facet, degree)
        phis = P.tabulate(Qref.get_points())[(0,) * dim]
        for f in sorted(top[dim]):
            cur = len(nodes)
            Q = FacetQuadratureRule(ref_el, dim, f, Qref, avg=True)
            thats = ref_el.compute_tangents(dim, f)
            if sd == 2:
                nhat = np.dot(R, *thats)
                components = (nhat, *thats)
            else:
                nhat = np.cross(*thats)
                ncrosst = np.cross(nhat[None, :], thats, axis=1)
                components = (nhat, *ncrosst)
            nodes.extend(TensorBidirectionalIntegralMoment(ref_el, nhat, comp, Q, phi)
                         for phi in phis for comp in components)
            entity_ids[dim][f].extend(range(cur, len(nodes)))

        cur = len(nodes)
        n = [ref_el.compute_scaled_normal(f) for f in sorted(top[sd - 1])]
        Q = parse_quadrature_scheme(ref_complex, 2 * degree - 1, quad_scheme)
        P = polyset.ONPolynomialSet(ref_el, degree - 1, scale="L2 piola")
        phis = P.tabulate(Q.get_points())[(0,) * sd]
        nodes.extend(TensorBidirectionalIntegralMoment(ref_el, n[i + 1], n[j + 1],
                                                       Q, phi)
                     for phi in phis for i in range(sd) for j in range(i, sd))
        entity_ids[sd][0].extend(range(cur, len(nodes)))

        super().__init__(nodes, ref_el, entity_ids)


class JohnsonMercier(finite_element.CiarletElement):
    """The Johnson-Mercier element."""

    def __init__(self, ref_el, degree=1, variant=None, quad_scheme=None):
        ref_complex = AlfeldSplit(ref_el)
        poly_set = HDivSymPolynomialSet(ref_complex, degree)
        dual = JohnsonMercierDualSet(ref_complex, degree, variant=variant,
                                     quad_scheme=quad_scheme)
        super().__init__(poly_set, dual, degree,
                         ref_el.get_spatial_dimension() - 1,
                         mapping="double contravariant piola")
