"""Extended Bernardi-Raugel element (parity with
/root/reference/FIAT/bernardi_raugel.py): (P_order + facet bubbles)^d with
lattice values and facet normal/tangential bubble moments (the extra
tangential functionals feed the transformation theory)."""

import math

import numpy as np

from ..core import expansions, finite_element, polyset
from ..core.dualset import DualSet
from ..core.functionals import ComponentPointEvaluation, FrobeniusIntegralMoment
from ..core.quadrature import FacetQuadratureRule
from ..core.variants import parse_quadrature_scheme
from .hierarchical import make_dual_bubbles


def BernardiRaugelSpace(ref_el, order):
    """Basis for (P_order + FacetBubble)^d in the C0 bubble expansion."""
    sd = ref_el.get_spatial_dimension()
    if order > sd:
        raise ValueError("The Bernardi-Raugel space needs order <= dim")
    Pd = polyset.ONPolynomialSet(ref_el, sd, shape=(sd,), scale=1, variant="bubble")
    dimPd = expansions.polynomial_dimension(ref_el, sd, continuity="C0")
    entity_ids = expansions.polynomial_entity_ids(ref_el, sd, continuity="C0")

    slices = {dim: slice(math.comb(order - 1, dim)) for dim in range(order)}
    slices.pop(sd - 1, None)
    ids = [i + j * dimPd
           for dim in slices
           for f in sorted(entity_ids[dim])
           for i in entity_ids[dim][f][slices[dim]]
           for j in range(sd)]

    interior_facets = ref_el.get_interior_facets(sd - 1) or ()
    facets = list(set(entity_ids[sd - 1]) - set(interior_facets))
    ids.extend(i + j * dimPd
               for f in sorted(facets)
               for i in entity_ids[sd - 1][f]
               for j in range(sd))
    return Pd.take(ids)


class BernardiRaugelDualSet(DualSet):
    """Lattice component evaluations + facet bubble moments."""

    def __init__(self, ref_el, order=1, degree=None, reduced=False,
                 ref_complex=None, hierarchical=False, quad_scheme=None):
        if ref_complex is None:
            ref_complex = ref_el
        sd = ref_el.get_spatial_dimension()
        if degree is None:
            degree = sd
        if order > sd:
            raise ValueError("BernardiRaugelDualSet needs order <= dim")
        top = ref_el.get_topology()
        entity_ids = {dim: {e: [] for e in sorted(top[dim])} for dim in sorted(top)}

        nodes = []
        if order > 0:
            for dim in sorted(top):
                for entity in sorted(top[dim]):
                    cur = len(nodes)
                    pts = ref_el.make_points(dim, entity, order)
                    nodes.extend(ComponentPointEvaluation(ref_el, comp, (sd,), pt)
                                 for pt in pts for comp in range(sd))
                    entity_ids[dim][entity].extend(range(cur, len(nodes)))

        if order < sd:
            ref_facet = ref_complex.construct_subcomplex(sd - 1)
            ref_area = ref_facet.volume()

            codim = sd - 1 if degree == 1 and ref_facet.is_macrocell() else 0
            Qt_ref, phis = make_dual_bubbles(ref_facet, degree, codim=codim, scale=1)
            ft_at_qpts = phis[-1]
            if codim == 0:
                scale = (-1) ** (sd - 1) * 0.5 * ref_area
            else:
                scale = ref_area / np.dot(ft_at_qpts, Qt_ref.get_weights())
            ft_at_qpts = ft_at_qpts * scale
            if codim != 0:
                ft_at_qpts = ft_at_qpts - (np.dot(ft_at_qpts, Qt_ref.get_weights())
                                           / ref_area)

            interior_facets = ref_el.get_interior_facets(sd - 1) or ()
            facets = list(set(top[sd - 1]) - set(interior_facets))
            Qt = {f: FacetQuadratureRule(ref_el, sd - 1, f, Qt_ref, avg=True)
                  for f in facets}

            if hierarchical:
                Qn = Qt
                fn_at_qpts = ft_at_qpts
            else:
                Qn_ref = parse_quadrature_scheme(ref_facet, degree,
                                                 quad_scheme=quad_scheme)
                Qn = {f: FacetQuadratureRule(ref_el, sd - 1, f, Qn_ref, avg=True)
                      for f in facets}
                fn_at_qpts = np.full(Qn_ref.get_weights().shape, 1 / ref_area)

            thats = {f: ref_el.compute_tangents(sd - 1, f) for f in facets}

            def perp(*v):
                if len(v) == 1:
                    return np.array([v[0][1], -v[0][0]])
                return np.cross(*v)

            ndir = 1 if reduced else sd
            for i in range(ndir):
                for f in sorted(facets):
                    cur = len(nodes)
                    nhat = perp(*thats[f])
                    if i == 0:
                        Q, phi, comp = Qn[f], fn_at_qpts, nhat
                    else:
                        Q, phi = Qt[f], ft_at_qpts
                        comp = (thats[f][i - 1] if sd == 2
                                else perp(nhat, thats[f][i - 1]))
                    nodes.append(FrobeniusIntegralMoment(ref_el, Q,
                                                         np.outer(comp, phi)))
                    entity_ids[sd - 1][f].extend(range(cur, len(nodes)))
        super().__init__(nodes, ref_el, entity_ids)


class BernardiRaugel(finite_element.CiarletElement):
    """The extended Bernardi-Raugel element (inf-sup stable with DG_{k-1})."""

    def __init__(self, ref_el, order=1, hierarchical=False, quad_scheme=None):
        degree = ref_el.get_spatial_dimension()
        if order >= degree:
            raise ValueError("BernardiRaugel only defined for order < dim")
        poly_set = BernardiRaugelSpace(ref_el, order)
        dual = BernardiRaugelDualSet(ref_el, order, degree=degree,
                                     hierarchical=hierarchical,
                                     quad_scheme=quad_scheme)
        super().__init__(poly_set, dual, degree, 0,
                         mapping="contravariant piola")
