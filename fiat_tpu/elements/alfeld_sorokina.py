"""Alfeld-Sorokina C0(Alfeld) Stokes macroelement with C0 divergence
(parity with /root/reference/FIAT/alfeld_sorokina.py)."""

import numpy as np

from ..core import finite_element, polyset
from ..core.dualset import DualSet
from ..core.functionals import ComponentPointEvaluation, PointDivergence
from ..core.macro import AlfeldSplit, CkPolynomialSet
from ..core.quadrature_schemes import create_quadrature


def AlfeldSorokinaSpace(ref_el, degree):
    """Vector-valued C0 polynomials on the Alfeld split with C0 divergence
    (divergence-jump null space)."""
    ref_complex = AlfeldSplit(ref_el)
    sd = ref_complex.get_spatial_dimension()
    C0 = CkPolynomialSet(ref_complex, degree, order=0, shape=(sd,),
                         variant="bubble")
    expansion_set = C0.get_expansion_set()
    num_members = C0.get_num_members()
    coeffs = C0.get_coeffs()

    facet_el = ref_complex.construct_subelement(sd - 1)
    phi = polyset.ONPolynomialSet(facet_el, 0 if sd == 1 else degree - 1)
    Q = create_quadrature(facet_el, 2 * phi.degree)
    qpts, qwts = Q.get_points(), Q.get_weights()
    phi_at_qpts = phi.tabulate(qpts)[(0,) * (sd - 1)]
    weights = phi_at_qpts * qwts

    rows = []
    for facet in ref_complex.get_interior_facets(sd - 1):
        n = ref_complex.compute_normal(facet)
        jumps = expansion_set.tabulate_normal_jumps(degree, qpts, facet, order=1)
        div_jump = n[:, None, None] * jumps[1][None, ...]
        r = np.tensordot(div_jump, weights, axes=(-1, -1))
        rows.append(r.reshape(num_members, -1).T)

    if rows:
        nsp = polyset.spanning_basis(np.vstack(rows), nullspace=True)
        coeffs = np.tensordot(nsp, coeffs, axes=(-1, 0))
    return polyset.PolynomialSet(ref_complex, degree, degree, expansion_set,
                                 coeffs)


class AlfeldSorokinaDualSet(DualSet):
    def __init__(self, ref_el, degree):
        if degree != 2:
            raise NotImplementedError("AlfeldSorokina only defined for degree = 2")
        top = ref_el.get_topology()
        sd = ref_el.get_spatial_dimension()
        entity_ids = {dim: {e: [] for e in sorted(top[dim])} for dim in sorted(top)}
        nodes = []
        for dim in sorted(top):
            for entity in sorted(top[dim]):
                cur = len(nodes)
                dpts = ref_el.make_points(dim, entity, degree - 1)
                nodes.extend(PointDivergence(ref_el, pt) for pt in dpts)
                pts = ref_el.make_points(dim, entity, degree)
                nodes.extend(ComponentPointEvaluation(ref_el, k, (sd,), pt)
                             for pt in pts for k in range(sd))
                entity_ids[dim][entity].extend(range(cur, len(nodes)))
        super().__init__(nodes, ref_el, entity_ids)


class AlfeldSorokina(finite_element.CiarletElement):
    """Alfeld-Sorokina C0 quadratic macroelement with C0 divergence."""

    def __init__(self, ref_el, degree=2):
        dual = AlfeldSorokinaDualSet(ref_el, degree)
        poly_set = AlfeldSorokinaSpace(ref_el, degree)
        formdegree = ref_el.get_spatial_dimension() - 1
        super().__init__(poly_set, dual, degree, formdegree,
                         mapping="contravariant piola")
