"""First-kind Nedelec H(curl) elements (parity with
/root/reference/FIAT/nedelec.py): N1_k = (P_{k-1})^d + S_k, with edge
tangent, face tangential, and interior moments."""

import numpy as np
from itertools import chain

from ..core import expansions, finite_element, functionals, polyset
from ..core.dualset import DualSet
from ..core.quadrature import FacetQuadratureRule
from ..core.quadrature_schemes import create_quadrature
from ..core.variants import check_format_variant, parse_quadrature_scheme


def _vector_pk_slices(sd, dimPkp1, lo, hi):
    return list(chain(*(range(i * dimPkp1 + lo, i * dimPkp1 + hi)
                        for i in range(sd))))


def NedelecSpace2D(ref_el, degree):
    """(P_{k-1})^2 + P^H_{k-1} rot(x)."""
    sd = ref_el.get_spatial_dimension()
    if sd != 2:
        raise ValueError("NedelecSpace2D requires a 2d reference element")
    k = degree - 1
    vec_Pkp1 = polyset.ONPolynomialSet(ref_el, k + 1, (sd,))
    dimPkp1 = expansions.polynomial_dimension(ref_el, k + 1)
    dimPk = expansions.polynomial_dimension(ref_el, k)
    dimPkm1 = expansions.polynomial_dimension(ref_el, k - 1)

    vec_Pk = vec_Pkp1.take(_vector_pk_slices(sd, dimPkp1, 0, dimPk))
    Pkp1 = polyset.ONPolynomialSet(ref_el, k + 1)
    PkH = Pkp1.take(list(range(dimPkm1, dimPk)))

    Q = create_quadrature(ref_el, 2 * (k + 1))
    Qpts, Qwts = Q.get_points(), Q.get_weights()
    PkH_at_Qpts = PkH.tabulate(Qpts)[(0,) * sd]
    Pkp1_at_Qpts = Pkp1.tabulate(Qpts)[(0,) * sd]

    rot_x = np.dot(np.array([[0.0, 1.0], [-1.0, 0.0]]), Qpts.T)
    PkHrotX_at_Qpts = PkH_at_Qpts[:, None, :] * rot_x[None, :, :]
    coeffs = np.dot(PkHrotX_at_Qpts * Qwts, Pkp1_at_Qpts.T)
    PkHrotX = polyset.PolynomialSet(ref_el, k + 1, k + 1,
                                    vec_Pkp1.get_expansion_set(), coeffs)
    return polyset.polynomial_set_union_normalized(vec_Pk, PkHrotX)


def NedelecSpace3D(ref_el, degree):
    """(P_{k-1})^3 + (harmonic-layer P_k)^3 x x (cross product)."""
    sd = ref_el.get_spatial_dimension()
    if sd != 3:
        raise ValueError("NedelecSpace3D requires a 3d reference element")
    k = degree - 1
    vec_Pkp1 = polyset.ONPolynomialSet(ref_el, k + 1, (sd,))
    dimPkp1 = expansions.polynomial_dimension(ref_el, k + 1)
    dimPk = expansions.polynomial_dimension(ref_el, k)
    dimPkm1 = expansions.polynomial_dimension(ref_el, k - 1)

    vec_Pk = vec_Pkp1.take(_vector_pk_slices(sd, dimPkp1, 0, dimPk))
    vec_Pke = vec_Pkp1.take(_vector_pk_slices(sd, dimPkp1, dimPkm1, dimPk))
    Pkp1 = polyset.ONPolynomialSet(ref_el, k + 1)

    Q = create_quadrature(ref_el, 2 * (k + 1))
    Qpts, Qwts = Q.get_points(), Q.get_weights()
    Pke_qpts = vec_Pke.tabulate(Qpts)[(0,) * sd]
    Pkp1_at_Qpts = Pkp1.tabulate(Qpts)[(0,) * sd]

    PkCrossX_at_Qpts = np.cross(Pke_qpts, Qpts.T[None, :, :], axis=1)
    coeffs = np.dot(PkCrossX_at_Qpts * Qwts, Pkp1_at_Qpts.T)
    PkCrossX = polyset.PolynomialSet(ref_el, k + 1, k + 1,
                                     vec_Pkp1.get_expansion_set(), coeffs)
    return polyset.polynomial_set_union_normalized(vec_Pk, PkCrossX)


class NedelecDual(DualSet):
    """Edge/face tangential moments + interior vector moments."""

    def __init__(self, ref_el, degree, variant, interpolant_deg, quad_scheme):
        nodes = []
        sd = ref_el.get_spatial_dimension()
        top = ref_el.get_topology()
        entity_ids = {dim: {e: [] for e in top[dim]} for dim in top}

        if variant == "integral":
            for dim in range(1, sd):
                phi_deg = degree - dim
                if phi_deg >= 0:
                    facet = ref_el.construct_subelement(dim)
                    Q_ref = parse_quadrature_scheme(facet, interpolant_deg + phi_deg,
                                                    quad_scheme)
                    Pqmd = polyset.ONPolynomialSet(facet, phi_deg, (dim,))
                    Phis = Pqmd.tabulate(Q_ref.get_points())[(0,) * dim]
                    Phis = np.transpose(Phis, (0, 2, 1))
                    for entity in top[dim]:
                        cur = len(nodes)
                        Q = FacetQuadratureRule(ref_el, dim, entity, Q_ref, avg=True)
                        R = np.asarray(ref_el.compute_tangents(dim, entity))
                        phis = np.transpose(np.dot(Phis, R), (0, 2, 1))
                        nodes.extend(functionals.FrobeniusIntegralMoment(ref_el, Q, phi)
                                     for phi in phis)
                        entity_ids[dim][entity] = list(range(cur, len(nodes)))

        elif variant == "point":
            for i in top[1]:
                cur = len(nodes)
                pts = ref_el.make_points(1, i, degree + 1)
                nodes.extend(functionals.PointEdgeTangentEvaluation(ref_el, i, pt)
                             for pt in pts)
                entity_ids[1][i] = list(range(cur, len(nodes)))
            if sd > 2 and degree > 1:
                for i in top[2]:
                    cur = len(nodes)
                    pts = ref_el.make_points(2, i, degree + 1)
                    nodes.extend(functionals.PointFaceTangentEvaluation(ref_el, i, k, pt)
                                 for k in range(2)
                                 for pt in pts)
                    entity_ids[2][i] = list(range(cur, len(nodes)))

        phi_deg = degree - sd
        if phi_deg >= 0:
            if interpolant_deg is None:
                interpolant_deg = degree
            cell = ref_el.construct_subelement(sd)
            Q_ref = parse_quadrature_scheme(cell, interpolant_deg + phi_deg,
                                            quad_scheme)
            Pqmd = polyset.ONPolynomialSet(cell, phi_deg)
            Phis = Pqmd.tabulate(Q_ref.get_points())[(0,) * sd]
            for entity in top[sd]:
                Q = FacetQuadratureRule(ref_el, sd, entity, Q_ref)
                cur = len(nodes)
                nodes.extend(functionals.IntegralMoment(ref_el, Q, phi, (d,), (sd,))
                             for d in range(sd)
                             for phi in Phis)
                entity_ids[sd][entity] = list(range(cur, len(nodes)))

        super().__init__(nodes, ref_el, entity_ids)


class Nedelec(finite_element.CiarletElement):
    """First-kind Nedelec element (covariant Piola)."""

    def __init__(self, ref_el, degree, variant=None, quad_scheme=None):
        splitting, variant, interpolant_deg = check_format_variant(variant, degree)
        if splitting is not None:
            ref_el = splitting(ref_el)
        if ref_el.is_macrocell():
            from ..core.macro import MacroPolynomialSet
            base_element = type(self)(ref_el.get_parent(), degree)
            poly_set = MacroPolynomialSet(ref_el, base_element)
        elif ref_el.get_spatial_dimension() == 3:
            poly_set = NedelecSpace3D(ref_el, degree)
        elif ref_el.get_spatial_dimension() == 2:
            poly_set = NedelecSpace2D(ref_el, degree)
        else:
            raise ValueError("Nedelec is only defined in 2D and 3D")
        dual = NedelecDual(ref_el, degree, variant, interpolant_deg, quad_scheme)
        super().__init__(poly_set, dual, degree, 1, mapping="covariant piola")
