"""Gopalakrishnan-Lederer-Schoberl elements (parity with
/root/reference/FIAT/gopalakrishnan_lederer_schoberl.py): traceless tensors
with continuous normal-tangential components (MCS Stokes)."""

from ..core import expansions, finite_element, polyset
from ..core.dualset import DualSet
from ..core.functionals import TensorBidirectionalIntegralMoment
from ..core.quadrature import FacetQuadratureRule
from ..core.variants import check_format_variant, parse_quadrature_scheme
from .restricted import RestrictedElement


class GLSDual(DualSet):
    def __init__(self, ref_el, degree, quad_scheme=None):
        sd = ref_el.get_spatial_dimension()
        top = ref_el.get_topology()
        nodes = []
        entity_ids = {dim: {e: [] for e in sorted(top[dim])} for dim in sorted(top)}

        for dim in (sd - 1, sd):
            q = degree + sd - 1 - dim
            if q < 0:
                continue
            ref_facet = ref_el.construct_subelement(dim)
            Q_ref = parse_quadrature_scheme(ref_facet, degree + q, quad_scheme)
            P = polyset.ONPolynomialSet(ref_facet, q, scale=1)
            phis = P.tabulate(Q_ref.get_points())[(0,) * dim]
            for entity in sorted(top[dim]):
                cur = len(nodes)
                Q = FacetQuadratureRule(ref_el, dim, entity, Q_ref, avg=True)
                for f in ref_el.get_connectivity()[(dim, sd - 1)][entity]:
                    normal = ref_el.compute_scaled_normal(f)
                    tangents = ref_el.compute_tangents(sd - 1, f)
                    nodes.extend(
                        TensorBidirectionalIntegralMoment(ref_el, t, normal, Q, phi)
                        for phi in phis for t in tangents)
                entity_ids[dim][entity].extend(range(cur, len(nodes)))
        super().__init__(nodes, ref_el, entity_ids)


class GopalakrishnanLedererSchoberlSecondKind(finite_element.CiarletElement):
    """GLS^2(k): traceless polynomials with continuous nt components."""

    def __init__(self, ref_el, degree, variant=None, quad_scheme=None):
        splitting, variant, interpolant_deg = check_format_variant(variant, degree)
        assert variant == "integral"
        if splitting is not None:
            ref_el = splitting(ref_el)
        if ref_el.is_macrocell():
            from ..core.macro import MacroPolynomialSet
            base_element = type(self)(ref_el.get_parent(), degree)
            poly_set = MacroPolynomialSet(ref_el, base_element)
        else:
            poly_set = polyset.TracelessTensorPolynomialSet(ref_el, degree)
        dual = GLSDual(ref_el, degree, quad_scheme=quad_scheme)
        sd = ref_el.get_spatial_dimension()
        super().__init__(poly_set, dual, degree, (1, sd - 1),
                         mapping="covariant contravariant piola")


def GopalakrishnanLedererSchoberlFirstKind(ref_el, degree, variant=None,
                                           quad_scheme=None):
    """GLS^1(k): nt-continuity reduced to degree k-1 (a restriction)."""
    fe = GopalakrishnanLedererSchoberlSecondKind(ref_el, degree, variant=variant,
                                                 quad_scheme=quad_scheme)
    entity_dofs = fe.entity_dofs()
    sd = ref_el.get_spatial_dimension()
    facet = ref_el.construct_subelement(sd - 1)
    dimPkm1 = (sd - 1) * expansions.polynomial_dimension(facet, degree - 1)
    indices = []
    for f in sorted(entity_dofs[sd - 1]):
        indices.extend(entity_dofs[sd - 1][f][:dimPkm1])
    for cell in sorted(entity_dofs[sd]):
        indices.extend(entity_dofs[sd][cell])
    return RestrictedElement(fe, indices=indices)
