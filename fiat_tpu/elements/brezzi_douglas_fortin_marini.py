"""BDFM element (parity with
/root/reference/FIAT/brezzi_douglas_fortin_marini.py): BDM_k with facet
normal components reduced to degree k-1."""

from ..core.expansions import polynomial_dimension
from .brezzi_douglas_marini import BrezziDouglasMarini
from .nodal_enriched import NodalEnrichedElement
from .restricted import RestrictedElement


def BrezziDouglasFortinMarini(ref_el, degree, variant=None, quad_scheme=None):
    """The BDFM element."""
    if variant == "point":
        BDM_I = RestrictedElement(
            BrezziDouglasMarini(ref_el, degree, variant=variant),
            restriction_domain="interior")
        BDM_F = RestrictedElement(
            BrezziDouglasMarini(ref_el, degree - 1, variant=variant),
            restriction_domain="facet")
        return NodalEnrichedElement(BDM_I, BDM_F)
    BDM = BrezziDouglasMarini(ref_el, degree, variant=variant,
                              quad_scheme=quad_scheme)
    entity_ids = BDM.dual.get_entity_ids()
    sd = ref_el.get_spatial_dimension()
    indices = []
    for dim in sorted(entity_ids):
        if dim == sd - 1:
            s = slice(polynomial_dimension(ref_el.construct_subelement(dim),
                                           degree - 1))
        else:
            s = slice(None)
        for entity in sorted(entity_ids[dim]):
            indices.extend(entity_ids[dim][entity][s])
    return RestrictedElement(BDM, indices)
