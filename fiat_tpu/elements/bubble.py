"""(Facet)Bubble elements: interior-DoF restrictions of Lagrange (parity
with /root/reference/FIAT/bubble.py)."""

from itertools import chain

from .lagrange import Lagrange
from .restricted import RestrictedElement


class CodimBubble(RestrictedElement):
    """Bubbles of a given codimension."""

    def __init__(self, ref_el, degree, codim, variant=None, quad_scheme=None):
        if variant and variant.startswith("integral"):
            from .hierarchical import IntegratedLegendre
            element = IntegratedLegendre(ref_el, degree, variant=variant,
                                         quad_scheme=quad_scheme)
        else:
            element = Lagrange(ref_el, degree, variant=variant or "equispaced")
        cell_dim = ref_el.get_dimension()
        dofs = sorted(chain(*element.entity_dofs()[cell_dim - codim].values()))
        if len(dofs) == 0:
            raise RuntimeError(
                f"Bubble element of degree {degree} and codimension {codim} "
                f"has no dofs")
        super().__init__(element, indices=dofs)


class Bubble(CodimBubble):
    """Interior DoFs of Lagrange."""

    def __init__(self, ref_el, degree, variant=None, quad_scheme=None):
        super().__init__(ref_el, degree, codim=0, variant=variant,
                         quad_scheme=quad_scheme)


class FacetBubble(CodimBubble):
    """Facet-interior DoFs of Lagrange."""

    def __init__(self, ref_el, degree, variant=None, quad_scheme=None):
        super().__init__(ref_el, degree, codim=1, variant=variant,
                         quad_scheme=quad_scheme)
