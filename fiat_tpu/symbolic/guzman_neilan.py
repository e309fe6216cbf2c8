"""Guzman-Neilan transformations (parity with
/root/reference/finat/guzman_neilan.py)."""

from .. import elements as fe
from .citations import cite
from .piola_mapped import PiolaBubbleElement


class GuzmanNeilanFirstKindH1(PiolaBubbleElement):
    """Pk^d enriched with Guzman-Neilan bubbles."""

    def __init__(self, cell, order=1, quad_scheme=None):
        cite("GuzmanNeilan2019")
        super().__init__(fe.GuzmanNeilanFirstKindH1(cell, order=order,
                                                    quad_scheme=quad_scheme))


class GuzmanNeilanSecondKindH1(PiolaBubbleElement):
    """C0 Pk^d(Alfeld) enriched with Guzman-Neilan bubbles."""

    def __init__(self, cell, order=1, quad_scheme=None):
        cite("GuzmanNeilan2019")
        super().__init__(fe.GuzmanNeilanSecondKindH1(cell, order=order,
                                                     quad_scheme=quad_scheme))


class GuzmanNeilanBubble(GuzmanNeilanFirstKindH1):
    """Modified Bernardi-Raugel bubbles (constant divergence)."""

    def __init__(self, cell, degree=None, quad_scheme=None):
        super().__init__(cell, order=0, quad_scheme=quad_scheme)


class GuzmanNeilanH1div(PiolaBubbleElement):
    """Alfeld-Sorokina nodally enriched with Guzman-Neilan bubbles."""

    def __init__(self, cell, degree=None, quad_scheme=None):
        cite("GuzmanNeilan2019")
        super().__init__(fe.GuzmanNeilanH1div(cell, degree=degree,
                                              quad_scheme=quad_scheme))
