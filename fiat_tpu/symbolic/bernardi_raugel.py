"""Bernardi-Raugel transformation (parity with
/root/reference/finat/bernardi_raugel.py)."""

from .. import elements as fe
from .citations import cite
from .piola_mapped import PiolaBubbleElement


class BernardiRaugel(PiolaBubbleElement):
    def __init__(self, cell, order=1, quad_scheme=None):
        cite("Mardal2002")
        super().__init__(fe.BernardiRaugel(cell, order=order,
                                           quad_scheme=quad_scheme))


class BernardiRaugelBubble(BernardiRaugel):
    def __init__(self, cell, degree=None, quad_scheme=None):
        super().__init__(cell, order=0, quad_scheme=quad_scheme)
