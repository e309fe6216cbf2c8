"""Christiansen-Hu transformation (parity with
/root/reference/finat/christiansen_hu.py)."""

from .. import elements as fe
from .citations import cite
from .piola_mapped import PiolaBubbleElement


class ChristiansenHu(PiolaBubbleElement):
    def __init__(self, cell, degree=1):
        cite("GuzmanNeilan2019")
        super().__init__(fe.ChristiansenHu(cell, degree))
