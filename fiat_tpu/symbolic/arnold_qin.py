"""Arnold-Qin elements in the symbolic layer (parity with
/root/reference/finat/arnold_qin.py)."""

from .. import elements as fe
from .citations import cite
from .fiat_bridge import FiatElement
from .piola_mapped import PiolaBubbleElement


class ArnoldQin(FiatElement):
    def __init__(self, cell, degree=2):
        cite("GuzmanNeilan2019")
        super().__init__(fe.ArnoldQin(cell, degree))


class ReducedArnoldQin(PiolaBubbleElement):
    def __init__(self, cell, degree=2):
        cite("GuzmanNeilan2019")
        super().__init__(fe.ArnoldQin(cell, degree, reduced=True))
