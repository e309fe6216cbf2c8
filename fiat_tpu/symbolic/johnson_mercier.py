"""Johnson-Mercier transformation (parity with
/root/reference/finat/johnson_mercier.py)."""

from .. import elements as fe
from .aw import _facet_transform
from .citations import cite
from .fiat_bridge import FiatElement
from .physically_mapped import PhysicallyMappedElement, identity


class JohnsonMercier(PhysicallyMappedElement, FiatElement):
    """Symmetric-matrix-valued JM macroelement."""

    def __init__(self, cell, degree=1, variant=None, quad_scheme=None):
        self._indices = slice(None, None)
        super().__init__(fe.JohnsonMercier(cell, degree, variant=variant,
                                           quad_scheme=quad_scheme))

    def basis_transformation(self, coordinate_mapping):
        numbf = self._element.space_dimension()
        ndof = self.space_dimension()
        V = identity(numbf, ndof)
        Vsub = _facet_transform(self.cell, 1, coordinate_mapping)
        Vsub = Vsub[:, self._indices]
        m, n = Vsub.shape
        V[:m, :n] = Vsub
        return V.T
