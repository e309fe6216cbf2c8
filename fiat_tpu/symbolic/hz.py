"""Hu-Zhang transformation (parity with /root/reference/finat/hz.py)."""

from .. import elements as fe
from .aw import _evaluation_transform, _facet_transform
from .citations import cite
from .fiat_bridge import FiatElement
from .physically_mapped import PhysicallyMappedElement, identity


class HuZhang(PhysicallyMappedElement, FiatElement):
    def __init__(self, cell, degree=3, variant=None, quad_scheme=None):
        cite("ArnoldWinther2002")
        self.variant = variant
        super().__init__(fe.HuZhang(cell, degree, variant=variant,
                                    quad_scheme=quad_scheme))

    def basis_transformation(self, coordinate_mapping):
        ndofs = self.space_dimension()
        V = identity(ndofs)

        sd = self.cell.get_spatial_dimension()
        W = _evaluation_transform(self.cell, coordinate_mapping)
        ncomp = W.shape[0]
        V[0:3, 0:3] = V[3:6, 3:6] = V[6:9, 6:9] = W
        num_verts = sd + 1
        cur = num_verts * ncomp

        Vsub = _facet_transform(self.cell, self.degree - 2, coordinate_mapping)
        fdofs = Vsub.shape[0]
        V[cur:cur + fdofs, cur:cur + fdofs] = Vsub
        cur += fdofs

        if self.variant == "point":
            while cur < ndofs:
                V[cur:cur + ncomp, cur:cur + ncomp] = W
                cur += ncomp

        h = coordinate_mapping.cell_size()
        for e in range(num_verts):
            V[:, ncomp * e:ncomp * (e + 1)] *= 1 / (h[e] * h[e])
        return V.T
