"""Alfeld-Sorokina transformation (parity with
/root/reference/finat/alfeld_sorokina.py): undo the Piola transform on
point values; divergence DoFs scale by detJ."""

import numpy as np

from .. import elements as fe
from .citations import cite
from .fiat_bridge import FiatElement
from .physically_mapped import PhysicallyMappedElement, identity
from .piola_mapped import piola_inverse


class AlfeldSorokina(PhysicallyMappedElement, FiatElement):
    def __init__(self, cell, degree=2):
        cite("GuzmanNeilan2019")
        super().__init__(fe.AlfeldSorokina(cell, degree))

    def basis_transformation(self, coordinate_mapping):
        sd = self.cell.get_spatial_dimension()
        bary, = self.cell.make_points(sd, 0, sd + 1)
        J = coordinate_mapping.jacobian_at(bary)
        detJ = coordinate_mapping.detJ_at(bary)

        dofs = self.entity_dofs()
        V = identity(self.space_dimension())

        nodes = self._element.get_dual_set().nodes
        Finv = piola_inverse(self.cell, J, detJ)
        for dim in sorted(dofs):
            for e in sorted(dofs[dim]):
                k = 0
                while k < len(dofs[dim][e]):
                    cur = dofs[dim][e][k]
                    if len(nodes[cur].deriv_dict) > 0:
                        V[cur, cur] = detJ
                        k += 1
                    else:
                        s = dofs[dim][e][k:k + sd]
                        V[np.ix_(s, s)] = Finv
                        k += sd
        return V.T
