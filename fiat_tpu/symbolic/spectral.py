"""Spectral shortcut elements (parity with
/root/reference/finat/spectral.py): when the evaluation point set is tagged
as the element's own node family (GL/GLL/KMV), the 0th-derivative table is
replaced by an EXACT identity -- a structural Kronecker delta that XLA
constant-folds out of downstream contractions (diagonal mass without
computation)."""

from abc import ABCMeta, abstractmethod

import numpy as np

from .. import elements as fe
from .citations import cite
from .fiat_bridge import (DiscontinuousLagrange, Lagrange, ScalarFiatElement)
from .point_set import (GaussLegendrePointSet, GaussLobattoLegendrePointSet,
                        KMVPointSet)


class SpectralElement(metaclass=ABCMeta):
    """Mixin replacing the value table by the identity when points match
    the nodes."""

    @property
    @abstractmethod
    def point_set_family(self):
        """The PointSet subclass on which this element tabulates to a
        delta."""

    def basis_evaluation(self, order, ps, entity=None, coordinate_mapping=None):
        result = super().basis_evaluation(order, ps, entity=entity,
                                          coordinate_mapping=coordinate_mapping)
        cell_dimension = self.cell.get_dimension()
        if entity is None or entity == (cell_dimension, 0):
            space_dim = self.space_dimension()
            if isinstance(ps, self.point_set_family) \
                    and len(ps.points) == space_dim:
                spatial_dim = self.cell.get_spatial_dimension()
                result[(0,) * spatial_dim] = np.eye(space_dim)
        return result


class GaussLobattoLegendre(SpectralElement, Lagrange):
    """Continuous spectral element at GLL points."""
    point_set_family = GaussLobattoLegendrePointSet

    def __init__(self, cell, degree):
        super(Lagrange, self).__init__(fe.GaussLobattoLegendre(cell, degree))


class GaussLegendre(SpectralElement, DiscontinuousLagrange):
    """Discontinuous spectral element at GL points."""
    point_set_family = GaussLegendrePointSet

    def __init__(self, cell, degree):
        super(DiscontinuousLagrange, self).__init__(
            fe.GaussLegendre(cell, degree))


class KongMulderVeldhuizen(SpectralElement, ScalarFiatElement):
    """Mass-lumped simplicial spectral element at KMV points."""
    point_set_family = KMVPointSet

    def __init__(self, cell, degree):
        super(ScalarFiatElement, self).__init__(
            fe.KongMulderVeldhuizen(cell, degree))
        cite("ChinJoeKong1999")
        cite("Geevers2018")


class Legendre(ScalarFiatElement):
    """DG modal Legendre element."""

    def __init__(self, cell, degree, variant=None):
        super().__init__(fe.Legendre(cell, degree, variant=variant))


class IntegratedLegendre(ScalarFiatElement):
    """CG integrated-Legendre element."""

    def __init__(self, cell, degree, variant=None):
        super().__init__(fe.IntegratedLegendre(cell, degree, variant=variant))


class FDMLagrange(ScalarFiatElement):
    def __init__(self, cell, degree):
        super().__init__(fe.FDMLagrange(cell, degree))


class FDMDiscontinuousLagrange(ScalarFiatElement):
    def __init__(self, cell, degree):
        super().__init__(fe.FDMDiscontinuousLagrange(cell, degree))


class FDMQuadrature(ScalarFiatElement):
    def __init__(self, cell, degree):
        super().__init__(fe.FDMQuadrature(cell, degree))


class FDMBrokenH1(ScalarFiatElement):
    def __init__(self, cell, degree):
        super().__init__(fe.FDMBrokenH1(cell, degree))


class FDMBrokenL2(ScalarFiatElement):
    def __init__(self, cell, degree):
        super().__init__(fe.FDMBrokenL2(cell, degree))


class FDMHermite(ScalarFiatElement):
    def __init__(self, cell, degree):
        super().__init__(fe.FDMHermite(cell, degree))
