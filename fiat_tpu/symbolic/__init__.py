"""The symbolic element layer: elements whose tabulations are traceable
array programs (the FInAT-equivalent; SURVEY.md §2.4).

Where FInAT emits GEM expression DAGs for the TSFC form compiler, fiat_tpu
elements return arrays -- host numpy for static points, traced jnp arrays
inside ``jax.jit`` -- so XLA plays gem's role (CSE, fusion, sum
factorisation) and Pallas/MXU the code generator's."""

from .base import FiniteElementBase, entity_support_dofs          # noqa: F401
from .point_set import (AbstractPointSet, FacetPointSet,          # noqa: F401
                        GaussLegendrePointSet,
                        GaussLobattoLegendrePointSet, KMVPointSet,
                        PointSet, PointSingleton, TensorPointSet,
                        UnknownPointSet)
from .quadrature import (QuadratureRule,                          # noqa: F401
                         TensorProductQuadratureRule, make_quadrature)
from .fiat_bridge import (DPC, Bernstein, BrezziDouglasFortinMarini,  # noqa: F401
                          BrezziDouglasMarini, Bubble, CrouzeixRaviart,
                          DiscontinuousLagrange, DiscontinuousTaylor,
                          FacetBubble, FiatElement,
                          GopalakrishnanLedererSchoberlFirstKind,
                          GopalakrishnanLedererSchoberlSecondKind,
                          HDivTrace, HellanHerrmannJohnson, Histopolation,
                          Lagrange, Nedelec, NedelecSecondKind,
                          RaviartThomas, Real, Regge, ScalarFiatElement,
                          Serendipity, VectorFiatElement)
from .physically_mapped import (DirectlyDefinedElement,           # noqa: F401
                                MappedTabulation,
                                NeedsCoordinateMappingElement,
                                PhysicalGeometry, PhysicallyMappedElement)
from .argyris import Argyris                                      # noqa: F401
from .bell import Bell                                            # noqa: F401
from .hermite import Hermite                                      # noqa: F401
from .hct import HsiehCloughTocher, ReducedHsiehCloughTocher      # noqa: F401
from .morley import Morley                                        # noqa: F401
from .powell_sabin import (QuadraticPowellSabin6,                 # noqa: F401
                           QuadraticPowellSabin12)
from .citations import cite                                       # noqa: F401
