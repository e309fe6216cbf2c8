"""The element zoo: every family of the reference tabulator (parity with
/root/reference/FIAT/__init__.py, including the ``supported_elements``
registry)."""

# Compositional wrappers
from .discontinuous import DiscontinuousElement                   # noqa: F401
from .enriched import EnrichedElement                             # noqa: F401
from .hdivcurl import Hcurl, Hdiv                                 # noqa: F401
from .mixed import MixedElement                                   # noqa: F401
from .nodal_enriched import NodalEnrichedElement                  # noqa: F401
from .quadrature_element import QuadratureElement                 # noqa: F401
from .restricted import RestrictedElement                         # noqa: F401
from .tensor_product import FlattenedDimensions, TensorProductElement  # noqa: F401

# Families
from .alfeld_sorokina import AlfeldSorokina
from .argyris import Argyris
from .arnold_qin import ArnoldQin
from .arnold_winther import ArnoldWinther, ArnoldWintherNC
from .bell import Bell
from .bernardi_raugel import BernardiRaugel
from .bernstein import Bernstein
from .brezzi_douglas_fortin_marini import BrezziDouglasFortinMarini
from .brezzi_douglas_marini import BrezziDouglasMarini
from .bubble import Bubble, FacetBubble
from .c2_elements import AlfeldC2, BrambleZlamalC2
from .christiansen_hu import ChristiansenHu
from .crouzeix_raviart import CrouzeixRaviart
from .discontinuous_lagrange import DiscontinuousLagrange
from .discontinuous_pc import DPC
from .discontinuous_raviart_thomas import DiscontinuousRaviartThomas
from .discontinuous_taylor import DiscontinuousTaylor
from .fdm_element import (FDMBrokenH1, FDMBrokenL2,                # noqa: F401
                          FDMDiscontinuousLagrange, FDMHermite,
                          FDMLagrange, FDMQuadrature)
from .gopalakrishnan_lederer_schoberl import (
    GopalakrishnanLedererSchoberlFirstKind,
    GopalakrishnanLedererSchoberlSecondKind)
from .guzman_neilan import (GuzmanNeilanFirstKindH1, GuzmanNeilanH1div,
                            GuzmanNeilanSecondKindH1)
from .hct import HsiehCloughTocher
from .hdiv_trace import HDivTrace
from .hellan_herrmann_johnson import HellanHerrmannJohnson
from .hermite import CubicHermite
from .hierarchical import IntegratedLegendre, Legendre
from .histopolation import Histopolation
from .hu_zhang import HuZhang
from .johnson_mercier import JohnsonMercier
from .kong_mulder_veldhuizen import KongMulderVeldhuizen
from .lagrange import Lagrange
from .mardal_tai_winther import MardalTaiWinther
from .morley import Morley
from .nedelec import Nedelec
from .nedelec_second_kind import NedelecSecondKind
from .p0 import P0
from .powell_sabin import QuadraticPowellSabin6, QuadraticPowellSabin12
from .raviart_thomas import RaviartThomas
from .regge import Regge
from .serendipity import Serendipity
from .spectral import GaussLegendre, GaussLobattoLegendre, GaussRadau
from .walkington import Walkington
from .wuxu import WuXuH3NC, WuXuRobustH3NC

__all__ = [name for name in dir() if not name.startswith("_")]

#: family name -> element class (parity with FIAT/__init__.py:72-131)
supported_elements = {
    "Argyris": Argyris,
    "Bell": Bell,
    "Bernardi-Raugel": BernardiRaugel,
    "Bernstein": Bernstein,
    "Brezzi-Douglas-Marini": BrezziDouglasMarini,
    "Brezzi-Douglas-Fortin-Marini": BrezziDouglasFortinMarini,
    "Bubble": Bubble,
    "FacetBubble": FacetBubble,
    "Crouzeix-Raviart": CrouzeixRaviart,
    "Discontinuous Lagrange": DiscontinuousLagrange,
    "S": Serendipity,
    "DPC": DPC,
    "Discontinuous Taylor": DiscontinuousTaylor,
    "Discontinuous Raviart-Thomas": DiscontinuousRaviartThomas,
    "Hermite": CubicHermite,
    "Nonconforming Wu-Xu": WuXuH3NC,
    "Nonconforming Robust Wu-Xu": WuXuRobustH3NC,
    "Hsieh-Clough-Tocher": HsiehCloughTocher,
    "QuadraticPowellSabin6": QuadraticPowellSabin6,
    "QuadraticPowellSabin12": QuadraticPowellSabin12,
    "Alfeld C2": AlfeldC2,
    "Bramble-Zlamal C2": BrambleZlamalC2,
    "Alfeld-Sorokina": AlfeldSorokina,
    "Arnold-Qin": ArnoldQin,
    "Christiansen-Hu": ChristiansenHu,
    "Guzman-Neilan 1st kind H1": GuzmanNeilanFirstKindH1,
    "Guzman-Neilan 2nd kind H1": GuzmanNeilanSecondKindH1,
    "Guzman-Neilan H1(div)": GuzmanNeilanH1div,
    "Johnson-Mercier": JohnsonMercier,
    "Lagrange": Lagrange,
    "Kong-Mulder-Veldhuizen": KongMulderVeldhuizen,
    "Gauss-Lobatto-Legendre": GaussLobattoLegendre,
    "Gauss-Legendre": GaussLegendre,
    "Gauss-Radau": GaussRadau,
    "Histopolation": Histopolation,
    "Legendre": Legendre,
    "Integrated Legendre": IntegratedLegendre,
    "Morley": Morley,
    "Nedelec 1st kind H(curl)": Nedelec,
    "Nedelec 2nd kind H(curl)": NedelecSecondKind,
    "Raviart-Thomas": RaviartThomas,
    "Regge": Regge,
    "HDiv Trace": HDivTrace,
    "Hellan-Herrmann-Johnson": HellanHerrmannJohnson,
    "Gopalakrishnan-Lederer-Schoberl 1st kind":
        GopalakrishnanLedererSchoberlFirstKind,
    "Gopalakrishnan-Lederer-Schoberl 2nd kind":
        GopalakrishnanLedererSchoberlSecondKind,
    "Conforming Arnold-Winther": ArnoldWinther,
    "Nonconforming Arnold-Winther": ArnoldWintherNC,
    "Hu-Zhang": HuZhang,
    "Mardal-Tai-Winther": MardalTaiWinther,
    "Walkington": Walkington,
}

from .trimmed_serendipity import (TrimmedSerendipityCurl,  # noqa: F401
                                  TrimmedSerendipityDiv,
                                  TrimmedSerendipityEdge,
                                  TrimmedSerendipityFace)
from .bdm_cube import (BrezziDouglasMariniCubeEdge,  # noqa: F401
                       BrezziDouglasMariniCubeFace)

supported_elements.update({
    "SminusF": TrimmedSerendipityFace,
    "SminusDiv": TrimmedSerendipityDiv,
    "SminusE": TrimmedSerendipityEdge,
    "SminusCurl": TrimmedSerendipityCurl,
    "Brezzi-Douglas-Marini Cube Face": BrezziDouglasMariniCubeFace,
    "Brezzi-Douglas-Marini Cube Edge": BrezziDouglasMariniCubeEdge,
})

extra_elements = {"P0": P0}
