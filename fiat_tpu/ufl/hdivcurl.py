"""HDiv/HCurl conforming wrappers and WithMapping.

Equivalent of /root/reference/finat/ufl/hdivcurl.py.  The callable
HDiv/HCurl Sobolev-space instances live in fiat_tpu.ufl.sobolevspace."""

from .finiteelementbase import FiniteElementBase
from .sobolevspace import L2
from .sobolevspace import HCurl as HCurlSobolevSpace
from .sobolevspace import HDiv as HDivSobolevSpace

# the callable space instances double as element constructors:
# HDiv(element) -> HDivElement(element)
HDiv = HDivSobolevSpace
HCurl = HCurlSobolevSpace


class HDivElement(FiniteElementBase):
    """A div-conforming version of an outer-product element."""

    def __init__(self, element):
        self._element = element
        FiniteElementBase.__init__(
            self, "TensorProductElement", element.cell, element.degree(),
            element.quadrature_scheme(),
            (element.cell.topological_dimension,))

    def __repr__(self):
        return f"HDivElement({self._element!r})"

    def mapping(self):
        return "contravariant Piola"

    @property
    def sobolev_space(self):
        return HDivSobolevSpace

    def reconstruct(self, **kwargs):
        return HDivElement(self._element.reconstruct(**kwargs))

    def variant(self):
        return self._element.variant()

    def __str__(self):
        return f"HDivElement({self._element!r})"

    def shortstr(self):
        return f"HDivElement({self._element.shortstr()})"

    @property
    def embedded_subdegree(self):
        return self._element.embedded_subdegree

    @property
    def embedded_superdegree(self):
        return self._element.embedded_superdegree


class HCurlElement(FiniteElementBase):
    """A curl-conforming version of an outer-product element."""

    def __init__(self, element):
        self._element = element
        FiniteElementBase.__init__(
            self, "TensorProductElement", element.cell, element.degree(),
            element.quadrature_scheme(),
            (element.cell.topological_dimension,))

    def __repr__(self):
        return f"HCurlElement({self._element!r})"

    def mapping(self):
        return "covariant Piola"

    @property
    def sobolev_space(self):
        return HCurlSobolevSpace

    def reconstruct(self, **kwargs):
        return HCurlElement(self._element.reconstruct(**kwargs))

    def variant(self):
        return self._element.variant()

    def __str__(self):
        return f"HCurlElement({self._element!r})"

    def shortstr(self):
        return f"HCurlElement({self._element.shortstr()})"

    @property
    def embedded_subdegree(self):
        return self._element.embedded_subdegree

    @property
    def embedded_superdegree(self):
        return self._element.embedded_superdegree


class WithMapping(FiniteElementBase):
    """Specify an alternative reference mapping for the wrappee, e.g.
    ``WithMapping(E, "identity")`` to drop a Piola map."""

    def __init__(self, wrapee, mapping):
        if mapping == "symmetries":
            raise ValueError("Can't change mapping to 'symmetries'")
        self._mapping = mapping
        self.wrapee = wrapee

    def __getattr__(self, attr):
        if attr.startswith("_") or attr == "wrapee":
            raise AttributeError(
                f"{type(self).__name__!r} object has no attribute {attr!r}")
        try:
            return getattr(self.wrapee, attr)
        except AttributeError:
            raise AttributeError(
                f"{type(self).__name__!r} object has no attribute {attr!r}")

    def __repr__(self):
        return f"WithMapping({self.wrapee!r}, {self._mapping!r})"

    def value_shape(self, domain=None):
        tdim = self.cell.topological_dimension
        mapping = self.mapping()
        if mapping in ("covariant Piola", "contravariant Piola"):
            return (tdim,)
        elif mapping in ("double covariant Piola",
                         "double contravariant Piola"):
            return (tdim, tdim)
        return self.wrapee.value_shape(domain)

    @property
    def reference_value_shape(self):
        tdim = self.cell.topological_dimension
        mapping = self.mapping()
        if mapping in ("covariant Piola", "contravariant Piola"):
            return (tdim,)
        elif mapping in ("double covariant Piola",
                         "double contravariant Piola"):
            return (tdim, tdim)
        return self.wrapee.reference_value_shape

    @property
    def cell(self):
        return self.wrapee.cell

    def mapping(self):
        return self._mapping

    @property
    def sobolev_space(self):
        if self.wrapee.mapping() == self.mapping():
            return self.wrapee.sobolev_space
        return L2

    def reconstruct(self, **kwargs):
        mapping = kwargs.pop("mapping", self._mapping)
        return type(self)(self.wrapee.reconstruct(**kwargs), mapping)

    def variant(self):
        return self.wrapee.variant()

    def degree(self, component=None):
        return self.wrapee.degree(component)

    def quadrature_scheme(self):
        return self.wrapee.quadrature_scheme()

    def family(self):
        return self.wrapee.family()

    def __str__(self):
        return f"WithMapping({self.wrapee!r}, {self._mapping})"

    def shortstr(self):
        return f"WithMapping({self.wrapee.shortstr()}, {self._mapping})"

    @property
    def embedded_subdegree(self):
        return self.wrapee.embedded_subdegree

    @property
    def embedded_superdegree(self):
        return self.wrapee.embedded_superdegree
