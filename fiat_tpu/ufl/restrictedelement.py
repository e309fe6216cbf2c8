"""Restriction of an element description to a class of cell entities.

Equivalent of /root/reference/finat/ufl/restrictedelement.py."""

from .finiteelementbase import FiniteElementBase
from .mixedelement import MixedElement, TensorElement, VectorElement

valid_restriction_domains = ("interior", "facet", "ridge", "face", "edge",
                             "vertex", "reduced")


class RestrictedElement(FiniteElementBase):
    """An element restricted to DoFs on a type of cell entity."""

    def __new__(cls, element, restriction_domain):
        # push the restriction below Mixed/Vector/Tensor
        if isinstance(element, (VectorElement, TensorElement)):
            return element.reconstruct(sub_element=RestrictedElement(
                element.sub_elements[0], restriction_domain))
        elif isinstance(element, MixedElement):
            return MixedElement([RestrictedElement(e, restriction_domain)
                                 for e in element.sub_elements])
        return super().__new__(cls)

    def __init__(self, element, restriction_domain):
        if not isinstance(element, FiniteElementBase):
            raise ValueError("Expecting a finite element instance.")
        if restriction_domain not in valid_restriction_domains:
            raise ValueError(
                f"Expecting one of: {valid_restriction_domains}")
        FiniteElementBase.__init__(self, "RestrictedElement", element.cell,
                                   element.degree(),
                                   element.quadrature_scheme(),
                                   element.reference_value_shape)
        self._element = element
        self._restriction_domain = restriction_domain

    def __repr__(self):
        return (f"RestrictedElement({self._element!r}, "
                f"{self._restriction_domain!r})")

    @property
    def sobolev_space(self):
        return self._element.sobolev_space

    def is_cellwise_constant(self):
        return self._element.is_cellwise_constant()

    def _is_linear(self):
        return self._element._is_linear()

    def sub_element(self):
        """The element being restricted."""
        return self._element

    def mapping(self):
        return self._element.mapping()

    def restriction_domain(self):
        """The entity class the element is restricted to."""
        return self._restriction_domain

    def reconstruct(self, element=None, **kwargs):
        if element is None:
            element = self._element.reconstruct(**kwargs)
        return RestrictedElement(element, self._restriction_domain)

    def __str__(self):
        return f"<{self._element}>|_{{{self._restriction_domain}}}"

    def shortstr(self):
        return (f"<{self._element.shortstr()}>"
                f"|_{{{self._restriction_domain}}}")

    def symmetry(self):
        return self._element.symmetry()

    @property
    def num_sub_elements(self):
        return self._element.num_sub_elements

    @property
    def sub_elements(self):
        return self._element.sub_elements

    def num_restricted_sub_elements(self):
        return 1

    def restricted_sub_elements(self):
        return (self._element,)

    def variant(self):
        return self._element.variant()
