"""Enriched element descriptions (vector sum of spaces).

Equivalent of /root/reference/finat/ufl/enrichedelement.py."""

from .finiteelementbase import FiniteElementBase


class EnrichedElementBase(FiniteElementBase):
    """The vector sum of several finite element spaces."""

    def __init__(self, *elements):
        self._elements = elements
        cell = elements[0].cell
        if not all(e.cell == cell for e in elements[1:]):
            raise ValueError("Cell mismatch in enriched element.")

        if isinstance(elements[0].degree(), int):
            degrees = {e.degree() for e in elements} - {None}
            degree = max(degrees) if degrees else None
        else:
            degree = tuple(map(max, zip(*[e.degree() for e in elements])))

        quad_schemes = [qs for qs in
                        (e.quadrature_scheme() for e in elements)
                        if qs is not None]
        quad_scheme = quad_schemes[0] if quad_schemes else None
        if not all(qs == quad_scheme for qs in quad_schemes):
            raise ValueError("Quadrature scheme mismatch.")

        reference_value_shape = elements[0].reference_value_shape
        if not all(e.reference_value_shape == reference_value_shape
                   for e in elements[1:]):
            raise ValueError("Element reference value shape mismatch.")

        FiniteElementBase.__init__(self, self.__class__.__name__, cell,
                                   degree, quad_scheme,
                                   reference_value_shape)

    def mapping(self):
        return self._elements[0].mapping()

    @property
    def sobolev_space(self):
        spaces = [e.sobolev_space for e in self._elements]
        if all(s == spaces[0] for s in spaces):
            return spaces[0]
        # smallest shared superspace
        superspaces = [{s} | set(s.parents) for s in spaces]
        intersect = set.intersection(*superspaces)
        for s in intersect.copy():
            for parent in s.parents:
                intersect.discard(parent)
        space, = intersect
        return space

    def variant(self):
        try:
            variant, = {e.variant() for e in self._elements}
            return variant
        except ValueError:
            return None

    def reconstruct(self, **kwargs):
        return type(self)(*[e.reconstruct(**kwargs)
                            for e in self._elements])

    @property
    def embedded_subdegree(self):
        return min(e.embedded_subdegree for e in self._elements)

    @property
    def embedded_superdegree(self):
        return max(e.embedded_superdegree for e in self._elements)


class EnrichedElement(EnrichedElementBase):
    """Span of the union of subelement bases; not nodal."""

    def is_cellwise_constant(self):
        return all(e.is_cellwise_constant() for e in self._elements)

    def __repr__(self):
        return ("EnrichedElement("
                + ", ".join(repr(e) for e in self._elements) + ")")

    def __str__(self):
        return "<" + " + ".join(str(e) for e in self._elements) + ">"

    def shortstr(self):
        return "<" + " + ".join(e.shortstr() for e in self._elements) + ">"


class NodalEnrichedElement(EnrichedElementBase):
    """Same space as EnrichedElement but re-orthogonalised to the
    concatenated dual basis, so the result is nodal."""

    def is_cellwise_constant(self):
        return False

    def __repr__(self):
        return ("NodalEnrichedElement("
                + ", ".join(repr(e) for e in self._elements) + ")")

    def __str__(self):
        return ("<Nodal enriched element("
                + ", ".join(str(e) for e in self._elements) + ")>")

    def shortstr(self):
        return ("NodalEnriched("
                + ", ".join(e.shortstr() for e in self._elements) + ")")
