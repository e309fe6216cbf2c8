"""Tensor-product element descriptions.

Equivalent of /root/reference/finat/ufl/tensorproductelement.py."""

from itertools import chain

from .cell import TensorProductCell, as_cell
from .finiteelementbase import FiniteElementBase
from .sobolevspace import DirectionalSobolevSpace


class TensorProductElement(FiniteElementBase):
    r"""The product space V_1 (x) V_2 (x) ... (x) V_d."""

    def __init__(self, *elements, **kwargs):
        if not elements:
            raise ValueError(
                "Cannot create TensorProductElement from empty list.")
        keywords = list(kwargs.keys())
        if keywords and keywords != ["cell"]:
            raise ValueError(
                f"Unexpected keyword argument {keywords[0]!r}")
        cell = kwargs.get("cell")

        try:
            family, = {e.family() for e in elements}
        except ValueError:
            family = "TensorProductElement"

        if cell is None:
            cell = TensorProductCell(*[e.cell for e in elements])
        else:
            cell = as_cell(cell)

        degree = tuple(e.degree() for e in elements)
        reference_value_shape = tuple(chain(
            *[e.reference_value_shape for e in elements]))
        if len(reference_value_shape) > 1:
            raise ValueError(
                "Product of vector-valued elements not supported")

        FiniteElementBase.__init__(self, family, cell, degree, None,
                                   reference_value_shape)
        self._factor_elements = elements
        self._cell = cell

    def __repr__(self):
        return ("TensorProductElement("
                + ", ".join(repr(e) for e in self._factor_elements)
                + f", cell={self._cell!r})")

    def mapping(self):
        if all(e.mapping() == "identity" for e in self._factor_elements):
            return "identity"
        elif all(e.mapping() == "L2 Piola" for e in self._factor_elements):
            return "L2 Piola"
        return "undefined"

    @property
    def sobolev_space(self):
        elements = self._factor_elements
        if all(e.sobolev_space == elements[0].sobolev_space
               for e in elements):
            return elements[0].sobolev_space
        orders = []
        for e in elements:
            orders.extend((e.sobolev_space._order,)
                          * e.cell.topological_dimension)
        return DirectionalSobolevSpace(orders)

    @property
    def num_factor_elements(self):
        return len(self._factor_elements)

    @property
    def factor_elements(self):
        return self._factor_elements

    def reconstruct(self, **kwargs):
        cell = kwargs.pop("cell", self.cell)
        return TensorProductElement(
            *[e.reconstruct(**kwargs) for e in self.factor_elements],
            cell=cell)

    def variant(self):
        try:
            variant, = {e.variant() for e in self.factor_elements}
            return variant
        except ValueError:
            return None

    def __str__(self):
        return ("TensorProductElement("
                + ", ".join(str(e) for e in self._factor_elements)
                + f", cell={self._cell})")

    def shortstr(self):
        return ("TensorProductElement("
                + ", ".join(e.shortstr() for e in self._factor_elements)
                + f", cell={self._cell})")

    @property
    def embedded_superdegree(self):
        return sum(self.degree())

    @property
    def embedded_subdegree(self):
        return min(self.degree())
