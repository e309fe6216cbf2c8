"""Mixed, Vector, and Tensor element descriptions.

Equivalent of /root/reference/finat/ufl/mixedelement.py: MixedElement
(flat concatenation of subelement values), VectorElement (dim repeated
copies), TensorElement (shaped copies with optional symmetry)."""

import numpy as np

from .cell import CellSequence, as_cell
from .finiteelement import FiniteElement
from .finiteelementbase import FiniteElementBase, product


def shape_to_strides(sh):
    """Row-major strides of a shape."""
    if not sh:
        return ()
    strides = [1]
    for d in reversed(sh[1:]):
        strides.insert(0, strides[0] * d)
    return tuple(strides)


def flatten_multiindex(ii, strides):
    return sum(i * s for i, s in zip(ii, strides))


def unflatten_index(i, strides):
    out = []
    for s in strides:
        out.append(i // s)
        i %= s
    return tuple(out)


_unflatten = unflatten_index


def _max_degree(degrees):
    """Max over possibly tuple-valued degrees."""
    if any(isinstance(d, tuple) for d in degrees):
        return tuple(map(max, zip(*(d if isinstance(d, tuple) else (d,)
                                    for d in degrees))))
    return max(degrees)


class MixedElement(FiniteElementBase):
    """A flat concatenation of subelement value components."""

    def __init__(self, *elements, **kwargs):
        if type(self) is MixedElement and kwargs:
            raise ValueError(
                "Not expecting keyword arguments to MixedElement.")
        if len(elements) == 1 and isinstance(elements[0], (tuple, list)):
            elements = elements[0]
        elements = [MixedElement(e) if isinstance(e, (tuple, list)) else e
                    for e in elements]
        self._sub_elements = elements

        if len(elements) == 0:
            quad_scheme = None
        else:
            quad_scheme = elements[0].quadrature_scheme()
            if not all(e.quadrature_scheme() == quad_scheme
                       for e in elements):
                raise ValueError("Quadrature scheme mismatch.")

        rvs_sum = sum(product(e.reference_value_shape)
                      for e in self._sub_elements)
        reference_value_shape = kwargs.get("reference_value_shape",
                                           (rvs_sum,))

        degrees = {e.degree() for e in self._sub_elements} - {None}
        degree = _max_degree(degrees) if degrees else None
        FiniteElementBase.__init__(self, "Mixed", self._make_cell(), degree,
                                   quad_scheme, reference_value_shape)

    def _make_cell(self):
        if self.num_sub_elements == 0:
            return None
        return CellSequence(tuple(e.cell for e in self.sub_elements))

    def __repr__(self):
        return ("MixedElement("
                + ", ".join(map(repr, self._sub_elements)) + ")")

    def _is_linear(self):
        return all(e._is_linear() for e in self._sub_elements)

    def reconstruct_from_elements(self, *elements):
        if all(a == b for a, b in zip(elements, self._sub_elements)):
            return self
        return MixedElement(*elements)

    def value_shape(self, domain=None):
        # flat concatenation of physical value sizes
        return (sum(e.value_size(domain) for e in self._sub_elements),)

    def symmetry(self, domain=None):
        sm = {}
        j = 0
        for e in self._sub_elements:
            sh = e.value_shape(domain)
            st = shape_to_strides(sh)
            for c0, c1 in e.symmetry(domain).items():
                sm[(flatten_multiindex(c0, st) + j,)] = \
                    (flatten_multiindex(c1, st) + j,)
            j += product(sh)
        if j != product(self.value_shape(domain)):
            raise ValueError("Size mismatch in symmetry algorithm.")
        return sm

    @property
    def sobolev_space(self):
        return max(e.sobolev_space for e in self._sub_elements)

    def mapping(self):
        if all(e.mapping() == "identity" for e in self._sub_elements):
            return "identity"
        return "undefined"

    @property
    def num_sub_elements(self):
        return len(self._sub_elements)

    @property
    def sub_elements(self):
        return self._sub_elements

    def extract_subelement_component(self, i, domain=None):
        if isinstance(i, int):
            i = (i,)
        self._check_component(i, domain)
        if len(self.value_shape(domain)) == 1:
            j, = i
            j = int(j)
            for k, e in enumerate(self._sub_elements):
                sh = e.value_shape(domain)
                si = product(sh)
                if j < si:
                    break
                j -= si
            if j < 0:
                raise ValueError("Moved past last value component!")
            st = shape_to_strides(sh)
            return (k, _unflatten(j, st))
        else:
            k = i[0]
            if k >= len(self._sub_elements):
                raise ValueError(f"Illegal component index {i}.")
            return (k, i[1:])

    def extract_component(self, i, domain=None):
        k, component = self.extract_subelement_component(i, domain)
        return self._sub_elements[k].extract_component(component, domain)

    def extract_subelement_reference_component(self, i):
        if isinstance(i, int):
            i = (i,)
        self._check_reference_component(i)
        assert len(self.reference_value_shape) == 1
        j, = i
        j = int(j)
        for k, e in enumerate(self._sub_elements):
            sh = e.reference_value_shape
            si = product(sh)
            if j < si:
                break
            j -= si
        if j < 0:
            raise ValueError("Moved past last reference component!")
        return (k, _unflatten(j, shape_to_strides(sh)))

    def extract_reference_component(self, i):
        k, comp = self.extract_subelement_reference_component(i)
        return self._sub_elements[k].extract_reference_component(comp)

    def is_cellwise_constant(self, component=None):
        if component is None:
            return all(e.is_cellwise_constant() for e in self.sub_elements)
        i, e = self.extract_component(component)
        return e.is_cellwise_constant()

    def degree(self, component=None):
        if component is None:
            return self._degree
        i, e = self.extract_component(component)
        return e.degree()

    @property
    def embedded_subdegree(self):
        return min(e.embedded_subdegree for e in self.sub_elements)

    @property
    def embedded_superdegree(self):
        return max(e.embedded_superdegree for e in self.sub_elements)

    def reconstruct(self, **kwargs):
        cell = kwargs.pop("cell", None)
        if cell is None:
            cells = self.cell.cells
        elif isinstance(cell, CellSequence):
            cells = cell.cells
        else:
            cells = [cell] * len(self.sub_elements)
        return type(self)(*[e.reconstruct(cell=c, **kwargs)
                            for c, e in zip(cells, self.sub_elements)])

    def variant(self):
        try:
            variant, = {e.variant() for e in self.sub_elements}
            return variant
        except ValueError:
            return None

    def __str__(self):
        return ("<Mixed element: ("
                + ", ".join(map(str, self._sub_elements)) + ")>")

    def shortstr(self):
        return ("Mixed<"
                + ", ".join(e.shortstr() for e in self._sub_elements)
                + ">")

    @property
    def pullback(self):
        from .pullback import MixedPullback
        return MixedPullback(self)


class VectorElement(MixedElement):
    """dim copies of one subelement, vector-valued."""

    def __init__(self, family, cell=None, degree=None, dim=None,
                 form_degree=None, quad_scheme=None, variant=None):
        if isinstance(family, FiniteElementBase):
            sub_element = family
            cell = sub_element.cell
        else:
            if cell is not None:
                cell = as_cell(cell)
            sub_element = FiniteElement(family, cell, degree,
                                        form_degree=form_degree,
                                        quad_scheme=quad_scheme,
                                        variant=variant)
        if dim is None:
            if cell is None:
                raise ValueError(
                    "Cannot infer vector dimension without a cell.")
            dim = cell.topological_dimension

        self._mapping = sub_element.mapping()
        sub_elements = [sub_element] * dim
        reference_value_shape = (dim,) + sub_element.reference_value_shape
        MixedElement.__init__(self, sub_elements,
                              reference_value_shape=reference_value_shape)
        FiniteElementBase.__init__(self, sub_element.family(),
                                   sub_element.cell, sub_element.degree(),
                                   sub_element.quadrature_scheme(),
                                   reference_value_shape)
        self._sub_element = sub_element
        self._repr = f"VectorElement({sub_element!r}, dim={dim})"

    def _make_cell(self):
        if self.num_sub_elements == 0:
            return None
        cell, = set(e.cell for e in self.sub_elements)
        return cell

    def __repr__(self):
        return self._repr

    def value_shape(self, domain=None):
        return ((len(self._sub_elements),)
                + self._sub_element.value_shape(domain))

    def reconstruct(self, sub_element=None, **kwargs):
        if sub_element is None:
            sub_element = self._sub_element.reconstruct(**kwargs)
        return VectorElement(sub_element, dim=len(self.sub_elements))

    def variant(self):
        return self._sub_element.variant()

    def mapping(self):
        return self._mapping

    def __str__(self):
        return (f"<vector element with {len(self._sub_elements)} "
                f"components of {self._sub_element}>")

    def shortstr(self):
        return (f"Vector<{len(self._sub_elements)} x "
                f"{self._sub_element.shortstr()}>")

    @property
    def pullback(self):
        return self._sub_element.pullback


class TensorElement(MixedElement):
    """Shaped copies of one subelement, with optional symmetry."""

    def __init__(self, family, cell=None, degree=None, shape=None,
                 symmetry=None, quad_scheme=None, variant=None):
        if isinstance(family, FiniteElementBase):
            sub_element = family
            cell = sub_element.cell
        else:
            if cell is not None:
                cell = as_cell(cell)
            sub_element = FiniteElement(family, cell, degree,
                                        quad_scheme=quad_scheme,
                                        variant=variant)
        if shape is None:
            if cell is None:
                raise ValueError(
                    "Cannot infer tensor shape without a cell.")
            dim = cell.topological_dimension
            shape = (dim, dim)

        if symmetry is None:
            symmetry = {}
        elif symmetry is True:
            if not (len(shape) == 2 and shape[0] == shape[1]):
                raise ValueError(
                    "Cannot set automatic symmetry for non-square tensor.")
            symmetry = {(i, j): (j, i) for i in range(shape[0])
                        for j in range(shape[1]) if i > j}
        elif not isinstance(symmetry, dict):
            raise ValueError("symmetry must be None, True, or a dict.")

        for i, j in symmetry.items():
            if len(i) != len(j):
                raise ValueError("Non-matching symmetry index lengths.")
            for k in range(len(i)):
                if not (0 <= i[k] < shape[k] and 0 <= j[k] < shape[k]):
                    raise ValueError("Symmetry dimensions out of bounds.")

        indices = list(np.ndindex(*shape)) if shape else [()]
        sub_elements = []
        sub_element_mapping = {}
        for index in indices:
            if index in symmetry:
                continue
            sub_element_mapping[index] = len(sub_elements)
            sub_elements.append(sub_element)
        for index in indices:
            if index in symmetry:
                sub_element_mapping[index] = \
                    sub_element_mapping[symmetry[index]]
        flattened = [sub_element_mapping[index] for index in indices]

        if symmetry:
            reference_value_shape = (product(shape) - len(symmetry),)
            self._mapping = "symmetries"
        else:
            reference_value_shape = shape
            self._mapping = sub_element.mapping()
        reference_value_shape = (reference_value_shape
                                 + sub_element.reference_value_shape)
        MixedElement.__init__(self, sub_elements,
                              reference_value_shape=reference_value_shape)
        self._family = sub_element.family()
        self._degree = sub_element.degree()
        self._sub_element = sub_element
        self._shape = shape
        self._symmetry = symmetry
        self._sub_element_mapping = sub_element_mapping
        self._flattened_sub_element_mapping = flattened
        self._repr = (f"TensorElement({sub_element!r}, shape={shape}, "
                      f"symmetry={symmetry})")

    def _make_cell(self):
        if self.num_sub_elements == 0:
            return None
        cell, = set(e.cell for e in self.sub_elements)
        return cell

    def __repr__(self):
        return self._repr

    def value_shape(self, domain=None):
        return self._shape + self._sub_element.value_shape(domain)

    def variant(self):
        return self._sub_element.variant()

    def mapping(self):
        return self._mapping

    def flattened_sub_element_mapping(self):
        return self._flattened_sub_element_mapping

    def extract_subelement_component(self, i, domain=None):
        if isinstance(i, int):
            i = (i,)
        self._check_component(i, domain)
        i = self.symmetry(domain).get(i, i)
        rank = len(self._shape)
        ii, jj = i[:rank], i[rank:]
        if ii not in self._sub_element_mapping:
            raise ValueError(f"Illegal component index {i}.")
        return (self._sub_element_mapping[ii], jj)

    def symmetry(self, domain=None):
        return self._symmetry

    def reconstruct(self, sub_element=None, **kwargs):
        if sub_element is None:
            sub_element = self._sub_element.reconstruct(**kwargs)
        return TensorElement(sub_element, shape=self._shape,
                             symmetry=self._symmetry)

    def __str__(self):
        sym = ""
        if self._symmetry:
            tmp = ", ".join(f"{a} -> {b}"
                            for a, b in self._symmetry.items())
            sym = f" with symmetries ({tmp})"
        return (f"<tensor element with shape {self.reference_value_shape} "
                f"of {self._sub_element}{sym}>")

    def shortstr(self):
        sym = ""
        if self._symmetry:
            tmp = ", ".join(f"{a} -> {b}"
                            for a, b in self._symmetry.items())
            sym = f" with symmetries ({tmp})"
        return (f"Tensor<{self.reference_value_shape} x "
                f"{self._sub_element.shortstr()}{sym}>")

    @property
    def pullback(self):
        if self._symmetry:
            from .pullback import SymmetricPullback
            import numpy as _np
            symmetry = {}
            n = 0
            for i in _np.ndindex(self._shape):
                if i in self._symmetry and self._symmetry[i] in symmetry:
                    symmetry[i] = symmetry[self._symmetry[i]]
                else:
                    symmetry[i] = n
                    n += 1
            return SymmetricPullback(self, symmetry)
        return self._sub_element.pullback
