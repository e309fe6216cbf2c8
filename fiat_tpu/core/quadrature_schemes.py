"""Degree -> quadrature rule selection.

Parity note vs /root/reference/FIAT/quadrature_schemes.py: the reference
dispatches to hard-coded Xiao-Gimbutas / Keast point tables for low-degree
triangles/tets and falls back to collapsed Gauss.  Both integrate the
requested degree exactly, so tabulated elements are identical; this rebuild
uses the collapsed Gauss scheme uniformly (fewer-point symmetric tables are
a planned optimisation, tracked in README).  KMV lumped schemes ship with
the KMV element.
"""

import numpy as np

from . import cells as cl
from .quadrature import (FacetQuadratureRule,
                         GaussLobattoLegendreQuadratureLineRule,
                         make_quadrature, make_tensor_product_quadrature)


def create_quadrature(ref_el, degree, scheme="default", entity=None):
    """A rule integrating degree-``degree`` polynomials exactly on
    ``ref_el`` (or one of its subentities, via ``entity=(dim, id)``)."""
    if entity is not None:
        dimension, entity_id = entity
        sub_el = ref_el.construct_subelement(dimension)
        Q_ref = create_quadrature(sub_el, degree, scheme=scheme)
        return FacetQuadratureRule(ref_el, dimension, entity_id, Q_ref)

    if ref_el.is_macrocell():
        from .macro import MacroQuadratureRule
        dimension = ref_el.get_dimension()
        sub_el = ref_el.construct_subelement(dimension)
        Q_ref = create_quadrature(sub_el, degree, scheme=scheme)
        return MacroQuadratureRule(ref_el, Q_ref)

    if ref_el.get_shape() == cl.TENSORPRODUCT:
        try:
            degree = tuple(degree)
        except TypeError:
            degree = (degree,) * len(ref_el.cells)
        assert len(ref_el.cells) == len(degree)
        rules = [create_quadrature(c, d, scheme) for c, d in zip(ref_el.cells, degree)]
        return make_tensor_product_quadrature(*rules)

    if ref_el.get_shape() in (cl.QUADRILATERAL, cl.HEXAHEDRON):
        return create_quadrature(ref_el.product, degree, scheme)

    if degree < 0:
        raise ValueError(f"Need positive degree, not {degree}")

    if scheme in ("default", "canonical"):
        return _collapsed_scheme(ref_el, degree)
    if scheme == "KMV":
        return _kmv_lump_scheme(ref_el, degree)
    raise ValueError(f"Unknown quadrature scheme {scheme!r}")


def _collapsed_scheme(ref_el, degree):
    """Collapsed Gauss rule exact to the requested degree."""
    num_points_per_axis = (degree + 2) // 2
    return make_quadrature(ref_el, num_points_per_axis)


def _kmv_lump_scheme(ref_el, degree):
    """Kong-Mulder-Veldhuizen spectral mass-lumping rules."""
    sd = ref_el.get_spatial_dimension()
    if sd == 1:
        return GaussLobattoLegendreQuadratureLineRule(ref_el, degree + 1)
    from ..elements.kong_mulder_veldhuizen import kmv_quadrature
    return kmv_quadrature(ref_el, degree)
