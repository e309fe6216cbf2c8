"""Guzman-Neilan macroelements (parity with
/root/reference/FIAT/guzman_neilan.py): the extended Bernardi-Raugel space
projected into C0 Pk(Alfeld)^d with P_{k-1} divergence (kinds 1/2 + the
H1(div) enrichment)."""

import math

import numpy as np

from ..core import expansions, finite_element, polyset
from ..core.macro import AlfeldSplit
from ..core.quadrature_schemes import create_quadrature
from .alfeld_sorokina import AlfeldSorokina
from .bernardi_raugel import (BernardiRaugel, BernardiRaugelDualSet,
                              BernardiRaugelSpace)
from .brezzi_douglas_marini import BrezziDouglasMarini
from .nodal_enriched import NodalEnrichedElement
from .restricted import RestrictedElement


def inner(v, u, qwts):
    return np.tensordot(v * qwts, u,
                        axes=(range(1, v.ndim), range(1, u.ndim)))


def div(U):
    return sum(U[k][:, k.index(1), :] for k in U if sum(k) == 1)


def take_interior_bubbles(P, degree=None):
    """Interior bubbles (up to ``degree``) of a complete PolynomialSet on a
    complex."""
    ref_complex = P.get_reference_element()
    ncomp = int(np.prod(P.get_shape()))
    dimPk = P.expansion_set.get_num_members(P.degree)
    assert ncomp * dimPk == P.get_num_members()
    continuity = P.expansion_set.continuity
    entity_ids = expansions.polynomial_entity_ids(ref_complex, P.degree,
                                                  continuity=continuity)
    if degree is None or degree >= P.degree:
        slices = {dim: slice(None) for dim in entity_ids}
    else:
        slices = {dim: slice(math.comb(degree - 1, dim)) for dim in entity_ids}
    ids = [i + j * dimPk
           for dim in slices
           for f in sorted(ref_complex.get_interior_facets(dim))
           for i in entity_ids[dim][f][slices[dim]]
           for j in range(ncomp)]
    return P.take(ids)


def modified_bubble_subspace(B):
    """The modified interior bubble space M_k(K^r) of Guzman-Neilan 2019:
    hat^(k-j) * BDM_j facet functions, projected onto the bubbles."""
    ref_complex = B.get_reference_element()
    sd = ref_complex.get_spatial_dimension()
    degree = B.degree
    rule = create_quadrature(ref_complex, 2 * degree)
    qpts, qwts = rule.get_points(), rule.get_weights()

    hat = B.take([0])
    hat_at_qpts = hat.tabulate(qpts)[(0,) * sd][0, 0]

    ref_el = ref_complex.get_parent()
    bubbles = [np.eye(sd)[:, :, None] * hat_at_qpts[None, None, :] ** degree]
    for k in range(1, degree):
        BDM = BrezziDouglasMarini(ref_el, k)
        BDM_facet = BDM.get_nodal_basis().take(BDM.dual.get_indices("facet"))
        phis = BDM_facet.tabulate(qpts)[(0,) * sd]
        bubbles.append(phis * hat_at_qpts ** (degree - k))
    bubbles = np.concatenate(bubbles, axis=0)

    v = B.tabulate(qpts)[(0,) * sd]
    coeffs = np.linalg.solve(inner(v, v, qwts), inner(v, bubbles, qwts))
    coeffs = np.tensordot(coeffs, B.get_coeffs(), axes=(0, 0))
    return polyset.PolynomialSet(ref_complex, degree, degree,
                                 B.get_expansion_set(), coeffs)


def constant_div_projection(BR, C0, M, num_bubbles):
    """Project the BR space into C0 Pk(Alfeld)^d with P_{k-1} divergence."""
    ref_complex = C0.get_reference_element()
    sd = ref_complex.get_spatial_dimension()
    degree = C0.degree
    rule = create_quadrature(ref_complex, 2 * degree)
    qpts, qwts = rule.get_points(), rule.get_weights()

    Q = polyset.ONPolynomialSet(ref_complex, degree - 1)
    Q = Q.take(list(range(1, Q.get_num_members())))
    P = Q.tabulate(qpts)[(0,) * sd]
    P = P - np.dot(P, qwts)[:, None] / sum(qwts)

    U = M.tabulate(qpts, 1)
    X = BR.tabulate(qpts, 1)
    B = inner(P, div(U), qwts)
    g = inner(P, div(X)[-num_bubbles:], qwts)
    w = np.linalg.solve(B, g)

    v = C0.tabulate(qpts)[(0,) * sd]
    coeffs = np.linalg.solve(inner(v, v, qwts), inner(v, X[(0,) * sd], qwts))
    coeffs = coeffs.T.reshape(BR.get_num_members(), sd, -1)
    coeffs[-num_bubbles:] -= np.tensordot(w, M.get_coeffs(), axes=(0, 0))
    return polyset.PolynomialSet(ref_complex, degree, degree,
                                 C0.get_expansion_set(), coeffs)


def GuzmanNeilanSpace(ref_el, order, kind=1, reduced=False):
    """Basis for the (extended) Guzman-Neilan H1 space."""
    sd = ref_el.get_spatial_dimension()
    ref_complex = AlfeldSplit(ref_el)
    C0 = polyset.ONPolynomialSet(ref_complex, sd, shape=(sd,), scale=1,
                                 variant="bubble")
    B = take_interior_bubbles(C0)
    if sd > 2:
        B = modified_bubble_subspace(B)

    K = ref_complex if kind == 2 else ref_el
    num_bubbles = sd + 1
    if reduced:
        BR = BernardiRaugel(K, order, hierarchical=True).get_nodal_basis()
        reduced_dim = BR.get_num_members() - (sd - 1) * (sd + 1)
        BR = BR.take(list(range(reduced_dim)))
    else:
        num_bubbles *= sd
        BR = BernardiRaugelSpace(K, order)
    return constant_div_projection(BR, C0, B, num_bubbles)


class GuzmanNeilanH1(finite_element.CiarletElement):
    """The Guzman-Neilan H1-conforming (extended) macroelement."""

    def __init__(self, ref_el, order=1, kind=1, quad_scheme=None):
        sd = ref_el.get_spatial_dimension()
        if order >= sd:
            raise ValueError("GuzmanNeilan is only defined for order < dim")
        degree = sd
        poly_set = GuzmanNeilanSpace(ref_el, order, kind=kind)
        ref_complex = poly_set.get_reference_element() if kind == 2 else ref_el
        dual = BernardiRaugelDualSet(ref_complex, order, degree=degree,
                                     quad_scheme=quad_scheme)
        super().__init__(poly_set, dual, degree, sd - 1,
                         mapping="contravariant piola")


class GuzmanNeilanFirstKindH1(GuzmanNeilanH1):
    """GN of the first kind: Pk^d + GN bubbles (paired with unsplit DG)."""

    def __init__(self, ref_el, order=1, quad_scheme=None):
        super().__init__(ref_el, order=order, kind=1, quad_scheme=quad_scheme)


class GuzmanNeilanSecondKindH1(GuzmanNeilanH1):
    """GN of the second kind: C0 Pk(Alfeld)^d + GN bubbles."""

    def __init__(self, ref_el, order=1, quad_scheme=None):
        super().__init__(ref_el, order=order, kind=2, quad_scheme=quad_scheme)


def GuzmanNeilanH1div(ref_el, degree=2, reduced=False, quad_scheme=None):
    """GN H1(div): Alfeld-Sorokina enriched with GN bubbles."""
    order = 0
    AS = AlfeldSorokina(ref_el, 2)
    if reduced or ref_el.get_spatial_dimension() <= 2:
        order = 1
        div_nodes = [i for i, node in enumerate(AS.dual_basis())
                     if len(node.deriv_dict) > 0]
        AS = RestrictedElement(AS, indices=div_nodes)
    GN = GuzmanNeilanH1(ref_el, order=order, quad_scheme=quad_scheme)
    return NodalEnrichedElement(AS, GN)
