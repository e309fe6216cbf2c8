"""Polynomial sets: spaces as coefficient tensors over an expansion basis.

Parity with /root/reference/FIAT/polynomial_set.py.  A set is
``coeffs[i, (shape...), k]`` against expansion member k; tabulation is a
single dense contraction ``coeffs . base_vals`` -- the MXU-friendly matmul
at the centre of the TPU tabulation path.
"""

from itertools import chain

import numpy as np

from . import expansions
from .expansions import mis  # re-export (reference API location)


class PolynomialSet:
    """Members span(coeffs @ expansion) of degree ``degree`` embedded in the
    expansion set of ``embedded_degree``."""

    def __init__(self, ref_el, degree, embedded_degree, expansion_set, coeffs):
        self.ref_el = ref_el
        self.num_members = coeffs.shape[0]
        self.degree = degree
        self.embedded_degree = embedded_degree
        self.expansion_set = expansion_set
        self.coeffs = coeffs

    def tabulate_new(self, pts):
        return np.dot(self.coeffs,
                      self.expansion_set.tabulate(self.embedded_degree, pts))

    def tabulate(self, pts, jet_order=0):
        """dict alpha -> D^alpha of every member at pts."""
        base_vals = self.expansion_set._tabulate(self.embedded_degree, pts,
                                                 order=jet_order)
        return {alpha: np.dot(self.coeffs, base_vals[alpha])
                for alpha in base_vals}

    def get_expansion_set(self):
        return self.expansion_set

    def get_coeffs(self):
        return self.coeffs

    def get_num_members(self):
        return self.num_members

    def get_degree(self):
        return self.degree

    def get_embedded_degree(self):
        return self.embedded_degree

    def get_dmats(self, cell=0):
        return self.expansion_set.get_dmats(self.embedded_degree, cell=cell)

    def get_reference_element(self):
        return self.ref_el

    def get_shape(self):
        """Value shape of members: () scalar, (d,) vector, etc."""
        return self.coeffs.shape[1:-1]

    def take(self, items):
        return PolynomialSet(self.ref_el, self.degree, self.embedded_degree,
                             self.expansion_set, np.take(self.coeffs, items, 0))

    def __len__(self):
        return self.num_members


def _component_identity_coeffs(shape, num_exp):
    """Coefficients giving one copy of the expansion basis per component."""
    ncomp = int(np.prod(shape, dtype=int))
    if shape == ():
        return np.eye(num_exp)
    coeffs = np.zeros((ncomp * num_exp, *shape, num_exp))
    members = np.arange(num_exp)
    for blk, idx in enumerate(np.ndindex(shape)):
        coeffs[(blk * num_exp + members, *idx, members)] = 1.0
    return coeffs


class ONPolynomialSet(PolynomialSet):
    """Orthonormal expansion basis as a set (per component for non-scalar
    shapes)."""

    def __init__(self, ref_el, degree, shape=(), **kwargs):
        expansion_set = expansions.ExpansionSet(ref_el, **kwargs)
        num_exp = expansion_set.get_num_members(degree)
        coeffs = _component_identity_coeffs(shape, num_exp)
        super().__init__(ref_el, degree, degree, expansion_set, coeffs)


def project(f, U, Q):
    """Expansion coefficients of f against the members of U by quadrature Q."""
    pts, wts = Q.get_points(), Q.get_weights()
    f_at_qps = np.asarray([f(x) for x in pts])
    U_at_qps = U.tabulate(pts)[(0,) * U.ref_el.get_spatial_dimension()]
    return np.asarray([np.sum(wts * f_at_qps * phi) for phi in U_at_qps])


def form_matrix_product(mats, alpha):
    """prod_i mats[i]^alpha[i] (for dmats chains)."""
    result = np.eye(mats[0].shape[0])
    for mat, power in zip(mats, alpha):
        for _ in range(power):
            result = mat @ result
    return result


def spanning_basis(A, nullspace=False, rtol=1e-10):
    """Row-space (or nullspace) orthonormal basis of A by SVD."""
    Aflat = A.reshape(A.shape[0], -1)
    u, sig, vt = np.linalg.svd(Aflat, full_matrices=True)
    num_sv = int(np.sum(np.abs(sig) > rtol * (sig[0] + 1)))
    basis = vt[num_sv:] if nullspace else vt[:num_sv]
    return basis.reshape(-1, *A.shape[1:])


def polynomial_set_union_normalized(A, B):
    """A set spanning span(A) + span(B), re-orthonormalised by SVD."""
    assert A.get_reference_element() == B.get_reference_element()
    new_coeffs = construct_new_coeffs(A.get_reference_element(), A, B)
    return PolynomialSet(A.get_reference_element(),
                         max(A.get_degree(), B.get_degree()),
                         max(A.get_embedded_degree(), B.get_embedded_degree()),
                         A.get_expansion_set(),
                         spanning_basis(new_coeffs))


def construct_new_coeffs(ref_el, A, B):
    """Stack coefficients of A and B over a common embedded degree
    (zero-padding the smaller, exploiting that lower-degree Dubiner bases
    prefix higher-degree ones)."""
    if A.get_expansion_set().continuity != B.get_expansion_set().continuity:
        raise ValueError("Continuity of expansion sets does not match.")
    if (A.get_embedded_degree() != B.get_embedded_degree()
            and A.get_expansion_set().continuity is None):
        hi, lo = ((A, B) if A.get_embedded_degree() > B.get_embedded_degree()
                  else (B, A))
        diff = hi.coeffs.shape[-1] - lo.coeffs.shape[-1]
        pad = [(0, 0)] * (lo.coeffs.ndim - 1) + [(0, diff)]
        return np.concatenate((np.pad(lo.coeffs, pad), hi.coeffs), axis=0)
    if A.get_embedded_degree() == B.get_embedded_degree():
        return np.concatenate((A.coeffs, B.coeffs), axis=0)
    raise NotImplementedError(
        "Union with continuity and mismatched degrees is not supported")


class ONSymTensorPolynomialSet(PolynomialSet):
    """Orthonormal basis of symmetric-matrix-valued polynomials."""

    def __init__(self, ref_el, degree, size=None, **kwargs):
        expansion_set = expansions.ExpansionSet(ref_el, **kwargs)
        sd = ref_el.get_spatial_dimension()
        size = size or sd
        num_exp = expansion_set.get_num_members(degree)
        num_members = (size * (size + 1) // 2) * num_exp
        coeffs = np.zeros((num_members, size, size, num_exp))
        members = np.arange(num_exp)
        blk = 0
        for i in range(size):
            for j in range(i, size):
                rows = blk * num_exp + members
                coeffs[rows, i, j, members] = 1.0
                coeffs[rows, j, i, members] = 1.0
                blk += 1
        super().__init__(ref_el, degree, degree, expansion_set, coeffs)


class TracelessTensorPolynomialSet(PolynomialSet):
    """Orthonormal basis of traceless-matrix-valued polynomials."""

    def __init__(self, ref_el, degree, size=None, **kwargs):
        expansion_set = expansions.ExpansionSet(ref_el, **kwargs)
        sd = ref_el.get_spatial_dimension()
        size = size or sd
        num_exp = expansion_set.get_num_members(degree)
        num_members = (size * size - 1) * num_exp
        coeffs = np.zeros((num_members, size, size, num_exp))
        members = np.arange(num_exp)
        blk = 0
        for i, j in np.ndindex((size, size)):
            if i == size - 1 and j == size - 1:
                continue
            rows = blk * num_exp + members
            coeffs[rows, i, j, members] = 1.0
            if i == j:
                coeffs[rows, -1, -1, members] = -1.0
            blk += 1
        super().__init__(ref_el, degree, degree, expansion_set, coeffs)


def make_bubbles(ref_el, degree, codim=0, shape=(), scale="L2 piola"):
    """Bubbles (C0 members vanishing on dimension sd-codim entity
    boundaries) up to ``degree``."""
    poly_set = ONPolynomialSet(ref_el, degree, shape=shape, scale=scale,
                               variant="bubble")
    sd = ref_el.get_spatial_dimension()
    if sd == 0:
        return poly_set
    entity_ids = expansions.polynomial_entity_ids(ref_el, degree, continuity="C0")
    indices = list(chain(*entity_ids[sd - codim].values()))
    if shape != ():
        ncomp = int(np.prod(shape, dtype=int))
        dimPk = poly_set.get_num_members() // ncomp
        indices = list((np.asarray(indices)[:, None]
                        + dimPk * np.arange(ncomp)[None, :]).flat)
    return poly_set.take(indices)
