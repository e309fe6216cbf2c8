"""Recover a pointwise dual basis for a non-nodal primal basis (parity with
/root/reference/FIAT/pointwise_dual.py): invert the tabulation at a
unisolvent point set and encode the rows as point-evaluation combinations."""

from collections import defaultdict
from itertools import zip_longest

import numpy as np

from .dualset import DualSet
from .functionals import Functional


def compute_pointwise_dual(el, pts):
    """A DualSet of pointwise-evaluation functionals dual to el's basis
    (exact on the polynomial space; finite-difference-like outside it)."""
    nbf = el.space_dimension()
    T = el.ref_el
    sd = T.get_spatial_dimension()
    ncomp = int(np.prod(el.value_shape())) if el.value_shape() else 1
    assert np.asarray(pts).shape == (nbf // ncomp, sd)

    z = (0,) * sd
    V = el.tabulate(0, pts)[z]
    alphas = np.linalg.inv(V.reshape((nbf, -1)).T).reshape(V.shape)

    pts = np.asarray(pts)
    nds = []
    for coeffs in alphas:
        pt_dict = defaultdict(list)
        nonzero = np.where(np.abs(coeffs) > 1e-12)
        *comp, pt_index = nonzero
        for pt, coeff_comp in zip(pts[pt_index],
                                  zip_longest(coeffs[nonzero], zip(*comp),
                                              fillvalue=())):
            pt_dict[tuple(pt)].append(coeff_comp)
        nds.append(Functional(T, el.value_shape(), dict(pt_dict), {}, "node"))
    return DualSet(nds, T, el.entity_dofs())
