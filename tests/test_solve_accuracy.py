"""Refined-truth attribution of the relaxed parity tolerances.

The parity sweep grants BrambleZlamalC2 / AlfeldC2 a relaxed atol
(tests/test_parity_sweep.py _ATOL) because both implementations solve a
~1e8-conditioned generalized Vandermonde.  This module pins down WHOSE
error the residual gap is, by building a third, more accurate oracle:
the reference's own construction (/root/reference/FIAT/c2_elements.py +
finite_element.py:140-165) re-run with its nodal solve refined to the
true (V, B) solution by extended-precision iterative refinement.  The
refined-reference tabulation is then the shared truth:

* BrambleZlamalC2: OUR tabulation sits ~5x closer to the truth than the
  plain reference does (the reference's plain scipy solve loses
  ~cond*eps; ours refines, core/finite_element.py:50-63).  This is the
  justification for the 5e-9 parity atol: the parity gap is dominated
  by the reference's own forward error, which the sweep cannot see.
* AlfeldC2: the plain reference IS accurate (its Vandermonde is only
  ~1e5-conditioned) and the small residual is ours -- macro
  constrained-space assembly.  r5: the extended-precision nullspace
  refinement in polyset.spanning_basis cut it 4.8e-10 -> ~1.8e-10 at
  degree 6; the remainder is f64 V/B ASSEMBLY noise (coefficient error
  ~1e-12 relative, surfacing absolutely through the ~1e2 second
  derivative magnitudes -- the per-alpha residual scales exactly with
  |D^alpha|), bounded at 3e-10 here and 4e-10 in the sweep.
"""

import numpy as np
import pytest

FIAT = pytest.importorskip("FIAT")

import scipy.linalg  # noqa: E402

from fiat_tpu.core import cells as cl  # noqa: E402
from fiat_tpu.elements.c2_elements import (AlfeldC2,  # noqa: E402
                                           BrambleZlamalC2)


def _refined_solve(a, b, *args, transposed=False, **kw):
    """scipy.linalg.solve + longdouble iterative refinement: converges
    to the true f64 solution of the system actually given to scipy."""
    x = scipy.linalg._orig_solve(a, b, *args, transposed=transposed, **kw)
    al = np.asarray(a, np.longdouble)
    if transposed:
        al = al.T
    bl = np.asarray(b, np.longdouble)
    for _ in range(3):
        r = np.asarray(bl - al @ np.asarray(x, np.longdouble), np.float64)
        x = x + scipy.linalg._orig_solve(a, r, *args,
                                         transposed=transposed, **kw)
    return x


def _refined_reference(cls, *args):
    """Build a reference element with its nodal solve refined."""
    scipy.linalg._orig_solve = scipy.linalg.solve
    scipy.linalg.solve = _refined_solve
    try:
        return cls(*args)
    finally:
        scipy.linalg.solve = scipy.linalg._orig_solve
        del scipy.linalg._orig_solve


def _probe_points(n=30):
    rng = np.random.RandomState(0)
    p = rng.rand(n, 2)
    return p / (p.sum(1)[:, None] + 1e-9) * np.random.RandomState(1).rand(n, 1)


def _tab_err(ta, tb):
    return max(np.abs(np.asarray(ta[a]) - np.asarray(tb[a])).max()
               for a in tb)


@pytest.mark.parametrize("degree,ref_floor", [(9, 2e-10), (10, 7e-10)])
def test_bramble_zlamal_gap_is_reference_solve_error(degree, ref_floor):
    from FIAT.c2_elements import BrambleZlamalC2 as RefBZ
    rt = FIAT.ufc_simplex(2)
    truth = _refined_reference(RefBZ, rt, degree)
    plain = RefBZ(rt, degree)
    mine = BrambleZlamalC2(cl.ufc_simplex(2), degree)
    pts = _probe_points()
    t_truth = truth.tabulate(2, pts)
    e_ref = _tab_err(plain.tabulate(2, pts), t_truth)
    e_mine = _tab_err(mine.tabulate(2, pts), t_truth)
    # we are within the global budget of the refined truth ...
    assert e_mine < 4e-10
    # ... while the plain reference's own solve error exceeds it (the
    # measured values are ~3e-10 at degree 9, ~1.3e-9 at degree 10),
    # so the parity sweep's relaxed atol charges the REFERENCE's error
    assert e_ref > ref_floor
    assert e_ref > 2 * e_mine


@pytest.mark.parametrize("degree,bound", [(5, 1e-10), (6, 3e-10)])
def test_alfeld_c2_residual_is_ours_and_bounded(degree, bound):
    from FIAT.c2_elements import AlfeldC2 as RefAC2
    rt = FIAT.ufc_simplex(2)
    truth = _refined_reference(RefAC2, rt, degree)
    plain = RefAC2(rt, degree)
    mine = AlfeldC2(cl.ufc_simplex(2), degree)
    pts = _probe_points()
    t_truth = truth.tabulate(2, pts)
    # the reference's Alfeld Vandermonde is benign: plain == refined
    assert _tab_err(plain.tabulate(2, pts), t_truth) < 1e-11
    # our macro-construction residual stays within the parity bound
    assert _tab_err(mine.tabulate(2, pts), t_truth) < bound
