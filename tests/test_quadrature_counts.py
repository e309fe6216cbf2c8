"""Point-count competitiveness of the default quadrature dispatch.

The reference ships precomputed Xiao-Gimbutas tables
(/root/reference/FIAT/xg_quad_data.py, selected by
quadrature_schemes.py:324-412: triangle degrees <= 50, tet <= 15);
fiat_tpu GENERATES its rules (core/symquad.py + core/elimquad.py).
Every consumer integrating against the default scheme pays the point
count forever, so this locks in the competitiveness contract:

* every covered (cell, degree) stays within HARD_CAP of the XG count
  (current worst: tet 12 at 1.21x);
* everything not on the documented over-budget list stays within 1.1x
  (the parity bar).  Entries leave ``OVER_BUDGET`` as the generator
  chains (tools/gen_quad3d.py) land tighter rules -- the test only
  bounds from above, so improvements never break it.

XG counts are frozen here so the test runs without the reference
mounted; tri degrees 1-20 are spot-checked against the live tables
when available.
"""

import pytest

from fiat_tpu.core.cells import ufc_simplex
from fiat_tpu.core.quadrature_schemes import create_quadrature

#: len(points) of the reference's XG tables (frozen 2026-08-19)
XG_TRI = {1: 1, 2: 3, 3: 6, 4: 6, 5: 7, 6: 12, 7: 15, 8: 16, 9: 19,
          10: 25, 11: 28, 12: 33, 13: 37, 14: 42, 15: 49, 16: 55,
          17: 60, 18: 67, 19: 73, 20: 79, 21: 87, 22: 96, 23: 103,
          24: 112, 25: 120, 26: 130, 27: 141, 28: 150, 29: 159,
          30: 171, 31: 181, 32: 193, 33: 204, 34: 214, 35: 228,
          36: 243, 37: 252, 38: 267, 39: 282, 40: 295, 41: 309,
          42: 324, 43: 339, 44: 354, 45: 370, 46: 385, 47: 399,
          48: 423, 49: 435, 50: 453}
XG_TET = {1: 1, 2: 4, 3: 6, 4: 11, 5: 14, 6: 23, 7: 31, 8: 44, 9: 57,
          10: 74, 11: 95, 12: 122, 13: 146, 14: 177, 15: 214}

#: degrees currently above the 1.1x bar (generator chains running;
#: shrink entries as they land -- the test only bounds from above).
#: Empty since the unconstrained transformed solver (gen_quad3d
#: solve_free) landed: every covered (cell, degree) is at or within
#: 1.1x of the XG count, with tet 10/12/13/14 matching XG exactly.
OVER_BUDGET = set()
HARD_CAP = 1.1


@pytest.mark.parametrize("cell_name,dim,table", [
    ("triangle", 2, XG_TRI), ("tetrahedron", 3, XG_TET)])
def test_default_scheme_point_counts_vs_xg(cell_name, dim, table):
    cell = ufc_simplex(dim)
    over = []
    for degree, n_xg in table.items():
        n = len(create_quadrature(cell, degree).get_weights())
        ratio = n / n_xg
        assert ratio <= HARD_CAP, (cell_name, degree, n, n_xg)
        if ratio > 1.1 and (cell_name, degree) not in OVER_BUDGET:
            over.append((degree, n, n_xg, round(ratio, 3)))
    assert not over, f"{cell_name} degrees newly over 1.1x XG: {over}"


def test_frozen_xg_counts_match_reference():
    """Spot-check the frozen table against the live reference."""
    xg = pytest.importorskip("FIAT.xg_quad_data")
    for d in range(1, 21):
        assert len(xg.triangle_table[d]["points"]) == XG_TRI[d]
    for d in range(1, 16):
        assert len(xg.tetrahedron_table[d]["points"]) == XG_TET[d]
