"""General (asymmetric) positive-weight simplex quadrature.

The reference's tetrahedron tables (FIAT/xg_quad_data.py, Xiao &
Gimbutas 2010) are NOT fully symmetric -- node-elimination rules can use
~|G| fewer points than symmetry-orbit rules at equal exactness, and the
same holds on the triangle wherever the orbit search stalls above the
published counts.  This module serves the in-repo generated equivalents
(tools/gen_quad3d.py: Gauss-Newton node elimination with strict weight
positivity, seeded from the symmetric orbit rules; nothing read from the
reference's tables but the published point COUNTS as search targets).

Storage: ``triquad_data.py`` / ``tetquad_data.py`` map degree ->
(barycentric points flat, weights); weights integrate over the UFC
reference simplex (sum = 1/d!) and are rescaled by
ref_el.volume() * d! on mapping, the same contract as core/symquad.py.

Reference behaviour covered: FIAT/quadrature_schemes.py:356-418
(_triangle_scheme degrees <= 50, _tetrahedron_scheme degrees <= 15).
"""

from math import factorial

import numpy as np


def _table(sd):
    if sd == 2:
        from . import triquad_data
        return triquad_data.TRIANGLE
    if sd == 3:
        from . import tetquad_data
        return tetquad_data.TETRAHEDRON
    raise KeyError(sd)


def available_degrees(sd=3):
    return sorted(_table(sd))


def _best_covering_degree(table, degree):
    cands = [d for d in table if d >= max(degree, 1)]
    if not cands:
        raise KeyError(degree)
    return min(cands, key=lambda d: len(table[d][1]))


def rule_size(degree, sd=3):
    """Point count of the stored general rule serving ``degree``;
    KeyError when uncovered."""
    table = _table(sd)
    return len(table[_best_covering_degree(table, degree)][1])


def general_rule(ref_el, degree):
    """The stored general rule of exactness >= degree, mapped onto
    ``ref_el``.  Raises KeyError when uncovered."""
    from .quadrature import QuadratureRule
    sd = ref_el.get_spatial_dimension()
    table = _table(sd)
    bary_flat, wts = table[_best_covering_degree(table, degree)]
    bary = np.asarray(bary_flat, dtype=float).reshape(-1, sd + 1)
    verts = np.asarray(ref_el.get_vertices(), dtype=float)
    scale = ref_el.volume() * factorial(sd)
    return QuadratureRule(ref_el, bary @ verts,
                          np.asarray(wts, dtype=float) * scale)
