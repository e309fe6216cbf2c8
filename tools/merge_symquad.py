#!/usr/bin/env python3
"""Merge symquad part files into fiat_tpu/core/symquad_data.py.

Each part file (written by gen_symquad.py --out) defines TRIANGLE and/or
TETRAHEDRON tables.  For every degree, keep the rule with the FEWEST
points among the current data and all parts (ties: the incumbent wins).

Usage: python tools/merge_symquad.py part1.py [part2.py ...]
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fiat_tpu.core.symquad import (ORBIT_SIZE, RULE_COND_MAX,  # noqa: E402
                                   rule_cond)
from gen_symquad import emit                          # noqa: E402


def load_tables(path):
    ns = {}
    with open(path) as f:
        exec(compile(f.read(), path, "exec"), ns)
    return {name: ns.get(name, {}) for name in ("TRIANGLE", "TETRAHEDRON")}


def npts(orbits):
    return sum(ORBIT_SIZE[k] for k, _, _ in orbits)


def main():
    out = os.path.join(REPO, "fiat_tpu", "core", "symquad_data.py")
    merged = load_tables(out)
    for part in sys.argv[1:]:
        tabs = load_tables(part)
        for name, table in tabs.items():
            dim = 2 if name == "TRIANGLE" else 3
            for d, orbits in table.items():
                # a stored rule must beat the collapsed fallback by a
                # margin (else create_quadrature never picks it and the
                # table just carries dead weight)
                if npts(orbits) >= 0.95 * ((d + 2) // 2) ** dim:
                    continue
                cur = merged[name].get(d)
                # rules failing the default dispatch's weight-conditioning
                # gate lose to ANY gate-passing rule, then fewest points
                rank = lambda o: (rule_cond(o) > RULE_COND_MAX, npts(o))
                if cur is None or rank(orbits) < rank(cur):
                    merged[name][d] = orbits
    emit(merged, out)
    for name in ("TRIANGLE", "TETRAHEDRON"):
        t = merged[name]
        print(name, "degrees", min(t, default=0), "-", max(t, default=0),
              "counts", {d: npts(t[d]) for d in sorted(t)})


if __name__ == "__main__":
    main()
