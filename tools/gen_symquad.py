#!/usr/bin/env python3
"""Generate the symmetric simplex quadrature tables (core/symquad_data.py).

For each degree, pick an orbit structure (counts of each symmetry-orbit
type) whose parameter count matches the dimension of the symmetric-
invariant polynomial space, then solve the moment equations

    sum_orbits w_o sum_{x in orbit(o)} phi_k(x) = int phi_k      (all k <= d)

with Gauss-Newton (scipy least_squares, analytic Jacobian) over the orbit
generators AND weights, seeded by degree continuation (the previous
degree's converged rule plus fresh orbits) and random restarts.

Usage: python tools/gen_symquad.py [--dim 2|3] [--max-degree N]
Appends converged rules into fiat_tpu/core/symquad_data.py.
"""

import argparse
import itertools
import os
import sys

import numpy as np
from scipy.optimize import least_squares

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fiat_tpu.core import cells as cl                      # noqa: E402
from fiat_tpu.core.expansions import ExpansionSet          # noqa: E402
from fiat_tpu.core.quadrature import make_quadrature       # noqa: E402
from fiat_tpu.core.symquad import (ORBIT_NPARAM, ORBIT_SIZE,  # noqa: E402
                                   orbit_bary)

TYPES = {2: ["S3", "S21", "S111"],
         3: ["S4", "S31", "S22", "S211", "S1111"]}
# generator validity boxes (barycentric interior with margin)
BOUNDS = {"S3": [], "S21": [(1e-4, 0.4999)], "S111": [(1e-4, 0.9999)] * 2,
          "S4": [], "S31": [(1e-4, 0.3333)], "S22": [(1e-4, 0.2499)],
          "S211": [(1e-4, 0.4999), (1e-4, 0.9999)],
          "S1111": [(1e-4, 0.9999)] * 3}
# reference rule sizes (point counts only, as search targets):
# FIAT/quadrature_schemes.py xg_scheme tables
XG_TRI = {1: 1, 2: 3, 3: 6, 4: 6, 5: 7, 6: 12, 7: 15, 8: 16, 9: 19, 10: 25,
          11: 28, 12: 33, 13: 37, 14: 42, 15: 49, 16: 55, 17: 60, 18: 67,
          19: 73, 20: 79, 21: 87, 22: 96, 23: 103, 24: 112, 25: 120,
          26: 130, 27: 141, 28: 150, 29: 159, 30: 171, 31: 181, 32: 193,
          33: 204, 34: 214, 35: 228, 36: 243, 37: 252, 38: 267, 39: 282,
          40: 295, 41: 309, 42: 324, 43: 339, 44: 354, 45: 370, 46: 385,
          47: 399, 48: 423, 49: 435, 50: 453}
XG_TET = {1: 1, 2: 4, 3: 6, 4: 11, 5: 14, 6: 23, 7: 31, 8: 44, 9: 57,
          10: 74, 11: 95, 12: 122, 13: 146, 14: 177, 15: 214}


def invariant_count(dim, d):
    """dim of symmetric-group-invariant polynomials of degree <= d
    (Molien: 1/prod(1-t^k), k = 2..dim+1)."""
    gens = list(range(2, dim + 2))
    count = 0
    ranges = [range(d // g + 1) for g in gens]
    for combo in itertools.product(*ranges):
        if sum(g * c for g, c in zip(gens, combo)) <= d:
            count += 1
    return count


def structures(dim, d, window=8):
    """Candidate orbit-count tuples, square systems (dof == invariants)
    first, ordered by point count, limited to a window around the
    reference rule size."""
    m = invariant_count(dim, d)
    target = (XG_TRI if dim == 2 else XG_TET).get(d, None)
    types = TYPES[dim]
    dofs = [1 + ORBIT_NPARAM[t] for t in types]   # weight + params
    sizes = [ORBIT_SIZE[t] for t in types]
    maxn = [1] + [m // df + 1 for df in dofs[1:]]
    out = []
    for counts in itertools.product(*[range(n + 1) for n in maxn]):
        dof = sum(c * df for c, df in zip(counts, dofs))
        if dof < m or dof > m + 3:
            continue
        pts = sum(c * s for c, s in zip(counts, sizes))
        if target is not None and not (target - 6 <= pts <= target + window):
            continue
        # prefer square systems at the reference's (near-optimal) size:
        # cheaper-but-infeasible structures otherwise eat the try budget
        gap = abs(pts - target) if target is not None else 0
        out.append((dof != m, gap, pts, counts))
    out.sort()
    return [(pts, counts) for _, _, pts, counts in out], m


class RuleSolver:
    def __init__(self, dim, max_degree):
        self.dim = dim
        self.cell = cl.ufc_simplex(dim)
        self.verts = np.asarray(self.cell.get_vertices())
        self.es = ExpansionSet(self.cell)
        Q = make_quadrature(self.cell, max_degree // 2 + 3)
        qp, qw = Q.get_points(), Q.get_weights()
        self.exact = {}
        phi = self.es.tabulate(max_degree, qp)
        self._phi_int_full = phi @ qw

    def exact_moments(self, d):
        nexp = self.es.get_num_members(d)
        return self._phi_int_full[:nexp]

    def _orbit_grad(self, kind, params, h=1e-7):
        """d(bary)/d(param): orbit structure is piecewise linear in the
        generators, so central differences are exact to roundoff."""
        grads = []
        for j in range(len(params)):
            p1 = list(params); p1[j] += h
            p0 = list(params); p0[j] -= h
            grads.append((orbit_bary(kind, p1) - orbit_bary(kind, p0))
                         / (2 * h))
        return grads

    def residual_and_jac(self, d, structure, theta, want_jac=True):
        """structure: list of (kind, count); theta: flat [params..., w...]
        Returns residual (nexp,) and jacobian (nexp, len(theta)).

        All orbit points are stacked into ONE expansion tabulation per
        evaluation; per-orbit columns come back by segment sums."""
        kinds = [k for k, c in structure for _ in range(c)]
        nparams = sum(ORBIT_NPARAM[k] for k in kinds)
        pvec, wvec = theta[:nparams], theta[nparams:]
        nexp = self.es.get_num_members(d)

        allX, dXs, seg = [], [], [0]
        off = 0
        for kind in kinds:
            np_ = ORBIT_NPARAM[kind]
            params = pvec[off:off + np_]
            B = orbit_bary(kind, params)
            allX.append(B @ self.verts)
            if want_jac and np_:
                dXs.append([g @ self.verts
                            for g in self._orbit_grad(kind, params)])
            else:
                dXs.append([])
            seg.append(seg[-1] + len(B))
            off += np_

        X = np.vstack(allX)
        if want_jac:
            tabs = self.es._tabulate(d, X, order=1)
            phi = tabs[(0,) * self.dim]
            grads = np.stack([tabs[tuple(a)]
                              for a in np.eye(self.dim, dtype=int)])
        else:
            phi = self.es.tabulate(d, X)

        V = np.add.reduceat(phi, seg[:-1], axis=1)               # (nexp, norb)
        r = V @ wvec - self.exact_moments(d)
        if not want_jac:
            return r, None
        J = np.zeros((nexp, len(theta)))
        off = 0
        for i, kind in enumerate(kinds):
            sl = slice(seg[i], seg[i + 1])
            for dx in dXs[i]:
                J[:, off] = wvec[i] * np.einsum("dep,pd->e",
                                                grads[:, :, sl], dx)
                off += 1
        J[:, nparams:] = V
        return r, J

    def attempt(self, d, structure, theta0, nparams):
        lo, hi = [], []
        for kind, c in structure:
            for _ in range(c):
                for (a, b) in BOUNDS[kind]:
                    lo.append(a)
                    hi.append(b)
        lo += [-np.inf] * (len(theta0) - nparams)
        hi += [np.inf] * (len(theta0) - nparams)
        fun = lambda th: self.residual_and_jac(d, structure, th, False)[0]
        jac = lambda th: self.residual_and_jac(d, structure, th, True)[1]
        try:
            sol = least_squares(fun, np.clip(theta0, lo, hi), jac=jac,
                                bounds=(lo, hi), method="trf",
                                xtol=3e-16, ftol=3e-16, gtol=1e-14,
                                max_nfev=260)
        except Exception:
            return None
        r = fun(sol.x)
        if np.abs(r).max() < 2e-14:
            return sol.x
        return None

    def verify(self, d, orbits):
        """Exactness of the expanded rule on every Dubiner mode <= d."""
        from fiat_tpu.core.symquad import expand_rule
        bary, wts = expand_rule(orbits)
        if bary.min() < 1e-6:
            return False, "exterior"
        X = bary @ self.verts
        phi = self.es.tabulate(d, X)
        err = np.abs(phi @ wts - self.exact_moments(d)).max()
        return err < 5e-14, err


def pack(structure, theta):
    kinds = [k for k, c in structure for _ in range(c)]
    nparams = sum(ORBIT_NPARAM[k] for k in kinds)
    pvec, wvec = theta[:nparams], theta[nparams:]
    orbits, off = [], 0
    for i, kind in enumerate(kinds):
        np_ = ORBIT_NPARAM[kind]
        orbits.append((kind, tuple(float(p) for p in pvec[off:off + np_]),
                       float(wvec[i])))
        off += np_
    return orbits


def seed_from(prev, structure, rng, solver, d):
    """Continuation seed: reuse the previous rule's generators where the
    kinds match, fill the rest quasi-randomly, weights by lstsq."""
    kinds = [k for k, c in structure for _ in range(c)]
    pool = {}
    if prev:
        for kind, params, w in prev:
            pool.setdefault(kind, []).append(list(params))
    pvec = []
    jitter = 0.0 if rng.integers(3) == 0 else 0.015
    for kind in kinds:
        avail = pool.get(kind, [])
        if avail:
            base = avail.pop(0)
            pvec.extend([p + jitter * rng.standard_normal() for p in base])
        else:
            while True:
                fresh = [rng.uniform(lo + 0.02, hi - 0.02)
                         for (lo, hi) in BOUNDS[kind]]
                if sum(fresh) < 0.95 or len(fresh) < 2:
                    break
            pvec.extend(fresh)
    norb = len(kinds)
    theta = np.array(pvec + [0.0] * norb)
    # linear solve for the weights at the seeded positions
    nparams = len(pvec)
    _, J = solver.residual_and_jac(d, structure, theta, True)
    V = J[:, nparams:]
    w, *_ = np.linalg.lstsq(V, solver.exact_moments(d), rcond=None)
    theta[nparams:] = w
    return theta, nparams


def generate(dim, max_degree, out_path, tries=40):
    solver = RuleSolver(dim, max_degree)
    rng = np.random.default_rng(2026)
    table = {}
    prev = None
    for d in range(1, max_degree + 1):
        cands, m = structures(dim, d)
        got = fallback = None
        tries_d = tries + 2 * d
        for pts, counts in cands[:4]:
            structure = [(k, c) for k, c in zip(TYPES[dim], counts) if c]
            for t in range(tries_d):
                theta0, nparams = seed_from(prev if t % 3 != 2 else None,
                                            structure, rng, solver, d)
                sol = solver.attempt(d, structure, theta0, nparams)
                if sol is None:
                    continue
                orbits = pack(structure, sol)
                ok, err = solver.verify(d, orbits)
                if not ok:
                    continue
                if all(w > 0 for _, _, w in orbits):
                    got = (pts, orbits)      # prefer positive weights
                    break
                if fallback is None:
                    fallback = (pts, orbits)
            if got:
                break
        if got is None and fallback is not None:
            got = fallback
        if got is None:
            # node elimination from the GM rule: slower to reach the
            # reference count but verified and always available
            orbits = eliminate_degree(solver, dim, d, 
                                      (XG_TRI if dim == 2 else XG_TET).get(d, 10**9))
            ok, err = solver.verify(d, orbits)
            if ok:
                got = (sum(ORBIT_SIZE[k] for k, _, _ in orbits), orbits)
        if got:
            pts, orbits = got
            table[d] = orbits
            prev = orbits
            target = (XG_TRI if dim == 2 else XG_TET).get(d)
            print(f"dim {dim} degree {d:3d}: {pts:4d} pts "
                  f"(reference {target}) OK", flush=True)
            _save(dim, table, out_path)      # survive interruption
        else:
            # keep the last converged rule as the continuation seed: its
            # generators are still better-than-random starts
            print(f"dim {dim} degree {d:3d}: FAILED", flush=True)
    return table


def _save(dim, table, out_path):
    tables = {"TRIANGLE": {}, "TETRAHEDRON": {}}
    try:
        import importlib
        from fiat_tpu.core import symquad_data
        importlib.reload(symquad_data)
        tables["TRIANGLE"].update(symquad_data.TRIANGLE)
        tables["TETRAHEDRON"].update(symquad_data.TETRAHEDRON)
    except Exception:
        pass
    tables["TRIANGLE" if dim == 2 else "TETRAHEDRON"].update(table)
    emit(tables, out_path)


def emit(tables, out_path):
    tmp_path = out_path + ".tmp"
    with open(tmp_path, "w") as f:
        f.write('"""Generated by tools/gen_symquad.py -- do not edit.\n\n'
                "Symmetric simplex quadrature orbit tables: {degree:\n"
                "[(orbit kind, generator params, orbit weight)]}, weights\n"
                'normalised to unit cell measure."""\n\n')
        for name, table in tables.items():
            f.write(f"{name} = {{\n")
            for d in sorted(table):
                f.write(f"    {d}: [\n")
                for kind, params, w in table[d]:
                    ps = ", ".join(f"{float(p)!r}" for p in params)
                    tail = f"({ps},)" if params else "()"
                    f.write(f'        ("{kind}", {tail}, {float(w)!r}),\n')
                f.write("    ],\n")
            f.write("}\n\n")
    os.replace(tmp_path, out_path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--max-degree", type=int, default=20)
    ap.add_argument("--tries", type=int, default=40)
    ap.add_argument("--strategy", default="newton",
                    choices=("newton", "eliminate"))
    args = ap.parse_args()
    out = os.path.join(REPO, "fiat_tpu", "core", "symquad_data.py")
    if args.strategy == "eliminate":
        table = generate_eliminate(args.dim, args.max_degree, out)
    else:
        table = generate(args.dim, args.max_degree, out, tries=args.tries)
    _save(args.dim, table, out)
    print("wrote", out)




# =============================================================================
# Elimination strategy: start from the exact Grundmann-Moller rule (itself
# fully symmetric) in orbit form and remove orbits one at a time, re-solving
# with Gauss-Newton seeded at the current rule -- every solve starts near a
# solution, unlike random restarts whose basins vanish past degree ~11.
# =============================================================================

def gm_orbits(dim, d):
    """The Grundmann-Moller rule of exactness >= d as symmetry orbits
    [(kind, params, weight)], weights on the UFC simplex."""
    from fiat_tpu.core.quadrature_schemes import _grundmann_moller_scheme
    from fiat_tpu.core.macro import xy_to_bary
    cell = cl.ufc_simplex(dim)
    Q = _grundmann_moller_scheme(cell, d)
    bary = xy_to_bary(cell.get_vertices(), Q.get_points())
    wts = Q.get_weights()
    groups = {}
    for b, w in zip(bary, wts):
        key = tuple(np.round(np.sort(b), 12))
        groups.setdefault(key, []).append((b, w))
    orbits = []
    for key, pts in groups.items():
        b, w = pts[0]
        vals = np.sort(b)[::-1]
        if np.isclose(vals[0], vals[-1]):
            kind = "S4" if dim == 3 else "S3"
            params = ()
        elif dim == 2:
            if np.isclose(vals[0], vals[1]) or np.isclose(vals[1], vals[2]):
                a = vals[1]      # the repeated value (< 1/2)
                kind, params = "S21", (float(a),)
            else:
                kind, params = "S111", (float(vals[0]), float(vals[1]))
        else:
            uniq = len(set(np.round(vals, 12)))
            if uniq == 2 and np.isclose(vals[0], vals[1]) and np.isclose(vals[2], vals[3]):
                kind, params = "S22", (float(vals[2]),)
            elif uniq == 2:
                # (a,a,a,b) pattern
                a = vals[1] if np.isclose(vals[0], vals[1]) else vals[2]
                kind, params = "S31", (float(a),)
            elif uniq == 3:
                # (a,a,b,c)
                rep = [v for v in vals if np.isclose(vals, v).sum() == 2][0]
                others = sorted(set(float(np.round(v, 14)) for v in vals
                                    if not np.isclose(v, rep)))
                kind, params = "S211", (float(rep), float(others[0]))
            else:
                kind, params = "S1111", tuple(float(v) for v in vals[:3])
        # several GM layers can hit the same lattice orbit (the centroid
        # does): the per-point weight is the group total / orbit size
        assert len(pts) % ORBIT_SIZE[kind] == 0, (kind, len(pts), key)
        total = sum(wi for _, wi in pts)
        orbits.append((kind, params, float(total / ORBIT_SIZE[kind])))
    return orbits


def _theta_from_orbits(orbits):
    """kind-major (structure, theta, nparams) from an orbit list."""
    order = {k: i for i, k in enumerate(["S3", "S21", "S111", "S4", "S31",
                                         "S22", "S211", "S1111"])}
    orbits = sorted(orbits, key=lambda o: order[o[0]])
    counts = {}
    for kind, params, w in orbits:
        counts[kind] = counts.get(kind, 0) + 1
    structure = [(k, counts[k]) for k in order if k in counts]
    pvec = [p for kind, params, w in orbits for p in params]
    wvec = [w for kind, params, w in orbits]
    return structure, np.array(pvec + wvec), len(pvec)


def eliminate_degree(solver, dim, d, target, verbose=False):
    """Node elimination from the GM rule down toward ``target`` points.
    Returns the best verified orbit list found."""
    orbits = gm_orbits(dim, d)
    m = invariant_count(dim, d)
    best = orbits

    def npts(os):
        return sum(ORBIT_SIZE[k] for k, _, _ in os)

    while npts(best) > target:
        # rank removal candidates by |w| * orbit size (least important)
        ranked = sorted(range(len(best)),
                        key=lambda i: abs(best[i][2]) * ORBIT_SIZE[best[i][0]])
        improved = None
        for i in ranked[:6]:
            trial = [o for j, o in enumerate(best) if j != i]
            dof = sum(1 + ORBIT_NPARAM[k] for k, _, _ in trial)
            if dof < m:
                continue
            structure, theta0, nparams = _theta_from_orbits(trial)
            sol = solver.attempt(d, structure, theta0, nparams)
            if sol is None:
                continue
            orbs = pack(structure, sol)
            ok, err = solver.verify(d, orbs)
            if ok:
                improved = orbs
                break
        if improved is None:
            break
        best = improved
        if verbose:
            print(f"    -> {npts(best)} pts", flush=True)
    return best


def generate_eliminate(dim, max_degree, out_path):
    solver = RuleSolver(dim, max_degree)
    targets = XG_TRI if dim == 2 else XG_TET
    table = {}
    for d in range(1, max_degree + 1):
        target = targets.get(d, 10 ** 9)
        best = eliminate_degree(solver, dim, d, target)
        pts = sum(ORBIT_SIZE[k] for k, _, _ in best)
        ok, err = solver.verify(d, best)
        if ok:
            table[d] = best
            print(f"dim {dim} degree {d:3d}: {pts:4d} pts "
                  f"(reference {target}) OK", flush=True)
            _save(dim, table, out_path)
        else:
            print(f"dim {dim} degree {d:3d}: verify failed ({err})", flush=True)
    return table

if __name__ == "__main__":
    main()
