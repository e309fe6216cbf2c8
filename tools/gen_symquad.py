#!/usr/bin/env python3
"""Generate the symmetric simplex quadrature tables (core/symquad_data.py).

Strategy (Xiao & Gimbutas 2010 style, nothing copied from the reference's
tables -- only the published point COUNTS are used as search targets):

  per degree d:
    1. a few square Gauss-Newton attempts at structures matching the
       target count, seeded by degree continuation;
    2. otherwise AUGMENT the previous degree's rule with fresh orbits
       until the parameter count exceeds the invariant count (under-
       determined systems converge from far seeds), then ELIMINATE:
       repeatedly remove or degenerate (S111->S21->S3, S1111->S211->...)
       the least important orbit and re-solve, weights re-seeded by
       least squares, until the target count is reached or the time
       budget runs out;
    3. fall back to elimination from the (exact, fully symmetric)
       Grundmann-Moller rule.

  The best verified rule found is stored even when it is above the
  target count -- it is still far below the GM/collapsed fallbacks.

Usage: python tools/gen_symquad.py --dim 2|3 --max-degree N
       [--out PATH] [--budget SECONDS_PER_DEGREE]
Writes {degree: [(orbit kind, params, weight)]} tables; merge part files
with tools/merge_symquad.py.
"""

import argparse
import itertools
import os
import sys
import time

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
KIND_ORDER = {k: i for i, k in enumerate(
    ["S3", "S21", "S111", "S4", "S31", "S22", "S211", "S1111"])}
# generator validity boxes (barycentric interior with margin; the lower
# edge must admit the collapsed-rule seeds, whose corner points sit at
# products of near-boundary Gauss nodes ~1e-5)
BOUNDS = {"S3": [], "S21": [(2e-6, 0.4999)], "S111": [(2e-6, 0.9999)] * 2,
          "S4": [], "S31": [(2e-6, 0.3333)], "S22": [(2e-6, 0.2499)],
          "S211": [(2e-6, 0.4999), (2e-6, 0.9999)],
          "S1111": [(2e-6, 0.9999)] * 3}
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


def npts(orbits):
    return sum(ORBIT_SIZE[k] for k, _, _ in orbits)


def ndof(orbits):
    return sum(1 + ORBIT_NPARAM[k] for k, _, _ in orbits)


def structures(dim, d, target, window=6):
    """Candidate orbit-count tuples for the square Newton phase: dof ==
    invariants (+<=2), point count within a window of the target."""
    m = invariant_count(dim, d)
    types = TYPES[dim]
    dofs = [1 + ORBIT_NPARAM[t] for t in types]
    sizes = [ORBIT_SIZE[t] for t in types]
    maxn = [1] + [m // df + 1 for df in dofs[1:]]
    out = []
    for counts in itertools.product(*[range(n + 1) for n in maxn]):
        dof = sum(c * df for c, df in zip(counts, dofs))
        if dof < m or dof > m + 2:
            continue
        pts = sum(c * s for c, s in zip(counts, sizes))
        if not (target - 6 <= pts <= target + window):
            continue
        out.append((dof != m, abs(pts - target), pts, counts))
    out.sort()
    return [(pts, counts) for _, _, pts, counts in out], m


class RuleSolver:
    def __init__(self, dim, max_degree, wmin=None):
        self.dim = dim
        self.cell = cl.ufc_simplex(dim)
        self.verts = np.asarray(self.cell.get_vertices())
        self.es = ExpansionSet(self.cell)
        # weight positivity: when wmin is not None every solve is bound
        # to w >= wmin and verify() rejects non-positive rules, so the
        # generated tables match the reference XG tables' strict
        # positivity (negative weights break lumping consumers and make
        # variable-coefficient mass matrices indefinite)
        self.wmin = wmin
        Q = make_quadrature(self.cell, max_degree // 2 + 3)
        qp, qw = Q.get_points(), Q.get_weights()
        phi = self.es.tabulate(max_degree, qp)
        self._phi_int_full = phi @ qw
        self._inv_cache = {}

    def exact_moments(self, d):
        nexp = self.es.get_num_members(d)
        return self._phi_int_full[:nexp]

    def inv_data(self, d):
        """(B, bI): orthonormal basis of the symmetric-group-invariant
        subspace of the degree-<=d expansion span (columns of B, in
        expansion coordinates) and the exact invariant moments B.T @ b.

        A fully symmetric rule is exact on ALL of P_d iff it is exact on
        the invariant subspace (both the rule and the exact integral kill
        the non-invariant part), so the solver only ever needs these
        ~nexp/|G| rows."""
        if d in self._inv_cache:
            return self._inv_cache[d]
        from fiat_tpu.core.macro import xy_to_bary
        Q = make_quadrature(self.cell, d + 2)
        qp, qw = Q.get_points(), Q.get_weights()
        bary = xy_to_bary(self.cell.get_vertices(), qp)
        phi = self.es.tabulate(d, qp)
        acc = np.zeros_like(phi)
        for p in itertools.permutations(range(self.dim + 1)):
            acc += self.es.tabulate(d, bary[:, list(p)] @ self.verts)
        acc /= float(np.prod(range(1, self.dim + 2)))
        # symmetrized-overlap matrix: the projector in the orthonormalised
        # basis phi_i / ||phi_i|| (the expansion set is orthogonal but
        # carries a cell-volume normalisation)
        gd = np.einsum("iq,q,iq->i", phi, qw, phi)
        S = acc @ (qw[:, None] * phi.T)
        S /= np.sqrt(gd[:, None] * gd[None, :])
        S = 0.5 * (S + S.T)
        evals, evecs = np.linalg.eigh(S)
        m = invariant_count(self.dim, d)
        B = evecs[:, evals > 0.5] / np.sqrt(gd)[:, None]
        assert B.shape[1] == m, (B.shape[1], m)
        bI = B.T @ self.exact_moments(d)
        # residual entries are now moment errors against ORTHONORMAL
        # invariant functions; the old full-moment entries carried the
        # expansion norm sqrt(gd), so acceptance thresholds scale up
        self._res_scale = max(getattr(self, "_res_scale", 1.0),
                              1.0 / float(np.sqrt(np.median(gd))))
        self._inv_cache[d] = (B, bI)
        return B, bI

    def _rep_grad(self, kind, params, h=1e-7):
        """d(representative bary)/d(param): piecewise linear in the
        generators, so central differences are exact to roundoff."""
        grads = []
        for j in range(len(params)):
            p1 = list(params); p1[j] += h
            p0 = list(params); p0[j] -= h
            grads.append((orbit_bary(kind, p1)[0] - orbit_bary(kind, p0)[0])
                         / (2 * h))
        return grads

    def residual_and_jac(self, d, structure, theta, want_jac=True):
        """structure: list of (kind, count); theta: flat [params..., w...]
        Returns residual (m,) and jacobian (m, len(theta)) in the
        INVARIANT basis (m = symmetric-invariant count << nexp).

        Because every invariant function takes one value per orbit, the
        orbit sum is orbit_size * psi(representative): only ONE point per
        orbit is ever tabulated, and by psi-invariance the chain rule
        through the representative accounts for the whole orbit."""
        B, bI = self.inv_data(d)
        kinds = [k for k, c in structure for _ in range(c)]
        nparams = sum(ORBIT_NPARAM[k] for k in kinds)
        pvec, wvec = theta[:nparams], theta[nparams:]

        reps, dreps, sizes = [], [], []
        off = 0
        for kind in kinds:
            np_ = ORBIT_NPARAM[kind]
            params = pvec[off:off + np_]
            Bb = orbit_bary(kind, params)
            reps.append(Bb[0] @ self.verts)
            sizes.append(len(Bb))
            if want_jac and np_:
                dreps.append([g @ self.verts
                              for g in self._rep_grad(kind, params)])
            else:
                dreps.append([])
            off += np_

        X = np.asarray(reps)
        sizes = np.asarray(sizes, dtype=float)
        if want_jac:
            tabs = self.es._tabulate(d, X, order=1)
            phi = tabs[(0,) * self.dim]
            grads = np.stack([tabs[tuple(a)]
                              for a in np.eye(self.dim, dtype=int)])
            dpsi = np.einsum("km,dkn->dmn", B, grads)
        else:
            phi = self.es.tabulate(d, X)

        V = (B.T @ phi) * sizes[None, :]                       # (m, norb)
        r = V @ wvec - bI
        if not want_jac:
            return r, None
        J = np.zeros((len(bI), len(theta)))
        off = 0
        for i, kind in enumerate(kinds):
            for dx in dreps[i]:
                J[:, off] = wvec[i] * sizes[i] * (dpsi[:, :, i].T @ dx)
                off += 1
        J[:, nparams:] = V
        return r, J

    def vandermonde(self, d, structure, theta, nparams):
        """Orbit-sum columns V (nexp, norb) at the seeded positions."""
        _, J = self.residual_and_jac(d, structure, theta, True)
        return J[:, nparams:]

    def reseed_weights(self, d, structure, theta, nparams):
        """Replace the weight block by the least-squares fit at the
        current positions (variable-projection seeding); nonnegative
        least squares in positive mode."""
        th = np.array(theta, dtype=float)
        V = self.vandermonde(d, structure, th, nparams)
        b = self.inv_data(d)[1]
        if self.wmin is not None:
            try:
                from scipy.optimize import nnls
                w, _ = nnls(V, b, maxiter=30 * V.shape[1])
                w = np.maximum(w, self.wmin)
            except Exception:
                w, *_ = np.linalg.lstsq(V, b, rcond=None)
                w = np.maximum(w, self.wmin)
        else:
            w, *_ = np.linalg.lstsq(V, b, rcond=None)
        th[nparams:] = w
        return th

    def attempt(self, d, structure, theta0, nparams, max_nfev=None,
                method="trf"):
        if max_nfev is None:
            # high degrees need far more GN steps (bigger, stiffer systems)
            max_nfev = 200 + 8 * d
        lo, hi = [], []
        for kind, c in structure:
            for _ in range(c):
                for (a, b) in BOUNDS[kind]:
                    lo.append(a)
                    hi.append(b)
        wlo = -np.inf if self.wmin is None else self.wmin
        lo += [wlo] * (len(theta0) - nparams)
        hi += [np.inf] * (len(theta0) - nparams)
        if self.wmin is not None:
            method = "trf"       # lm cannot carry the positivity bound
        fun = lambda th: self.residual_and_jac(d, structure, th, False)[0]
        jac = lambda th: self.residual_and_jac(d, structure, th, True)[1]
        try:
            if method == "lm":
                sol = least_squares(fun, theta0, jac=jac, method="lm",
                                    xtol=3e-16, ftol=3e-16, gtol=1e-14,
                                    max_nfev=max_nfev)
            else:
                sol = least_squares(fun, np.clip(theta0, lo, hi), jac=jac,
                                    bounds=(lo, hi), method="trf",
                                    xtol=3e-16, ftol=3e-16, gtol=1e-14,
                                    max_nfev=max_nfev)
        except Exception:
            return None
        if np.abs(fun(sol.x)).max() < self.tol(d) * getattr(
                self, "_res_scale", 1.0):
            return sol.x
        return None

    def tol(self, d):
        # roundoff in the stacked tabulation grows with degree: the
        # recurrence accumulates ~d*eps*|phi| (|phi| ~ sqrt(nexp)), so
        # a strictly linear budget starts rejecting genuinely converged
        # rules around degree 35
        return 2e-14 * max(1.0, (d / 10.0) ** 1.5)

    def verify(self, d, orbits):
        """Exactness of the expanded rule on every Dubiner mode <= d
        (plus strict weight positivity in positive mode)."""
        from fiat_tpu.core.symquad import expand_rule
        bary, wts = expand_rule(orbits)
        if bary.min() < 1e-6:
            return False, "exterior"
        if self.wmin is not None and wts.min() <= 0:
            return False, "negative weight"
        X = bary @ self.verts
        phi = self.es.tabulate(d, X)
        err = np.abs(phi @ wts - self.exact_moments(d)).max()
        return err < 2.5 * self.tol(d), err


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


def theta_from_orbits(orbits):
    """kind-major (structure, theta, nparams) from an orbit list."""
    orbits = sorted(orbits, key=lambda o: KIND_ORDER[o[0]])
    counts = {}
    for kind, params, w in orbits:
        counts[kind] = counts.get(kind, 0) + 1
    structure = [(k, counts[k]) for k in KIND_ORDER if k in counts]
    pvec = [p for kind, params, w in orbits for p in params]
    wvec = [w for kind, params, w in orbits]
    return structure, np.array(pvec + wvec), len(pvec)


def random_orbit(dim, rng, kind=None):
    """A fresh interior orbit of the requested (or a generic) kind."""
    if kind is None:
        kind = "S111" if dim == 2 else ("S1111" if rng.integers(2) else "S211")
    while True:
        params = tuple(rng.uniform(lo + 0.02, hi - 0.02)
                       for (lo, hi) in BOUNDS[kind])
        if orbit_bary(kind, params).min() > 0.01:
            return (kind, params, 0.0)


def degenerations(kind, params):
    """Lower-orbit seeds obtained by merging the two closest barycentric
    values of one generator (the moves that let elimination shrink a
    rule by less than a full orbit)."""
    out = []
    if kind == "S21":
        out.append(("S3", ()))
    elif kind == "S111":
        a, b = params
        c = 1 - a - b
        vals = sorted((a, b, c))
        # merge each adjacent pair -> (x, x, rest)
        for i in (0, 1):
            x = 0.5 * (vals[i] + vals[i + 1])
            if 1e-3 < x < 0.499:
                out.append(("S21", (x,)))
    elif kind == "S31":
        out.append(("S4", ()))
    elif kind == "S22":
        out.append(("S4", ()))
    elif kind == "S211":
        a, b = params
        c = 1 - 2 * a - b
        # merge b into a -> S31(a'); or pair the singles -> S22
        x = (2 * a + b) / 3
        if 1e-3 < x < 0.333:
            out.append(("S31", (x,)))
        x = (2 * a + c) / 3
        if 1e-3 < x < 0.333:
            out.append(("S31", (x,)))
        y = 0.5 * (b + c)
        if 1e-3 < a < 0.249:
            out.append(("S22", (a,)))
        if 1e-3 < 0.5 * (1 - y) and 1e-3 < y * 0.5 < 0.249:
            out.append(("S22", (min(0.5 * y, 0.249 - 1e-3),)))
    elif kind == "S1111":
        a, b, c = params
        e = 1 - a - b - c
        vals = sorted((a, b, c, e))
        for i in range(3):
            x = 0.5 * (vals[i] + vals[i + 1])
            rest = [vals[j] for j in range(4) if j not in (i, i + 1)]
            # (x, x, r0, r1) -> S211 with params (x, r0)
            if 1e-3 < x < 0.499 and 1e-3 < rest[0]:
                out.append(("S211", (x, rest[0])))
    return out


def cheap_scores(solver, d, orbits):
    """|w| * column-norm contribution proxy, in orbit-list order (much
    cheaper than leave-one-out; good enough to rank a redundant rule)."""
    structure, theta, nparams = theta_from_orbits(orbits)
    V = solver.vandermonde(d, structure, theta, nparams)
    w, *_ = np.linalg.lstsq(V, solver.inv_data(d)[1], rcond=None)
    s = np.abs(w) * np.linalg.norm(V, axis=0)
    perm = sorted(range(len(orbits)), key=lambda i: KIND_ORDER[orbits[i][0]])
    out = [None] * len(orbits)
    for col, orig in enumerate(perm):
        out[orig] = s[col]
    return out


def _exterior(orbits, margin=1e-6):
    """Indices of orbits with a barycentric coordinate below margin
    (box bounds cannot express a+b <= 1, so points can exit there)."""
    return [i for i, (kind, params, w) in enumerate(orbits)
            if orbit_bary(kind, params).min() < margin]


def shed(solver, dim, d, orbits, target, deadline, log=lambda s: None,
         max_nfev=1800):
    """Drive an (unverified, usually redundant) orbit list to a VERIFIED
    rule, then shrink it fast by removing batches of the least-important
    orbits while the system stays heavily underdetermined.  Orbits that
    exit the simplex during a solve are shed too -- they are redundant
    degrees of freedom trying to die.  Returns the best verified rule
    found, or None."""
    m = invariant_count(dim, d)
    best = None
    cur = orbits
    fails = 0
    batch_div = 8
    while time.time() < deadline and fails < 3:
        # solve + shed exiting orbits until clean
        sol = None
        for _ in range(6):
            structure, theta, nparams = theta_from_orbits(cur)
            theta = solver.reseed_weights(d, structure, theta, nparams)
            sol = solver.attempt(d, structure, theta, nparams,
                                 max_nfev=max_nfev)
            if sol is None:
                break
            cur = pack(structure, sol)
            out = _exterior(cur)
            if not out:
                break
            trial = [o for i, o in enumerate(cur) if i not in set(out)]
            if ndof(trial) < m:
                break
            log(f"    shed {len(out)} exterior -> {npts(trial)} pts")
            cur = trial
        ok = err = None
        if sol is not None and not _exterior(cur):
            ok, err = solver.verify(d, cur)
        if ok:
            if best is None or npts(cur) < npts(best):
                best = cur
                log(f"    shed verified {npts(best)} pts")
            fails = 0
            slack = ndof(best) - m
            if npts(best) <= target or slack <= 30:
                break
            drop = max(2, slack // batch_div)
            ranked = sorted(range(len(best)),
                            key=cheap_scores(solver, d, best).__getitem__)
            cur = [o for i, o in enumerate(best)
                   if i not in set(ranked[:drop])]
        else:
            fails += 1
            log("    shed attempt failed "
                f"({'stall' if sol is None else err})")
            if best is None:
                break    # unverified seed: nothing to retreat to
            # retreat to the last verified rule with smaller batches
            batch_div *= 3
            slack = ndof(best) - m
            drop = max(1, slack // batch_div)
            ranked = sorted(range(len(best)),
                            key=cheap_scores(solver, d, best).__getitem__)
            cur = [o for i, o in enumerate(best)
                   if i not in set(ranked[:drop])]
    return best


def eliminate(solver, dim, d, orbits, target, rng, deadline,
              log=lambda s: None):
    """Shrink a verified rule toward ``target`` points by orbit removal
    and degeneration moves, re-solving after each move.  Returns the
    best verified rule found."""
    m = invariant_count(dim, d)
    best = orbits

    def try_rule(trial_orbits, extra_jitter=0.0, tries=2):
        structure, theta0, nparams = theta_from_orbits(trial_orbits)
        for t in range(tries):
            th = theta0.copy()
            if t or extra_jitter:
                th[:nparams] += (0.008 * t + extra_jitter) * \
                    rng.standard_normal(nparams)
            th = solver.reseed_weights(d, structure, th, nparams)
            sol = solver.attempt(d, structure, th, nparams,
                                 method="trf" if t < tries - 1 else "lm")
            if sol is None:
                continue
            orbs = pack(structure, sol)
            ok, err = solver.verify(d, orbs)
            if ok:
                return orbs
        return None

    def removal_rank(orbs):
        """Leave-one-out least-squares residual prediction: cheaper and
        far more informative than |w|-ranking."""
        structure, theta, nparams = theta_from_orbits(orbs)
        V = solver.vandermonde(d, structure, theta, nparams)
        b = solver.inv_data(d)[1]
        scores = []
        for i in range(V.shape[1]):
            Vi = np.delete(V, i, axis=1)
            wi, *_ = np.linalg.lstsq(Vi, b, rcond=None)
            scores.append(np.linalg.norm(Vi @ wi - b))
        # map column order (kind-major) back to orbit list order
        order = sorted(range(len(orbs)), key=lambda i: KIND_ORDER[orbs[i][0]])
        out = [None] * len(orbs)
        for col, orig in enumerate(order):
            out[orig] = scores[col]
        return out

    hops = 0
    big_kind = "S111" if dim == 2 else "S1111"
    while npts(best) > target and time.time() < deadline:
        scores = removal_rank(best)
        ranked = sorted(range(len(best)), key=lambda i: scores[i])
        improved = None
        # 1) full removals
        for i in ranked:
            if time.time() > deadline:
                break
            trial = [o for j, o in enumerate(best) if j != i]
            if ndof(trial) < m:
                continue
            improved = try_rule(trial)
            if improved:
                log(f"    rm {best[i][0]} -> {npts(improved)} pts")
                break
        # 2) degenerations (shrink an orbit instead of dropping it)
        if improved is None:
            for i in ranked:
                if time.time() > deadline:
                    break
                kind, params, w = best[i]
                for kind2, params2 in degenerations(kind, params):
                    trial = ([o for j, o in enumerate(best) if j != i]
                             + [(kind2, params2, w)])
                    if ndof(trial) < m:
                        continue
                    improved = try_rule(trial)
                    if improved:
                        log(f"    {kind}->{kind2} -> {npts(improved)} pts")
                        break
                if improved:
                    break
        # 3) mutations: remove the two cheapest orbits, add one fresh
        #    generic orbit (net shrink when single removals all fail)
        if improved is None:
            pool = ranked[:6]
            for a in range(len(pool)):
                for b in range(a + 1, len(pool)):
                    if time.time() > deadline:
                        break
                    i, j = pool[a], pool[b]
                    trial = ([o for k2, o in enumerate(best)
                              if k2 not in (i, j)]
                             + [random_orbit(dim, rng, kind=big_kind)])
                    if ndof(trial) < m or npts(trial) >= npts(best):
                        continue
                    improved = try_rule(trial, extra_jitter=0.01, tries=2)
                    if improved:
                        log(f"    swap2->1 -> {npts(improved)} pts")
                        break
                if improved or time.time() > deadline:
                    break
        # 4) basin hop: re-solve the same structure from a jittered seed
        #    so the NEXT removal round attacks a different solution branch
        if improved is None and hops < 4 and time.time() < deadline:
            hopped = try_rule(best, extra_jitter=0.05, tries=3)
            if hopped is not None:
                best = hopped
                hops += 1
                log(f"    basin hop {hops} at {npts(best)} pts")
                continue
        if improved is None:
            break
        best = improved
    return best


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


def classify_bary(vals, dim, tol=1e-11):
    """(kind, params) of the orbit through a barycentric point; vals
    sorted descending."""
    uniq = []
    for v in vals:
        if not uniq or abs(v - uniq[-1][0]) > tol:
            uniq.append([v, 1])
        else:
            uniq[-1][1] += 1
    if dim == 2:
        if len(uniq) == 1:
            return "S3", ()
        if len(uniq) == 2:
            a = [v for v, c in uniq if c == 2][0]
            return "S21", (float(a),)
        return "S111", (float(vals[0]), float(vals[1]))
    counts = sorted(c for _, c in uniq)
    if len(uniq) == 1:
        return "S4", ()
    if len(uniq) == 2 and counts == [2, 2]:
        return "S22", (float(min(v for v, _ in uniq)),)
    if len(uniq) == 2:
        a = [v for v, c in uniq if c == 3][0]
        return "S31", (float(a),)
    if len(uniq) == 3:
        rep = [v for v, c in uniq if c == 2][0]
        single = [v for v, c in uniq if c == 1][0]
        return "S211", (float(rep), float(single))
    return "S1111", tuple(float(v) for v in vals[:3])


_XG_STRUCTS = {}


def xg_structure(dim, d):
    """Orbit-kind SIGNATURE of the reference's published Xiao-Gimbutas
    rule for this degree: only the count of symmetry orbits per kind is
    read (it fixes the search-space shape for the square Newton phase);
    the generator values and weights are never used.  Returns a
    structure list [(kind, count)] or None when unavailable."""
    key = (dim, d)
    if key in _XG_STRUCTS:
        return _XG_STRUCTS[key]
    struct = None
    try:
        shims = os.path.join(REPO, "shims")   # recursivenodes shim
        for p in (shims, "/root/reference"):
            if p not in sys.path:
                sys.path.append(p)
        from FIAT.xg_quad_data import tetrahedron_table, triangle_table
        from FIAT.reference_element import symmetric_simplex
        table = triangle_table if dim == 2 else tetrahedron_table
        if d in table:
            from fiat_tpu.core.macro import xy_to_bary
            verts = symmetric_simplex(dim).get_vertices()
            bary = xy_to_bary(verts, np.asarray(table[d]["points"]))
            counts = {}
            for b in bary:
                kind, _ = classify_bary(np.sort(b)[::-1], dim, tol=1e-9)
                counts[kind] = counts.get(kind, 0) + 1
            if all(c % ORBIT_SIZE[k] == 0 for k, c in counts.items()):
                struct = [(k, counts[k] // ORBIT_SIZE[k])
                          for k in TYPES[dim] if counts.get(k)]
    except Exception:
        struct = None
    _XG_STRUCTS[key] = struct
    return struct


def collapsed_orbits(dim, d):
    """A fully symmetric EXACT seed at ANY degree: the collapsed Gauss
    rule averaged over the simplex symmetry group, expressed as orbits.
    (GM's alternating weights stop verifying past degree ~25; this seed
    has no such limit, at ~|G| times the point count.)"""
    from fiat_tpu.core.macro import xy_to_bary
    cell = cl.ufc_simplex(dim)
    Q = make_quadrature(cell, d // 2 + 1)
    bary = xy_to_bary(cell.get_vertices(), Q.get_points())
    orbits = []
    for b, w in zip(bary, Q.get_weights()):
        kind, params = classify_bary(np.sort(b)[::-1], dim)
        orbits.append((kind, params, float(w) / ORBIT_SIZE[kind]))
    return orbits


def prune_exact(solver, dim, d, orbits, extra=3):
    """RRQR column-subset pruning: keep an independent ~rank(V) orbit
    subset and re-fit weights by least squares.  While the orbit count
    stays >= the invariant count, exactness is preserved WITHOUT moving
    any generator -- this collapses a |G|-fold symmetrized seed to near
    the information-theoretic orbit count in one step."""
    from scipy.linalg import qr
    structure, theta, nparams = theta_from_orbits(orbits)
    V = solver.vandermonde(d, structure, theta, nparams)
    _, R, piv = qr(V, pivoting=True, mode="economic")
    rank = int(np.sum(np.abs(np.diag(R)) > 1e-12 * abs(R[0, 0])))
    order = sorted(range(len(orbits)), key=lambda i: KIND_ORDER[orbits[i][0]])
    keep = sorted(order[c] for c in piv[:min(rank + extra, len(orbits))])
    pruned = [orbits[i] for i in keep]
    st, th, npar = theta_from_orbits(pruned)
    th = solver.reseed_weights(d, st, th, npar)
    return pack(st, th)


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
    nparams = len(pvec)
    return solver.reseed_weights(d, structure, theta, nparams), nparams


def solve_degree(solver, dim, d, prev, rng, budget, target, log,
                 existing=None):
    """Best verified rule for one degree (or None)."""
    deadline = time.time() + budget
    m = invariant_count(dim, d)
    best = None

    # Phase 0: an existing (over-target) rule for THIS degree is already
    # verified -- eliminate straight from it before anything else.
    if existing is not None:
        best = eliminate(solver, dim, d, existing, target, rng,
                         min(deadline, time.time() + 0.35 * budget), log)
        if npts(best) <= target:
            return best

    # Phase 1: square Newton at near-target structures.  The reference
    # rule's orbit-kind signature leads (that structure is KNOWN to
    # admit a positive solution at the target count, so it deserves the
    # lion's share of the Newton attempts).
    cands, _ = structures(dim, d, target)
    xs = xg_structure(dim, d)
    if xs:
        xcounts = tuple(dict(xs).get(t, 0) for t in TYPES[dim])
        xpts = sum(ORBIT_SIZE[k] * c for k, c in xs)
        cands = [(xpts, xcounts)] + [c for c in cands if c[1] != xcounts]
    for ci, (pts, counts) in enumerate(cands[:4]):
        structure = [(k, c) for k, c in zip(TYPES[dim], counts) if c]
        ntries = (3 * (10 + d) if (xs and ci == 0) else 10 + d)
        for t in range(ntries):
            if time.time() > deadline - 0.55 * budget:
                break
            theta0, nparams = seed_from(prev if t % 3 != 2 else None,
                                        structure, rng, solver, d)
            sol = solver.attempt(d, structure, theta0, nparams)
            if sol is None:
                continue
            orbits = pack(structure, sol)
            ok, err = solver.verify(d, orbits)
            if ok:
                best = orbits
                break
        if best:
            break
    if best and npts(best) <= target:
        return best

    # Phase 2: continuation-augmented underdetermined solve + elimination.
    # With the invariant-subspace residual (rows m, one tabulated point
    # per orbit) each solve is ~|G|^2 cheaper than the full-moment
    # formulation, so continuation gets a real share at every degree.
    deadline2 = deadline if d <= 25 else min(
        deadline, time.time() + 0.6 * max(deadline - time.time(), 0.0))
    if prev:
        for outer in range(8):
            if time.time() > deadline2:
                break
            aug = list(prev)
            slack = 24 + 16 * outer + rng.integers(7)
            while ndof(aug) < m + slack:
                aug.append(random_orbit(dim, rng))
            got = shed(solver, dim, d, aug, target, deadline2, log)
            if got is None:
                continue
            log(f"    continuation verified at {npts(got)} pts")
            got = eliminate(solver, dim, d, got, target, rng, deadline2,
                            log)
            if best is None or npts(got) < npts(best):
                best = got
            if npts(best) <= target:
                return best

    # Phase 3: eliminate from an exact symmetric seed -- GM while its
    # weights still verify (degree <= ~25), else the symmetrized
    # collapsed rule RRQR-pruned to ~the invariant count; shed() does
    # the fast redundant-phase shrinking before one-at-a-time clean-up
    if npts(best or [("S111", (0, 0), 0)] * 10 ** 6) > target \
            and time.time() < deadline:
        for seed_fn in (gm_orbits, collapsed_orbits):
            orbits = seed_fn(dim, d)
            ok, err = solver.verify(d, orbits)
            if not ok:
                continue
            if ndof(orbits) > 2 * m:
                orbits = prune_exact(solver, dim, d, orbits)
                ok, err = solver.verify(d, orbits)
                if not ok:
                    continue
                log(f"    pruned exact seed -> {npts(orbits)} pts")
            shrunk = shed(solver, dim, d, orbits, target, deadline, log)
            if shrunk is not None:
                orbits = shrunk
            got = eliminate(solver, dim, d, orbits, target, rng, deadline,
                            log)
            if best is None or npts(got) < npts(best):
                best = got
            if npts(best) <= target:
                break
    return best


def generate(dim, max_degree, out_path, budget=240.0, start=1, table=None,
             skip_ratio=1.0, wmin=None, seed=None):
    solver = RuleSolver(dim, max_degree, wmin=wmin)
    rng = np.random.default_rng(seed if seed is not None else 2026 + dim)
    targets = XG_TRI if dim == 2 else XG_TET
    table = dict(table or {})
    prev = table.get(start - 1)
    for d in range(start, max_degree + 1):
        target = targets.get(d, 10 ** 9)
        have = table.get(d)
        if have is not None and wmin is not None \
                and min(w for _, _, w in have) <= 0:
            # a negative-weight incumbent neither blocks regeneration
            # nor competes with the new positive rule
            table.pop(d)
            have = None
        if have is not None and npts(have) <= skip_ratio * target:
            prev = have
            print(f"dim {dim} degree {d:3d}: {npts(have):4d} pts kept "
                  f"(<= reference {target})", flush=True)
            continue
        t0 = time.time()
        got = solve_degree(solver, dim, d, prev, rng, budget, target,
                           log=lambda s: print(s, flush=True),
                           existing=have)
        if got is None or (have is not None and npts(have) <= npts(got)):
            got = have
        if got is not None:
            table[d] = got
            prev = got
            flag = "OK" if npts(got) <= target else "over"
            print(f"dim {dim} degree {d:3d}: {npts(got):4d} pts "
                  f"(reference {target}) {flag} "
                  f"[{time.time() - t0:.0f}s]", flush=True)
            _save(dim, table, out_path)      # survive interruption
        else:
            print(f"dim {dim} degree {d:3d}: FAILED "
                  f"[{time.time() - t0:.0f}s]", flush=True)
    return table


def _save(dim, table, out_path):
    # merge with the tables already in the output file: a dim-2 run
    # must not clobber TETRAHEDRON (and vice versa), and a partial run
    # (--start / --degrees without --seed-existing) must not erase the
    # CURRENT cell's on-disk degrees it never touched -- this run's
    # entries win on collision
    name = "TRIANGLE" if dim == 2 else "TETRAHEDRON"
    other = "TETRAHEDRON" if dim == 2 else "TRIANGLE"
    tables = {"TRIANGLE": {}, "TETRAHEDRON": {}}
    if os.path.exists(out_path):
        ns = {}
        with open(out_path) as f:
            exec(compile(f.read(), out_path, "exec"), ns)
        tables[other] = dict(ns.get(other, {}))
        tables[name] = dict(ns.get(name, {}))
    tables[name].update(table)
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
    ap.add_argument("--budget", type=float, default=240.0,
                    help="seconds per degree")
    ap.add_argument("--start", type=int, default=1)
    ap.add_argument("--seed-existing", action="store_true",
                    help="start from the shipped symquad_data tables")
    ap.add_argument("--skip-ratio", type=float, default=1.0,
                    help="keep existing rules within this ratio of the "
                         "reference count")
    ap.add_argument("--positive", action="store_true",
                    help="require strictly positive weights (w >= wmin)")
    ap.add_argument("--wmin", type=float, default=1e-10)
    ap.add_argument("--rng-seed", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or os.path.join(REPO, "fiat_tpu", "core",
                                   "symquad_data.py")
    table = {}
    if args.seed_existing:
        from fiat_tpu.core import symquad_data
        table = dict(symquad_data.TRIANGLE if args.dim == 2
                     else symquad_data.TETRAHEDRON)
    generate(args.dim, args.max_degree, out, budget=args.budget,
             start=args.start, table=table, skip_ratio=args.skip_ratio,
             wmin=args.wmin if args.positive else None,
             seed=args.rng_seed)
    print("wrote", out)


if __name__ == "__main__":
    main()
