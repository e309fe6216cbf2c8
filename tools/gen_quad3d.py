#!/usr/bin/env python3
"""Generate general (asymmetric) positive simplex rules
(core/tetquad_data.py / core/triquad_data.py) by Gauss-Newton node
elimination.

The reference's own tet tables are asymmetric: node elimination reaches
point counts a symmetry-orbit search cannot (one point = sd+1 dofs vs an
S1111 orbit's 27), and on the triangle it can undercut stalled orbit
searches.  Algorithm (Xiao & Gimbutas 2010, sec. 4 -- nothing
copied from the reference's tables; only published COUNTS as targets):

  1. seed with the best in-repo symmetric rule (or symmetrized
     collapsed Gauss) expanded to raw points;
  2. rank points by |w_q| * ||phi(x_q)|| (their share of the moment
     Vandermonde), drop the least significant, re-solve the full
     nonlinear moment system with w >= wmin bounds (trf);
  3. accept only rules that verify: exact on every Dubiner mode <= d,
     all points strictly inside, all weights positive;
  4. repeat until the target count or the budget is reached.

Usage: python tools/gen_quad3d.py [--dim 2|3] --max-degree 15
       [--degrees 7,10-15] [--budget SECONDS] [--out PATH]
"""

import argparse
import os
import sys
import time
from math import factorial

import numpy as np
from scipy.optimize import least_squares

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fiat_tpu.core import cells as cl                      # noqa: E402
from fiat_tpu.core.expansions import ExpansionSet          # noqa: E402
from fiat_tpu.core.macro import xy_to_bary                 # noqa: E402
from fiat_tpu.core.quadrature import make_quadrature       # noqa: E402

XG_TET = {1: 1, 2: 4, 3: 6, 4: 11, 5: 14, 6: 23, 7: 31, 8: 44, 9: 57,
          10: 74, 11: 95, 12: 122, 13: 146, 14: 177, 15: 214}
XG_TRI = {1: 1, 2: 3, 3: 6, 4: 6, 5: 7, 6: 12, 7: 15, 8: 16, 9: 19, 10: 25,
          11: 28, 12: 33, 13: 37, 14: 42, 15: 49, 16: 55, 17: 60, 18: 67,
          19: 73, 20: 79, 21: 87, 22: 96, 23: 103, 24: 112, 25: 120,
          26: 130, 27: 141, 28: 150, 29: 159, 30: 171, 31: 181, 32: 193,
          33: 204, 34: 214, 35: 228, 36: 243, 37: 252, 38: 267, 39: 282,
          40: 295, 41: 309, 42: 324, 43: 339, 44: 354, 45: 370, 46: 385,
          47: 399, 48: 423, 49: 435, 50: 453}
MARGIN = 1e-6      # barycentric interior margin


class NodeSolver:
    def __init__(self, max_degree, wmin=1e-9, dim=3):
        self.sd = dim
        self.cell = cl.ufc_simplex(dim)
        self.verts = np.asarray(self.cell.get_vertices())
        self.es = ExpansionSet(self.cell)
        self.wmin = wmin
        Q = make_quadrature(self.cell, max_degree // 2 + 2)
        self._b_full = self.es.tabulate(max_degree, Q.get_points()) \
            @ Q.get_weights()
        # affine barycentric map bary = A x + c for the interior
        # penalty: the trf box bounds only encode 0 <= x_i <= 1, not
        # sum(x) <= 1, so converged solutions can park points just
        # outside the simplex (measured: deg-11 repair hits residual
        # 2e-16 with 6 points at bary -1.5e-2).  The moment system is
        # underdetermined ((sd+1)n dofs vs nexp rows), so interior
        # solutions exist on the same manifold; a smooth squared-hinge
        # on each barycentric coordinate steers onto them.
        # bary solves [V^T; 1^T] bary = [x; 1]
        T = np.linalg.inv(np.vstack([self.verts.T, np.ones(self.sd + 1)]))
        self._bary_A = T[:, :self.sd]          # (sd+1, sd)
        self._bary_c = T[:, self.sd]           # (sd+1,)
        self.pen_margin = 5e-3                  # start pushing inside here
        self.pen_scale = 0.3

    def moments(self, d):
        n = self.es.get_num_members(d)
        assert n <= len(self._b_full), \
            f"degree {d} exceeds the solver's max_degree moment table"
        return self._b_full[:n]

    def tol(self, d):
        return 5e-14 * max(1.0, (d / 10.0) ** 1.5)

    def residual(self, d, theta, want_jac=False):
        sd = self.sd
        n = len(theta) // (sd + 1)
        X = theta[:sd * n].reshape(n, sd)
        w = theta[sd * n:]
        b = self.moments(d)
        # interior penalty rows: one squared hinge per (point, bary
        # coordinate); C^1-smooth, zero (with zero jacobian) for any
        # point deeper inside than pen_margin, so exactness rows alone
        # define the solution there
        bary = X @ self._bary_A.T + self._bary_c
        gap = np.maximum(self.pen_margin - bary, 0.0)     # (n, sd+1)
        pen = self.pen_scale * gap.reshape(-1) ** 2
        if want_jac:
            tabs = self.es._tabulate(d, X, order=1)
            phi = tabs[(0,) * sd][:len(b)]
            J = np.zeros((len(b) + (sd + 1) * n, (sd + 1) * n))
            for j, a in enumerate(np.eye(sd, dtype=int)):
                J[:len(b), j:sd * n:sd] = tabs[tuple(a)][:len(b)] * w
            J[:len(b), sd * n:] = phi
            dpen = -2.0 * self.pen_scale * gap                # (n, sd+1)
            for q in range(n):
                rows = slice(len(b) + q * (sd + 1),
                             len(b) + (q + 1) * (sd + 1))
                J[rows, q * sd:(q + 1) * sd] = \
                    dpen[q][:, None] * self._bary_A
            return np.concatenate([phi @ w - b, pen]), J
        phi = self.es.tabulate(d, X)[:len(b)]
        return np.concatenate([phi @ w - b, pen]), None

    def solve(self, d, X0, w0, max_nfev=None):
        sd = self.sd
        n = len(w0)
        if max_nfev is None:
            max_nfev = 150 + 6 * d
        theta0 = np.concatenate([X0.reshape(-1), w0])
        lo = np.concatenate([np.full(sd * n, 0.0), np.full(n, self.wmin)])
        hi = np.concatenate([np.full(sd * n, 1.0), np.full(n, np.inf)])
        fun = lambda th: self.residual(d, th)[0]
        jac = lambda th: self.residual(d, th, True)[1]
        try:
            sol = least_squares(fun, np.clip(theta0, lo, hi), jac=jac,
                                bounds=(lo, hi), method="trf",
                                xtol=3e-16, ftol=3e-16, gtol=1e-14,
                                max_nfev=max_nfev)
        except Exception:
            return None
        X = sol.x[:sd * n].reshape(n, sd)
        w = sol.x[sd * n:]
        if self.verify(d, X, w):
            return X, w
        return None

    def solve_free(self, d, X0, w0, max_nfev=None):
        """Unconstrained Gauss-Newton in transformed variables:
        bary = softmax(U) per point (interior by construction),
        w = exp(v) (positive by construction).

        The bounded trf solve stalls when the active set chatters at
        the box walls; this parametrization has no walls at all, so a
        trust-region step can cross regions the bounded solve cannot.
        The softmax gauge freedom (U_q + c) is pinned by n tiny
        regularization rows on mean(U_q).  verify() still gates."""
        sd = self.sd
        n = len(w0)
        if max_nfev is None:
            max_nfev = 300 + 12 * d
        b = self.moments(d)
        bary0 = np.clip(xy_to_bary(self.cell.get_vertices(), X0),
                        1e-7, 1.0)
        theta0 = np.concatenate([
            np.log(bary0).reshape(-1),
            np.log(np.maximum(w0, self.wmin))])
        nb = len(b)

        def unpack(th):
            U = th[:n * (sd + 1)].reshape(n, sd + 1)
            E = np.exp(U - U.max(axis=1, keepdims=True))
            bary = E / E.sum(axis=1, keepdims=True)
            return U, bary, bary @ self.verts, np.exp(th[n * (sd + 1):])

        GAUGE = 1e-7

        def fun(th):
            U, _, X, w = unpack(th)
            phi = self.es.tabulate(d, X)[:nb]
            return np.concatenate([phi @ w - b, GAUGE * U.mean(axis=1)])

        def jac(th):
            U, bary, X, w = unpack(th)
            tabs = self.es._tabulate(d, X, order=1)
            phi = tabs[(0,) * sd][:nb]
            # G[:, q, s] = d phi / d x_s at point q
            G = np.stack([tabs[tuple(a)][:nb]
                          for a in np.eye(sd, dtype=int)], axis=-1)
            # X_q = sum_k bary_{qk} v_k  =>  dX_q/dU_{qk} =
            # bary_{qk} (v_k - X_q)
            dXdU = bary[:, :, None] * (self.verts[None, :, :]
                                       - X[:, None, :])   # (n, sd+1, sd)
            J = np.zeros((nb + n, n * (sd + 1) + n))
            J[:nb, :n * (sd + 1)] = np.einsum(
                "bqs,qks->bqk", G * w[None, :, None],
                dXdU).reshape(nb, n * (sd + 1))
            J[:nb, n * (sd + 1):] = phi * w[None, :]
            for q in range(n):
                J[nb + q, q * (sd + 1):(q + 1) * (sd + 1)] = \
                    GAUGE / (sd + 1)
            return J

        try:
            sol = least_squares(fun, theta0, jac=jac, method="trf",
                                xtol=3e-16, ftol=3e-16, gtol=1e-14,
                                max_nfev=max_nfev)
        except Exception:
            return None
        _, _, X, w = unpack(sol.x)
        if self.verify(d, X, w):
            return X, w
        return None

    def verify(self, d, X, w):
        bary = xy_to_bary(self.cell.get_vertices(), X)
        if bary.min() < MARGIN or w.min() <= 0:
            return False
        r, _ = self.residual(d, np.concatenate([X.reshape(-1), w]))
        # moment rows only: a verified rule may keep points shallower
        # than pen_margin (nonzero penalty) as long as they are inside
        return np.abs(r[:len(self.moments(d))]).max() < self.tol(d)

    def reseed_weights(self, d, X, w):
        """Nonnegative least-squares refit of the weights at fixed
        positions (keeps elimination candidates feasible)."""
        from scipy.optimize import nnls
        phi = self.es.tabulate(d, X)[:len(self.moments(d))]
        try:
            w2, _ = nnls(phi, self.moments(d), maxiter=30 * len(w))
            return np.maximum(w2, self.wmin)
        except Exception:
            return w

    def scores(self, d, X, w):
        """Point significance |w_q| * ||phi(x_q)|| (ascending = drop
        first)."""
        phi = self.es.tabulate(d, X)[:len(self.moments(d))]
        return np.abs(w) * np.linalg.norm(phi, axis=0)


def seed_points(solver, d, elim_table=None):
    """Best available exact seed as raw points.

    Candidates are every stored rule covering degree d -- the symmetric
    orbit tables AND the eliminator's own general tables (all positive
    by construction) -- walked in ascending point count.  A positive
    candidate is returned directly; a negative one gets a positivity
    repair at its own count (negative weights are sometimes essential
    at the symmetric minimum, e.g. tet degree 8, but a repaired rule at
    that count beats eliminating down from a much larger positive
    rule).  Falls back to collapsed Gauss."""
    from fiat_tpu.core import symquad_data
    from fiat_tpu.core.symquad import ORBIT_SIZE, expand_rule
    table = (symquad_data.TRIANGLE if solver.sd == 2
             else symquad_data.TETRAHEDRON)
    # (point count, kind, degree); expand_rule weights already
    # integrate over the UFC cell (volume 1/d! -- mapping scale 1)
    covering = [(sum(ORBIT_SIZE[k] for k, _, _ in table[dd]), "sym", dd)
                for dd in table if dd >= d]
    if elim_table:
        covering += [(len(elim_table[dd][1]), "elim", dd)
                     for dd in elim_table if dd >= d]
    rng = np.random.default_rng(d)
    repairs = 0
    for _, kind, dd in sorted(covering):
        if kind == "elim":
            bary = np.asarray(elim_table[dd][0]).reshape(-1, solver.sd + 1)
            w = np.asarray(elim_table[dd][1])
        else:
            bary, w = expand_rule(table[dd])
        X = bary @ solver.verts
        if w.min() > 0:
            return X, w
        if repairs >= 2:     # bound the repair spend; larger positive
            continue         # candidates follow in the ordering anyway
        repairs += 1
        # repair nfev is capped like the elimination passes: at large n
        # one lsq iteration costs seconds, and seeding runs OUTSIDE the
        # degree budget, so an uncapped 600+20d spend here can stall a
        # degree for an hour before elimination even starts
        for jit in (0.0, 0.004, 0.012, 0.03):
            Xj = np.clip(X + jit * rng.standard_normal(X.shape), 0, 1)
            got = solver.solve(d, Xj,
                               solver.reseed_weights(d, Xj, np.abs(w)),
                               max_nfev=min(600 + 20 * d, 350))
            if got is None:
                got = solver.solve_free(
                    d, Xj, solver.reseed_weights(d, Xj, np.abs(w)),
                    max_nfev=min(600 + 20 * d, 350))
            if got is not None:
                return got
    Q = make_quadrature(solver.cell, d // 2 + 1)
    return np.asarray(Q.get_points()), np.asarray(Q.get_weights())


def eliminate(solver, d, X, w, target, deadline, log, max_hops=12,
              on_improve=None):
    """``on_improve(X, w)``: called at every accepted point-count
    reduction so long chains persist progress incrementally (a budget
    or session expiry no longer loses the whole degree's work)."""
    nexp = len(solver.moments(d))
    best = (X, w)
    seed_n = len(w)
    hops = 0
    while len(best[1]) > target and time.time() < deadline:
        X, w = best
        n = len(w)
        if (solver.sd + 1) * (n - 1) < nexp:
            log(f"    dof floor reached at {n} pts (nexp {nexp})")
            break
        order = np.argsort(solver.scores(d, X, w))
        rng = np.random.default_rng(9000 * n + hops)

        def try_remove(q, jit, nfev, free=False):
            keep = np.arange(n) != q
            Xt = X[keep] if not jit else np.clip(
                X[keep] + jit * rng.standard_normal((n - 1, solver.sd)),
                0, 1)
            wt = solver.reseed_weights(d, Xt, w[keep])
            if free:
                return solver.solve_free(d, Xt, wt, max_nfev=nfev)
            return solver.solve(d, Xt, wt, max_nfev=nfev)

        improved = None
        # failed attempts burn their full iteration budget, so sweep a
        # wide candidate set with a CHEAP budget first, then give the
        # best few candidates the full budget (successful removals
        # converge fast; verify() guards accuracy regardless).  The
        # unconstrained transformed solver leads: it escapes the
        # bounded-trf active-set stalls (measured: removed a point from
        # the 86-pt tet-10 rule in 1 s where hours of bounded sweeps
        # found nothing), with bounded trf as the fallback flavor
        # nfev caps: successful removals converge fast (<~100 iters
        # even at tri degree 50); FAILED attempts burn the whole cap,
        # and at large n one lsq iteration costs seconds, so an uncapped
        # 120+5d cheap pass can blow 10x past the degree deadline on a
        # single doomed candidate
        passes = ((min(120 + 5 * d, 160), order[:24], (0.0,), True),
                  (min(70 + 3 * d, 140), order[:24], (0.0, 0.008), False),
                  (min(600 + 20 * d, 420), order[:10], (0.0, 0.01), True),
                  (None, order[:6], (0.01, 0.03), False))
        for nfev, cands, jits, free in passes:
            for q in cands:
                if time.time() > deadline:
                    break
                for jit in jits:
                    got = try_remove(q, jit, nfev, free=free)
                    if got is not None:
                        improved = got
                        log(f"    rm{'(free)' if free else ''} -> "
                            f"{len(got[1])} pts")
                        break
                if improved is not None:
                    break
            if improved is not None or time.time() > deadline:
                break
            log(f"    sweep at {n} pts: no single removal "
                f"({'free' if free else 'cheap' if nfev else 'full'}"
                " pass)")
        if improved is not None:
            best = improved
            hops = 0
            if on_improve is not None and len(best[1]) < seed_n:
                on_improve(*best)
            continue
        # removal stalled: try merging the closest pairs -- both points
        # collapse to their weighted centroid (weight sum), a different
        # escape move that succeeds when no single point is removable
        # but a local cluster is over-resolved
        D = np.linalg.norm(X[:, None, :] - X[None, :, :], axis=-1)
        iu = np.triu_indices(n, k=1)
        close = np.argsort(D[iu])[:6]
        for k in close:
            if time.time() > deadline:
                break
            i, j = iu[0][k], iu[1][k]
            keep = (np.arange(n) != i) & (np.arange(n) != j)
            xm = (w[i] * X[i] + w[j] * X[j]) / (w[i] + w[j])
            Xt = np.vstack([X[keep], xm])
            wt = np.concatenate([w[keep], [w[i] + w[j]]])
            got = solver.solve(d, Xt, solver.reseed_weights(d, Xt, wt))
            if got is None:
                got = solver.solve_free(
                    d, Xt, solver.reseed_weights(d, Xt, wt))
            if got is not None:
                improved = got
                log(f"    merge({i},{j}) -> {len(got[1])} pts")
                break
        if improved is not None:
            best = improved
            hops = 0
            if on_improve is not None and len(best[1]) < seed_n:
                on_improve(*best)
            continue
        # removal AND merge stalled: JUMP -- drop several points at
        # once (keep the highest-significance subset), nnls-reseed the
        # weights, and give the solver a long leash.  One-at-a-time
        # descent follows a single basin; the moment system is strongly
        # underdetermined ((sd+1)m dofs vs nexp rows), so a direct jump
        # to a smaller count often converges where the n-1 step cannot.
        keep_order = np.argsort(solver.scores(d, X, w))[::-1]
        for m in (n - 2, n - 4, max(target, -(-nexp // (solver.sd + 1)))):
            if m >= n or (solver.sd + 1) * m < nexp:
                continue
            if time.time() > deadline:
                break
            for jit in (0.0, 0.01):
                Xt = X[np.sort(keep_order[:m])]
                if jit:
                    Xt = np.clip(
                        Xt + jit * rng.standard_normal(Xt.shape), 0, 1)
                wt = solver.reseed_weights(
                    d, Xt, np.full(m, w.sum() / m))
                got = solver.solve(d, Xt, wt, max_nfev=400 + 12 * d)
                if got is None:
                    got = solver.solve_free(d, Xt, wt,
                                            max_nfev=500 + 15 * d)
                if got is not None:
                    improved = got
                    log(f"    jump -> {len(got[1])} pts")
                    break
            if improved is not None:
                break
        if improved is not None:
            best = improved
            hops = 0
            if on_improve is not None and len(best[1]) < seed_n:
                on_improve(*best)
            continue
        # stalled at this count: basin hop (re-solve the same count from
        # a jittered start) so the next removal round attacks a
        # different solution branch
        hops += 1
        if hops > max_hops or time.time() > deadline:
            break
        scale = 0.004 * (1.7 ** hops)
        Xj = np.clip(X + scale * rng.standard_normal(X.shape), 0, 1)
        got = solver.solve(d, Xj, solver.reseed_weights(d, Xj, w))
        if got is not None:
            best = got
            log(f"    hop {hops} at {len(got[1])} pts")
    return best


_CELL_NAME = {2: "TRIANGLE", 3: "TETRAHEDRON"}


def load_table(path, dim=3):
    ns = {}
    if os.path.exists(path):
        with open(path) as f:
            exec(compile(f.read(), path, "exec"), ns)
    return dict(ns.get(_CELL_NAME[dim], {}))


def emit(table, out_path, dim=3):
    name = _CELL_NAME[dim]
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        f.write('"""Generated by tools/gen_quad3d.py -- do not edit.\n\n'
                f"General positive-weight {name.lower()} rules: {{degree:\n"
                "(barycentric points flattened, weights)}; weights\n"
                f"integrate over the UFC reference {name.lower()}\n"
                f"(sum = 1/d! = 1/{factorial(dim)}),\n"
                'rescaled by the consumer for other cells."""\n\n')
        f.write(name + " = {\n")
        for d in sorted(table):
            bary, wts = table[d]
            f.write(f"    {d}: (\n        [")
            f.write(",\n         ".join(
                ", ".join(repr(float(x)) for x in row)
                for row in np.asarray(bary).reshape(-1, dim + 1)))
            f.write("],\n        [")
            f.write(",\n         ".join(repr(float(x)) for x in wts))
            f.write("],\n    ),\n")
        f.write("}\n")
    os.replace(tmp, out_path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-degree", type=int, default=15)
    ap.add_argument("--degrees", default=None,
                    help="comma list / a-b ranges; default = all with a "
                         "gap vs the reference count")
    ap.add_argument("--budget", type=float, default=900.0)
    ap.add_argument("--ratio", type=float, default=1.05,
                    help="stop improving a degree once count <= "
                         "ratio * reference")
    ap.add_argument("--dim", type=int, default=3, choices=(2, 3))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.out is None:
        args.out = os.path.join(REPO, "fiat_tpu", "core",
                                {2: "triquad_data.py",
                                 3: "tetquad_data.py"}[args.dim])

    degrees = []
    if args.degrees:
        for part in args.degrees.split(","):
            if "-" in part:
                a, b = part.split("-")
                degrees.extend(range(int(a), int(b) + 1))
            else:
                degrees.append(int(part))
    else:
        degrees = list(range(2, args.max_degree + 1))

    # the solver's moment table must cover every requested degree --
    # moments(d) slices the table and numpy silently returns fewer rows
    # past the end, which would "verify" exactness only to max_degree
    solver = NodeSolver(max(args.max_degree, max(degrees)), dim=args.dim)
    table = load_table(args.out, args.dim)
    targets = XG_TRI if args.dim == 2 else XG_TET
    from fiat_tpu.core.quadrature import QuadratureRule  # noqa: F401

    for d in degrees:
        target = targets.get(d, 10 ** 9)
        have = table.get(d)
        have_n = len(have[1]) if have else None
        X, w = seed_points(solver, d, elim_table=table)
        if have_n is not None and have_n <= len(w):
            bary = np.asarray(have[0]).reshape(-1, args.dim + 1)
            X = bary @ solver.verts
            w = np.asarray(have[1])
        if len(w) <= args.ratio * target:
            print(f"degree {d:3d}: {len(w):4d} pts kept "
                  f"(<= {args.ratio} * {target})", flush=True)
            continue
        t0 = time.time()
        if not solver.verify(d, X, w):
            print(f"degree {d:3d}: seed does not verify, skipping",
                  flush=True)
            continue
        def save(Xs, ws, _d=d):
            bary = xy_to_bary(solver.cell.get_vertices(), Xs)
            table[_d] = ([float(x) for x in bary.reshape(-1)],
                         [float(x) for x in ws])
            emit(table, args.out, args.dim)

        X, w = eliminate(solver, d, X, w, int(args.ratio * target),
                         t0 + args.budget,
                         log=lambda s: print(s, flush=True),
                         on_improve=(save if have_n is None
                                     else lambda Xs, ws: len(ws) < have_n
                                     and save(Xs, ws)))
        if have_n is None or len(w) < have_n:
            save(X, w)
        flag = "OK" if len(w) <= args.ratio * target else "over"
        print(f"degree {d:3d}: {len(w):4d} pts (reference {target}) "
              f"{flag} [{time.time() - t0:.0f}s]", flush=True)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
