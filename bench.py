"""Benchmark: batched full-zoo tabulation throughput on TPU vs NumPy FIAT.

Tabulates values + gradients of a zoo of triangle elements (Lagrange/DG
p=1..10, RT/Nedelec/BDM k=1..6, Hermite, Morley, Argyris, Bell) at 1e5
points in ONE fused jitted program (BatchedTabulator), in float64, and
compares against the reference FIAT doing the same tabulations on CPU
(imported from /root/reference via the bundled recursivenodes shim).

Prints one JSON line:
  {"metric": ..., "value": points*basis-values/sec, "unit": ...,
   "vs_baseline": speedup_over_reference, ...}
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(REPO, "shims"))
sys.path.insert(0, REPO)
if os.path.isdir("/root/reference"):
    sys.path.insert(0, "/root/reference")

NPTS = 100_000
NCHECK = 2_000


def build_zoo(cells_mod, lagrange, dg, rt, ned, bdm, hermite, morley, argyris, bell):
    T = cells_mod(2)
    zoo = [lagrange(T, p) for p in range(1, 11)]
    zoo += [dg(T, p) for p in range(1, 9)]
    zoo += [rt(T, k) for k in range(1, 7)]
    zoo += [ned(T, k) for k in range(1, 7)]
    zoo += [bdm(T, k) for k in range(1, 7)]
    zoo += [hermite(T), morley(T), argyris(T, 5), bell(T)]
    return zoo


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import fiat_tpu  # noqa: F401
    from fiat_tpu.core import cells as cl
    from fiat_tpu.elements.argyris import Argyris
    from fiat_tpu.elements.bell import Bell
    from fiat_tpu.elements.brezzi_douglas_marini import BrezziDouglasMarini
    from fiat_tpu.elements.discontinuous_lagrange import DiscontinuousLagrange
    from fiat_tpu.elements.hermite import CubicHermite
    from fiat_tpu.elements.lagrange import Lagrange
    from fiat_tpu.elements.morley import Morley
    from fiat_tpu.elements.nedelec import Nedelec
    from fiat_tpu.elements.raviart_thomas import RaviartThomas
    from fiat_tpu.ops.tabulate import BatchedTabulator

    zoo = build_zoo(cl.ufc_simplex, Lagrange, DiscontinuousLagrange,
                    RaviartThomas, Nedelec, BrezziDouglasMarini,
                    CubicHermite, Morley, Argyris, Bell)
    tab = BatchedTabulator(zoo, order=1)

    rng = np.random.default_rng(42)
    pts = rng.random((NPTS, 2))
    pts = pts / (pts.sum(axis=1)[:, None] + 1e-9) * rng.random((NPTS, 1))
    dpts = jnp.asarray(pts)

    # one output entry = one (basis row x point) value per derivative table
    rows = tab.stacked.shape[0]
    n_tables = 3  # value + 2 gradient components
    work = rows * NPTS * n_tables

    # Remote/async dispatch makes block_until_ready unreliable for timing
    # through a device tunnel: run K chained iterations inside ONE program
    # and fetch a scalar, so the wall time provably covers K executions.
    K = 8

    @jax.jit
    def chained(points):
        def body(p, _):
            tables = tab._tabulate(p)
            s = sum(jnp.sum(t) for t in tables.values())
            return p + 1e-300 * s, s
        _, ss = jax.lax.scan(body, points, None, length=K)
        return ss

    float(np.asarray(chained(dpts))[0])       # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(chained(dpts))[0])   # host fetch = hard sync
        times.append(time.perf_counter() - t0)
    tpu_time = min(times) / K
    value = work / tpu_time

    # ---- reference FIAT on CPU, same tabulations -------------------------
    vs_baseline = None
    max_err = None
    try:
        import FIAT
        ref_zoo = build_zoo(FIAT.ufc_simplex, FIAT.Lagrange,
                            FIAT.DiscontinuousLagrange, FIAT.RaviartThomas,
                            FIAT.Nedelec, FIAT.BrezziDouglasMarini,
                            FIAT.CubicHermite, FIAT.Morley, FIAT.Argyris,
                            FIAT.Bell)
        # accuracy check on a subset of points
        sub = pts[:NCHECK]
        fused = {a: np.asarray(v)[:, :NCHECK] for a, v in tab(jnp.asarray(sub)).items()}
        per = tab.unpack(fused)
        max_err = 0.0
        for e, mine in zip(ref_zoo, per):
            theirs = e.tabulate(1, sub)
            for a in theirs:
                max_err = max(max_err, float(abs(theirs[a]
                                                 - mine[a].reshape(theirs[a].shape)).max()))
        # timing: min of 2 passes (host timing is load-sensitive)
        ref_time = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for e in ref_zoo:
                e.tabulate(1, pts)
            ref_time = min(ref_time, time.perf_counter() - t0)
        vs_baseline = (work / tpu_time) / (work / ref_time)
    except Exception as exc:  # reference unavailable: report absolute only
        sys.stderr.write(f"reference comparison skipped: {exc}\n")

    # ---- pallas fused f32 throughput path (values + gradients) -----------
    pallas_vps = None
    pallas_err = None
    try:
        from fiat_tpu.ops.pallas_tabulate import PallasZooTabulator
        ptab = PallasZooTabulator(tab)   # fuses all 3 tables

        @jax.jit
        def pallas_chained(points):
            def body(p, _):
                out = ptab._apply(p)
                s = jnp.sum(out)
                return p + 1e-30 * s, s
            _, ss = jax.lax.scan(body, points.astype(jnp.float32), None,
                                 length=K)
            return ss

        float(np.asarray(pallas_chained(dpts))[0])
        t0 = time.perf_counter()
        float(np.asarray(pallas_chained(dpts))[0])
        pallas_time = (time.perf_counter() - t0) / K
        pallas_vps = ptab.rows * NPTS / pallas_time
        sub = pts[:NCHECK]
        fused32 = ptab.unpack(np.asarray(ptab(jnp.asarray(sub))))
        ref64 = tab(jnp.asarray(sub))
        pallas_err = max(
            float(np.abs(fused32[a] - np.asarray(ref64[a])).max()
                  / max(1.0, np.abs(np.asarray(ref64[a])).max()))
            for a in ref64)
    except Exception as exc:
        sys.stderr.write(f"pallas path skipped: {exc}\n")

    result = {
        "metric": "fused full-zoo tabulation (values+grads, 41 triangle "
                  "elements, p<=10, 1e5 pts, f64)",
        "value": value,
        "unit": "basis-values/s",
        "vs_baseline": vs_baseline,
        "tpu_time_s": tpu_time,
        "max_abs_err_vs_reference": max_err,
        "device": str(jax.devices()[0]),
        "rows": rows,
        "pallas_f32_values_per_s": pallas_vps,
        "pallas_f32_rel_err": pallas_err,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
