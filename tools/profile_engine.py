#!/usr/bin/env python3
"""Per-stage profile of the fused f64 engine on a zoo config.

Times each pipeline stage with the same methodology as bench.py:
chained-scan execution (so XLA cannot hoist the body) at a fixed chain
length, minus an identity-body floor measured the same way — the
~30 ms axon-tunnel round-trip and the chain scaffolding cancel.

Stages:
  rec        the Pallas slice-recurrence kernel (B-operand pipeline)
  bucket:K   each degree bucket's fused multiword kernel
  specials   macro side programs (masked parent tabulation + GEMM)
  full       the complete _f64_blocks pass

Usage:
  python tools/profile_engine.py                 # full triangle zoo
  python tools/profile_engine.py tet8            # order-8 tet
  python tools/profile_engine.py c1              # C1 + macro zoo
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def chain(jax, jnp, fn, arg, length=128, reps=2):
    eps = np.float64(2 ** -52)

    @jax.jit
    def chained(a):
        def body(c, _):
            out = fn(a * (1.0 + c.astype(a.dtype) * eps))
            # f32 leaves = Pallas pair outputs (not narrowable by XLA):
            # one row serializes the kernel without a full output
            # re-read; f64 leaves are consumed whole (see bench.py)
            s = sum(jnp.sum((v[:1] if v.ndim and v.dtype == jnp.float32
                             else v).astype(jnp.float32))
                    for v in jax.tree_util.tree_leaves(out))
            return c + 1e-300 * s.astype(jnp.float64), s
        _, ss = jax.lax.scan(body, jnp.asarray(0.0, jnp.float64),
                             None, length=length)
        return ss
    float(np.asarray(chained(arg))[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(chained(arg))[0])
        best = min(best, time.perf_counter() - t0)
    return best / length * 1e3


def zoos(fe, tri, tet):
    full = ([fe.Lagrange(tri, p) for p in range(1, 11)]
            + [fe.DiscontinuousLagrange(tri, p) for p in range(1, 9)]
            + [fe.RaviartThomas(tri, k) for k in range(1, 7)]
            + [fe.Nedelec(tri, k) for k in range(1, 7)]
            + [fe.BrezziDouglasMarini(tri, k) for k in range(1, 7)]
            + [fe.CubicHermite(tri), fe.Morley(tri), fe.Argyris(tri, 5),
               fe.Bell(tri), fe.HsiehCloughTocher(tri, 3),
               fe.QuadraticPowellSabin6(tri)])
    return {
        "full": (full, 2),
        "tet8": ([fe.Lagrange(tet, 8)], 3),
        "c1": ([fe.CubicHermite(tri), fe.Morley(tri), fe.Argyris(tri, 5),
                fe.Bell(tri), fe.HsiehCloughTocher(tri, 3),
                fe.QuadraticPowellSabin6(tri),
                fe.QuadraticPowellSabin12(tri)], 2),
    }


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "full"
    npts = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import fiat_tpu  # noqa: F401
    from fiat_tpu.core import cells as cl
    from fiat_tpu import elements as fe
    from fiat_tpu.ops.tabulate import BatchedTabulator
    from fiat_tpu.ops.pallas_multiword import FusedZooTabulator

    tri, tet = cl.ufc_simplex(2), cl.ufc_simplex(3)
    els, dim = zoos(fe, tri, tet)[which]
    bt = BatchedTabulator(els, order=1)
    interpret = jax.default_backend() == "cpu"
    fz = FusedZooTabulator(bt, interpret=interpret)
    if interpret:
        print("[note] CPU backend: kernels run in interpret mode "
              "(relative numbers only)")

    rng = np.random.default_rng(0)
    p = rng.random((npts, dim))
    p = p / (p.sum(axis=1)[:, None] + 1e-9) * rng.random((npts, 1))
    pts = jnp.asarray(p)

    floor = chain(jax, jnp, lambda q: q[:1, :1], pts)
    print(f"[{which}] chain floor        {floor:8.3f} ms (subtracted)")

    rec = fz._slice_rec
    if rec is not None:
        t = chain(jax, jnp, rec._apply, pts) - floor
        print(f"[{which}] slice recurrence   {t:8.3f} ms "
              f"(nexp {rec.nexp}, tile {rec._vmem_tile()})")
        slices_ready = rec(pts)
        jax.block_until_ready(slices_ready)

        for b in fz.buckets:
            def one(q, b=b):
                sl, sB = rec._apply(q)
                return b.fm.apply_pair(([x[:b.K] for x in sl], sB),
                                       trim=False)
            t = chain(jax, jnp, one, pts) - floor
            print(f"[{which}] rec+bucket K={b.K:<4d} {t:8.3f} ms "
                  f"(rows {b.rows}, rpad {b.fm.rpad})")

    if bt.special_progs:
        t = chain(jax, jnp, fz._specials, pts) - floor
        print(f"[{which}] macro specials     {t:8.3f} ms "
              f"({len(fz.macro_fms)} programs)")
        if getattr(fz, "macro_oneshot", None) is not None:
            t = chain(jax, jnp,
                      lambda q: fz.macro_oneshot.apply_pair_points(
                          q, trim=False), pts) - floor
            print(f"[{which}] macro ONE-SHOT     {t:8.3f} ms "
                  f"(K {fz.macro_oneshot.K}, "
                  f"rpad {fz.macro_oneshot.rpad}, "
                  f"T {fz.macro_oneshot.point_tile})")
        if fz._macro_rec is not None:
            t = chain(jax, jnp, fz._macro_rec._apply, pts) - floor
            print(f"[{which}] macro recurrence   {t:8.3f} ms "
                  f"(dedicated, nexp {fz._macro_rec.nexp})")
        if fz.macro_merged is not None:
            from fiat_tpu.core.expansions import partition_of_unity_masks

            def masks_only(q):
                outs = []
                for prog in bt.macro_programs:
                    unique = (prog.es.continuity is not None
                              and bt.order == 0)
                    m, _tot = partition_of_unity_masks(
                        prog.es.ref_el, q, unique=unique, raw=True)
                    outs.append(jnp.stack(
                        [m[pos] for pos, _c in enumerate(prog.cells)]))
                return outs
            t = chain(jax, jnp, masks_only, pts) - floor
            print(f"[{which}] binning masks      {t:8.3f} ms")

            def merged_only(q):
                sl, sB = (fz._macro_rec._apply(q)
                          if fz._macro_rec is not None
                          else fz._prepared(q))
                M = jnp.concatenate(masks_only(q), axis=0)
                return fz.macro_merged.apply_pair_masked(sl, sB, M)
            t = chain(jax, jnp, merged_only, pts) - floor
            print(f"[{which}] rec+masks+merged   {t:8.3f} ms "
                  f"(K {fz.macro_merged.K}, rpad {fz.macro_merged.rpad})")

    t = chain(jax, jnp, fz._pair_blocks, pts) - floor
    print(f"[{which}] FULL _pair_blocks  {t:8.3f} ms (default surface)")
    t = chain(jax, jnp, fz._f64_blocks, pts) - floor
    print(f"[{which}] FULL _f64_blocks   {t:8.3f} ms (promoted)")


if __name__ == "__main__":
    main()
