"""Benchmark: the five BASELINE.json configs on TPU vs NumPy FIAT.

Each config tabulates (values + gradients, float64 via the fused Ozaki
multiword engine) on the TPU and runs the same tabulations with the
reference FIAT on CPU (imported from /root/reference via the bundled
recursivenodes shim):

  1. p2_tri      P2 Lagrange/triangle at the degree-4 Gauss-Jacobi rule,
                 tiled to 1e5 points (assembly over ~11k cells)
  2. tet8_hex    order-8 Lagrange/tet at 1e5 points + order-8 GLL/hex
                 sum-factorised moments on a 46^3 factored grid
  3. hdiv_hcurl  RT / Nedelec / BDM on triangles (k<=6) and tets (k<=3)
  4. c1_macro    C1 zoo: Hermite, Morley, Argyris, Bell + HCT and
                 Powell-Sabin 6/12 macro side programs
  5. full_zoo    the full triangle sweep (Lagrange/DG p<=10, RT/Ned/BDM
                 k<=6, Hermite, Morley, Argyris, Bell, HCT, PS6)

Prints ONE JSON line: the headline metric is the full-zoo sweep; the
other configs are recorded under "configs".
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
NREF = 20_000   # reference CPU timing points (scaled linearly to NPTS)
NCHECK = 2_000
K = 4  # chained device iterations per timed fetch


def chain_timer(jax, jnp, fn, arg, reps=3, target_s=0.25):
    """min wall time of one fn(arg) execution: K chained executions inside
    one jitted scan, synced by a scalar host fetch (async-dispatch safe).
    Returns (seconds, flag) where flag is None or a timing-quality note.

    K auto-scales so the chained run dwarfs the device round-trip
    latency (~30 ms through the axon tunnel, which at the fixed K=4
    dominated every sub-10-ms config).

    The input is perturbed by the loop carry each iteration: XLA's
    loop-invariant code motion otherwise hoists the whole body out of
    the scan (measured: a full-array reduction times at exactly
    latency/K for every K), which would time nothing at all."""
    eps = jnp.asarray(1e-300 if arg.dtype == jnp.float64 else 1e-30,
                      dtype=arg.dtype)

    def make(length):
        @jax.jit
        def chained(a):
            def body(c, _):
                out = fn(a * (1.0 + c.astype(a.dtype) * eps))
                leaves = jax.tree_util.tree_leaves(out)
                # liveness sink: f32 leaves are Pallas pair outputs --
                # XLA cannot narrow a pallas_call, so consuming ONE row
                # serializes the whole kernel without charging it a
                # full HBM re-read of its own output (the reference CPU
                # timing pays no such consumer reduction either;
                # measured: the full-array sum added ~2 ms per 1.6 GB
                # of pair output).  f64 leaves may be XLA-derived
                # (narrowable), so they are consumed in full, as an f32
                # sum -- an f64 reduction is emulated and comparable to
                # the workload itself.
                s = sum(jnp.sum((v[:1] if v.ndim and v.dtype == jnp.float32
                                 else v).astype(jnp.float32))
                        for v in leaves)
                return c + 1e-300 * s.astype(jnp.float64), s
            _, ss = jax.lax.scan(body, jnp.asarray(0.0, jnp.float64),
                                 None, length=length)
            return ss
        return chained
    probe = make(K)
    float(np.asarray(probe(arg))[0])            # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(probe(arg))[0])
    est = max((time.perf_counter() - t0) / K, 1e-6)
    length = min(512, max(K, int(target_s / est + 0.5)))
    # time at L and 2L and difference: the constant per-fetch round-trip
    # (~30 ms through the axon tunnel) cancels exactly, so small configs
    # aren't charged the tunnel latency the reference CPU never pays

    def diff_at(length):
        runs = []
        for n in (length, 2 * length):
            chained = probe if n == K else make(n)
            float(np.asarray(chained(arg))[0])  # warm (fresh scan length)
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(np.asarray(chained(arg))[0])
                best = min(best, time.perf_counter() - t0)
            runs.append(best)
        return (runs[1] - runs[0]) / length

    # timing noise at short chains can make the 2L run no slower than
    # the L run; a clamp there would silently report ~1e9x throughput.
    # Retry at longer chains, and flag the result if it never resolves.
    d = diff_at(length)
    for _ in range(2):
        if d > 0:
            break
        longer = min(4096, 2 * length)
        if longer == length:        # already at the cap: a re-run of the
            break                   # identical pair can't resolve anything
        length = longer
        d = diff_at(length)
    if d <= 0:
        return 1e-9, "nonpositive_chain_diff"
    # MEDIAN of three independent L/2L diffs: the axon tunnel exhibits
    # multi-second sustained stalls on some days, corrupting a single
    # pair in EITHER direction (p2 read 9.5 ms for a truth of 0.23;
    # full_zoo read 5.0 ms for a truth of ~7.1).  The per-pair
    # min-of-reps absorbs short spikes; the cross-pair median absorbs
    # sustained ones.  A diff can also never legitimately exceed the
    # warm single-execution estimate (est still charges the FULL ~30 ms
    # round-trip / K), so samples above est are known-corrupt.
    samples = [d]
    tries = 0
    while len(samples) < 3 and tries < 6:
        tries += 1
        d2 = diff_at(length)
        if d2 > 0:
            samples.append(d2)
    plaus = sorted(x for x in samples if x <= est) or sorted(samples)
    d = plaus[len(plaus) // 2]
    spread = (max(plaus) - min(plaus)) / d if d else 0.0
    flag = None
    if len(plaus) < len(samples):
        flag = "dropped_samples_above_single_exec_estimate"
    elif spread > 0.25:
        flag = f"timer_jitter_spread_{spread:.2f}"
    return d, flag


def host_timer(fn, reps=1):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def direct_timer(jax, fn, arg, reps=3):
    """min wall time of one blocking fn(arg) on a LOCAL backend (CPU
    fallback): per-call dispatch is microseconds there, so the
    chain-differencing machinery (built to cancel the ~30 ms tunnel
    round-trip) is unnecessary and ~4x more expensive."""
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(arg))          # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(jfn(arg))
        best = min(best, time.perf_counter() - t0)
    return best, None


def _device_peaks(jax):
    """(HBM bytes/s, bf16 flops/s, VPU ops/s) for the current device
    generation, or (None, None, None) when unknown.  bf16 MXU peaks are
    the DENSE bf16 numbers (v5e: 197 -- its widely quoted 394 is int8,
    which the kernel model weights at 0.5 against this peak).  The VPU
    peak is bf16_peak/32: per TensorCore, 4 vector ALUs over an (8,128)
    register vs 4 MXUs of 128x128x2 flops at the same clock."""
    kind = getattr(jax.devices()[0], "device_kind", "")
    peaks = {"v5 lite": (819, 197), "v5e": (819, 197), "v5p": (2765, 459),
             "v6": (1640, 918), "v4": (1228, 275)}
    for key, (b, f) in peaks.items():
        if key in kind:
            return b * 1e9, f * 1e12, f * 1e12 / 32
    return None, None, None


#: Pallas-kernel primitives counted as one VPU ALU op per output
#: element.  Memory movement (get/swap), layout changes (broadcast,
#: reshape, transpose, concatenate, slice, pad) and control flow are NOT
#: counted -- they cost real time on TPU but have no clean per-element
#: ALU model, so skipping them keeps the VPU term an UNDERestimate and
#: the floor conservative.
_VPU_PRIMS = frozenset("""
add sub mul div neg abs max min sign floor ceil round rem
select_n lt le gt ge eq ne and or xor not
shift_left shift_right_logical shift_right_arithmetic
integer_pow exp log rsqrt sqrt
""".split())
# convert_element_type / bitcast_convert_type are NOT counted: Mosaic
# folds representation changes into the producing/consuming op in the
# common case, and counting them pushed the smallest config marginally
# past frac_of_floor 1.0 (an overcounting tell).


def _subjaxprs(params):
    for v in params.values():
        vals = v if isinstance(v, (list, tuple)) else (v,)
        for item in vals:
            if hasattr(item, "eqns"):
                yield item                  # raw Jaxpr
            elif hasattr(item, "jaxpr"):
                yield item.jaxpr            # ClosedJaxpr


def _kernel_stats(kjaxpr):
    """(vpu_ops, weighted_mxu_flops) per grid step of a Pallas kernel
    jaxpr.  dot_general counts 2*M*N*K (0.5 weight for s8 operands --
    the s8 MXU runs at 2x the bf16 rate); listed elementwise primitives
    count one ALU op per output element."""
    vpu = 0
    mxu = 0.0
    for eqn in kjaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            lhs = eqn.invars[0].aval
            rhs = eqn.invars[1].aval
            (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
            K = int(np.prod([lhs.shape[d] for d in lc])) if lc else 1
            B = int(np.prod([lhs.shape[d] for d in lb])) if lb else 1
            M = int(np.prod([lhs.shape[d] for d in range(lhs.ndim)
                             if d not in tuple(lc) + tuple(lb)]))
            N = int(np.prod([rhs.shape[d] for d in range(rhs.ndim)
                             if d not in tuple(rc) + tuple(rb)]))
            w = 0.5 if str(lhs.dtype) in ("int8", "uint8") else 1.0
            mxu += 2.0 * B * M * N * K * w
            continue
        for sub in _subjaxprs(eqn.params):
            sv, sm = _kernel_stats(sub)
            vpu += sv
            mxu += sm
        if name in _VPU_PRIMS and eqn.outvars:
            shape = getattr(eqn.outvars[0].aval, "shape", ())
            if not shape:
                vpu += 1
            else:
                # REGISTER-PADDED issue cost: the VPU processes whole
                # (8, 128) vector registers, so an op on (k, T) rows
                # with k < 8 (the early recurrence levels, binning mask
                # rows, column scales) still spends ceil(k/8) x
                # ceil(T/128) register slots.  Raw element counts
                # undercount exactly the narrow-row chains that
                # dominate the df32 recurrences.
                r = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
                c = int(shape[-1])
                vpu += (-(-r // 8) * 8) * (-(-c // 128) * 128)
    return vpu, mxu


def engine_model_floor(jax, fn, arg, seconds):
    """Traced-kernel roofline of one fused pass: every Pallas kernel in
    ``jax.make_jaxpr(fn)(arg)`` contributes
    max(bytes/HBM_BW, flops_w/MXU_bf16_peak, vpu_ops/VPU_peak), summed.

    - bytes: the kernel's own analytic CostEstimate (operand streaming
      per the grid layout + the pair written once).
    - flops: dot_generals counted from the traced kernel body (x grid
      steps), s8 at half weight against the bf16 peak.
    - vpu_ops: elementwise ALU ops counted from the traced kernel body
      (x grid steps).  The df32 recurrences, ff binning and TwoSum
      combines are REAL work on the VPU -- a bytes-only model called
      the macro engine 7x off when its kernels were VPU-bound.
    Non-Pallas XLA glue (pair split, padding, slicing) is excluded, so
    the true floor is slightly higher (frac_of_floor slightly
    optimistic)."""
    hbm_peak, mxu_peak, vpu_peak = _device_peaks(jax)
    kernels = []

    def walk(jx):
        for eqn in jx.eqns:
            if eqn.primitive.name == "pallas_call":
                gm = eqn.params["grid_mapping"]
                nsteps = int(np.prod([int(g) for g in gm.grid])) or 1
                vpu, mxu = _kernel_stats(eqn.params["jaxpr"])
                ce = eqn.params.get("cost_estimate")
                byts = int(ce.bytes_accessed) if ce is not None else 0
                kernels.append({"name": str(eqn.params.get("name") or "?"),
                                "grid_steps": nsteps,
                                "hbm_bytes": byts,
                                "mxu_flops": mxu * nsteps,
                                "vpu_ops": vpu * nsteps})
            else:
                for sub in _subjaxprs(eqn.params):
                    walk(sub)

    try:
        walk(jax.make_jaxpr(fn)(arg).jaxpr)
    except Exception as e:                      # pragma: no cover
        return {"error": f"trace failed: {e!r}"}
    out = {"kernel_flops": sum(k["mxu_flops"] for k in kernels),
           "kernel_hbm_bytes": sum(k["hbm_bytes"] for k in kernels),
           "kernel_vpu_ops": sum(k["vpu_ops"] for k in kernels)}
    if hbm_peak:
        floor = 0.0
        for k in kernels:
            terms = {"hbm": k["hbm_bytes"] / hbm_peak,
                     "mxu": k["mxu_flops"] / mxu_peak,
                     "vpu": k["vpu_ops"] / vpu_peak}
            k["floor_ms"] = max(terms.values()) * 1e3
            k["bound"] = max(terms, key=terms.get)
            floor += max(terms.values())
        out["floor_ms"] = floor * 1e3
        out["frac_of_floor"] = floor / seconds
        if floor / seconds > 1.0:
            # the chained-scan timer is good to ~3-5%: a frac slightly
            # above 1 means the config sits AT its floor, not that the
            # model is violated
            out["frac_note"] = "measured within timer noise of the floor"
        bounds = [k["bound"] for k in kernels]
        out["bound"] = max(set(bounds), key=bounds.count) if bounds else None
        out["kernels"] = kernels
    return out


def device_roofline(jax, fn, arg, seconds):
    """Compiled cost analysis for one fn(arg) pass: flops, HBM bytes, and
    achieved fractions of the device peaks (roofline placement).

    Replaces the reference's static flop counter
    (/root/reference/gem/flop_count.py:188) with XLA's own model."""
    try:
        comp = jax.jit(fn).lower(arg).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0] if ca else {}
    except Exception as exc:  # cost model unavailable on some backends
        return {"error": f"{type(exc).__name__}: {exc}"}
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    hbm_peak, mxu_peak, _vpu_peak = _device_peaks(jax)
    out = {"flops": flops, "hbm_bytes": byts,
           "gflops_per_s": flops / seconds / 1e9,
           "hbm_gbytes_per_s": byts / seconds / 1e9,
           "arithmetic_intensity": flops / byts if byts else None}
    if hbm_peak:
        out["frac_hbm_peak"] = byts / seconds / hbm_peak
        out["frac_mxu_bf16_peak"] = flops / seconds / mxu_peak
    return out


def zoo_config(jax, jnp, name, mine, ref, pts, order=1, full_ref=False,
               nref=NREF):
    """Time a fused f64 zoo pass on TPU vs the same tabulations on CPU.
    The CPU reference is timed at ``nref`` points and scaled linearly
    unless ``full_ref`` (tabulation cost is linear in the point count)."""
    from fiat_tpu.ops.tabulate import BatchedTabulator
    tpu_like = jax.default_backend() in ("tpu", "axon")
    if tpu_like:
        from fiat_tpu.ops.pallas_multiword import FusedZooTabulator
        bt = BatchedTabulator(mine, order=order)
        fz = FusedZooTabulator(bt)
        timed_fn = fz._pair_blocks
    else:
        # CPU fallback: f64 is native here, so the multiword pipeline
        # (which exists to emulate f64 on the bf16 MXU) would only run
        # in slow interpret mode.  Time the plain XLA f64 engine.
        bt = BatchedTabulator(mine, order=order, matmul="native")
        fz = None
        timed_fn = bt._tabulate
    dpts = jnp.asarray(pts)
    sys.stderr.write(f"[bench] {name}: compiled+timing\n"); sys.stderr.flush()
    # block layout: per-source tables (the reference likewise emits
    # per-element arrays; a fused concatenation would cost every table
    # an extra HBM round-trip).  The DEFAULT consumer surface is the
    # exact two-float pair (hi + lo == the f64 table): f64 is emulated
    # on TPU, so the final promote is opt-in (ops/pallas_multiword.py,
    # _pair_blocks docstring); its cost is recorded as the delta below.
    timer = (lambda fn, reps: chain_timer(jax, jnp, fn, dpts, reps=reps)) \
        if tpu_like else (lambda fn, reps: direct_timer(jax, fn, dpts, reps))
    tpu_time, tflag = timer(timed_fn, 3)
    sys.stderr.write(f"[bench] {name}: tpu {tpu_time*1e3:.1f} ms (pair)\n"); sys.stderr.flush()
    f64_flag = None
    if fz is not None:
        f64_time, f64_flag = chain_timer(jax, jnp, fz._f64_blocks, dpts,
                                         reps=2)
    rows = max(hi for (lo, hi, shape) in bt.slices)
    ntab = len(bt._alpha_order) if bt.alpha_mats else 1
    work = rows * len(pts) * ntab
    roof = device_roofline(jax, timed_fn, dpts, tpu_time)
    if fz is not None:
        roof["kernel_model"] = engine_model_floor(jax, timed_fn, dpts,
                                                  tpu_time)

    max_err = ref_time = speedup = None
    if ref is not None:
        sub = pts[:NCHECK]
        # parity THROUGH the pair surface: unpack_pairs sums hi + lo on
        # the host, so the default (combine-free) path is what's checked
        per = (fz.unpack_pairs(fz.pair_blocks(sub), len(sub))
               if fz is not None else bt.unpack(bt(sub)))
        max_err = 0.0
        for e, tab in zip(ref, per):
            theirs = e.tabulate(order, sub)
            for a in theirs:
                max_err = max(max_err, float(np.abs(
                    np.asarray(theirs[a]) - tab[a].reshape(np.shape(theirs[a]))).max()))
        sys.stderr.write(f"[bench] {name}: parity done, timing reference\n"); sys.stderr.flush()
        rpts = pts if full_ref else pts[:nref]
        ref_time = host_timer(lambda: [e.tabulate(order, rpts) for e in ref])
        ref_time *= len(pts) / len(rpts)
        speedup = ref_time / tpu_time
    out = {"name": name, "elements": len(mine), "rows": rows,
           "tpu_ms": tpu_time * 1e3, "ref_s": ref_time, "speedup": speedup,
           "max_abs_err": max_err, "work": work,
           "values_per_s": work / tpu_time, "roofline": roof}
    if fz is not None:
        out["tpu_ms_f64_promote"] = f64_time * 1e3
        po = (f64_time - tpu_time) * 1e3
        out["promote_overhead_ms"] = po
        if po <= 0:
            # two independent chain timers subtracted: a non-positive
            # difference is timer noise, not negative work -- flag it so
            # the driver artifact is self-describing
            out["promote_overhead_flag"] = "below_timer_resolution"
    if tflag:
        out["timing_flag"] = tflag
    if f64_flag:
        out["timing_flag_f64_promote"] = f64_flag
    return out


def moments_config(jax, jnp, name, mine, ref, pts, nref=NREF):
    """Dual-evaluation/moments config: M[i] = sum_q w_q f(x_q) phi_i(x_q)
    for every basis function of the zoo, computed expansion-side (the
    sum-factorised contraction of ops/moments.py -- the reference's
    to_riesz + dual_evaluation hot path,
    /root/reference/FIAT/dual_set.py:86-206 and
    /root/reference/finat/finiteelementbase.py:245-285).  The nodal
    table is never materialised, so the engine's 8 B/value pair-write
    floor does not apply; ``via_tables_ms`` records what materialising
    through the fused pair surface + contracting would cost instead."""
    from fiat_tpu.ops.tabulate import BatchedTabulator
    from fiat_tpu.ops import moments as mo
    tpu_like = jax.default_backend() in ("tpu", "axon")
    bt = BatchedTabulator(mine, order=0)
    rng = np.random.default_rng(7)
    wf_h = rng.random(len(pts))
    dpts = jnp.asarray(pts)
    wf = jnp.asarray(wf_h)
    timed_fn = lambda q: mo.moment_rows(bt, q, wf)   # noqa: E731
    sys.stderr.write(f"[bench] {name}: compiled+timing\n"); sys.stderr.flush()
    timer = (lambda fn, reps: chain_timer(jax, jnp, fn, dpts, reps=reps)) \
        if tpu_like else (lambda fn, reps: direct_timer(jax, fn, dpts, reps))
    tpu_time, tflag = timer(timed_fn, 3)
    rows = max(hi for (lo, hi, shape) in bt.slices)
    roof = device_roofline(jax, timed_fn, dpts, tpu_time)
    roof["kernel_model"] = engine_model_floor(jax, timed_fn, dpts, tpu_time)

    # what the same moments cost when the nodal table IS materialised
    # (fused pair surface + f64 contraction) -- the floor this config
    # exists to bypass
    via_tables = None
    if tpu_like:
        try:
            from fiat_tpu.ops.pallas_multiword import FusedZooTabulator
            fz = FusedZooTabulator(BatchedTabulator(mine, order=0))

            def through_tables(q):
                blocks = fz._f64_blocks(q)
                a0 = next(iter(blocks))
                return [b @ wf for b in blocks[a0]]
            via_tables, _ = chain_timer(jax, jnp, through_tables, dpts,
                                        reps=2)
        except Exception as exc:
            via_tables = None
            sys.stderr.write(f"[bench] {name}: via-tables probe failed "
                             f"({exc})\n")

    max_err = ref_time = speedup = None
    if ref is not None:
        sub = pts[:NCHECK]
        wsub = wf_h[:NCHECK]
        M = np.asarray(jax.jit(lambda q, w: mo.moment_rows(bt, q, w))(
            jnp.asarray(sub), jnp.asarray(wsub)))
        per = mo.unpack_moments(bt, M)
        max_err = 0.0
        for e, m in zip(ref, per):
            tab = e.tabulate(0, sub)[(0,) * sub.shape[1]]
            want = np.asarray(tab).reshape(m.shape + (len(sub),)) @ wsub
            max_err = max(max_err, float(np.abs(want - m).max()))
        sys.stderr.write(f"[bench] {name}: parity done, timing reference\n")
        sys.stderr.flush()
        rpts = pts[:nref]
        rw = wf_h[:nref]

        def ref_pass():
            out = []
            for e in ref:
                tab = e.tabulate(0, rpts)[(0,) * rpts.shape[1]]
                t2 = np.asarray(tab).reshape(-1, len(rpts))
                out.append(t2 @ rw)
            return out
        ref_time = host_timer(ref_pass) * len(pts) / len(rpts)
        speedup = ref_time / tpu_time
    out = {"name": name, "elements": len(mine), "rows": rows,
           "tpu_ms": tpu_time * 1e3, "ref_s": ref_time, "speedup": speedup,
           "max_abs_err": max_err, "work": rows * len(pts),
           "values_per_s": rows * len(pts) / tpu_time, "roofline": roof}
    if via_tables is not None:
        out["via_tables_ms"] = via_tables * 1e3
        out["pair_write_floor_bypass_x"] = via_tables / tpu_time
        out["via_tables_note"] = ("f64 block tables materialised by the "
                                  "fused engine + an emulated-f64 "
                                  "contraction -- the naive consumer "
                                  "route on TPU")
    if tflag:
        out["timing_flag"] = tflag
    return out


def hex_gll_config(jax, jnp, FIAT):
    """Order-8 GLL hex: sum-factorised moments on a 46^3 factored grid vs
    the reference's dense tabulation + contraction."""
    from fiat_tpu.core import cells as cl
    from fiat_tpu.core.barycentric import (barycentric_interpolation,
                                           get_lagrange_points)
    from fiat_tpu import elements as fe
    from fiat_tpu.core.quadrature import GaussJacobiQuadratureLineRule

    I = cl.ufc_simplex(1)
    gll = fe.GaussLobattoLegendre(I, 8)
    m = 46
    rule = GaussJacobiQuadratureLineRule(I, m)
    x1, w1 = rule.get_points(), rule.get_weights()
    phi1 = gll.tabulate(0, x1)[(0,)]                # (9, m) 1D factor table

    P1 = jnp.asarray(phi1)
    W1 = jnp.asarray(w1)
    rng = np.random.default_rng(0)
    F = jnp.asarray(rng.random((m, m, m)))

    def moments(f):
        # sum-factorised: contract one axis at a time, O(p*N) per axis
        t = jnp.einsum("aq,qrs->ars", P1 * W1, f)
        t = jnp.einsum("br,ars->abs", P1 * W1, t)
        return jnp.einsum("cs,abs->abc", P1 * W1, t)

    if jax.default_backend() in ("tpu", "axon"):
        tpu_time, tflag = chain_timer(jax, jnp, moments, F)
    else:
        tpu_time, tflag = direct_timer(jax, moments, F)
    roof = device_roofline(jax, moments, F, tpu_time)
    M = np.asarray(moments(F)).reshape(-1)

    ref_time = max_err = speedup = None
    if FIAT is not None:
        # the unfactorised reference: the FIAT hex element's dense
        # (729, m^3) table + one contraction
        ri = FIAT.ufc_simplex(1)
        rgll = FIAT.GaussLobattoLegendre(ri, 8)
        rphi = rgll.tabulate(0, np.asarray(x1))[(0,)]
        max_err = float(np.abs(rphi - phi1).max())
        tp = FIAT.tensor_product.TensorProductElement(
            FIAT.tensor_product.TensorProductElement(rgll, rgll), rgll)
        hexel = FIAT.tensor_product.FlattenedDimensions(tp)
        xg = np.asarray(x1).ravel()
        grid = np.stack(np.meshgrid(xg, xg, xg, indexing="ij"),
                        axis=-1).reshape(-1, 3)
        w3f = (np.einsum("p,q,r->pqr", w1, w1, w1) * np.asarray(F)).ravel()

        def ref_pass():
            tab = hexel.tabulate(0, grid)[(0, 0, 0)]
            return tab @ w3f
        Mr = ref_pass()
        max_err = max(max_err, float(np.abs(Mr - M).max() / np.abs(Mr).max()))
        ref_time = host_timer(ref_pass)
        speedup = ref_time / tpu_time
    out = {"name": "hex_gll_sumfact", "tpu_ms": tpu_time * 1e3,
           "ref_s": ref_time, "speedup": speedup, "max_abs_err": max_err,
           "npts": m ** 3, "roofline": roof}
    if tflag:
        out["timing_flag"] = tflag
    return out


_PROBE_SRC = """
import os
import jax
# honour a JAX_PLATFORMS override (e.g. CPU smoke runs): the env var
# alone does not stop the wedge-prone axon plugin from initialising,
# the config update does (same workaround as tests/conftest.py)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
d = jax.devices()
assert d, d
import jax.numpy as jnp
x = jnp.ones((256, 256), jnp.float32)
(x @ x).block_until_ready()
"""


def probe_device(max_wait=1500, attempt_timeout=150):
    """Bounded-retry device probe with backoff.

    Each attempt runs in a FRESH subprocess: PJRT backend init is a
    process-wide singleton, so once an in-process ``jax.devices()``
    hangs on a wedged axon-tunnel claim it hangs forever — only a new
    process re-initiates the claim.  Returns True once a probe succeeds
    (a transient wedge often clears within minutes)."""
    import subprocess
    deadline = time.time() + max_wait
    attempt, backoff = 0, 15
    while True:
        attempt += 1
        budget = min(attempt_timeout, max(30, deadline - time.time()))
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", _PROBE_SRC],
                               timeout=budget, capture_output=True)
            if r.returncode == 0:
                sys.stderr.write(f"[bench] device probe ok "
                                 f"(attempt {attempt}, "
                                 f"{time.time()-t0:.0f}s)\n")
                return True
            err = r.stderr.decode(errors="replace")[-200:]
        except subprocess.TimeoutExpired:
            err = f"timed out after {budget:.0f}s"
        sys.stderr.write(f"[bench] device probe attempt {attempt} "
                         f"failed: {err}\n")
        sys.stderr.flush()
        if time.time() + backoff >= deadline:
            return False
        time.sleep(backoff)
        backoff = min(backoff * 2, 180)


def _pause_generators():
    """SIGSTOP background quadrature-generator chains for the duration of
    the bench, SIGCONT at exit.  The host has one CPU core: a running
    tools/gen_symquad.py / tools/gen_quad3d.py chain inflates the
    reference-CPU timing (and the TPU host-dispatch path) and corrupts
    vs_baseline.  Pausing (not killing) lets the chains resume exactly
    where they were once the bench finishes."""
    import atexit
    import signal
    me = os.getpid()
    paused = []
    try:
        pids = [p for p in os.listdir("/proc") if p.isdigit()]
    except OSError:
        return
    for pid_s in pids:
        pid = int(pid_s)
        if pid == me:
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode("utf-8", "replace")
        except OSError:
            continue
        if "gen_quad3d.py" in cmd or "gen_symquad.py" in cmd:
            try:
                os.kill(pid, signal.SIGSTOP)
                paused.append(pid)
            except OSError:
                pass
    if paused:
        sys.stderr.write(f"[bench] paused generator pid(s) {paused} "
                         "for the duration of the bench\n")

        def _resume():
            for pid in paused:
                try:
                    os.kill(pid, signal.SIGCONT)
                except OSError:
                    pass
        atexit.register(_resume)

        # atexit does NOT run on an unhandled SIGTERM (e.g. the
        # driver's `timeout` wrapper): resume the chains, then re-raise
        # the default action so the exit code stays honest.  SIGINT is
        # left alone -- KeyboardInterrupt unwinds Python normally and
        # atexit (including _resume) already runs.
        def _on_signal(signum, frame):
            _resume()
            signal.signal(signum, signal.SIG_DFL)
            os.kill(me, signum)
        try:
            signal.signal(signal.SIGTERM, _on_signal)
        except (ValueError, OSError):
            pass


def _cpu_fallback(reason):
    """Re-exec this bench on the CPU XLA backend when the TPU tunnel is
    unreachable.  The child's JSON is explicitly labelled degraded — a
    real, honestly-labelled CPU-vs-NumPy number still measures the
    engine (same XLA program, same parity checks), where an error JSON
    measures nothing.  Runs in a fresh process because the parent's
    PJRT init state may already be wedged on the axon claim."""
    import subprocess
    sys.stderr.write(f"[bench] falling back to CPU backend: {reason}\n")
    sys.stderr.flush()
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               FIAT_TPU_BENCH_CPU_FALLBACK=reason)
    r = subprocess.run([sys.executable, os.path.abspath(__file__)]
                       + sys.argv[1:], env=env)
    sys.exit(r.returncode)


def main():
    _pause_generators()
    import jax
    if os.environ.get("JAX_PLATFORMS"):  # CPU smoke runs (see _PROBE_SRC)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_enable_x64", True)
    try:
        # persistent executable cache: a bench re-run (e.g. the driver's
        # end-of-round invocation after an in-session run) skips the
        # 20-40 s first-compiles and cannot blow a wall-clock budget on
        # XLA compilation alone; failures (unserialisable backend) are
        # non-fatal -- jax falls back to in-memory compilation
        from fiat_tpu.utils.runtime import enable_compilation_cache
        enable_compilation_cache()
    except Exception:
        pass
    import jax.numpy as jnp

    # fail fast if the device backend is unreachable: PJRT init through
    # the axon tunnel has no claim timeout and can hang indefinitely
    # when the remote grant is wedged (seen after a client was killed
    # mid-remote-compile); a hung bench is worse than a failed one.
    # probe_device retries in fresh subprocesses with backoff so a
    # transient wedge doesn't cost the whole round's number; if the
    # wedge persists, rerun the whole bench on the CPU backend rather
    # than record nothing (the JSON is labelled degraded).
    if not os.environ.get("JAX_PLATFORMS"):
        if not probe_device(max_wait=900):
            _cpu_fallback("axon tunnel unreachable after bounded retries")
        # the probe subprocess succeeded, so an in-process init should
        # be quick; guard it with a thread timeout anyway (the wedge
        # can recur)
        import threading
        probe_ok = []
        probe = threading.Thread(
            target=lambda: probe_ok.append(jax.devices()), daemon=True)
        probe.start()
        probe.join(timeout=300)
        if not probe_ok:
            _cpu_fallback("in-process device init hung after a "
                          "successful subprocess probe")

    import fiat_tpu  # noqa: F401
    from fiat_tpu.core import cells as cl
    from fiat_tpu.core.quadrature_schemes import create_quadrature
    from fiat_tpu import elements as fe

    try:
        import FIAT
    except Exception as exc:
        sys.stderr.write(f"reference unavailable: {exc}\n")
        FIAT = None

    tri, tet = cl.ufc_simplex(2), cl.ufc_simplex(3)
    rtri = FIAT.ufc_simplex(2) if FIAT else None
    rtet = FIAT.ufc_simplex(3) if FIAT else None

    rng = np.random.default_rng(42)
    pts2 = rng.random((NPTS, 2))
    pts2 = pts2 / (pts2.sum(axis=1)[:, None] + 1e-9) * rng.random((NPTS, 1))
    pts3 = rng.random((NPTS, 3))
    pts3 = pts3 / (pts3.sum(axis=1)[:, None] + 1e-9) * rng.random((NPTS, 1))

    configs = []

    def guard(name, thunk):
        """Run one config; a failure records an error entry instead of
        losing the whole round's JSON (partial results beat none)."""
        try:
            configs.append(thunk())
        except Exception as exc:
            import traceback
            sys.stderr.write(f"[bench] {name} FAILED:\n"
                             f"{traceback.format_exc()}\n")
            sys.stderr.flush()
            configs.append({"name": name,
                            "error": f"{type(exc).__name__}: {exc}"})

    # -- config 1: P2 on triangle at the degree-4 rule, tiled ----------------
    q4 = create_quadrature(tri, 4).get_points()
    tiled = np.tile(q4, (NPTS // len(q4) + 1, 1))[:NPTS]
    guard("p2_tri_deg4rule", lambda: zoo_config(
        jax, jnp, "p2_tri_deg4rule", [fe.Lagrange(tri, 2)],
        [FIAT.Lagrange(rtri, 2)] if FIAT else None, tiled))

    # -- config 2: order-8 tet + GLL hex sum-factorised ----------------------
    guard("tet_lagrange8", lambda: zoo_config(
        jax, jnp, "tet_lagrange8", [fe.Lagrange(tet, 8)],
        [FIAT.Lagrange(rtet, 8)] if FIAT else None, pts3, nref=2000))
    guard("hex_gll_sumfact", lambda: hex_gll_config(jax, jnp, FIAT))

    # -- config 3: H(div)/H(curl) on tri + tet --------------------------------
    def hdiv_tri():
        tri_vec = [fe.RaviartThomas(tri, k) for k in range(1, 7)] \
            + [fe.Nedelec(tri, k) for k in range(1, 7)] \
            + [fe.BrezziDouglasMarini(tri, k) for k in range(1, 7)]
        rtri_vec = ([FIAT.RaviartThomas(rtri, k) for k in range(1, 7)]
                    + [FIAT.Nedelec(rtri, k) for k in range(1, 7)]
                    + [FIAT.BrezziDouglasMarini(rtri, k) for k in range(1, 7)]
                    ) if FIAT else None
        return zoo_config(jax, jnp, "hdiv_hcurl_tri", tri_vec, rtri_vec, pts2)

    def hdiv_tet():
        tet_vec = [fe.RaviartThomas(tet, k) for k in range(1, 4)] \
            + [fe.Nedelec(tet, k) for k in range(1, 4)] \
            + [fe.BrezziDouglasMarini(tet, k) for k in range(1, 4)]
        rtet_vec = ([FIAT.RaviartThomas(rtet, k) for k in range(1, 4)]
                    + [FIAT.Nedelec(rtet, k) for k in range(1, 4)]
                    + [FIAT.BrezziDouglasMarini(rtet, k) for k in range(1, 4)]
                    ) if FIAT else None
        return zoo_config(jax, jnp, "hdiv_hcurl_tet", tet_vec, rtet_vec,
                          pts3, nref=2000)
    guard("hdiv_hcurl_tri", hdiv_tri)
    guard("hdiv_hcurl_tet", hdiv_tet)

    # -- config 4: C1 + macro zoo (order 1, then order 2: Hessian tables
    # ride the same engine -- jet recurrence + dmats folded into the
    # stacked change of basis -- with 3x the alpha rows) -------------------
    def c1_zoo(mod, cell):
        return [mod.CubicHermite(cell), mod.Morley(cell),
                mod.Argyris(cell, 5), mod.Bell(cell),
                mod.HsiehCloughTocher(cell, 3),
                mod.QuadraticPowellSabin6(cell),
                mod.QuadraticPowellSabin12(cell)]

    guard("c1_macro_zoo", lambda: zoo_config(
        jax, jnp, "c1_macro_zoo", c1_zoo(fe, tri),
        c1_zoo(FIAT, rtri) if FIAT else None, pts2))
    guard("c1_macro_hessians", lambda: zoo_config(
        jax, jnp, "c1_macro_hessians", c1_zoo(fe, tri),
        c1_zoo(FIAT, rtri) if FIAT else None, pts2, order=2))

    # -- config 5: the full triangle sweep (headline) -------------------------
    def full_zoo(mods):
        cell, L, DG, RT, N, BDM, H, M, A, B, HCT, PS6 = mods
        return ([L(cell, p) for p in range(1, 11)]
                + [DG(cell, p) for p in range(1, 9)]
                + [RT(cell, k) for k in range(1, 7)]
                + [N(cell, k) for k in range(1, 7)]
                + [BDM(cell, k) for k in range(1, 7)]
                + [H(cell), M(cell), A(cell, 5), B(cell),
                   HCT(cell, 3), PS6(cell)])

    def full_zoo_config():
        zoo = full_zoo((tri, fe.Lagrange, fe.DiscontinuousLagrange,
                        fe.RaviartThomas, fe.Nedelec, fe.BrezziDouglasMarini,
                        fe.CubicHermite, fe.Morley, fe.Argyris, fe.Bell,
                        fe.HsiehCloughTocher, fe.QuadraticPowellSabin6))
        rzoo = full_zoo((rtri, FIAT.Lagrange, FIAT.DiscontinuousLagrange,
                         FIAT.RaviartThomas, FIAT.Nedelec,
                         FIAT.BrezziDouglasMarini, FIAT.CubicHermite,
                         FIAT.Morley, FIAT.Argyris, FIAT.Bell,
                         FIAT.HsiehCloughTocher,
                         FIAT.QuadraticPowellSabin6)) if FIAT else None
        return zoo_config(jax, jnp, "full_zoo", zoo, rzoo, pts2)
    guard("full_zoo", full_zoo_config)

    # -- config 6: moments / dual evaluation (expansion-side contraction,
    # the reference's to_riesz + dual_evaluation hot path) -------------------
    def moments_cfg():
        zoo = full_zoo((tri, fe.Lagrange, fe.DiscontinuousLagrange,
                        fe.RaviartThomas, fe.Nedelec, fe.BrezziDouglasMarini,
                        fe.CubicHermite, fe.Morley, fe.Argyris, fe.Bell,
                        fe.HsiehCloughTocher, fe.QuadraticPowellSabin6))
        rzoo = full_zoo((rtri, FIAT.Lagrange, FIAT.DiscontinuousLagrange,
                         FIAT.RaviartThomas, FIAT.Nedelec,
                         FIAT.BrezziDouglasMarini, FIAT.CubicHermite,
                         FIAT.Morley, FIAT.Argyris, FIAT.Bell,
                         FIAT.HsiehCloughTocher,
                         FIAT.QuadraticPowellSabin6)) if FIAT else None
        return moments_config(jax, jnp, "moments_interp_full_zoo", zoo,
                              rzoo, pts2)
    guard("moments_interp_full_zoo", moments_cfg)

    head = next((c for c in configs if c["name"] == "full_zoo"
                 and "error" not in c), None)
    partial = head is None or any("error" in c for c in configs)
    if head is None:
        # headline config failed: fall back to the largest successful
        # zoo config so the round still records a real device number
        ok = [c for c in configs if "error" not in c and "work" in c]
        head = max(ok, key=lambda c: c["work"]) if ok else None
    full_zoo_ok = head is not None and head["name"] == "full_zoo"
    degraded = os.environ.get("FIAT_TPU_BENCH_CPU_FALLBACK")
    result = {
        "metric": ((f"fused full-zoo tabulation (values+grads, "
                    f"triangle zoo incl. macro, p<=10, 1e5 pts, "
                    f"f64 fused-ozaki)"
                    + (" [some secondary configs errored]" if partial
                       else "")) if full_zoo_ok else
                   f"fused zoo tabulation (PARTIAL: headline config "
                   f"substituted by {head['name']})" if head else
                   "fused full-zoo tabulation (all configs failed)"),
        "value": head["values_per_s"] if head else None,
        "unit": "basis-values/s",
        "vs_baseline": head["speedup"] if head else None,
        "device": str(jax.devices()[0]),
        # ADVICE r4 #2: the CPU-relative fields are HOST-dependent (the
        # NumPy reference runs on whatever single vCPU this VM has, and
        # has varied ~3x across bench hosts); tpu_ms / values_per_s /
        # max_abs_err are the stable cross-host numbers
        "cpu_reference_note": ("ref_s/speedup/vs_baseline depend on this "
                               "host's CPU; tpu_ms and values_per_s are "
                               "the device-stable metrics"),
        "configs": {c["name"]: {k: v for k, v in c.items() if k != "name"}
                    for c in configs},
    }
    if degraded:
        result["metric"] += " [DEGRADED: CPU-XLA fallback, not TPU]"
        result["degraded"] = f"cpu-fallback ({degraded})"
    if head:
        result["tpu_time_s"] = head["tpu_ms"] / 1e3
        result["max_abs_err_vs_reference"] = head["max_abs_err"]
        result["rows"] = head.get("rows")
    if partial:
        result["partial"] = True
    print(json.dumps(result))
    if head is None:
        sys.exit(3)


def mesh_main(n_devices):
    """``python bench.py --mesh N``: weak scaling of the sharded
    tabulate/moment steps on an N-virtual-device CPU mesh, with the
    collective inventory asserted from the compiled HLO (tabulation
    must be collective-free; moments exactly one all-reduce)."""
    _pause_generators()
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count"
                                 f"={n_devices}")
    import jax
    # the env var alone does not stick when the axon TPU plugin is
    # registered (see tests/conftest.py) -- force the platform too
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import fiat_tpu  # noqa: F401
    from fiat_tpu.core import cells as cl
    from fiat_tpu import elements as fe
    from fiat_tpu.ops.tabulate import BatchedTabulator
    from fiat_tpu.ops.pallas_multiword import FusedZooTabulator
    from fiat_tpu.parallel import sharding as ps

    tri = cl.ufc_simplex(2)
    zoo = [fe.Lagrange(tri, p) for p in (1, 3, 5)] + [fe.Nedelec(tri, 1)]
    bt = BatchedTabulator(zoo, order=0)
    fz = FusedZooTabulator(bt, interpret=True, row_block=256,
                           point_tile=256)
    rng = np.random.default_rng(0)
    local = 2048                     # points per device (weak scaling)

    def tri_pts(n):
        p = rng.random((n, 2))
        return p / (p.sum(axis=1)[:, None] + 1e-9) * rng.random((n, 1))

    _COLL = ("all_reduce", "all_gather", "reduce_scatter",
             "collective_permute", "all_to_all")

    def collectives(lowered):
        txt = lowered.as_text()
        return sum(txt.count(c) for c in _COLL)

    out = {"devices": [], "tabulate_ms": [], "moment_ms": [],
           "tabulate_collectives": [], "moment_err": []}
    d = 1
    while d <= n_devices:
        mesh = ps.points_mesh(d)
        pts = jnp.asarray(tri_pts(local * d))
        w = jnp.asarray(rng.random(local * d))
        f = jnp.asarray(rng.random(local * d))
        tstep = ps.make_fused_tabulate_step(fz, mesh)
        mstep = ps.make_moment_step(bt, mesh)
        # the shard_map'd tabulate path exposes its communication in
        # the lowered StableHLO: must be collective-free (pure SPMD)
        out["tabulate_collectives"].append(collectives(tstep.lower(pts)))
        # the jit'd moment path gets its all-reduce from the SPMD
        # partitioner at compile; verify the cross-device reduction by
        # value against the host contraction
        moments = np.asarray(mstep(pts, w, f))[:bt.stacked.shape[0]]
        phi = bt(pts)[(0, 0)]
        expect = np.asarray(phi) @ (np.asarray(w) * np.asarray(f))
        out["moment_err"].append(
            float(np.abs(moments - expect).max()
                  / (np.abs(expect).max() + 1)))
        jax.block_until_ready(tstep(pts))
        out["tabulate_ms"].append(
            host_timer(lambda: jax.block_until_ready(tstep(pts)),
                       reps=3) * 1e3)
        out["moment_ms"].append(
            host_timer(lambda: jax.block_until_ready(mstep(pts, w, f)),
                       reps=3) * 1e3)
        out["devices"].append(d)
        d *= 2

    assert all(c == 0 for c in out["tabulate_collectives"]), out
    assert all(e < 1e-12 for e in out["moment_err"]), out

    # 2D (points x rows) mesh at full width
    if n_devices >= 4:
        mesh2 = ps.zoo_mesh(n_points=n_devices // 2, n_rows=2)
        step2 = ps.make_moment_step_2d(bt, mesh2)
        pts = jnp.asarray(tri_pts(local * (n_devices // 2)))
        w = jnp.asarray(rng.random(pts.shape[0]))
        f = jnp.asarray(rng.random(pts.shape[0]))
        jax.block_until_ready(step2(pts, w, f))
        out["moment2d_ms"] = host_timer(
            lambda: jax.block_until_ready(step2(pts, w, f)), reps=3) * 1e3
    print(json.dumps({"metric": "virtual-mesh weak scaling "
                                "(CPU interpret, per-device points "
                                f"{local})", **out}))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--mesh":
        mesh_main(int(sys.argv[2]))
    else:
        main()
