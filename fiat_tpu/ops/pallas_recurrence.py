"""Fused df32 recurrence + Ozaki slice preparation in Pallas.

The XLA df32 path (ops/doublefloat.py) is arithmetic-cheap but
graph-shaped badly for XLA:TPU -- the per-level chains of small
elementwise ops run ~5x below VPU speed (measured: the tet degree-8
value recurrence costs 7.7 ms/1e5 pts on v5e; the plain f32 XLA
recurrence is no faster).  This kernel runs, per point tile, entirely
in VMEM:

  * the two-float (hi, lo) Dubiner value recurrence
    (doublefloat.dubiner_tabulate_ff -- the SAME ff_* arithmetic
    helpers trace inside the kernel),
  * the morton gather + normalisation as an EXACT {0,1} selection
    matmul (exact because each row has a single unit coefficient)
    followed by an error-free constant multiply,
  * the fixed CHUNK-bit-window bf16 slice split (prepare_B_ff), with the
    power-of-two column scale computed by integer exponent extraction
    (no transcendentals),

and writes only the bf16 slices + the f32 column scale: the B-operand
pipeline of the fused multiword kernel (ops/pallas_multiword.py) with
no f64 and no pair array ever touching HBM.

Plain Dubiner variant, single-cell simplices (the callers gate on
``supports_ff``); ``interpret=True`` runs on CPU for tests."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.expansions import _stage_constants
from .multiword import resolve_scheme
from .doublefloat import (FF, ff_add, ff_mul, ff_scale_pow2, ff_sub, two_prod,
                          two_sum)


def _pack_stage_ff(dim, n, codim):
    """Host-packed ff recurrence data of one codim stage:
    (coeff columns [hi|lo interleaved], selection matrix P {0,1},
    norms (m_out, 2) [hi, lo], per-level row needs).

    The stage input is GRADED (morton rank is degree-major), so level i
    (trailing index i) only contributes outputs whose prefix multiindex
    sums to <= n - i: only the leading ``need[i]`` input rows are ever
    selected.  Trimming the levels to those prefixes cuts the ff
    recurrence work ~(n+1)*m_in/m_out-fold (2.45x on the degree-8 tet
    stage), shrinks the candidate stack (bigger VMEM tiles), and turns
    P into a square permutation."""
    from ..core.expansions import _stage_multiindices
    a1, b1, general, perm, norms = _stage_constants(dim, n, codim, None)
    m_in = a1.shape[0]
    subs = _stage_multiindices(codim, n, dim)
    need = [sum(1 for s in subs if sum(s) <= n - i) for i in range(n + 1)]
    offs = np.concatenate([[0], np.cumsum(need)])

    def hilo(x):
        x = np.asarray(x, dtype=np.float64)
        hi = x.astype(np.float32)
        lo = (x - hi.astype(np.float64)).astype(np.float32)
        return hi, lo

    cols = list(hilo(a1)) + list(hilo(b1))
    for i in range(2, n + 1):
        for arr in general[i]:
            cols.extend(hilo(arr))
    packed = np.concatenate(cols, axis=1)
    ncand = int(offs[-1]) if n >= 1 else m_in
    # remap the (level * m_in + row) gather into the trimmed layout
    lev, row = perm // m_in, perm % m_in
    assert np.all(row < np.asarray(need)[lev])
    tperm = offs[lev] + row
    P = np.zeros((len(perm), ncand), dtype=np.float32)
    P[np.arange(len(perm)), tperm] = 1.0
    nh, nl = hilo(norms[:, 0])
    return packed, P, np.stack([nh, nl], axis=1), need


def _ff_mul_c(ch, cl, x):
    """_ConstFF-style multiply with per-row constant columns (the
    split of the hi word is recomputed in-kernel by integer masking)."""
    return ff_mul(FF(ch, cl), x)


def emit_slices(sd, n, scale, nslices, hi_ref, lo_ref, stage_refs, needs,
                wdtype="bf16"):
    """Trace the df32 Dubiner recurrence + fixed-window slice split
    inside a Pallas kernel body: returns (list of bf16 slice VALUES
    (nexp, T), f32 column scale (1, T)).  ``needs``: per-stage
    per-level row prefixes (see _pack_stage_ff) -- level i only runs on
    the input rows that can still reach a valid (sum <= n) member.

    (A fully-fused one-shot variant -- recurrence + group dots +
    combine in one kernel with A resident -- measured NO faster than
    the two-kernel split on v5e and compiled ~10x slower, so the split
    stays.)"""
    T = hi_ref.shape[1]
    zero = jnp.zeros((1, T), dtype=jnp.float32)
    R = FF(jnp.full((1, T), np.float32(scale)),
           jnp.full((1, T), np.float32(
               scale - np.float64(np.float32(scale)))))
    neg1 = FF(jnp.full((1, T), np.float32(-1.0)), zero)
    # cell map 2x-1 IN-KERNEL and error-free (pow2 scale + TwoSum):
    # doing it outside in f64 cost more than the whole recurrence (every
    # f64 op is emulated on TPU)
    X = []
    for i in range(sd):
        two_hi = hi_ref[i, :].reshape(1, T) * np.float32(2.0)
        two_lo = lo_ref[i, :].reshape(1, T) * np.float32(2.0)
        s, e = two_sum(two_hi, np.float32(-1.0))
        X.append(FF(*two_sum(s, e + two_lo)))
    X += [neg1, neg1]
    half = np.float32(0.5)
    one = FF(np.float32(1.0), np.float32(0.0))
    for codim in range(sd):
        x, y, z = X[codim], X[codim + 1], X[codim + 2]
        # identical ff arithmetic to dubiner_tabulate_ff
        fb = ff_scale_pow2(ff_add(y, z), half)
        fa = ff_add(ff_add(x, fb), one)
        fc = ff_mul(fb, fb)

        pk = stage_refs[3 * codim][:]
        P = stage_refs[3 * codim + 1][:]
        norms = stage_refs[3 * codim + 2][:]
        need = needs[codim]

        def cut(ff_arr, k):
            return (ff_arr if ff_arr.hi.shape[0] == k
                    else FF(ff_arr.hi[:k], ff_arr.lo[:k]))

        levels = [R]
        if n >= 1:
            k = need[1]
            a1 = FF(pk[:k, 0:1], pk[:k, 1:2])
            b1 = FF(pk[:k, 2:3], pk[:k, 3:4])
            u = ff_sub(ff_mul(a1, fa), ff_mul(b1, fb))
            levels.append(ff_mul(u, cut(R, k)))
        for i in range(2, n + 1):
            k = need[i]
            o = 4 + 6 * (i - 2)
            a = FF(pk[:k, o:o + 1], pk[:k, o + 1:o + 2])
            b = FF(pk[:k, o + 2:o + 3], pk[:k, o + 3:o + 4])
            c = FF(pk[:k, o + 4:o + 5], pk[:k, o + 5:o + 6])
            u = ff_sub(ff_mul(a, fa), ff_mul(b, fb))
            levels.append(ff_sub(ff_mul(u, cut(levels[-1], k)),
                                 ff_mul(ff_mul(c, fc),
                                        cut(levels[-2], k))))
        big_hi = jnp.concatenate([L.hi for L in levels], axis=0)
        big_lo = jnp.concatenate([L.lo for L in levels], axis=0)
        # exact permutation: each P row has ONE unit entry, so the
        # f32 matmul copies values exactly (no rounding)
        sel_hi = jnp.dot(P, big_hi, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        sel_lo = jnp.dot(P, big_lo, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        R = _ff_mul_c(norms[:, 0:1], norms[:, 1:2], FF(sel_hi, sel_lo))

    return slice_split_ff(R, nslices, wdtype)


def slice_split_ff(R, nslices, wdtype="bf16"):
    """prepare_B_ff traced for a kernel body: pow2 column scale by
    integer exponent extraction (no transcendentals) + the fixed
    window slice split of an FF pair (rows, T).  ``wdtype='int8'``
    emits 7-bit integer windows at the quarter scaling (multiword
    CHUNK_I8) for the s8 x s8 -> s32 MXU path.
    Returns ([slice values], f32 (1, T) column scale)."""
    chunk, _n, _o = resolve_scheme(wdtype, nslices)
    hi, lo = R
    m = jnp.max(jnp.abs(hi), axis=0, keepdims=True)
    bits = jax.lax.bitcast_convert_type(m, jnp.uint32)
    exp = bits >> np.uint32(23)
    if wdtype == "int8":
        # scale = 2^(floor(log2 m) + 2): max|.| lands in [1/4, 1/2]
        e_sel = exp + np.uint32(2)
    else:
        frac = bits & np.uint32(0x007FFFFF)
        e_sel = exp + jnp.where(frac == 0, np.uint32(0), np.uint32(1))
    sB = jax.lax.bitcast_convert_type(e_sel << np.uint32(23), jnp.float32)
    sB = jnp.where(m == 0, np.float32(1.0), sB)
    inv = np.float32(1.0) / sB                  # pow2: exact
    rh, rl = hi * inv, lo * inv
    out = []
    for i in range(nslices):
        sc = np.float32(2.0 ** (chunk * (i + 1)))
        isc = np.float32(2.0 ** (-chunk * (i + 1)))
        k = jnp.round(rh * sc)
        s = k * isc                       # exact pow2 (division is multi-op)
        out.append(k.astype(jnp.int8) if wdtype == "int8"
                   else s.astype(jnp.bfloat16))
        rh, rl = two_sum(rh - s, rl)
    return out, sB


class SubcellBinning:
    """Host-packed barycentric maps + traceable in-kernel ff subcell
    binning for a group of macro side programs (shared by the one-shot
    macro engine and the masked pair-moment kernel).

    ``geom``: per program {"maps": [(A_c, b_c) rescaled barycentric map
    per subcell], "unique": bool}; ``parent_map``: the shared parent
    cell's map.  All distances compute at once over the stacked
    (ncells+1, T) barycentric rows (parent first) with the same df32
    arithmetic and best + 1e-12 comparison as
    partition_of_unity_masks."""

    def __init__(self, geom, parent_map, sd):
        from .doublefloat import const_ff
        self.sd = sd
        self.geom = list(geom)
        maps = [(np.asarray(parent_map[0], np.float64),
                 np.asarray(parent_map[1], np.float64))]
        self.prog_cells = []
        pos = 1
        for g in self.geom:
            maps.extend(g["maps"])
            self.prog_cells.append((pos, pos + len(g["maps"])))
            pos += len(g["maps"])
        self.ncells = pos - 1
        nbary = max(Am.shape[0] for Am, _ in maps)
        assert all(Am.shape[0] == nbary for Am, _ in maps)
        self.nbary = nbary
        # one packed (ncells+1, nbary*(4*sd+2)) f32 operand: per bary
        # row j, the pre-split ff columns [hi|lo|sh|sl] of each coord's
        # coefficient plus [hi|lo] of the offset (Pallas kernels cannot
        # capture array constants)
        cols = []
        for j in range(nbary):
            for i in range(sd):
                c = const_ff(np.asarray([Am[j, i] for Am, _ in maps],
                                        np.float64)[:, None])
                cols.extend([c.hi, c.lo, c.sh, c.sl])
            o = const_ff(np.asarray([bm[j] for _, bm in maps],
                                    np.float64)[:, None])
            cols.extend([o.hi, o.lo])
        self.pack = np.concatenate(cols, axis=1, dtype=np.float32)

    def binning(self, xs, bary_ref, T):
        """All programs' {0,1} masks (merged piece order) + per-program
        ff multiplicity reciprocals (None for unique programs), traced
        over a kernel's point-tile ff coordinates ``xs``.

        EXPANSION (non-renormalising) arithmetic: the fully-normalised
        ff_add chain costs 92 VPU ops per bary row; here every exact
        product/sum error joins a plain-add error channel, so the
        result is exact to O(eps^2 * nterms) ~ 4e-15 absolute -- far
        below the 1e-12 binning tolerance -- at ~1/3 the ops.  The
        point-coordinate splits are computed once per tile and shared
        by every barycentric row of every cell."""
        from .doublefloat import split32
        one = jnp.ones((1, T), jnp.float32)
        zero = jnp.zeros((1, T), jnp.float32)
        nc = bary_ref.shape[0]
        sd = self.sd
        x_splits = [split32(x.hi) for x in xs]
        dS = dE = None
        col = 0
        for j in range(self.nbary):
            s = jnp.broadcast_to(bary_ref[:, col + 4 * sd:
                                          col + 4 * sd + 1], (nc, T))
            err = jnp.broadcast_to(bary_ref[:, col + 4 * sd + 1:
                                            col + 4 * sd + 2], (nc, T))
            for i in range(sd):
                ch, cl = bary_ref[:, col:col + 1], bary_ref[:, col + 1:col + 2]
                sh, sl = (bary_ref[:, col + 2:col + 3],
                          bary_ref[:, col + 3:col + 4])
                col += 4
                p, e = two_prod(ch, xs[i].hi, a_split=(sh, sl),
                                b_split=x_splits[i])
                s, e2 = two_sum(s, p)
                err = err + (e + e2 + (ch * xs[i].lo + cl * xs[i].hi))
            col += 2
            neg = s + err < 0
            ph = jnp.where(neg, -s, np.float32(0.0))
            pe = jnp.where(neg, -err, np.float32(0.0))
            if dS is None:
                dS, dE = ph, pe
            else:
                dS, e2 = two_sum(dS, ph)
                dE = dE + (pe + e2)
        dist = dS + dE                            # (ncells+1, T) f32
        near = dist[1:] <= dist[0:1] + np.float32(1e-12)
        M = jnp.where(near, np.float32(1.0), np.float32(0.0))
        masks, recips = [], []
        for g, (c0, c1) in zip(self.geom, self.prog_cells):
            raw = [M[c - 1:c, :] for c in range(c0, c1)]
            if g["unique"]:
                taken = zero
                uniq = []
                for m_ in raw:
                    m_ = m_ * (one - taken)
                    taken = jnp.maximum(taken, m_)
                    uniq.append(m_)
                raw = uniq
                recips.append(None)
            else:
                totp = jnp.sum(M[c0 - 1:c1 - 1, :], axis=0,
                               keepdims=True)    # small-int f32: exact
                r = one / totp
                p, e = two_prod(r, totp)
                d = (one - p) - e            # Sterbenz: p within 1 ulp of 1
                recips.append(FF(r, r * d))  # == 1/totp to ~2^-48
            masks.extend(raw)
        return masks, recips


class PallasSliceRecurrence:
    """``rec = PallasSliceRecurrence(es, degree); slices, sB = rec(pts)``
    matching ``prepare_B_ff(tabulate_ff(es, degree, pts))`` to pair
    accuracy, with the whole pipeline fused per point tile."""

    def __init__(self, es, degree, nslices=None, tile=None,
                 interpret=False, wdtype="bf16"):
        if es.variant is not None or len(es.affine_mappings) != 1:
            raise NotImplementedError(
                "Pallas slice recurrence: plain single-cell variant only")
        A0, b0 = es.affine_mappings[0]
        sd0 = es.ref_el.get_spatial_dimension()
        if not (np.allclose(np.asarray(A0), 2.0 * np.eye(sd0))
                and np.allclose(np.asarray(b0), -1.0)):
            raise NotImplementedError(
                "Pallas slice recurrence: 2x-1 cell map only")
        self.es = es
        self.degree = degree
        self.wdtype = wdtype
        _, self.nslices, _ = resolve_scheme(wdtype, nslices)
        self.interpret = interpret
        self.sd = es.ref_el.get_spatial_dimension()
        A, b = es.affine_mappings[0]
        self.A = np.asarray(A, dtype=np.float64)
        self.b = np.asarray(b, dtype=np.float64)
        self.scale = float(np.asarray(es.get_scale(degree, cell=0)))
        self.nexp = es.get_num_members(degree)
        self.stages = [_pack_stage_ff(self.sd, degree, c)
                       for c in range(self.sd)]
        self._tile = tile
        self._jitted = jax.jit(self._apply)

    # ------------------------------------------------------------------
    def _kernel(self, hi_ref, lo_ref, *rest):
        stage_refs, out_refs = rest[:-self.nslices - 1], rest[-self.nslices - 1:]
        slice_refs, sB_ref = out_refs[:-1], out_refs[-1]
        slices, sB = emit_slices(self.sd, self.degree, self.scale,
                                 self.nslices, hi_ref, lo_ref, stage_refs,
                                 [st[3] for st in self.stages],
                                 wdtype=self.wdtype)
        for i in range(self.nslices):
            slice_refs[i][:] = slices[i]
        sB_ref[:] = sB

    # ------------------------------------------------------------------
    def _vmem_tile(self):
        """Lane-multiple tile under a VMEM budget: the ff candidate
        stacks double the f32 engine's live set, and the slice outputs
        add nslices bf16 rows."""
        budget = 6 * 1024 * 1024
        ncand = max(sum(need) for _pk, _P, _n, need in self.stages)
        wbytes = 1 if self.wdtype == "int8" else 2
        per_point = 4 * (2 * 3 * ncand              # ff levels + big
                         + 2 * self.nexp            # selected pair
                         + 2 * self.sd * 2) \
            + wbytes * self.nslices * self.nexp     # slice blocks
        T = budget // max(per_point, 1)
        return max(256, min(self._tile or 4096, (T // 128) * 128))

    def _apply(self, points):
        npts = points.shape[0]
        T = min(self._vmem_tile(), max(128, npts))
        ntiles = -(-npts // T)
        pad = ntiles * T - npts
        # pair-split FIRST (the only f64 arithmetic: one subtract); the
        # pad/transpose run in f32 and the 2x-1 cell map happens
        # error-free inside the kernel
        if points.dtype == jnp.float64:
            hi = points.astype(jnp.float32)
            lo = (points - hi.astype(jnp.float64)).astype(jnp.float32)
        else:
            hi = points.astype(jnp.float32)
            lo = jnp.zeros_like(hi)
        hi = jnp.pad(hi, ((0, pad), (0, 0))).T        # (sd, ntiles*T)
        lo = jnp.pad(lo, ((0, pad), (0, 0))).T

        full = lambda arr: pl.BlockSpec(arr.shape, lambda i: tuple(
            i * 0 for _ in arr.shape), memory_space=pltpu.VMEM)
        pts_spec = pl.BlockSpec((self.sd, T), lambda i: (i * 0, i),
                                memory_space=pltpu.VMEM)
        in_specs = [pts_spec, pts_spec]
        operands = [hi, lo]
        for pk, P, norms, _need in self.stages:
            for arr in (pk, P, norms):
                in_specs.append(full(arr))
                operands.append(jnp.asarray(arr))

        out_spec = pl.BlockSpec((self.nexp, T), lambda i: (i * 0, i),
                                memory_space=pltpu.VMEM)
        sB_spec = pl.BlockSpec((1, T), lambda i: (i * 0, i),
                               memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            self._kernel,
            grid=(ntiles,),
            in_specs=in_specs,
            out_specs=tuple([out_spec] * self.nslices + [sB_spec]),
            out_shape=tuple(
                [jax.ShapeDtypeStruct(
                    (self.nexp, ntiles * T),
                    jnp.int8 if self.wdtype == "int8" else jnp.bfloat16)]
                * self.nslices
                + [jax.ShapeDtypeStruct((1, ntiles * T), jnp.float32)]),
            interpret=self.interpret,
            cost_estimate=pl.CostEstimate(
                flops=150 * self.nexp * ntiles * T,
                bytes_accessed=8 * self.sd * ntiles * T
                + ((1 if self.wdtype == "int8" else 2)
                   * self.nslices * self.nexp + 4) * ntiles * T,
                transcendentals=0,
            ),
        )(*operands)
        slices = [o[:, :npts] for o in outs[:-1]]
        return slices, outs[-1][:, :npts]

    def __call__(self, points):
        return self._jitted(jnp.asarray(points))


class PallasPairMoments(PallasSliceRecurrence):
    """Fused expansion-side moment contraction:
    ``m = PallasPairMoments(es, degree); M = m(points, wf)`` returns the
    (nexp,) f64 vector  sum_q phi_k(x_q) wf_q  with the WHOLE pipeline
    in one kernel per point tile:

      * the df32 Dubiner recurrence + window split (emit_slices),
      * exact pair reconstruction from the graded windows,
      * prod = ff_mul(phi_pair, wf_pair * sB)  (pair-exact product),
      * an EXACT within-tile point reduction: each prod row is
        row-pow2-scaled and re-windowed, every 8-bit window summing
        exactly in f32 (|k| <= 2^8 over <= 2^12 columns < 2^24), the
        residual pair summed as a tail window; the tile's (hi, lo)
        partial combines the window sums with a TwoSum chain,
      * per-tile pair partials written to their own output column; the
        cross-tile reduction is ntiles f64 adds in XLA.

    This is the engine's dual-evaluation path (the reference's to_riesz
    + dual_evaluation contraction, /root/reference/FIAT/dual_set.py:86
    and /root/reference/finat/finiteelementbase.py:245-285) with no
    (rows, npts) table and no emulated-f64 recurrence: the 8 B/value
    pair-write floor of tabulating consumers does not apply."""

    def _moment_kernel(self, *refs):
        from .doublefloat import FF, fast_two_sum, ff_mul
        n = self.nslices
        phi_ref, plo_ref = refs[0], refs[1]
        wh_ref, wl_ref = refs[2], refs[3]
        stage_refs = refs[4:4 + 3 * self.sd]
        hi_ref, lo_ref = refs[-2], refs[-1]

        slices, sB = emit_slices(self.sd, self.degree, self.scale,
                                 n, phi_ref, plo_ref, stage_refs,
                                 [st[3] for st in self.stages],
                                 wdtype=self.wdtype)
        # exact pair reconstruction (disjoint 8-bit windows)
        if self.wdtype == "int8":
            from .multiword import CHUNK_I8
            vals = [s.astype(jnp.float32)
                    * np.float32(2.0 ** (-CHUNK_I8 * (i + 1)))
                    for i, s in enumerate(slices)]
        else:
            vals = [s.astype(jnp.float32) for s in slices]
        ph, pl = vals[0], jnp.zeros_like(vals[0])
        for v in vals[1:]:
            ph, e = fast_two_sum(ph, v)
            pl = pl + e
        ph, e = fast_two_sum(ph, pl)
        phi = FF(ph, e)                           # == sum(windows) exactly

        # wf pair at the shared column scale (pow2: exact)
        g = FF(wh_ref[0, :].reshape(1, -1) * sB,
               wl_ref[0, :].reshape(1, -1) * sB)
        prod = ff_mul(phi, g)                     # (nexp, T) pair

        # ---- exact within-tile reduction ----------------------------
        # row pow2 scale so every window's integer sum fits f32 exactly
        m = jnp.max(jnp.abs(prod.hi), axis=1, keepdims=True)
        bits = jax.lax.bitcast_convert_type(m, jnp.uint32)
        e_sel = (bits >> np.uint32(23)) + np.uint32(1)
        ms = jax.lax.bitcast_convert_type(e_sel << np.uint32(23),
                                          jnp.float32)
        ms = jnp.where(m == 0, np.float32(1.0), ms)
        inv = np.float32(1.0) / ms                # pow2: exact
        rh, rl = prod.hi * inv, prod.lo * inv
        acc_s = acc_e = None
        chunk = 8
        for i in range(self.nslices):
            sc = np.float32(2.0 ** (chunk * (i + 1)))
            isc = np.float32(2.0 ** (-chunk * (i + 1)))
            k = jnp.round(rh * sc)
            s = k * isc                   # exact pow2 window value
            part = jnp.sum(s, axis=1, keepdims=True)   # EXACT in f32
            if acc_s is None:
                acc_s, acc_e = part, jnp.zeros_like(part)
            else:
                t, e2 = two_sum(acc_s, part)
                acc_s, acc_e = t, acc_e + e2
            rh, rl = two_sum(rh - s, rl)
        # tail: the residual pair, plain f32 sums (terms <= 2^-8n of max)
        tail = jnp.sum(rh, axis=1, keepdims=True) \
            + jnp.sum(rl, axis=1, keepdims=True)
        t, e2 = two_sum(acc_s, tail)
        acc_s, acc_e = t, acc_e + e2
        # the (nexp, 1) pair broadcast over a full 128-lane block (TPU
        # blocks need lane-dim 128); XLA reads back lane 0
        hi_ref[:] = jnp.broadcast_to(acc_s * ms, hi_ref.shape)
        lo_ref[:] = jnp.broadcast_to(acc_e * ms, lo_ref.shape)

    def moment_rows(self, points, wf):
        """(nexp,) f64 of  sum_q phi_k(x_q) wf_q."""
        from .doublefloat import ff_from_f64
        npts = points.shape[0]
        T = min(self._vmem_tile(), max(128, npts))
        ntiles = -(-npts // T)
        pad = ntiles * T - npts
        if points.dtype == jnp.float64:
            hi = points.astype(jnp.float32)
            lo = (points - hi.astype(jnp.float64)).astype(jnp.float32)
        else:
            hi = points.astype(jnp.float32)
            lo = jnp.zeros_like(hi)
        hi = jnp.pad(hi, ((0, pad), (0, 0))).T
        lo = jnp.pad(lo, ((0, pad), (0, 0))).T
        g = ff_from_f64(jnp.asarray(wf, jnp.float64), xp=jnp)
        # padded wf columns are ZERO: padded points contribute nothing
        wh = jnp.pad(g.hi, (0, pad)).reshape(1, -1)
        wl = jnp.pad(g.lo, (0, pad)).reshape(1, -1)

        full = lambda arr: pl.BlockSpec(arr.shape, lambda i: tuple(
            i * 0 for _ in arr.shape), memory_space=pltpu.VMEM)
        pts_spec = pl.BlockSpec((self.sd, T), lambda i: (i * 0, i),
                                memory_space=pltpu.VMEM)
        w_spec = pl.BlockSpec((1, T), lambda i: (i * 0, i),
                              memory_space=pltpu.VMEM)
        in_specs = [pts_spec, pts_spec, w_spec, w_spec]
        operands = [hi, lo, wh, wl]
        for pk, P, norms, _need in self.stages:
            for arr in (pk, P, norms):
                in_specs.append(full(arr))
                operands.append(jnp.asarray(arr))
        out_spec = pl.BlockSpec((self.nexp, 128), lambda i: (i * 0, i),
                                memory_space=pltpu.VMEM)
        hi_o, lo_o = pl.pallas_call(
            self._moment_kernel,
            grid=(ntiles,),
            in_specs=in_specs,
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((self.nexp, ntiles * 128),
                                            jnp.float32),
                       jax.ShapeDtypeStruct((self.nexp, ntiles * 128),
                                            jnp.float32)),
            interpret=self.interpret,
            cost_estimate=pl.CostEstimate(
                flops=250 * self.nexp * ntiles * T,
                bytes_accessed=(8 * self.sd + 8) * ntiles * T
                + 8 * self.nexp * ntiles,
                transcendentals=0,
            ),
        )(*operands)
        hi_c = hi_o.reshape(self.nexp, ntiles, 128)[..., 0]
        lo_c = lo_o.reshape(self.nexp, ntiles, 128)[..., 0]
        return (jnp.sum(hi_c.astype(jnp.float64), axis=1)
                + jnp.sum(lo_c.astype(jnp.float64), axis=1))


class PallasMaskedPairMoments(PallasSliceRecurrence):
    """Masked (macro side-program) pair moments in ONE kernel:
    ``bw[c*nexp_p + k] = sum_q mask_c(x_q) phi_k(x_q) wf_q`` for every
    subcell c of every program in a group sharing one parent expansion
    set -- the b_stack contraction of MacroSideProgram.tables
    (ops/tabulate.py) without the XLA df32 tabulation or any
    (rows, npts) intermediate.

    Per point tile: in-kernel ff subcell binning (SubcellBinning), the
    shared parent recurrence (emit_slices) + exact pair reconstruction,
    g = wf_pair * sB (pair-exact; non-unique programs fold their ff
    multiplicity reciprocal into g), then the same exact window
    reduction as PallasPairMoments with the point sum replaced by an
    MXU dot against the {0,1} mask columns (window values x {0,1}
    products are exact; each 8-bit window's f32 accumulation over
    <= 2^12 columns is exact).

    ``entries``: per program {"nexp": parent members, "maps": subcell
    barycentric maps, "unique": binning mode}; ``parent_map``: shared
    parent-cell map.  Outputs are per-program (nexp_p, ncells_p) pair
    blocks; ``moment_rows`` returns them flattened in b_stack row order
    (cell-major)."""

    def __init__(self, es, degree, entries, parent_map, **kw):
        super().__init__(es, degree, **kw)
        self.entries = list(entries)
        geom = [{"maps": e["maps"], "unique": e["unique"]}
                for e in self.entries]
        self._bin = SubcellBinning(geom, parent_map, self.sd)
        self._rows = []
        r0 = 0
        for e in self.entries:
            self._rows.append((r0, r0 + e["nexp"], len(e["maps"])))
            r0 += e["nexp"]
        self._rtot = r0

    def _vmem_tile(self):
        # the base budget tracks only the recurrence stacks; this
        # kernel adds the binning rows, per-program pair products and
        # window temporaries (T=4096 measured 18.7M scoped vmem > 16M)
        return min(2048, super()._vmem_tile())

    def _masked_moment_kernel(self, *refs):
        from .doublefloat import FF, fast_two_sum, ff_mul
        n = self.nslices
        phi_ref, plo_ref = refs[0], refs[1]
        wh_ref, wl_ref, bary_ref = refs[2], refs[3], refs[4]
        stage_refs = refs[5:5 + 3 * self.sd]
        hi_ref, lo_ref = refs[-2], refs[-1]

        T = phi_ref.shape[1]
        xs = [FF(phi_ref[i, :].reshape(1, T), plo_ref[i, :].reshape(1, T))
              for i in range(self.sd)]
        masks, recips = self._bin.binning(xs, bary_ref[:], T)

        slices, sB = emit_slices(self.sd, self.degree, self.scale,
                                 n, phi_ref, plo_ref, stage_refs,
                                 [st[3] for st in self.stages],
                                 wdtype=self.wdtype)
        if self.wdtype == "int8":
            from .multiword import CHUNK_I8
            vals = [s.astype(jnp.float32)
                    * np.float32(2.0 ** (-CHUNK_I8 * (i + 1)))
                    for i, s in enumerate(slices)]
        else:
            vals = [s.astype(jnp.float32) for s in slices]
        ph, pl = vals[0], jnp.zeros_like(vals[0])
        for v in vals[1:]:
            ph, e = fast_two_sum(ph, v)
            pl = pl + e
        ph, e = fast_two_sum(ph, pl)
        phi = FF(ph, e)

        g0 = FF(wh_ref[0, :].reshape(1, T) * sB,
                wl_ref[0, :].reshape(1, T) * sB)
        mpos = 0
        for (r0, r1, nc), ent, recip in zip(self._rows, self.entries,
                                            recips):
            nexp = ent["nexp"]
            Mk = jnp.concatenate(masks[mpos:mpos + nc], axis=0)  # (nc, T)
            mpos += nc
            g = g0 if recip is None else ff_mul(g0, recip)
            prod = ff_mul(FF(phi.hi[:nexp], phi.lo[:nexp]), g)
            m = jnp.max(jnp.abs(prod.hi), axis=1, keepdims=True)
            bits = jax.lax.bitcast_convert_type(m, jnp.uint32)
            e_sel = (bits >> np.uint32(23)) + np.uint32(1)
            ms = jax.lax.bitcast_convert_type(e_sel << np.uint32(23),
                                              jnp.float32)
            ms = jnp.where(m == 0, np.float32(1.0), ms)
            inv = np.float32(1.0) / ms
            rh, rl = prod.hi * inv, prod.lo * inv
            Mb = Mk.astype(jnp.bfloat16).T
            acc_s = acc_e = None
            for i in range(self.nslices):
                sc = np.float32(2.0 ** (8 * (i + 1)))
                isc = np.float32(2.0 ** (-8 * (i + 1)))
                k = jnp.round(rh * sc)
                s = k * isc               # exact pow2
                # window values are scaled integers |k| <= 2^8: exactly
                # representable in bf16, so the single-pass bf16 dot
                # against the {0,1} masks is EXACT (a HIGHEST-precision
                # f32 dot costs 6+ MXU passes for the same bits)
                part = jnp.dot(s.astype(jnp.bfloat16), Mb,
                               preferred_element_type=jnp.float32)
                if acc_s is None:
                    acc_s, acc_e = part, jnp.zeros_like(part)
                else:
                    t, e2 = two_sum(acc_s, part)
                    acc_s, acc_e = t, acc_e + e2
                rh, rl = two_sum(rh - s, rl)
            tail = jnp.dot(rh + rl, Mk.T,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            t, e2 = two_sum(acc_s, tail)
            acc_s, acc_e = t, acc_e + e2
            pad = ((0, 0), (0, 128 - nc))
            hi_ref[r0:r1, :] = jnp.pad(acc_s * ms, pad)
            lo_ref[r0:r1, :] = jnp.pad(acc_e * ms, pad)

    def moment_rows(self, points, wf):
        """[(ncells_p * nexp_p,) f64 per program] -- b_stack row order
        (cell-major), at the SHARED recurrence scale (callers apply
        their per-program normalisation ratio)."""
        from .doublefloat import ff_from_f64
        npts = points.shape[0]
        T = min(self._vmem_tile(), max(128, npts))
        ntiles = -(-npts // T)
        pad = ntiles * T - npts
        if points.dtype == jnp.float64:
            hi = points.astype(jnp.float32)
            lo = (points - hi.astype(jnp.float64)).astype(jnp.float32)
        else:
            hi = points.astype(jnp.float32)
            lo = jnp.zeros_like(hi)
        hi = jnp.pad(hi, ((0, pad), (0, 0))).T
        lo = jnp.pad(lo, ((0, pad), (0, 0))).T
        g = ff_from_f64(jnp.asarray(wf, jnp.float64), xp=jnp)
        wh = jnp.pad(g.hi, (0, pad)).reshape(1, -1)
        wl = jnp.pad(g.lo, (0, pad)).reshape(1, -1)

        full = lambda arr: pl.BlockSpec(arr.shape, lambda i: tuple(
            i * 0 for _ in arr.shape), memory_space=pltpu.VMEM)
        pts_spec = pl.BlockSpec((self.sd, T), lambda i: (i * 0, i),
                                memory_space=pltpu.VMEM)
        w_spec = pl.BlockSpec((1, T), lambda i: (i * 0, i),
                              memory_space=pltpu.VMEM)
        bary = jnp.asarray(self._bin.pack)
        in_specs = [pts_spec, pts_spec, w_spec, w_spec, full(bary)]
        operands = [hi, lo, wh, wl, bary]
        for pk, P, norms, _need in self.stages:
            for arr in (pk, P, norms):
                in_specs.append(full(arr))
                operands.append(jnp.asarray(arr))
        out_spec = pl.BlockSpec((self._rtot, 128), lambda i: (i * 0, i),
                                memory_space=pltpu.VMEM)
        hi_o, lo_o = pl.pallas_call(
            self._masked_moment_kernel,
            grid=(ntiles,),
            in_specs=in_specs,
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((self._rtot, ntiles * 128),
                                            jnp.float32),
                       jax.ShapeDtypeStruct((self._rtot, ntiles * 128),
                                            jnp.float32)),
            interpret=self.interpret,
            cost_estimate=pl.CostEstimate(
                flops=400 * self._rtot * ntiles * T,
                bytes_accessed=(8 * self.sd + 8) * ntiles * T
                + 8 * self._rtot * ntiles * 128,
                transcendentals=0,
            ),
        )(*operands)
        hi_c = hi_o.reshape(self._rtot, ntiles, 128)
        lo_c = lo_o.reshape(self._rtot, ntiles, 128)
        out = []
        for (r0, r1, nc) in self._rows:
            h = hi_c[r0:r1, :, :nc].astype(jnp.float64)
            l = lo_c[r0:r1, :, :nc].astype(jnp.float64)
            bw = (jnp.sum(h, axis=1) + jnp.sum(l, axis=1))  # (nexp, nc)
            out.append(bw.T.reshape(-1))                    # cell-major
        return out
