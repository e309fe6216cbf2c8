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
from .doublefloat import (FF, ff_add, ff_mul, ff_scale_pow2, ff_sub,
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
        k = jnp.round(rh * sc)
        s = k / sc
        out.append(k.astype(jnp.int8) if wdtype == "int8"
                   else s.astype(jnp.bfloat16))
        rh, rl = two_sum(rh - s, rl)
    return out, sB


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
