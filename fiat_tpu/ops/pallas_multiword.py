"""Fused multiword (Ozaki) change-of-basis kernel: the f64 accuracy path
on the bf16 MXU, without HBM round-trips.

The XLA f64 path (ops/tabulate.py + ops/multiword.py) materialises every
Ozaki group product (rows, npts) f32 in HBM before the TwoSum combine --
for the full zoo that is ~12 GB of intermediate traffic per pass.  This
kernel performs, per (row-block, point-tile) grid cell, entirely in VMEM:

  * the per-order group dots over the bf16 slices (MXU),
  * the TwoSum two-float combine (VPU, f32),
  * the exact power-of-two unscale,

and writes ONLY the two-float result (hi, lo) with hi + lo == the f64
Ozaki product exactly.  ``combine=True`` adds the one emulated-f64
hi + lo promotion in XLA; downstream pair-aware consumers can skip it.

Grid layout: (row_blocks, point_tiles) with the A-slice blocks constant
over the inner point sweep, so A streams exactly once and B streams once
per row block.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .multiword import (DEFAULT_ORDER, DEFAULT_SLICES, prepare_B,
                        split_scaled_host)


def _batch_index_sets(order, nslices):
    """One batch per order group: same-scale slice products accumulate
    exactly in f32 (sharing adjacent groups cost ~2e-9 at the 8-bit
    windows -- see multiword.py)."""
    batches = [(t,) for t in range(order + 1)]
    out = []
    for ts in batches:
        idx = [(i, t - i) for t in ts for i in range(t + 1)
               if i < nslices and t - i < nslices]
        if idx:
            out.append(idx)
    return out


class FusedMultiwordMatmul:
    """``fm = FusedMultiwordMatmul(A); hi, lo = fm.apply_pair(B_prepared)``
    computes A @ B to f64 accuracy as an exact two-float pair, fusing the
    whole group-dot + combine pipeline in one Pallas kernel."""

    def __init__(self, A, nslices=DEFAULT_SLICES, order=DEFAULT_ORDER,
                 row_block=512, point_tile=None, interpret=False):
        self.shape = A.shape
        self.nslices = nslices
        self.order = order
        self.interpret = interpret
        rows, self.K = A.shape
        # even 128-aligned row blocks (the MXU's systolic tile; a
        # non-128-multiple block measured 2.4x slower) with minimal
        # padding: ceil(rows/row_block) blocks of ceil-even size, NOT
        # ceil-to-row_block -- e.g. 672 rows at cap 512 used to pad to
        # 1024 (52% dead MXU work); now 2 blocks of 384
        nblocks = max(1, -(-rows // row_block))
        self.row_block = max(128, -(-(-(-rows // nblocks)) // 128) * 128)
        self.rows = rows
        self.rpad = nblocks * self.row_block
        # fixed 512-point tiles: a VMEM-adaptive tile (long tiles for
        # small zoos) measured NO faster anywhere and slightly slower
        # on the latency-bound configs
        self.point_tile = 512 if point_tile is None else point_tile

        slices, sA = split_scaled_host(A, nslices)
        pad = self.rpad - rows
        self.A_slices = [jnp.asarray(np.pad(np.asarray(s, np.float32),
                                            ((0, pad), (0, 0))
                                            ).astype(s.dtype))
                         for s in slices]
        self.sA = jnp.asarray(np.pad(sA.astype(np.float32),
                                     ((0, pad), (0, 0)), constant_values=1.0))
        self.batches = _batch_index_sets(order, nslices)

    def _kernel(self, *refs):
        n = self.nslices
        a_refs = refs[:n]
        b_refs = refs[n:2 * n]
        sa_ref, sb_ref = refs[2 * n], refs[2 * n + 1]
        hi_ref, lo_ref = refs[2 * n + 2], refs[2 * n + 3]

        # every dot's result joins one TwoSum accumulation chain, so
        # only (s, e) stay live between dots.  Same-quantum 16-bit slice
        # products fit the f32 accumulator exactly only for <= 256-term
        # contractions, so EVERY group's concatenated dot (group t has
        # (t+1)*K columns) splits into <= 256-column chunks whose
        # partials the TwoSum chain combines error-free.
        dots = []
        for idx in self.batches:
            Acat = jnp.concatenate([a_refs[i][:] for i, _ in idx], axis=1)
            Bcat = jnp.concatenate([b_refs[j][:] for _, j in idx], axis=0)
            if Acat.shape[1] > 256:
                for k0 in range(0, Acat.shape[1], 256):
                    dots.append((Acat[:, k0:k0 + 256],
                                 Bcat[k0:k0 + 256, :]))
            else:
                dots.append((Acat, Bcat))
        s = e = None
        for Acat, Bcat in dots:
            g = jnp.dot(Acat, Bcat, preferred_element_type=jnp.float32)
            if s is None:
                s, e = g, jnp.zeros_like(g)
            else:
                t = s + g
                bp = t - s
                e = e + ((s - (t - bp)) + (g - bp))   # Knuth TwoSum error
                s = t
        scale = sa_ref[:] * sb_ref[:]             # pow2 * pow2: exact in f32
        hi_ref[:] = s * scale
        lo_ref[:] = e * scale

    def apply_pair(self, B_prepared, trim=True):
        """(hi, lo) f32 pair with hi + lo == (A @ B) in the multiword
        scheme's accuracy; B_prepared from multiword.prepare_B.
        ``trim=False`` returns the block-padded (rpad, tpad) arrays so
        the caller can fuse its own (aligned) slicing into downstream
        ops -- the eager trim here costs a full extra HBM round-trip."""
        B_slices, sB = B_prepared
        npts = B_slices[0].shape[1]
        T = self.point_tile
        tpad = -(-npts // T) * T
        pad = tpad - npts
        Bp = [jnp.pad(b, ((0, 0), (0, pad))) for b in B_slices]
        sBp = jnp.pad(sB.astype(jnp.float32), ((0, 0), (0, pad)),
                      constant_values=1.0)

        Rb = self.row_block
        grid = (self.rpad // Rb, tpad // T)
        K = self.K

        # A blocks move with the OUTER grid axis only: streamed once;
        # B tiles move with the inner axis: streamed once per row block
        a_spec = pl.BlockSpec((Rb, K), lambda r, t: (r, t * 0),
                              memory_space=pltpu.VMEM)
        b_spec = pl.BlockSpec((K, T), lambda r, t: (r * 0, t),
                              memory_space=pltpu.VMEM)
        sa_spec = pl.BlockSpec((Rb, 1), lambda r, t: (r, t * 0),
                               memory_space=pltpu.VMEM)
        sb_spec = pl.BlockSpec((1, T), lambda r, t: (r * 0, t),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((Rb, T), lambda r, t: (r, t),
                                memory_space=pltpu.VMEM)

        npairs = sum(len(idx) for idx in self.batches)
        hi, lo = pl.pallas_call(
            self._kernel,
            grid=grid,
            in_specs=[a_spec] * self.nslices + [b_spec] * self.nslices
            + [sa_spec, sb_spec],
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((self.rpad, tpad), jnp.float32),
                       jax.ShapeDtypeStruct((self.rpad, tpad), jnp.float32)),
            interpret=self.interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * self.rpad * tpad * K * npairs,
                bytes_accessed=2 * K * tpad * self.nslices * grid[0]
                + 2 * self.rpad * K * self.nslices + 8 * self.rpad * tpad,
                transcendentals=0,
            ),
        )(*self.A_slices, *Bp, self.sA, sBp)
        if not trim:
            return hi, lo
        return hi[:self.rows, :npts], lo[:self.rows, :npts]

    def __call__(self, B):
        hi, lo = self.apply_pair(prepare_B(jnp.asarray(B), self.nslices))
        return hi.astype(jnp.float64) + lo.astype(jnp.float64)

    def apply(self, B_prepared):
        """f64 result (combines the pair with one emulated-f64 add)."""
        hi, lo = self.apply_pair(B_prepared)
        return hi.astype(jnp.float64) + lo.astype(jnp.float64)


class FusedZooTabulator:
    """The f64 accuracy path of a BatchedTabulator with the multiword
    change of basis fused in Pallas.

    Preferred surface: ``blocks = fz.block_tables(points)`` +
    ``fz.unpack(blocks)`` -- per-source f64 tables (plain block + one
    block per macro element) with no fused concatenation.
    ``fz(points)`` matches ``batched(points)`` (one concatenated
    {alpha: (rows, npts)} array, f64) at the cost of an extra HBM
    round-trip per table; ``fz.pair_tables(points)`` returns exact
    (hi, lo) f32 pairs, skipping the final f64 promotion for
    pair-aware consumers.  Macro side programs (split-complex
    expansions) run through their own fused kernels: the masked parent
    tabulation rides the slice-recurrence kernel with {0,1} masks
    applied in bf16 slice space, and their tall change-of-basis GEMM is
    a second FusedMultiwordMatmul, so no emulated-f64 GEMM remains."""

    #: per-alpha row blocks are padded to this multiple so the _split
    #: slices start sublane-aligned (an unaligned-offset row slice of
    #: the kernel output costs a shifted copy on TPU)
    ROW_ALIGN = 8

    def __init__(self, batched, interpret=False, **kw):
        self.batched = batched
        self.sd = batched.sd
        self.rows = batched.stacked.shape[0]
        self.block_rows = -(-self.rows // self.ROW_ALIGN) * self.ROW_ALIGN
        pad = ((0, self.block_rows - self.rows), (0, 0))
        if batched.alpha_mats:
            self.alphas = batched._alpha_order
            tall = np.vstack([np.pad(batched.alpha_mats[a], pad)
                              for a in self.alphas])
        else:
            self.alphas = [(0,) * self.sd]
            tall = np.pad(batched.stacked, pad)
        self.fm = FusedMultiwordMatmul(tall, interpret=interpret, **kw)
        # eager: the EFT-safety probe jit-compiles, so it cannot run
        # while the fused pipeline itself is being traced
        from .doublefloat import supports_ff
        self._ff_ok = supports_ff(batched.target_es)
        # fused Pallas recurrence+slice kernel for the B operand (the
        # XLA df32 recurrence graph runs ~5x below VPU speed; the
        # in-VMEM kernel also keeps the (hi, lo) pair out of HBM)
        self._slice_rec = None
        if self._ff_ok and not interpret:
            from .pallas_recurrence import PallasSliceRecurrence
            try:
                self._slice_rec = PallasSliceRecurrence(
                    batched.target_es, batched.max_degree,
                    nslices=self.fm.nslices)
            except NotImplementedError:
                pass
        # one fused kernel per macro side program (the tall GEMM there was
        # the emulated-f64 bottleneck of the macro zoo: native dot by
        # default, or the XLA multiword variant at +190 s compile)
        self.macro_fms = []
        for prog in getattr(batched, "macro_programs", None) or ():
            fm = FusedMultiwordMatmul(prog.tall, interpret=interpret)
            ff_ok = supports_ff(prog.parent_es)
            rec = None
            if ff_ok and not interpret:
                from .pallas_recurrence import PallasSliceRecurrence
                try:
                    rec = PallasSliceRecurrence(prog.parent_es, prog.degree,
                                                nslices=fm.nslices)
                except NotImplementedError:
                    pass
            self.macro_fms.append((fm, ff_ok, rec))
        self._jit_pairs = jax.jit(self._pairs)
        self._jit_f64 = jax.jit(self._f64)
        self._jit_blocks = jax.jit(self._f64_blocks)

    def _phi(self, points):
        from .tabulate import _tiled_apply
        b = self.batched
        base = _tiled_apply(
            lambda t: b.target_es._tabulate_on_cell(b.max_degree, t, order=0),
            points, b.tile)
        return base[(0,) * self.sd]

    def _phi_pair(self, points):
        """The expansion tabulation as a df32 (hi, lo) pair: native-f32
        recurrence (ops/doublefloat.py), no emulated f64 anywhere."""
        from .tabulate import _tiled_apply
        from .doublefloat import FF, tabulate_ff
        b = self.batched

        def body(t):
            ff = tabulate_ff(b.target_es, b.max_degree, t)
            return {"hi": ff.hi, "lo": ff.lo}
        out = _tiled_apply(body, points, b.tile)
        return FF(out["hi"], out["lo"])

    def _split(self, hi, lo):
        """Aligned per-alpha views of the PADDED kernel outputs; each
        entry still carries the row/column padding (trim fuses into the
        consumer's convert, avoiding an eager HBM round-trip)."""
        r = self.block_rows
        return {a: (hi[k * r:(k + 1) * r], lo[k * r:(k + 1) * r])
                for k, a in enumerate(self.alphas)}

    def _macro_prepared_B(self, prog, ff_ok, rec, points):
        """Ozaki slice preparation of a macro program's masked parent
        tabulation, plus the per-point multiplicity reciprocal to fold
        into the result (or None).

        Preferred path: the fused Pallas recurrence+slice kernel on the
        PARENT basis, then exact {0,1} mask multiplies in bf16 slice
        space -- valid because the binning mask is constant down each
        point column, so mask * slice_k(phi) == slice_k(mask * phi) at
        the unmasked column scale.  Multiplicity averaging (non-unique
        binning) becomes an exact f64 multiply AFTER the kernel instead
        of an in-pair division.  Fallbacks: the XLA df32 pipeline, then
        the emulated-f64 b_stack split."""
        from ..core.expansions import partition_of_unity_masks
        from .tabulate import _tiled_apply
        from .doublefloat import prepare_B_ff
        b = self.batched
        n = self.fm.nslices

        if rec is not None and points.dtype == jnp.float64:
            unique = prog.es.continuity is not None and b.order == 0
            masks, total = partition_of_unity_masks(
                prog.es.ref_el, points, unique=unique, raw=True)
            slices, sB = rec._apply(points)
            Bs = [jnp.concatenate(
                [masks[pos].astype(jnp.bfloat16) * s
                 for pos, c in enumerate(prog.cells)], axis=0)
                for s in slices]
            recip = (None if total is None
                     else 1.0 / total.astype(jnp.float64))
            return (Bs, sB), recip

        def body(pts):
            if ff_ok:
                slices, sB = prepare_B_ff(prog.b_stack_ff(pts, b.order), n)
            else:
                slices, sB = prepare_B(prog.b_stack(pts, b.order), n)
            out = {f"s{i:02d}": s for i, s in enumerate(slices)}
            out["scale"] = sB
            return out

        prep = _tiled_apply(body, points, b.tile)
        return ([prep[f"s{i:02d}"] for i in range(n)], prep["scale"]), None

    def _specials(self, points):
        """Macro side tables {alpha: [blocks]}: each grouped dmats side
        program runs through its own fused multiword kernel (B prepared
        tile-by-tile so the parent recurrence keeps a bounded working
        set); programs without the grouped form fall back to the traced
        per-element engine."""
        b = self.batched
        parts = {a: [] for a in self.alphas}
        if getattr(b, "macro_programs", None):
            per_elem = {}
            for (fm, ff_ok, rec), prog in zip(self.macro_fms,
                                              b.macro_programs):
                Bp, recip = self._macro_prepared_B(prog, ff_ok, rec, points)
                hi, lo = fm.apply_pair(Bp)
                out = hi.astype(jnp.float64) + lo.astype(jnp.float64)
                if recip is not None:
                    # exact rational multiplicity averaging in f64
                    out = out * recip
                r = prog.rows
                tabs = {a: out[k * r:(k + 1) * r]
                        for k, a in enumerate(prog.alphas)}
                for idx, lo_, hi_ in prog.row_slices:
                    per_elem[idx] = {a: tabs[a][lo_:hi_]
                                     for a in self.alphas}
            for i, e in b.special:
                for alpha in parts:
                    parts[alpha].append(per_elem[i][alpha])
            return parts
        for es, deg, flat in b.special_progs:
            base = es._tabulate(deg, points, order=b.order)
            C = jnp.asarray(flat, dtype=points.dtype)
            for alpha in parts:
                parts[alpha].append(C @ base[alpha])
        return parts

    def _padded_pairs(self, points):
        """{alpha: padded (hi, lo)} straight off the fused kernel."""
        from .doublefloat import prepare_B_ff
        if self._slice_rec is not None and points.dtype == jnp.float64:
            Bp = self._slice_rec._apply(points)
        elif self._ff_ok and points.dtype == jnp.float64:
            Bp = prepare_B_ff(self._phi_pair(points))
        else:
            Bp = prepare_B(self._phi(points))
        hi, lo = self.fm.apply_pair(Bp, trim=False)
        return self._split(hi, lo)

    def _pairs(self, points):
        npts = points.shape[0]
        return {a: (h[:self.rows, :npts], l[:self.rows, :npts])
                for a, (h, l) in self._padded_pairs(points).items()}

    def _f64(self, points):
        npts = points.shape[0]
        r = self.rows
        # slice-then-convert: the trim fuses into the f32->f64 promote,
        # so the padded kernel outputs cross HBM exactly once
        out = {a: (h[:r, :npts].astype(jnp.float64)
                   + l[:r, :npts].astype(jnp.float64))
               for a, (h, l) in self._padded_pairs(points).items()}
        if self.batched.special_progs:
            specials = self._specials(points)
            out = {a: jnp.concatenate([out[a]] + specials[a], axis=0)
                   for a in out}
        return out

    def _f64_blocks(self, points):
        """{alpha: [plain_block, macro_block...]} f64 without the final
        concatenate -- the concatenated layout costs a full extra HBM
        round-trip of every table, and consumers (unpack, moments) are
        block-agnostic; the reference likewise emits per-element arrays
        (FIAT/finite_element.py:181), never a fused concatenation."""
        npts = points.shape[0]
        r = self.rows
        out = {a: [h[:r, :npts].astype(jnp.float64)
                   + l[:r, :npts].astype(jnp.float64)]
               for a, (h, l) in self._padded_pairs(points).items()}
        if self.batched.special_progs:
            for a, blocks in self._specials(points).items():
                out[a].extend(blocks)
        return out

    def block_tables(self, points):
        """f64 tables in block layout; ``unpack`` maps them back to the
        per-element dicts."""
        return self._jit_blocks(jnp.asarray(points))

    def unpack(self, block_tables):
        """Per-element {alpha: array} views from ``block_tables`` output
        (same result as ``batched.unpack(self(points))``); concatenated
        tables (the ``__call__`` layout) are accepted too."""
        b = self.batched
        if block_tables and not isinstance(
                next(iter(block_tables.values())), (list, tuple)):
            return b.unpack(block_tables)
        special_pos = {i: 1 + k for k, (i, e) in enumerate(b.special)}
        out = []
        for i, (lo, hi, shape) in enumerate(b.slices):
            elem = {}
            for alpha, blocks in block_tables.items():
                if i in special_pos:
                    tab = blocks[special_pos[i]]
                else:
                    tab = blocks[0][lo:hi]
                elem[alpha] = tab.reshape(shape + tab.shape[-1:])
            out.append(elem)
        return out

    def pair_tables(self, points):
        return self._jit_pairs(jnp.asarray(points))

    def __call__(self, points):
        return self._jit_f64(jnp.asarray(points))
