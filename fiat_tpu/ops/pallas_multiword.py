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

from .multiword import prepare_B, resolve_scheme, split_scaled_host
from .doublefloat import FF, ff_mul


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

    #: first order group accumulated with plain f32 adds (see _kernel)
    TAIL = 3

    def __init__(self, A, nslices=None, order=None,
                 row_block=None, point_tile=None, interpret=False,
                 wdtype="bf16"):
        self.shape = A.shape
        if wdtype == "auto":
            wdtype = "int8" if A.shape[1] >= 128 else "bf16"
        self.wdtype = wdtype
        _, self.nslices, self.order = resolve_scheme(wdtype, nslices, order)
        nslices, order = self.nslices, self.order
        self.interpret = interpret
        rows, self.K = A.shape
        # narrow contractions fit longer point tiles in VMEM, and the
        # smaller row block + longer tile measured ~18% faster on the
        # bucketed zoo kernels; wide (macro) contractions keep 512/512
        if row_block is None:
            row_block = 256 if self.K <= 128 else 512
        if point_tile is None and self.K <= 128:
            point_tile = 1024
        # even 128-aligned row blocks (the MXU's systolic tile; a
        # non-128-multiple block measured 2.4x slower) with minimal
        # padding: search the block count from ceil(rows/cap) up to
        # all-128 blocks and take the smallest total rpad (fewest
        # blocks on ties -- each extra block streams B once more).
        # The old ceil-even rule missed e.g. 384 rows at cap 256:
        # 2 blocks of 256 = 512 (33% dead MXU work) vs 3 x 128 = 384.
        nb0 = max(1, -(-rows // row_block))
        best = None
        for n in range(nb0, max(nb0, -(-rows // 128)) + 1):
            rb = max(128, -(-(-(-rows // n)) // 128) * 128)
            key = (n * rb, n)
            if best is None or key < best:
                best = key
                self.row_block = rb
        self.rows = rows
        self.rpad = best[0]
        # fixed 512-point tiles: a VMEM-adaptive tile (long tiles for
        # small zoos) measured NO faster anywhere and slightly slower
        # on the latency-bound configs
        self.point_tile = 512 if point_tile is None else point_tile

        slices, sA = split_scaled_host(A, nslices, wdtype=wdtype)
        pad = self.rpad - rows
        if wdtype == "int8":
            self.A_slices = [jnp.asarray(np.pad(s, ((0, pad), (0, 0))))
                             for s in slices]
        else:
            self.A_slices = [jnp.asarray(np.pad(np.asarray(s, np.float32),
                                                ((0, pad), (0, 0))
                                                ).astype(s.dtype))
                             for s in slices]
        self.sA = jnp.asarray(np.pad(sA.astype(np.float32),
                                     ((0, pad), (0, 0)), constant_values=1.0))
        self.batches = _batch_index_sets(order, nslices)

    def _combine_dots(self, a_vals, b_vals, sa, sb, hi_ref, lo_ref):
        """Group dots + TwoSum combine over VMEM VALUES, scaled and
        written to the output refs (see _combine_core)."""
        s, e = self._combine_core(a_vals, b_vals)
        scale = sa * sb                           # pow2 * pow2: exact in f32
        hi_ref[:] = s * scale
        lo_ref[:] = e * scale

    def _combine_core(self, a_vals, b_vals):
        """Group dots + TwoSum combine over VMEM VALUES (the masked
        variant builds its b_vals in-kernel, so the body takes arrays,
        not refs).  Returns the UNSCALED (s, e) accumulator pair; the
        caller applies the exact pow2 column/row scales (and, in the
        one-shot macro kernel, the pair-exact multiplicity reciprocal)
        before writing."""
        # every dot's result joins one TwoSum accumulation chain, so
        # only (s, e) stay live between dots.  Same-quantum 16-bit slice
        # products fit the f32 accumulator exactly only for <= 256-term
        # contractions, so EVERY group's concatenated dot (group t has
        # (t+1)*K columns) splits into <= 256-column chunks whose
        # partials the TwoSum chain combines error-free.
        if self.wdtype == "int8":
            return self._combine_core_i8(a_vals, b_vals)
        dots = []
        tail_parts = []
        for t, idx in enumerate(self.batches):
            Acat = jnp.concatenate([a_vals[i] for i, _ in idx], axis=1)
            Bcat = jnp.concatenate([b_vals[j] for _, j in idx], axis=0)
            if t >= self.TAIL:
                # tail groups join the chain through plain f32 adds (see
                # below), so the 256-column exactness chunking buys them
                # nothing: merge ALL tail groups into one concatenated
                # dot with wide (1024) chunks -- the in-dot f32
                # accumulation rounds at ~2^-24 of the tail's OWN
                # magnitude (<= 2^(-8*TAIL) of the result), the same
                # budget the plain adds already spend.  Cuts the
                # MXU-call + VPU-pass count ~40% at the default order.
                tail_parts.append((Acat, Bcat))
                continue
            if Acat.shape[1] > 256:
                for k0 in range(0, Acat.shape[1], 256):
                    dots.append((t, Acat[:, k0:k0 + 256],
                                 Bcat[k0:k0 + 256, :]))
            else:
                dots.append((t, Acat, Bcat))
        if tail_parts:
            Acat = jnp.concatenate([a for a, _ in tail_parts], axis=1)
            Bcat = jnp.concatenate([b for _, b in tail_parts], axis=0)
            for k0 in range(0, Acat.shape[1], 1024):
                dots.append((self.TAIL, Acat[:, k0:k0 + 1024],
                             Bcat[k0:k0 + 1024, :]))
        # groups t >= TAIL are <= 2^(-8*TAIL) of the leading magnitude:
        # plain f32 adds there round at <= 2^-24 of their OWN size, i.e.
        # ~2^-(24 + 8*TAIL) of the result -- far below the pair budget --
        # so the tail skips the 6-op TwoSum and joins the chain once
        TAIL = self.TAIL
        s = e = acc = None
        for t, Acat, Bcat in dots:
            g = jnp.dot(Acat, Bcat, preferred_element_type=jnp.float32)
            if s is None:
                s, e = g, jnp.zeros_like(g)
            elif t >= TAIL:
                acc = g if acc is None else acc + g
            else:
                tt = s + g
                bp = tt - s
                e = e + ((s - (tt - bp)) + (g - bp))  # Knuth TwoSum error
                s = tt
        if acc is not None:
            tt = s + acc
            bp = tt - s
            e = e + ((s - (tt - bp)) + (acc - bp))
            s = tt
        return s, e

    def _combine_core_i8(self, a_vals, b_vals):
        """int8 window variant: one s8 x s8 -> s32 dot per order group
        (2x the bf16 MXU rate on v5e) with EXACT integer accumulation --
        no 256-column chunking, no in-dot rounding.  Each group's int32
        result converts to f32 (exactly when its magnitude bound fits
        2^24, else via an exact two-float split) and joins the same
        TwoSum chain at its window quantum 2^{-7(t+2)}.

        (Negative result, r5 -- do not retry: replacing the per-group
        concatenated dot with (t+1) pair dots accumulated in int32 to
        avoid the Acat/Bcat VMEM copies measured SLOWER everywhere:
        tet8 4.05 -> 5.09 ms, c1 one-shot 0.83 -> 1.00 ms.  The MXU
        call count dominates; Mosaic pipelines the concatenations.)"""
        from .multiword import CHUNK_I8
        s = e = None
        for t, idx in enumerate(self.batches):
            Acat = jnp.concatenate([a_vals[i] for i, _ in idx], axis=1)
            Bcat = jnp.concatenate([b_vals[j] for _, j in idx], axis=0)
            gi = jnp.dot(Acat, Bcat, preferred_element_type=jnp.int32)
            q = np.float32(2.0 ** (-CHUNK_I8 * (t + 2)))
            v1 = gi.astype(jnp.float32)
            # |gi| <= ncols * 64^2: the f32 convert is exact while that
            # bound stays under 2^24 (ncols <= 4096); past it, recover
            # the dropped low bits with one exact round-trip
            v2 = (None if Acat.shape[1] <= 4096
                  else (gi - v1.astype(jnp.int32)).astype(jnp.float32))
            g = v1 * q
            if s is None:
                s, e = g, jnp.zeros_like(g)
            else:
                # FULL TwoSum for every group: unlike the bf16 path
                # (19 chunked dots, tail shortcut), int8 has only
                # order+1 dots, and a plain-add tail would round at
                # 2^(-24 - 7*TAIL) -- measured 7.7e-11 at tet8, the
                # dominant error of the whole pipeline.  Six extra VPU
                # ops per group are noise next to the dots.
                tt = s + g
                bp = tt - s
                e = e + ((s - (tt - bp)) + (g - bp))  # Knuth TwoSum
                s = tt
            if v2 is not None:
                e = e + v2 * q
        return s, e

    def _kernel(self, *refs):
        n = self.nslices
        a_refs = refs[:n]
        b_refs = refs[n:2 * n]
        sa_ref, sb_ref = refs[2 * n], refs[2 * n + 1]
        hi_ref, lo_ref = refs[2 * n + 2], refs[2 * n + 3]
        self._combine_dots([a[:] for a in a_refs], [b[:] for b in b_refs],
                           sa_ref[:], sb_ref[:], hi_ref, lo_ref)

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
                bytes_accessed=(1 if self.wdtype == "int8" else 2)
                * K * self.nslices * (tpad * grid[0] + self.rpad)
                + 8 * self.rpad * tpad,
                transcendentals=0,
            ),
        )(*self.A_slices, *Bp, self.sA, sBp)
        if not trim:
            return hi, lo
        return hi[:self.rows, :npts], lo[:self.rows, :npts]

    def __call__(self, B):
        hi, lo = self.apply_pair(prepare_B(jnp.asarray(B), self.nslices,
                                           wdtype=self.wdtype))
        return hi.astype(jnp.float64) + lo.astype(jnp.float64)

    def apply(self, B_prepared):
        """f64 result (combines the pair with one emulated-f64 add)."""
        hi, lo = self.apply_pair(B_prepared)
        return hi.astype(jnp.float64) + lo.astype(jnp.float64)


class FusedMaskedMultiword(FusedMultiwordMatmul):
    """Fused multiword matmul whose B operand is assembled IN VMEM from
    a shared slice tabulation and per-subcell {0,1} mask rows:

        B rows [off_k, off_k + nexp_k) = mask[m_k] * slices[:nexp_k]

    This is the macro (split-complex) contraction  A @ (mask ⊙ Phi)
    with the masked, per-cell-expanded B never materialised in HBM --
    the XLA formulation spent more time relayouting the 12-way
    concatenation of short bf16 row blocks than the whole kernel takes.
    Masks are exact in bf16 ({0,1}), and since the binning mask is
    constant down each point column, mask * slice_k(phi) ==
    slice_k(mask * phi) at the shared per-point column scale.

    ``pieces``: [(mask_row, nexp_k)] in A-column order (one entry per
    (program, subcell) block of the merged macro A).

    B assembly runs on the MXU, not piecewise on the VPU: with the
    static one-hot matrices G[off_k + i, i] = 1 (slice-row expansion)
    and E[off_k + i, m_k] = 1 (mask-row expansion),

        B_j = (E @ masks) * (G @ slices_j)

    replaces the per-piece concatenation of ~20 tiny (nexp_k, T)
    broadcast-multiplies.  One-hot selection is exact in every window
    dtype, so the numerics are bit-identical to the piecewise form.
    (Measured on the C1 zoo: the two forms are within noise -- the
    kernel is MXU-bound at 21 multiword pair-dots, not assembly-bound;
    ``mxu_assembly=False`` restores the piecewise form.)"""

    mxu_assembly = True

    def __init__(self, A, pieces, **kw):
        super().__init__(A, **kw)
        self.pieces = list(pieces)
        assert sum(n for _, n in self.pieces) == self.K
        self.max_nexp = max(n for _, n in self.pieces)
        n_mask_rows = max(m for m, _ in self.pieces) + 1
        G = np.zeros((self.K, self.max_nexp))
        E = np.zeros((self.K, n_mask_rows))
        off = 0
        for m, nexp in self.pieces:
            G[off:off + nexp, :nexp] = np.eye(nexp)
            E[off:off + nexp, m] = 1.0
            off += nexp
        wdt = np.int8 if self.wdtype == "int8" else jnp.bfloat16
        self._G = jnp.asarray(G.astype(wdt))
        self._E = jnp.asarray(E.astype(wdt))

    def _masked_kernel(self, *refs):
        n = self.nslices
        a_refs = refs[:n]
        s_refs = refs[n:2 * n]
        m_ref, g_ref, e_ref = refs[2 * n], refs[2 * n + 1], refs[2 * n + 2]
        sa_ref, sb_ref = refs[2 * n + 3], refs[2 * n + 4]
        hi_ref, lo_ref = refs[2 * n + 5], refs[2 * n + 6]
        if not self.mxu_assembly:
            if self.wdtype == "int8":
                # piecewise select (i8 vector multiply is not legal)
                b_vals = [jnp.concatenate(
                    [jnp.where(m_ref[m:m + 1, :] != 0, s_refs[j][:nexp, :],
                               jnp.zeros_like(s_refs[j][:nexp, :]))
                     for m, nexp in self.pieces], axis=0)
                    for j in range(n)]
            else:
                b_vals = [jnp.concatenate(
                    [m_ref[m:m + 1, :] * s_refs[j][:nexp, :]
                     for m, nexp in self.pieces], axis=0)
                    for j in range(n)]
            self._combine_dots([a[:] for a in a_refs], b_vals,
                               sa_ref[:], sb_ref[:], hi_ref, lo_ref)
            return
        if self.wdtype == "int8":
            # Mosaic cannot legalize i8 vector multiplies (arith.muli on
            # vector<i8>): select on the expanded mask instead.  The
            # int32 -> int8 narrowing of the one-hot dots is exact
            # (windows fit int8 by construction; masks are {0,1}).
            m_exp = jnp.dot(e_ref[:], m_ref[:],
                            preferred_element_type=jnp.int32)
            b_vals = []
            for j in range(n):
                s_exp = jnp.dot(g_ref[:], s_refs[j][:],
                                preferred_element_type=jnp.int32
                                ).astype(jnp.int8)
                b_vals.append(jnp.where(m_exp != 0, s_exp,
                                        jnp.zeros_like(s_exp)))
        else:
            # one-hot f32 dot results are bf16 values exactly, and
            # mask * value is exact for {0,1} masks in any precision
            m_exp = jnp.dot(e_ref[:], m_ref[:],
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
            b_vals = [m_exp * jnp.dot(g_ref[:], s_refs[j][:],
                                      preferred_element_type=jnp.float32
                                      ).astype(jnp.bfloat16)
                      for j in range(n)]
        self._combine_dots([a[:] for a in a_refs], b_vals,
                           sa_ref[:], sb_ref[:], hi_ref, lo_ref)

    def apply_pair_masked(self, slices, sB, masks, trim=True):
        """(hi, lo) f32 pair of A @ B with B assembled in-kernel.

        :arg slices: shared bf16 slice tabulation, each (>= max piece
            nexp, npts) -- leading rows are taken per piece.
        :arg sB: (1, npts) f32 shared per-point column scale.
        :arg masks: (n_mask_rows, npts) {0,1} (any float dtype)."""
        npts = sB.shape[-1]
        T = self.point_tile
        tpad = -(-npts // T) * T
        pad = tpad - npts
        wdt = jnp.int8 if self.wdtype == "int8" else jnp.bfloat16
        S = [jnp.pad(s[:self.max_nexp].astype(wdt),
                     ((0, 0), (0, pad))) for s in slices]
        M = jnp.pad(masks.astype(wdt), ((0, 0), (0, pad)))
        sBp = jnp.pad(sB.astype(jnp.float32), ((0, 0), (0, pad)),
                      constant_values=1.0)

        Rb = self.row_block
        grid = (self.rpad // Rb, tpad // T)
        K = self.K

        a_spec = pl.BlockSpec((Rb, K), lambda r, t: (r, t * 0),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((self.max_nexp, T), lambda r, t: (r * 0, t),
                              memory_space=pltpu.VMEM)
        m_spec = pl.BlockSpec((M.shape[0], T), lambda r, t: (r * 0, t),
                              memory_space=pltpu.VMEM)
        g_spec = pl.BlockSpec(self._G.shape, lambda r, t: (r * 0, t * 0),
                              memory_space=pltpu.VMEM)
        e_spec = pl.BlockSpec(self._E.shape, lambda r, t: (r * 0, t * 0),
                              memory_space=pltpu.VMEM)
        sa_spec = pl.BlockSpec((Rb, 1), lambda r, t: (r, t * 0),
                               memory_space=pltpu.VMEM)
        sb_spec = pl.BlockSpec((1, T), lambda r, t: (r * 0, t),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((Rb, T), lambda r, t: (r, t),
                                memory_space=pltpu.VMEM)

        npairs = sum(len(idx) for idx in self.batches)
        hi, lo = pl.pallas_call(
            self._masked_kernel,
            grid=grid,
            in_specs=[a_spec] * self.nslices + [s_spec] * self.nslices
            + [m_spec, g_spec, e_spec, sa_spec, sb_spec],
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((self.rpad, tpad), jnp.float32),
                       jax.ShapeDtypeStruct((self.rpad, tpad), jnp.float32)),
            interpret=self.interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * self.rpad * tpad * K * npairs,
                bytes_accessed=(
                    (1 if self.wdtype == "int8" else 2)
                    * (self.max_nexp * self.nslices + M.shape[0])
                    * tpad * grid[0]
                    + (1 if self.wdtype == "int8" else 2)
                    * self.rpad * K * self.nslices
                    + 8 * self.rpad * tpad),
                transcendentals=0,
            ),
        )(*self.A_slices, *S, M, self._G, self._E, self.sA, sBp)
        if not trim:
            return hi, lo
        return hi[:self.rows, :npts], lo[:self.rows, :npts]


class FusedMacroOneShot(FusedMaskedMultiword):
    """ONE-launch macro (split-complex) engine: reads the RAW df32
    point pair and performs, per (row-block, point-tile) grid cell,
    entirely in VMEM:

      * the ff barycentric L1 subcell-binning masks of every macro
        program (the partition_of_unity_masks XLA pass and its HBM
        round-trip disappear; identical comparison semantics -- the
        same df32 distances against best + 1e-12),
      * the shared parent df32 Dubiner recurrence + window slice split
        (pallas_recurrence.emit_slices; the dedicated macro recurrence
        launch and its slice HBM round-trip disappear),
      * the per-piece masked B assembly + multiword group dots + TwoSum
        combine of FusedMaskedMultiword,
      * pair-exact multiplicity averaging for non-unique programs: the
        in-kernel ff reciprocal of the cover count multiplies the
        (s, e) accumulator with a full ff_mul, so the emulated-f64
        promote + f64 reciprocal multiply in XLA disappear too,

    and writes ONLY the (hi, lo) pair.  Workload shape of the reference:
    /root/reference/FIAT/macro.py:381 (MacroQuadratureRule) +
    /root/reference/FIAT/expansions.py:368-408 (per-subcell tabulation).

    ``geom``: per program {"maps": [(A_c, b_c) rescaled barycentric map
    per subcell, host f64], "unique": bool, "rows": (r0, r1) row range
    in the merged A}; ``parent_map``: the shared parent-cell map.
    ``rec_deg``/``scale``: the shared parent recurrence degree and
    normalisation (must match the scale the merged A was built
    against)."""

    def __init__(self, A, pieces, geom, parent_map, sd, rec_deg, scale,
                 point_tile=None, **kw):
        super().__init__(A, pieces, point_tile=point_tile or 2048, **kw)
        from .pallas_recurrence import _pack_stage_ff
        self._geom = list(geom)
        self._parent_map = (np.asarray(parent_map[0], np.float64),
                            np.asarray(parent_map[1], np.float64))
        self._sd = sd
        self._rec_deg = rec_deg
        self._scale = float(scale)
        self.stages = [_pack_stage_ff(sd, rec_deg, c) for c in range(sd)]
        if point_tile is None:
            # VMEM-adaptive tile (longer than the streamed-B kernel's
            # 512: the per-step recurrence + binning VPU work amortises
            # over the tile and B is computed, not streamed).  The
            # budget must hold the double-buffered pair outputs, the
            # assembled windows, the ff stacks and the binning rows --
            # a fixed 2048 OOM'd scoped vmem at rpad 256 (order-2
            # hessian zoos).
            ncand = max(sum(st[3]) for st in self.stages)
            wb = 1 if self.wdtype == "int8" else 2
            per_pt = (8 * 2 * self.row_block        # pair out, 2 buffers
                      + 2 * self.nslices * self.K * wb   # windows + dots
                      + 4 * (6 * ncand + 2 * self.max_nexp)  # ff stacks
                      + 4 * 8 * (len(self.pieces) + 1))     # binning
            budget = 7 * 1024 * 1024
            self.point_tile = max(512, min(2048,
                                           budget // per_pt // 512 * 512))
        nonuni = [g for g in self._geom if not g["unique"]]
        self._n_nonuni = len(nonuni)
        # stacked barycentric maps + in-kernel ff binning (shared with
        # the masked pair-moment kernel): distances run as (ncells+1, T)
        # ff ops -- per-cell (1, T) chains waste 7/8 of the VPU
        # sublanes (measured 0.33 ms of the c1 kernel)
        from .pallas_recurrence import SubcellBinning
        self._bin = SubcellBinning(geom, parent_map, sd)
        self._bary_pack = jnp.asarray(self._bin.pack)
        # one-hot row -> (non-unique program | virtual ones) selector:
        # the trailing virtual column carries recip == exactly 1 for
        # unique-program rows and block padding, so the in-kernel
        # selection dot is an exact copy everywhere
        E = np.zeros((self.rpad, self._n_nonuni + 1), np.float32)
        E[:, -1] = 1.0
        for j, g in enumerate(nonuni):
            r0, r1 = g["rows"]
            E[r0:r1, j], E[r0:r1, -1] = 1.0, 0.0
        self._Erow = jnp.asarray(E)

    # ------------------------------------------------------------------
    def _binning(self, xs, bary_ref, T):
        """Delegates to the shared SubcellBinning (pallas_recurrence)."""
        return self._bin.binning(xs, bary_ref, T)

    def _oneshot_kernel(self, *refs):
        from .pallas_recurrence import emit_slices
        n = self.nslices
        phi_ref, plo_ref = refs[0], refs[1]
        k = 2
        stage_refs = refs[k:k + 3 * self._sd]
        k += 3 * self._sd
        a_refs = refs[k:k + n]
        k += n
        (sa_ref, e_ref, bary_ref, g_ref,
         em_ref) = refs[k], refs[k + 1], refs[k + 2], refs[k + 3], refs[k + 4]
        hi_ref, lo_ref = refs[k + 5], refs[k + 6]

        T = phi_ref.shape[1]
        xs = [FF(phi_ref[i, :].reshape(1, T), plo_ref[i, :].reshape(1, T))
              for i in range(self._sd)]
        masks, recips = self._binning(xs, bary_ref[:], T)
        slices, sB = emit_slices(self._sd, self._rec_deg, self._scale, n,
                                 phi_ref, plo_ref, stage_refs,
                                 [st[3] for st in self.stages],
                                 wdtype=self.wdtype)
        # MXU one-hot B assembly (exact: each G/E row selects one value)
        # -- the piecewise 21-concat x nslices form measured 0.42 ms of
        # the 0.88 ms c1 kernel in VMEM relayout copies
        Mk = jnp.concatenate(masks, axis=0)
        if self.wdtype == "int8":
            m_exp = jnp.dot(em_ref[:], Mk.astype(jnp.int8),
                            preferred_element_type=jnp.int32)
            b_vals = []
            for s in slices:
                s_exp = jnp.dot(g_ref[:], s,
                                preferred_element_type=jnp.int32
                                ).astype(jnp.int8)
                b_vals.append(jnp.where(m_exp != 0, s_exp,
                                        jnp.zeros_like(s_exp)))
        else:
            m_exp = jnp.dot(em_ref[:], Mk.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
            b_vals = [m_exp * jnp.dot(g_ref[:], s,
                                      preferred_element_type=jnp.float32
                                      ).astype(jnp.bfloat16)
                      for s in slices]
        s, e = self._combine_core([a[:] for a in a_refs], b_vals)
        if self._n_nonuni:
            # exact one-hot selection of each row's program reciprocal
            Rh = jnp.concatenate([r.hi for r in recips if r is not None]
                                 + [jnp.ones((1, T), jnp.float32)], axis=0)
            Rl = jnp.concatenate([r.lo for r in recips if r is not None]
                                 + [jnp.zeros((1, T), jnp.float32)], axis=0)
            rh = jnp.dot(e_ref[:], Rh, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            rl = jnp.dot(e_ref[:], Rl, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            s, e = ff_mul(FF(s, e), FF(rh, rl))
        scale = sa_ref[:] * sB                    # pow2 * pow2: exact
        hi_ref[:] = s * scale
        lo_ref[:] = e * scale

    # ------------------------------------------------------------------
    def apply_pair_points(self, points, trim=True):
        """(hi, lo) pair of recip-applied macro tables straight from f64
        points: masks + parent recurrence + dots in ONE kernel."""
        npts = points.shape[0]
        T = self.point_tile
        tpad = -(-npts // T) * T
        pad = tpad - npts
        # the only f64 arithmetic: one subtract for the pair split
        hi = points.astype(jnp.float32)
        lo = ((points - hi.astype(jnp.float64)).astype(jnp.float32)
              if points.dtype == jnp.float64 else jnp.zeros_like(hi))
        hi = jnp.pad(hi, ((0, pad), (0, 0))).T    # (sd, tpad)
        lo = jnp.pad(lo, ((0, pad), (0, 0))).T

        Rb = self.row_block
        grid = (self.rpad // Rb, tpad // T)

        pts_spec = pl.BlockSpec((self._sd, T), lambda r, t: (r * 0, t),
                                memory_space=pltpu.VMEM)
        full = lambda arr: pl.BlockSpec(arr.shape, lambda r, t: tuple(
            r * 0 for _ in arr.shape), memory_space=pltpu.VMEM)
        in_specs = [pts_spec, pts_spec]
        operands = [hi, lo]
        for pk, P, norms, _need in self.stages:
            for arr in (pk, P, norms):
                in_specs.append(full(arr))
                operands.append(jnp.asarray(arr))
        a_spec = pl.BlockSpec((Rb, self.K), lambda r, t: (r, t * 0),
                              memory_space=pltpu.VMEM)
        sa_spec = pl.BlockSpec((Rb, 1), lambda r, t: (r, t * 0),
                               memory_space=pltpu.VMEM)
        e_spec = pl.BlockSpec((Rb, self._Erow.shape[1]),
                              lambda r, t: (r, t * 0),
                              memory_space=pltpu.VMEM)
        in_specs += [a_spec] * self.nslices + [sa_spec, e_spec,
                                               full(self._bary_pack),
                                               full(self._G), full(self._E)]
        operands += [*self.A_slices, self.sA, self._Erow, self._bary_pack,
                     self._G, self._E]
        out_spec = pl.BlockSpec((Rb, T), lambda r, t: (r, t),
                                memory_space=pltpu.VMEM)

        npairs = sum(len(idx) for idx in self.batches)
        hi_o, lo_o = pl.pallas_call(
            self._oneshot_kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((self.rpad, tpad), jnp.float32),
                       jax.ShapeDtypeStruct((self.rpad, tpad), jnp.float32)),
            interpret=self.interpret,
            cost_estimate=pl.CostEstimate(
                flops=(2 * self.rpad * tpad * self.K * npairs
                       + 400 * (self.max_nexp + len(self.pieces))
                       * tpad * grid[0]),
                bytes_accessed=8 * self._sd * tpad * grid[0]
                + (1 if self.wdtype == "int8" else 2)
                * self.rpad * self.K * self.nslices
                + 8 * self.rpad * tpad,
                transcendentals=0,
            ),
        )(*operands)
        if not trim:
            return hi_o, lo_o
        return hi_o[:self.rows, :npts], lo_o[:self.rows, :npts]


def _plan_buckets(widths_rows, nalpha, order, nslices, align,
                  wdtype="bf16"):
    """Contiguous partition of the distinct contraction widths
    minimizing total padded-rows x contraction-columns MXU work (plus a
    per-kernel fixed cost).  ``widths_rows``: {K: row count}.  Returns
    the list of bucket K caps, ascending."""
    ws = sorted(widths_rows)

    def ncols(K):
        cols = 0
        for t in range(order + 1):
            c = min(t + 1, nslices) * K
            if wdtype == "int8":
                cols += c / 2           # s8 dots run at 2x; no chunking
            else:
                cols += c + 128 * (-(-c // 256) - 1)  # chunk-split penalty
        return cols

    def rpad(rows):
        tall = nalpha * (-(-rows // align) * align)
        nblocks = max(1, -(-tall // 512))
        return nblocks * max(128, -(-(-(-tall // nblocks)) // 128) * 128)

    fixed = 128 * ncols(ws[-1])
    best = {0: (0.0, [])}           # prefix length -> (cost, K caps)
    for j in range(1, len(ws) + 1):
        options = []
        for i in range(j):
            rows = sum(widths_rows[w] for w in ws[i:j])
            cost = best[i][0] + rpad(rows) * ncols(ws[j - 1]) + fixed
            options.append((cost, best[i][1] + [ws[j - 1]]))
        best[j] = min(options)
    return best[len(ws)][1]


class _Bucket:
    """One fused kernel covering the zoo rows whose contraction width
    fits ``K``: the tall per-alpha change-of-basis blocks, the member
    element row ranges, and the row padding bookkeeping."""

    def __init__(self, K, gslices, mats, alphas, align, interpret, kw,
                 post=None):
        """``post``: optional (nexp, K) change of FEATURE basis folded
        into the A rows in longdouble (the Bernstein path: A' = A @ M
        so the kernel contracts Bernstein features instead of the
        Dubiner tabulation)."""
        self.K = K
        self.gslices = gslices          # [(element index, glo, ghi)]
        self.rows = sum(ghi - glo for _, glo, ghi in gslices)
        self.block_rows = -(-self.rows // align) * align
        pad = ((0, self.block_rows - self.rows), (0, 0))
        parts = []
        for a in alphas:
            rows = np.vstack([mats[a][glo:ghi]
                              for (_, glo, ghi) in gslices])
            if post is not None:
                rows = np.asarray(rows.astype(np.longdouble)
                                  @ post.astype(np.longdouble), np.float64)
            dropped = rows[:, K:]
            if dropped.size:
                limit = 1e-8 * (np.abs(rows).max() + 1.0)
                assert np.abs(dropped).max() <= limit, \
                    "bucket truncation would drop real coefficients"
            parts.append(np.pad(rows, pad)[:, :K])
        self.fm = FusedMultiwordMatmul(np.vstack(parts),
                                       interpret=interpret, **kw)

    def split(self, hi, lo, alphas):
        """Aligned per-alpha (hi, lo) views of the padded kernel out."""
        r = self.block_rows
        return {a: (hi[k * r:(k + 1) * r], lo[k * r:(k + 1) * r])
                for k, a in enumerate(alphas)}


class FusedZooTabulator:
    """The f64 accuracy path of a BatchedTabulator with the multiword
    change of basis fused in Pallas.

    Preferred surface: ``blocks = fz.block_tables(points)`` +
    ``fz.unpack(blocks)`` -- per-source f64 tables (one block per
    degree bucket + one block per macro element) with no fused
    concatenation.  ``fz(points)`` matches ``batched(points)`` (one
    concatenated {alpha: (rows, npts)} array, f64) at the cost of an
    extra HBM round-trip per table; ``fz.pair_tables(points)`` returns
    exact (hi, lo) f32 pairs, skipping the final f64 promotion for
    pair-aware consumers.

    Rows are BUCKETED by contraction width: a degree-d element's
    change-of-basis rows only touch the degree-d morton prefix of the
    expansion basis, so low-degree zoo members contract against K =
    nexp(d) columns instead of the full nexp(max degree) -- for the
    mixed-degree full zoo that cuts the MXU work ~2.5x.  Every bucket
    kernel consumes the SAME slice-recurrence output (row prefixes of
    the bf16 slices share the per-point column scale).

    Macro side programs (split-complex expansions) run through their
    own fused kernels: the masked parent tabulation rides the
    slice-recurrence kernel with {0,1} masks applied in bf16 slice
    space, and their tall change-of-basis GEMM is a further
    FusedMultiwordMatmul, so no emulated-f64 GEMM remains."""

    #: per-alpha row blocks are padded to this multiple so the _split
    #: slices start sublane-aligned (an unaligned-offset row slice of
    #: the kernel output costs a shifted copy on TPU)
    ROW_ALIGN = 8

    def __init__(self, batched, interpret=False, features="auto", **kw):
        """``features``: 'bernstein' swaps the B operand to the
        Bernstein feature kernel when the zoo is a single full-width
        bucket with no macro programs (see pallas_bernstein.py --
        measured SLOWER than the recurrence on v5e, kept as an
        independently-derived accuracy cross-check); 'auto'/'dubiner'
        (default) keep the slice recurrence everywhere."""
        self.batched = batched
        self.sd = batched.sd
        self.rows = batched.stacked.shape[0]
        if batched.alpha_mats:
            self.alphas = batched._alpha_order
            mats = batched.alpha_mats
        else:
            self.alphas = [(0,) * self.sd]
            mats = {self.alphas[0]: batched.stacked}
        nexp_full = batched.stacked.shape[1]

        # ---- degree buckets ------------------------------------------
        # per plain element: its global row range and contraction width
        plain_nexp = getattr(batched, "plain_nexp", None)
        if plain_nexp is None:       # widths unknown: one full bucket
            specials = {i for i, _ in batched.special}
            plain_nexp = {i: nexp_full
                          for i in range(len(batched.elements))
                          if i not in specials}
        entries = [(i, lo, hi, plain_nexp[i])
                   for i, (lo, hi, _shape) in enumerate(batched.slices)
                   if i in plain_nexp]
        widths_rows = {}
        for _, lo, hi, w in entries:
            widths_rows[w] = widths_rows.get(w, 0) + (hi - lo)
        # window dtype: 'auto' picks int8 for wide contractions, where
        # the s8 MXU's 2x rate dominates (measured on v5e: tet deg 8,
        # K=165: 5.14 -> 4.09 ms; but the K=66 full triangle zoo is
        # pair-write bound and the int8 scheme's extra groups cost 4%),
        # and bf16 for narrow ones.  128 = the MXU tile edge.
        self.wdtype = kw.pop("wdtype", "auto")
        if self.wdtype == "auto":
            max_k = max(widths_rows) if widths_rows else 0
            self.wdtype = "int8" if max_k >= 128 else "bf16"
        kw["wdtype"] = self.wdtype
        _, plan_nsl, plan_ord = resolve_scheme(self.wdtype,
                                               kw.get("nslices"),
                                               kw.get("order"))
        caps = _plan_buckets(widths_rows, len(self.alphas),
                             plan_ord, plan_nsl, self.ROW_ALIGN,
                             self.wdtype)

        self.buckets = []
        self._plain_loc = {}            # element index -> (bucket, lo, hi)
        lo_cap = 0
        for pos, cap in enumerate(caps):
            gslices, cursor = [], 0
            for i, lo, hi, w in entries:
                if lo_cap < w <= cap:
                    gslices.append((i, lo, hi))
                    self._plain_loc[i] = (pos, cursor, cursor + hi - lo)
                    cursor += hi - lo
            self.buckets.append(_Bucket(cap, gslices, mats, self.alphas,
                                        self.ROW_ALIGN, interpret, kw))
            lo_cap = cap
        self.fm = self.buckets[-1].fm
        # eager: the EFT-safety probe jit-compiles, so it cannot run
        # while the fused pipeline itself is being traced
        from .doublefloat import supports_ff
        self._ff_ok = supports_ff(batched.target_es)
        # fused Pallas recurrence+slice kernel for the B operand (the
        # XLA df32 recurrence graph runs ~5x below VPU speed; the
        # in-VMEM kernel also keeps the (hi, lo) pair out of HBM)
        self._slice_rec = None
        self._bern = None
        if self._ff_ok and not interpret:
            from .pallas_recurrence import PallasSliceRecurrence
            try:
                self._slice_rec = PallasSliceRecurrence(
                    batched.target_es, batched.max_degree,
                    nslices=self.fm.nslices, wdtype=self.wdtype)
            except NotImplementedError:
                pass
        # Bernstein feature path for single-bucket zoos (OPT-IN: pass
        # features="bernstein").  The degree buckets need the Dubiner
        # basis's graded prefixes, but a zoo with ONE full-width bucket
        # and no macro side programs can contract Bernstein features
        # instead, with the basis conversion folded into A on the host
        # (ops/pallas_bernstein.py).  Kept opt-in after measurement:
        # despite ~10x less nominal arithmetic, every vectorized
        # formulation of the feature kernel lost to the recurrence on
        # v5e (1.5 ms recurrence vs 2.8-6.4 ms across three kernel
        # designs at tet degree 8 / 1e5 pts) -- the VPU cost there is
        # sublane-broadcast relayouts and per-op materialisation, not
        # flops.  Parity through this path measures 2.9e-11 (<= the
        # 1e-10 budget; the Dubiner path gives 6.4e-12).
        if (features == "bernstein" and not interpret
                and self.wdtype == "bf16"
                and self._ff_ok and len(self.buckets) == 1
                and not batched.special
                and self.buckets[0].K == nexp_full):
            try:
                from .pallas_bernstein import (PallasBernsteinFeatures,
                                               bernstein_conversion)
                feat = PallasBernsteinFeatures(
                    batched.target_es, batched.max_degree,
                    nslices=self.fm.nslices)
            except NotImplementedError:
                feat = None
            if feat is not None:
                M = np.asarray(bernstein_conversion(
                    batched.target_es, batched.max_degree), np.float64)
                b0 = self.buckets[0]
                # same gslices/row order: _plain_loc stays valid
                self.buckets = [_Bucket(b0.K, b0.gslices, mats,
                                        self.alphas, self.ROW_ALIGN,
                                        interpret, kw, post=M)]
                self.fm = self.buckets[0].fm
                self._bern = feat
                self._slice_rec = feat      # same (slices, sB) contract
        # one fused kernel per macro side program (the tall GEMM there was
        # the emulated-f64 bottleneck of the macro zoo: native dot by
        # default, or the XLA multiword variant at +190 s compile)
        self.macro_fms = []
        for prog in getattr(batched, "macro_programs", None) or ():
            fm = FusedMultiwordMatmul(prog.tall, interpret=interpret,
                                      wdtype=self.wdtype)
            ff_ok = supports_ff(prog.parent_es)
            rec = None
            if ff_ok and not interpret:
                from .pallas_recurrence import PallasSliceRecurrence
                try:
                    rec = PallasSliceRecurrence(prog.parent_es, prog.degree,
                                                nslices=fm.nslices,
                                                wdtype=self.wdtype)
                except NotImplementedError:
                    pass
            self.macro_fms.append((fm, ff_ok, rec))
        self._build_macro_merged(batched, interpret, kw)
        self._jit_pairs = jax.jit(self._pairs)
        self._jit_f64 = jax.jit(self._f64)
        self._jit_blocks = jax.jit(self._f64_blocks)
        self._jit_pair_blocks = jax.jit(self._pair_blocks)

    def _build_macro_merged(self, batched, interpret, kw):
        """Merge ALL macro side programs into ONE masked fused kernel
        riding the zoo's shared slice recurrence: the per-program
        pipelines (own parent recurrence + HBM-materialised masked B +
        own kernel launch) dominated the macro zoos (measured 3.2 of
        3.8 ms on the C1 zoo); the merged kernel reads the shared
        prefix slices + one {0,1} mask matrix and assembles B in VMEM.

        A macro program's parent basis rows are the leading
        nexp(degree_p) rows of the shared recurrence output (same
        hierarchical Dubiner basis, same per-point column scale) --
        exactly the prefix property the degree buckets already use."""
        self.macro_merged = None
        self.macro_oneshot = None
        self._macro_rec = None
        progs = getattr(batched, "macro_programs", None) or ()
        if not progs:
            return
        t_es = batched.target_es
        ok = all(type(p.parent_es) is type(t_es)
                 and p.parent_es.variant is None
                 and p.es.ref_el.get_parent() == batched.ref_el
                 for p in progs)
        if not ok:
            return
        rec_deg = max(p.degree for p in progs)
        # degree-dependent normalisation (the degree-0 "exactly 1"
        # quirk) would break prefix reuse across scales
        if float(np.asarray(t_es.get_scale(rec_deg))) != float(
                np.asarray(t_es.get_scale(batched.max_degree))):
            return
        rows_t = sum(p.tall.shape[0] for p in progs)
        K_t = sum(p.K for p in progs)
        # the merged kernel picks its OWN window dtype: its contraction
        # width K_t (sum of per-piece parent widths) usually crosses the
        # int8 threshold even when the plain buckets are narrow, and the
        # kernel is MXU-bound (21 bf16 pair-dots at order 5), so the s8
        # MXU's 2x rate pays here regardless of the zoo-wide choice.
        # A dtype differing from the zoo's requires a DEDICATED
        # recurrence (the shared slices carry the zoo scheme's windows).
        macro_wdt = "int8" if K_t >= 128 else self.wdtype
        # a DEDICATED low-degree recurrence when the zoo's plain degree
        # exceeds the macro degree: the shared per-point column scale is
        # max|phi| over ALL rows, so quantising a degree-1 macro basis
        # at a degree-10 zoo's scale costs ~2.5 digits (measured on
        # Johnson-Mercier: 1.4e-13 -> 5.2e-11); the small recurrence is
        # ~0.1 ms and keeps the macro pair budget at its own scale
        if rec_deg != batched.max_degree or macro_wdt != self.wdtype:
            from .doublefloat import supports_ff
            from .pallas_recurrence import PallasSliceRecurrence
            ok_ff = supports_ff(t_es) and not interpret
            if ok_ff:
                # resolve with the caller's kw overrides so the
                # dedicated recurrence emits exactly the slice count
                # the merged kernel (built from the same kw below)
                # expects -- a bare resolve here desynchronises them
                # when the caller passes nslices/order explicitly
                _, nsl, _ = resolve_scheme(macro_wdt, kw.get("nslices"),
                                           kw.get("order"))
                try:
                    self._macro_rec = PallasSliceRecurrence(
                        t_es, rec_deg, nslices=nsl, wdtype=macro_wdt)
                except NotImplementedError:
                    self._macro_rec = None
            if self._macro_rec is None:
                if rec_deg != batched.max_degree:
                    return
                macro_wdt = self.wdtype     # shared slices, zoo scheme
        A = np.zeros((rows_t, K_t))
        pieces, self._merged_rows = [], []
        r0 = c0 = mrow = 0
        for p in progs:
            ratio = float(np.asarray(p.parent_es.get_scale(p.degree))
                          / np.asarray(t_es.get_scale(rec_deg)))
            A[r0:r0 + p.tall.shape[0], c0:c0 + p.K] = ratio * p.tall
            for _c in p.cells:
                pieces.append((mrow, p.nexp_parent))
                mrow += 1
            self._merged_rows.append((p, r0, r0 + p.tall.shape[0]))
            r0 += p.tall.shape[0]
            c0 += p.K
        self.macro_merged = FusedMaskedMultiword(
            A, pieces, interpret=interpret, **{**kw, "wdtype": macro_wdt})
        self._build_macro_oneshot(batched, A, pieces, t_es, rec_deg,
                                  macro_wdt, interpret, kw)

    def _build_macro_oneshot(self, batched, A, pieces, t_es, rec_deg,
                             macro_wdt, interpret, kw):
        """The ONE-launch macro engine (FusedMacroOneShot): in-kernel
        binning masks + parent recurrence + masked dots + pair-exact
        multiplicity averaging.  Gated on the same preconditions as the
        Pallas slice recurrence (plain single-cell parent, 2x-1 cell
        map) -- the fallback chain (merged masked kernel, per-program
        kernels, traced engine) is unchanged."""
        self.macro_oneshot = None
        if interpret:
            return
        from .doublefloat import supports_ff
        if not supports_ff(t_es):
            return
        if t_es.variant is not None or len(t_es.affine_mappings) != 1:
            return
        A0, b0 = t_es.affine_mappings[0]
        sd = t_es.ref_el.get_spatial_dimension()
        if not (np.allclose(np.asarray(A0), 2.0 * np.eye(sd))
                and np.allclose(np.asarray(b0), -1.0)):
            return
        progs = batched.macro_programs
        geom = []
        for (prog, r0, r1) in self._merged_rows:
            ref = prog.es.ref_el
            top = ref.get_topology()
            assert prog.cells == sorted(top[sd])
            geom.append({
                "maps": [ref.barycentric_map(entity=(sd, c), rescale=True)
                         for c in prog.cells],
                "unique": (prog.es.continuity is not None
                           and batched.order == 0),
                "rows": (r0, r1),
            })
        parent_map = progs[0].es.ref_el.get_parent().barycentric_map(
            rescale=True)
        scale = float(np.asarray(t_es.get_scale(rec_deg, cell=0)))
        try:
            self.macro_oneshot = FusedMacroOneShot(
                A, pieces, geom, parent_map, sd, rec_deg, scale,
                interpret=interpret, **{**kw, "wdtype": macro_wdt})
        except NotImplementedError:
            self.macro_oneshot = None

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
            wdt = jnp.int8 if self.wdtype == "int8" else jnp.bfloat16
            Bs = [jnp.concatenate(
                [masks[pos].astype(wdt) * s
                 for pos, c in enumerate(prog.cells)], axis=0)
                for s in slices]
            recip = (None if total is None
                     else 1.0 / total.astype(jnp.float64))
            return (Bs, sB), recip

        def body(pts):
            if ff_ok:
                slices, sB = prepare_B_ff(prog.b_stack_ff(pts, b.order), n,
                                          wdtype=self.wdtype)
            else:
                slices, sB = prepare_B(prog.b_stack(pts, b.order), n,
                                       wdtype=self.wdtype)
            out = {f"s{i:02d}": s for i, s in enumerate(slices)}
            out["scale"] = sB
            return out

        prep = _tiled_apply(body, points, b.tile)
        return ([prep[f"s{i:02d}"] for i in range(n)], prep["scale"]), None

    def _specials_merged(self, points, prepared):
        """Per-element macro tables off the ONE merged masked kernel:
        binning masks for every program's complex stack into one {0,1}
        matrix; B assembles in VMEM from the shared slice prefixes."""
        from ..core.expansions import partition_of_unity_masks
        b = self.batched
        if self._macro_rec is not None and points.dtype == jnp.float64:
            slices, sB = self._macro_rec._apply(points)
        else:
            slices, sB = prepared
        mask_rows, recips = [], []
        for p in b.macro_programs:
            unique = p.es.continuity is not None and b.order == 0
            masks, total = partition_of_unity_masks(
                p.es.ref_el, points, unique=unique, raw=True)
            mask_rows.extend(masks[pos] for pos, _c in enumerate(p.cells))
            recips.append(None if total is None
                          else 1.0 / total.astype(jnp.float64))
        M = jnp.stack(mask_rows)
        hi, lo = self.macro_merged.apply_pair_masked(slices, sB, M)
        out = hi.astype(jnp.float64) + lo.astype(jnp.float64)
        per_elem = {}
        for (prog, r0, r1), recip in zip(self._merged_rows, recips):
            o = out[r0:r1]
            if recip is not None:
                # exact rational multiplicity averaging in f64
                o = o * recip
            r = prog.rows
            tabs = {a: o[k * r:(k + 1) * r]
                    for k, a in enumerate(prog.alphas)}
            for idx, lo_, hi_ in prog.row_slices:
                per_elem[idx] = {a: tabs[a][lo_:hi_] for a in self.alphas}
        return {a: [per_elem[i][a] for i, _e in b.special]
                for a in self.alphas}

    def _specials_oneshot(self, points, pairs=False):
        """Per-element macro tables off the ONE-launch kernel (masks +
        recurrence + dots + multiplicity recip all in VMEM).  With
        ``pairs`` the blocks stay exact (hi, lo) f32 pairs (padded
        columns; unpack_pairs trims); otherwise each element's slice is
        promoted to trimmed f64 (promotion runs on the REAL rows only,
        never the padded kernel block)."""
        npts = points.shape[0]
        hi, lo = self.macro_oneshot.apply_pair_points(points, trim=False)
        per_elem = {}
        for (prog, r0, r1) in self._merged_rows:
            r = prog.rows
            tabs = {}
            for k, a in enumerate(prog.alphas):
                tabs[a] = (hi[r0 + k * r:r0 + (k + 1) * r],
                           lo[r0 + k * r:r0 + (k + 1) * r])
            for idx, lo_, hi_ in prog.row_slices:
                d = {}
                for a in self.alphas:
                    h, l = tabs[a]
                    h, l = h[lo_:hi_], l[lo_:hi_]
                    d[a] = ((h, l) if pairs
                            else h[:, :npts].astype(jnp.float64)
                            + l[:, :npts].astype(jnp.float64))
                per_elem[idx] = d
        return {a: [per_elem[i][a] for i, _e in self.batched.special]
                for a in self.alphas}

    def _specials(self, points, prepared=None, pairs=False):
        """Macro side tables {alpha: [blocks]}: one merged masked kernel
        when the programs share the zoo's parent basis (the fast path),
        else each grouped dmats side program runs through its own fused
        multiword kernel; programs without the grouped form fall back
        to the traced per-element engine."""
        b = self.batched
        parts = {a: [] for a in self.alphas}
        if getattr(b, "macro_programs", None):
            if (self.macro_oneshot is not None
                    and points.dtype == jnp.float64):
                return self._specials_oneshot(points, pairs=pairs)
            if self.macro_merged is not None and (
                    (self._macro_rec is not None
                     and points.dtype == jnp.float64)
                    or (prepared is not None
                        and self.macro_merged.wdtype == self.wdtype
                        and prepared[0][0].shape[0]
                        >= self.macro_merged.max_nexp)):
                return self._specials_merged(points, prepared)
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

    def _prepared(self, points):
        """The shared slice tabulation (slices, sB) feeding every bucket
        kernel AND the merged macro kernel."""
        from .doublefloat import prepare_B_ff
        if self._slice_rec is not None and points.dtype == jnp.float64:
            return self._slice_rec._apply(points)
        if self._bern is not None:
            # the bucket A is folded onto the Bernstein basis: every
            # fallback must tabulate Bernstein features, never Dubiner
            return prepare_B(self._bern.xla_f64(points), self.fm.nslices,
                             wdtype=self.wdtype)
        elif self._ff_ok and points.dtype == jnp.float64:
            return prepare_B_ff(self._phi_pair(points), self.fm.nslices,
                                wdtype=self.wdtype)
        return prepare_B(self._phi(points), self.fm.nslices,
                         wdtype=self.wdtype)

    def _padded_pairs(self, points, prepared=None):
        """{alpha: [per-bucket padded (hi, lo)]} off the fused kernels.
        One slice-recurrence pass feeds every bucket: bucket K_b takes
        the leading K_b slice rows (shared per-point column scale)."""
        slices, sB = (self._prepared(points) if prepared is None
                      else prepared)
        out = {a: [] for a in self.alphas}
        for bucket in self.buckets:
            Bp = ([s[:bucket.K] for s in slices], sB)
            hi, lo = bucket.fm.apply_pair(Bp, trim=False)
            for a, pair in bucket.split(hi, lo, self.alphas).items():
                out[a].append(pair)
        return out

    def _plain_f64_blocks(self, points, prepared=None):
        """{alpha: [per-bucket f64 block]}, trimmed; the slice-then-
        convert fuses the trim into the f32->f64 promote, so the padded
        kernel outputs cross HBM exactly once."""
        npts = points.shape[0]
        return {a: [h[:b.rows, :npts].astype(jnp.float64)
                    + l[:b.rows, :npts].astype(jnp.float64)
                    for b, (h, l) in zip(self.buckets, pairs)]
                for a, pairs in self._padded_pairs(points,
                                                   prepared).items()}

    def _gather_plain(self, blocks_a):
        """Per-bucket blocks -> one (plain_rows, npts) array in the
        BatchedTabulator's row order."""
        parts = []
        for i, (lo, hi, _shape) in enumerate(self.batched.slices):
            loc = self._plain_loc.get(i)
            if loc is not None:
                pos, blo, bhi = loc
                parts.append(blocks_a[pos][blo:bhi])
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 \
            else parts[0]

    def _pairs(self, points):
        """{alpha: (hi, lo)} trimmed, in stacked row order."""
        npts = points.shape[0]
        out = {}
        for a, pairs in self._padded_pairs(points, None).items():
            his = [h[:b.rows, :npts] for b, (h, _) in zip(self.buckets,
                                                          pairs)]
            los = [l[:b.rows, :npts] for b, (_, l) in zip(self.buckets,
                                                          pairs)]
            out[a] = (self._gather_plain(his), self._gather_plain(los))
        return out

    def _f64(self, points):
        """Concatenated {alpha: (rows, npts)} matching batched(points)."""
        prepared = self._prepared(points)
        out = {a: self._gather_plain(blocks)
               for a, blocks in self._plain_f64_blocks(points,
                                                       prepared).items()}
        if self.batched.special_progs:
            specials = self._specials(points, prepared)
            out = {a: jnp.concatenate([out[a]] + specials[a], axis=0)
                   for a in out}
        return out

    def _f64_blocks(self, points):
        """{alpha: [bucket_block..., macro_block...]} f64 without any
        concatenate -- a concatenated layout costs a full extra HBM
        round-trip of every table, and consumers (unpack, moments) are
        block-agnostic; the reference likewise emits per-element arrays
        (FIAT/finite_element.py:181), never a fused concatenation."""
        prepared = self._prepared(points)
        out = self._plain_f64_blocks(points, prepared)
        if self.batched.special_progs:
            for a, blocks in self._specials(points, prepared).items():
                out[a].extend(blocks)
        return out

    def _pair_blocks(self, points):
        """{alpha: [bucket (hi, lo) pair..., macro block...]} -- the
        macro blocks are (hi, lo) pairs too on the one-shot path
        (multiplicity recip applied pair-exactly in-kernel), f64
        otherwise.  This is the
        native output representation of the engine: hi + lo equals the
        f64 table exactly to the pair budget, with no extra HBM
        round-trip through an emulated-f64 convert (pairs leave padded;
        ``unpack`` trims).  TPU consumers should prefer this surface:
        f64 arithmetic is emulated on TPU, so a downstream moment or
        interpolation contraction is cheaper on the pair too."""
        prepared = self._prepared(points)
        out = {a: list(pairs)
               for a, pairs in self._padded_pairs(points,
                                                  prepared).items()}
        if self.batched.special_progs:
            for a, blocks in self._specials(points, prepared,
                                            pairs=True).items():
                out[a].extend(blocks)
        return out

    def pair_blocks(self, points):
        return self._jit_pair_blocks(jnp.asarray(points))

    def unpack_pairs(self, pair_blocks, npts):
        """Host-side: per-element {alpha: f64 array} from pair_blocks
        (hi + lo summed in f64, padding trimmed)."""
        nb = len(self.buckets)
        f64_blocks = {}
        for a, blocks in pair_blocks.items():
            conv = []
            for k, blk in enumerate(blocks):
                if k < nb:
                    hi, lo = blk
                    tab = (np.asarray(hi, dtype=np.float64)
                           + np.asarray(lo, dtype=np.float64))
                    conv.append(tab[:self.buckets[k].rows, :npts])
                elif isinstance(blk, tuple):
                    hi, lo = blk        # one-shot macro pair (padded cols)
                    tab = (np.asarray(hi, dtype=np.float64)
                           + np.asarray(lo, dtype=np.float64))
                    conv.append(tab[:, :npts])
                else:
                    conv.append(np.asarray(blk)[:, :npts])
            f64_blocks[a] = conv
        return self.unpack(f64_blocks)

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
        nb = len(self.buckets)
        special_pos = {i: nb + k for k, (i, e) in enumerate(b.special)}
        out = []
        for i, (lo, hi, shape) in enumerate(b.slices):
            elem = {}
            for alpha, blocks in block_tables.items():
                if i in special_pos:
                    tab = blocks[special_pos[i]]
                else:
                    pos, blo, bhi = self._plain_loc[i]
                    tab = blocks[pos][blo:bhi]
                elem[alpha] = tab.reshape(shape + tab.shape[-1:])
            out.append(elem)
        return out

    def pair_tables(self, points):
        return self._jit_pairs(jnp.asarray(points))

    def __call__(self, points):
        return self._jit_f64(jnp.asarray(points))
