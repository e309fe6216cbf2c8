"""Pallas fused tabulation kernel (f32 throughput path).

The XLA path (ops/tabulate.py) materialises the orthonormal expansion
table Phi [nexp, npts] in HBM between the Dubiner recurrence (VPU) and
the nodal change-of-basis matmul (MXU).  This kernel fuses them: per
point tile the recurrence runs entirely in VMEM and the tile of the
fused nodal table comes from one MXU contraction, so the expansion
table never touches HBM and the VPU recurrence of tile i+1 overlaps the
MXU work of tile i through the pipelined grid.

Mosaic-friendly reformulation of the recurrence
(fiat_tpu/core/expansions.py dubiner_tabulate):

* per-stage per-row coefficient vectors are packed host-side into one
  (m_in, 2 + 3(n-1)) array per codimension and passed as kernel inputs
  (Pallas forbids captured array constants);
* the morton gather + normalization `take_rows(big, perm) * norms` is
  replaced by multiplication with a sparse selection matrix S with
  S[r, perm[r]] = norms[r] -- a small dense MXU matmul instead of a
  gather, which Mosaic cannot vectorise.

float32 only (Mosaic has no f64); the f64 accuracy path runs on the
fused multiword kernels (ops/pallas_multiword.py).  Bubble/dual
expansion variants ride the same kernel (the variant recurrence shares
the stage structure; the bubble C0 recovery matrix folds into the
change of basis host-side), and macro (split-complex) zoo members get
an f32 side program: masked parent tabulation + one HIGHEST-precision
MXU contraction.  ``interpret=True`` runs the kernel on CPU for
tests."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.expansions import _c0_matrix, _stage_constants

DEFAULT_TILE = 2048


def _stage_inputs(dim, n, variant=None, dtype=np.float32):
    """Host-packed recurrence data per codimension stage:
    (packed coefficient columns, selection matrix)."""
    stages = []
    for codim in range(dim):
        a1, b1, general, perm, norms = _stage_constants(dim, n, codim,
                                                        variant)
        m_in = a1.shape[0]
        cols = [a1, b1]
        for i in range(2, n + 1):
            a, b, c = general[i]
            cols.extend([a, b, c])
        packed = np.concatenate(cols, axis=1).astype(dtype)
        ncand = (n + 1) * m_in if n >= 1 else m_in
        S = np.zeros((len(perm), ncand), dtype=dtype)
        S[np.arange(len(perm)), perm] = norms[:, 0]
        stages.append((packed, S))
    return stages


class PallasZooTabulator:
    """Fused tabulation of a BatchedTabulator's zoo in float32.

    ``tab = PallasZooTabulator(batched); out = tab(points)`` returns the
    fused table matching ``batched(points)`` to f32 accuracy.  When the
    BatchedTabulator carries derivative matrices (order >= 1, dmats
    path) the kernel emits ALL tables from the same in-VMEM recurrence:
    the per-alpha change-of-basis matrices are stacked row-wise so
    values + derivatives come from one MXU contraction per tile; use
    ``unpack`` to split.  Otherwise returns the (rows, npts) values."""

    def __init__(self, batched, tile=DEFAULT_TILE, interpret=False):
        es = batched.target_es
        if es.variant not in (None, "bubble", "dual") \
                or len(es.affine_mappings) != 1:
            raise NotImplementedError(
                "Pallas path needs a single-cell Dubiner-recurrence basis")
        self.batched = batched
        self.tile = tile
        self.interpret = interpret
        self.sd = batched.sd
        self.degree = batched.max_degree
        A, b = es.affine_mappings[0]
        self.A = np.asarray(A, dtype=np.float64)
        self.b = np.asarray(b, dtype=np.float64)
        self.scale = float(np.asarray(es.get_scale(self.degree)))
        if es.variant == "bubble":
            self.scale = -self.scale
        if batched.alpha_mats:
            self.alphas = list(batched.alpha_mats)
            self.stacked = np.vstack(
                [batched.alpha_mats[a] for a in self.alphas]
            ).astype(np.float32)
        else:
            self.alphas = None
            self.stacked = np.asarray(batched.stacked, dtype=np.float32)
        if es.variant == "bubble":
            # fold the C0 recovery (phi_C0 = C0 @ phi_bubble) into the
            # change of basis: one host-side matmul, no kernel change
            c0 = _c0_matrix(self.sd, self.degree).astype(np.float32)
            self.stacked = self.stacked @ c0
        self.rows, self.nexp = self.stacked.shape
        self.stages = _stage_inputs(self.sd, self.degree, es.variant)
        self._jitted = jax.jit(self._apply)
        self._jit_tables = jax.jit(self._tables)

    def unpack(self, out):
        """{alpha: (zoo_rows, npts)} when derivative tables are fused."""
        if self.alphas is None:
            return {(0,) * self.sd: out}
        r = self.batched.stacked.shape[0]
        return {a: out[i * r:(i + 1) * r]
                for i, a in enumerate(self.alphas)}

    def _macro_tables(self, points):
        """f32 tables of the macro zoo members: masked parent
        tabulation (traced f32 recurrence) + one HIGHEST MXU
        contraction per grouped side program."""
        from ..core.expansions import partition_of_unity_masks
        b = self.batched
        pts32 = points.astype(jnp.float32)
        per_elem = {}
        for prog in getattr(b, "macro_programs", None) or ():
            unique = prog.es.continuity is not None and b.order == 0
            masks, total = partition_of_unity_masks(
                prog.es.ref_el, pts32, unique=unique, raw=True)
            phi = prog.parent_es._tabulate_on_cell(
                prog.degree, pts32, order=0)[(0,) * self.sd]
            B = jnp.concatenate(
                [masks[pos].astype(jnp.float32) * phi
                 for pos, c in enumerate(prog.cells)], axis=0)
            tall = jnp.asarray(prog.tall, dtype=jnp.float32)
            out = jnp.dot(tall, B, precision=jax.lax.Precision.HIGHEST)
            if total is not None:
                out = out / total.astype(jnp.float32)
            r = prog.rows
            tabs = {a: out[k * r:(k + 1) * r]
                    for k, a in enumerate(prog.alphas)}
            for idx, lo, hi in prog.row_slices:
                per_elem[idx] = {a: tabs[a][lo:hi] for a in tabs}
        return per_elem

    def _tables(self, points):
        """{alpha: (rows, npts)} f32 in the BatchedTabulator layout,
        macro members included."""
        fused = self._apply(points)
        out = self.unpack(fused)
        b = self.batched
        if not b.special_progs:
            return out
        per_elem = self._macro_tables(points)
        missing = [i for i, _ in b.special if i not in per_elem]
        for i in missing:    # ungrouped fallback: traced f32 engine
            pos = [k for k, (j, _) in enumerate(b.special) if j == i][0]
            es, deg, flat = b.special_progs[pos]
            base = es._tabulate(deg, points.astype(jnp.float32),
                                order=b.order)
            C = jnp.asarray(flat, dtype=jnp.float32)
            per_elem[i] = {a: C @ base[a] for a in out}
        return {a: jnp.concatenate(
            [out[a]] + [per_elem[i][a] for i, _ in b.special], axis=0)
            for a in out}

    def tables(self, points):
        """Full-zoo f32 tables {alpha: (rows, npts)}; rows follow
        ``batched.slices`` (plain block then macro members)."""
        return self._jit_tables(jnp.asarray(points))

    def _kernel(self, pts_ref, C_ref, *rest):
        stage_refs, out_ref = rest[:-1], rest[-1]
        sd, n = self.sd, self.degree
        # map the tile to the default (-1,1) simplex (A, b as literals)
        vals = []
        for i in range(sd):
            v = jnp.float32(self.b[i])
            for j in range(sd):
                v = v + jnp.float32(self.A[i, j]) * pts_ref[j, :]
            vals.append(v)

        R = jnp.full((1, pts_ref.shape[1]), self.scale, dtype=jnp.float32)
        X = tuple(vals) + (-1.0, -1.0)
        for codim in range(sd):
            x, y, z = X[codim], X[codim + 1], X[codim + 2]
            fb = 0.5 * (y + z)
            fa = x + fb + 1.0
            fc = fb * fb
            pk = stage_refs[2 * codim][:]
            S = stage_refs[2 * codim + 1][:]
            a1 = pk[:, 0:1]
            b1 = pk[:, 1:2]
            levels = [R]
            if n >= 1:
                levels.append((a1 * fa - b1 * fb) * R)
            for i in range(2, n + 1):
                o = 2 + 3 * (i - 2)
                a = pk[:, o:o + 1]
                b = pk[:, o + 1:o + 2]
                c = pk[:, o + 2:o + 3]
                levels.append((a * fa - b * fb) * levels[-1]
                              - (c * fc) * levels[-2])
            big = jnp.concatenate(levels, axis=0)
            # HIGHEST: the MXU's default bf16 passes lose ~3 digits over
            # the p=10 dynamic range; full-f32 passes keep 1e-7
            R = jnp.dot(S, big, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        out_ref[:] = jnp.dot(C_ref[:], R,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)

    def _vmem_tile(self):
        """Largest lane-multiple tile fitting the VMEM budget: the
        (rows, T) output block and (sd, T) input block are double
        buffered by the pipeline; the recurrence's live intermediates
        are ~3 candidate blocks of (n+1)*m_in rows."""
        budget = 6 * 1024 * 1024  # leave headroom under the 16M limit
        m_mid = max(S.shape[1] for _, S in self.stages)
        n = self.degree
        # double-buffered out/in blocks + the recurrence's live arrays
        # (levels list + candidate stack + selected rows)
        per_point = 4 * (2 * self.rows + 2 * self.sd
                         + (n + 3) * m_mid // (n + 1) + 2 * m_mid
                         + self.nexp)
        fixed = 4 * self.rows * self.nexp
        T = (budget - fixed) // per_point
        return max(128, min(self.tile, (T // 128) * 128))

    def _apply(self, points):
        npts = points.shape[0]
        T = min(self._vmem_tile(), max(128, npts))
        ntiles = -(-npts // T)
        pad = ntiles * T - npts
        pts = jnp.pad(points.astype(jnp.float32), ((0, pad), (0, 0))).T

        # index maps return i*0 instead of literal 0: under jax_enable_x64
        # a static 0 traces as i64 and Mosaic rejects the mixed-width
        # (i64, i32) index tuple
        full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (i * 0, i * 0),
                                        memory_space=pltpu.VMEM)
        in_specs = [pl.BlockSpec((self.sd, T), lambda i: (i * 0, i),
                                 memory_space=pltpu.VMEM),
                    full(self.stacked)]
        operands = [pts, jnp.asarray(self.stacked)]
        for packed, S in self.stages:
            in_specs.extend([full(packed), full(S)])
            operands.extend([jnp.asarray(packed), jnp.asarray(S)])

        out = pl.pallas_call(
            self._kernel,
            grid=(ntiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((self.rows, T), lambda i: (i * 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((self.rows, ntiles * T),
                                           jnp.float32),
            interpret=self.interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * self.rows * self.nexp * ntiles * T,
                bytes_accessed=4 * (self.sd + self.rows) * ntiles * T
                + 4 * self.rows * self.nexp,
                transcendentals=0,
            ),
        )(*operands)
        return out[:, :npts]

    def __call__(self, points):
        return self._jitted(jnp.asarray(points))
