"""Bernstein feature tabulation in Pallas: a drop-in B-operand for the
fused multiword engine that replaces the df32 Dubiner recurrence.

The Dubiner slice recurrence (ops/pallas_recurrence.py) is the VPU
bottleneck of single-degree zoos: its per-level ff chains are
sequentially dependent and each codim stage pays an (nexp x ncand)
selection matmul (measured 1.8-2.5 ms of the 5.1 ms order-8 tet config).
Degree-d Bernstein polynomials span the same P_d, and evaluating all
C(d+sd, sd) of them needs only products of barycentric powers:

    B_{abcd} = multinomial(d; a,b,c,d) * l0^a l1^b l2^c l3^d

built here by binary exponentiation over rows (host-packed exponent
bit masks gate ~(sd+1)*log2(degree) vectorized ff multiplies).  The
change of basis (ON Dubiner <- Bernstein) is folded into the engine's
A matrices on the host (longdouble Gram projection, exact to ~1e-13),
so the downstream fused GEMM is unchanged.

MEASURED OUTCOME (v5e, tet degree 8, 1e5 points): the recurrence
kernel runs 1.53 ms; three vectorized formulations of this feature
kernel ran 2.75 ms (one-hot selection matmuls -- Precision.HIGHEST
f32 copy-matmuls), 6.4 ms (per-feature (1, T) rows -- 8x sublane
padding + per-op overhead), and 6.28 ms (this bitmask form -- the
(nexp, 1) x (1, T) broadcast relayouts dominate).  TPU VPU cost here
is layout movement, not arithmetic, and the recurrence's
shrinking-level/MXU-gather hybrid already minimises it.  The path is
therefore OPT-IN (FusedZooTabulator(features="bernstein")): it serves
as an independently-derived accuracy cross-check of the engine
(end-to-end parity 2.9e-11 vs the Dubiner path's 6.4e-12, both inside
the 1e-10 budget) and records the negative result so the experiment
is not repeated.

Bernstein features are not degree-graded, so the engine's width
buckets cannot share one tabulation -- the path serves single-bucket
(single embedded degree) zoos, replacing the recurrence kernel 1:1.
Error amplification through the folded matrix is bounded by the
Bernstein basis conditioning (measured ~6x the Dubiner path at tet
degree 8: |A'| |B| / |A phi| ~ 635 vs 125).

Reference for the substituted computation: the order-0 Dubiner
tabulation feeding FIAT's change of basis (dmats path), i.e.
``/root/reference/FIAT/expansions.py:329-366`` + ``polynomial_set.py``
tabulate; the Bernstein basis itself mirrors
``/root/reference/FIAT/bernstein.py`` (values only, re-derived).
"""

from math import factorial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .multiword import DEFAULT_SLICES
from .doublefloat import FF, ff_mul, split32
from .pallas_recurrence import slice_split_ff


def bernstein_multiindices(sd, degree):
    """Barycentric exponent tuples of the degree-``degree`` Bernstein
    basis on the ``sd``-simplex, in lexicographic order of the leading
    ``sd`` exponents (the module-wide row order)."""
    if sd == 1:
        return [(a, degree - a) for a in range(degree + 1)]
    if sd == 2:
        return [(a, b, degree - a - b)
                for a in range(degree + 1)
                for b in range(degree + 1 - a)]
    if sd == 3:
        return [(a, b, c, degree - a - b - c)
                for a in range(degree + 1)
                for b in range(degree + 1 - a)
                for c in range(degree + 1 - a - b)]
    raise NotImplementedError(f"Bernstein features: sd={sd}")


def multinomial(degree, mi):
    out = factorial(degree)
    for e in mi:
        out //= factorial(e)
    return out


def bernstein_conversion(es, degree):
    """(nexp, nexp) f64 matrix M with ``es.tabulate(degree, X) == M @
    bernstein(X)`` to ~1e-13: longdouble Gram projection of the scaled
    Dubiner basis onto the Bernstein basis (quadrature exact at
    2*degree), with two refinement steps against the Bernstein Gram."""
    from ..core.quadrature import make_quadrature
    ld = np.longdouble
    cell = es.ref_el
    sd = cell.get_spatial_dimension()
    nexp = es.get_num_members(degree)
    mis = bernstein_multiindices(sd, degree)
    assert len(mis) == nexp
    Q = make_quadrature(cell, degree + 1)
    Xq = np.asarray(Q.get_points())
    W = np.asarray(Q.get_weights()).astype(ld)
    B = _bernstein_host(cell, degree, Xq, ld)
    Phi = np.asarray(es.tabulate(degree, Xq)).astype(ld)[:nexp]
    GB = (B * W) @ B.T
    PB = (Phi * W) @ B.T
    GB64 = GB.astype(np.float64)
    M = np.linalg.solve(GB64, PB.astype(np.float64).T).T.astype(ld)
    for _ in range(2):
        R = PB - M @ GB
        M = M + np.linalg.solve(GB64, R.astype(np.float64).T).T
    return M


def _bary_map(cell):
    """Affine x -> barycentric map (A, c): lam = A x + c."""
    verts = np.asarray(cell.get_vertices())
    T = np.linalg.inv(np.vstack([verts.T, np.ones(len(verts))]))
    return T[:, :-1], T[:, -1]


def _bernstein_host(cell, degree, X, dtype=np.float64):
    """(nexp, npts) host Bernstein tabulation (tests + conversion)."""
    sd = cell.get_spatial_dimension()
    A, c = _bary_map(cell)
    lam = (np.asarray(X, dtype) @ A.T.astype(dtype) + c.astype(dtype))
    out = np.empty((len(bernstein_multiindices(sd, degree)), len(X)), dtype)
    for k, mi in enumerate(bernstein_multiindices(sd, degree)):
        row = dtype(multinomial(degree, mi))
        for i, e in enumerate(mi):
            row = row * lam[:, i] ** e
        out[k] = row
    return out


def _pow_table(lam, degree):
    """[lam^0 (None sentinel), lam^1, ..., lam^degree] with the split of
    lam.hi cached across the chain."""
    s = split32(lam.hi)
    p = [None, lam]
    for _ in range(2, degree + 1):
        p.append(ff_mul(p[-1], lam, y_split=s))
    return p


def _group_pack(sd, degree):
    """Host-packed bit masks for the vectorized kernel.

    Every Bernstein feature is ``coef * prod_i lam_i^{e_i(r)}``
    evaluated by BINARY EXPONENTIATION over rows: for coordinate i and
    bit k, the rows whose exponent has that bit multiply in
    lam_i^(2^k).  The per-(i, k) row masks are host-packed {0, 1}
    columns, so the kernel is ~(sd+1) * ceil(log2(degree+1)) vectorized
    (nexp, T) ff multiplies gated by elementwise selects -- no per-row
    scalar ops (8x sublane waste), no one-hot selection matmuls (a
    Precision.HIGHEST f32 copy-matmul costs 6 MXU passes).

    Returns {"bits": (nexp, (sd+1)*nbits) f32 masks, "coef": (nexp, 1)
    f32 exact-integer multinomials, "nbits": per-coordinate bit
    count}."""
    mis = bernstein_multiindices(sd, degree)
    nbits = max(1, int(degree).bit_length())
    cols = []
    for i in range(sd + 1):
        for k in range(nbits):
            cols.append([(mi[i] >> k) & 1 for mi in mis])
    coef = [multinomial(degree, mi) for mi in mis]
    # exact-int coefficients must be exact in f32 (split32's integer
    # masking then makes the ff multiply error-free in the split)
    assert max(coef) < 2 ** 24, "coefficient exceeds exact f32 ints"
    return {"bits": np.asarray(cols, np.float32).T.copy(),
            "coef": np.asarray(coef, np.float32).reshape(-1, 1),
            "nbits": nbits}


def emit_bernstein(sd, degree, hi_ref, lo_ref, bits_ref, coef_ref,
                   nbits):
    """Trace the df32 Bernstein feature evaluation inside a kernel
    body: returns the (nexp, T) FF feature pair in
    ``bernstein_multiindices`` row order.

    ``hi_ref``/``lo_ref``: (sd + 1, T) f32 pair-split BARYCENTRIC
    coordinates (computed outside the kernel in f64: an in-kernel
    ``1 - sum(x)`` would need literal-constant TwoSums, which XLA's
    algebraic simplifier folds away in ``interpret=True`` runs).
    ``bits_ref``: (nexp, (sd+1)*nbits) exponent-bit masks;
    ``coef_ref``: (nexp, 1) exact-integer multinomials."""
    T = hi_ref.shape[1]
    lam = [FF(hi_ref[i, :].reshape(1, T), lo_ref[i, :].reshape(1, T))
           for i in range(sd + 1)]
    # squaring chains lam_i^(2^k), k < nbits
    sq = []
    for l in lam:
        chain = [l]
        for _ in range(1, nbits):
            prev = chain[-1]
            s = split32(prev.hi)
            chain.append(ff_mul(prev, prev, x_split=s, y_split=s))
        sq.append(chain)

    coef = FF(coef_ref[:], jnp.zeros_like(coef_ref[:]))
    acc = None
    col = 0
    for i in range(sd + 1):
        for k in range(nbits):
            m = bits_ref[:, col:col + 1]
            col += 1
            p = sq[i][k]
            # masked factor: rows without the bit multiply by exactly 1
            f = FF(jnp.where(m > 0, p.hi, np.float32(1.0)),
                   jnp.where(m > 0, p.lo, np.float32(0.0)))
            acc = f if acc is None else ff_mul(acc, f)
    return ff_mul(coef, acc)


class PallasBernsteinFeatures:
    """``feat = PallasBernsteinFeatures(es, degree); slices, sB =
    feat._apply(pts)``: the (slices, column scale) contract of
    ``PallasSliceRecurrence``, but tabulating the degree-``degree``
    Bernstein basis; consumers fold ``bernstein_conversion(es, degree)``
    into their A matrices."""

    def __init__(self, es, degree, nslices=DEFAULT_SLICES, tile=None,
                 interpret=False):
        if es.variant is not None or len(es.affine_mappings) != 1:
            raise NotImplementedError(
                "Bernstein features: plain single-cell variant only")
        sd = es.ref_el.get_spatial_dimension()
        if sd not in (1, 2, 3):
            raise NotImplementedError("Bernstein features: sd 1-3")
        self.es = es
        self.sd = sd
        self.degree = degree
        self.nslices = nslices
        self.interpret = interpret
        self.nexp = es.get_num_members(degree)
        assert self.nexp == len(bernstein_multiindices(sd, degree))
        self._bary_A, self._bary_c = _bary_map(es.ref_el)
        try:
            self._pack = _group_pack(sd, degree)   # asserts exact coefs
        except AssertionError as exc:
            raise NotImplementedError(str(exc))
        self._tabs = [self._pack["bits"], self._pack["coef"]]
        self._tile = tile
        self._jitted = jax.jit(self._apply)

    def _kernel(self, hi_ref, lo_ref, bits_ref, coef_ref, *out_refs):
        slice_refs, sB_ref = out_refs[:-1], out_refs[-1]
        feats = emit_bernstein(self.sd, self.degree, hi_ref, lo_ref,
                               bits_ref, coef_ref, self._pack["nbits"])
        slices, sB = slice_split_ff(feats, self.nslices)
        for i in range(self.nslices):
            slice_refs[i][:] = slices[i]
        sB_ref[:] = sB

    def _vmem_tile(self):
        budget = 6 * 1024 * 1024
        per_point = 4 * (2 * 2 * self.nexp       # feature pair + factor
                         + 2 * 4 * (self.degree + 1)) \
            + 2 * self.nslices * self.nexp       # bf16 slice outputs
        T = budget // max(per_point, 1)
        return max(256, min(self._tile or 4096, (T // 128) * 128))

    def _apply(self, points):
        npts = points.shape[0]
        T = min(self._vmem_tile(), max(128, npts))
        ntiles = -(-npts // T)
        pad = ntiles * T - npts
        # barycentric map OUTSIDE the kernel, in f64 (a handful of
        # emulated ops per point; the in-kernel alternative needs
        # literal-constant TwoSums -- see emit_bernstein)
        lam = (points @ jnp.asarray(self._bary_A.T, dtype=points.dtype)
               + jnp.asarray(self._bary_c, dtype=points.dtype))
        if lam.dtype == jnp.float64:
            hi = lam.astype(jnp.float32)
            lo = (lam - hi.astype(jnp.float64)).astype(jnp.float32)
        else:
            hi = lam.astype(jnp.float32)
            lo = jnp.zeros_like(hi)
        hi = jnp.pad(hi, ((0, pad), (0, 0))).T
        lo = jnp.pad(lo, ((0, pad), (0, 0))).T

        pts_spec = pl.BlockSpec((self.sd + 1, T), lambda i: (i * 0, i),
                                memory_space=pltpu.VMEM)
        full = lambda arr: pl.BlockSpec(arr.shape, lambda i: tuple(
            i * 0 for _ in arr.shape), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((self.nexp, T), lambda i: (i * 0, i),
                                memory_space=pltpu.VMEM)
        sB_spec = pl.BlockSpec((1, T), lambda i: (i * 0, i),
                               memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            self._kernel,
            grid=(ntiles,),
            in_specs=[pts_spec, pts_spec] + [full(t) for t in self._tabs],
            out_specs=tuple([out_spec] * self.nslices + [sB_spec]),
            out_shape=tuple(
                [jax.ShapeDtypeStruct((self.nexp, ntiles * T), jnp.bfloat16)]
                * self.nslices
                + [jax.ShapeDtypeStruct((1, ntiles * T), jnp.float32)]),
            interpret=self.interpret,
            cost_estimate=pl.CostEstimate(
                flops=40 * self.nexp * ntiles * T,
                bytes_accessed=8 * self.sd * ntiles * T
                + (2 * self.nslices * self.nexp + 4) * ntiles * T,
                transcendentals=0,
            ),
        )(hi, lo, *[jnp.asarray(t) for t in self._tabs])
        slices = [o[:, :npts] for o in outs[:-1]]
        return slices, outs[-1][:, :npts]

    def __call__(self, points):
        return self._jitted(jnp.asarray(points))

    def xla_f64(self, points):
        """Plain-XLA f64 Bernstein tabulation (nexp, npts): the
        correctness fallback when the Pallas kernel cannot run (non-f64
        points, tracing restrictions); emulated f64 on TPU, native on
        CPU."""
        lam = (points @ jnp.asarray(self._bary_A.T, dtype=points.dtype)
               + jnp.asarray(self._bary_c, dtype=points.dtype))
        pows = []
        for i in range(self.sd + 1):
            col = [jnp.ones_like(lam[:, i])]
            for _ in range(self.degree):
                col.append(col[-1] * lam[:, i])
            pows.append(col)
        rows = []
        for mi in bernstein_multiindices(self.sd, self.degree):
            row = jnp.full_like(lam[:, 0],
                                float(multinomial(self.degree, mi)))
            for i, e in enumerate(mi):
                if e:
                    row = row * pows[i][e]
            rows.append(row)
        return jnp.stack(rows)
