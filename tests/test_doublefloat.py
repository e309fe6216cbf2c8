"""Tests for the double-float (two-f32) arithmetic layer (ops/doublefloat.py).

The host (numpy) paths verify the error-free transformations exactly;
the device paths verify either that the backend passes the EFT-safety
probe and the df32 recurrence reproduces the f64 recurrence, or that
the probe correctly reports the backend unsafe (XLA:CPU contracts
multiplies into FMAs across fusion boundaries) and the tabulators fall
back to the emulated-f64 recurrence.
"""

import numpy as np
import jax
import jax.numpy as jnp

from fiat_tpu.core import cells as cl
from fiat_tpu.core.expansions import ExpansionSet
from fiat_tpu.ops.doublefloat import (FF, eft_safe, ff_add, ff_from_f64,
                                      ff_mul, ff_to_f64, prepare_B_ff,
                                      split32, supports_ff, tabulate_ff,
                                      two_prod, two_sum)

RNG = np.random.default_rng(20)


def test_two_sum_exact_host():
    a = np.float32(RNG.random(200) * 4 - 2)
    b = np.float32(RNG.random(200) * 1e-4)
    s, e = two_sum(a, b)
    exact = a.astype(np.float64) + b.astype(np.float64)
    assert np.all(s.astype(np.float64) + e.astype(np.float64) == exact)


def test_split32_and_two_prod_exact_host():
    a = np.float32(RNG.random(200) * 20 - 10)
    b = np.float32(RNG.random(200) * 6 - 3)
    hi, lo = split32(a)
    assert np.all(hi + lo == a)
    # 12-bit halves: all pairwise products are exact in f32
    p, e = two_prod(a, b)
    exact = a.astype(np.float64) * b.astype(np.float64)
    assert np.all(p.astype(np.float64) + e.astype(np.float64) == exact)


def test_ff_add_cancellation_host():
    # the sloppy double-single add loses its compensation exactly here
    x = ff_from_f64(np.array([1.0 + 2**-30, 3.14159]))
    y = ff_from_f64(np.array([-1.0 + 2**-31, -3.141590118408203]))
    r = ff_add(x, y)
    exact = (x.hi.astype(np.float64) + x.lo.astype(np.float64)
             + y.hi.astype(np.float64) + y.lo.astype(np.float64))
    got = r.hi.astype(np.float64) + r.lo.astype(np.float64)
    assert np.abs(got - exact).max() < 1e-16


def test_ff_mul_accuracy_host():
    x = ff_from_f64(RNG.random(500) * 7 - 3.5)
    y = ff_from_f64(RNG.random(500) * 2 - 1)
    r = ff_mul(x, y)
    exact = ((x.hi.astype(np.float64) + x.lo.astype(np.float64))
             * (y.hi.astype(np.float64) + y.lo.astype(np.float64)))
    got = r.hi.astype(np.float64) + r.lo.astype(np.float64)
    rel = np.abs(got - exact).max() / np.abs(exact).max()
    assert rel < 1e-13


def test_probe_gates_device_path():
    """On EFT-safe backends the df32 recurrence must match the f64 one;
    on unsafe backends supports_ff must say so (the tabulators then use
    the emulated-f64 recurrence, covered by test_device_ops)."""
    es = ExpansionSet(cl.ufc_simplex(2))
    if not eft_safe():
        assert not supports_ff(es)
        return
    assert supports_ff(es)
    pts = RNG.random((1500, 2)) / 2
    ref = np.asarray(es.tabulate(10, pts))
    ffr = jax.jit(lambda p: tabulate_ff(es, 10, p))(jnp.asarray(pts))
    err = np.abs(np.asarray(ff_to_f64(ffr)) - ref).max()
    assert err < 1e-11

    slices, sB = jax.jit(lambda p: prepare_B_ff(tabulate_ff(es, 10, p)))(
        jnp.asarray(pts))
    recon = sum(np.asarray(s, np.float64) for s in slices) \
        * np.asarray(sB, np.float64)
    assert np.abs(recon - ref).max() < 1e-11


def test_ff_from_f64_roundtrip_host():
    # two f32 words carry ~48 significant bits of an arbitrary f64
    x = RNG.random(300) * 100 - 50
    p = ff_from_f64(x)
    rel = np.abs((p.hi.astype(np.float64) + p.lo.astype(np.float64)) - x) \
        / np.abs(x)
    assert rel.max() < 2.0 ** -46
