"""Sum-factorised moment/interpolation contractions for a fused zoo.

The engine's physical floor for any path that MATERIALISES nodal tables
is the 8 B/value pair write; integral consumers never need the table:

    M[i] = sum_q w_q phi_i(x_q) f(x_q)
         = sum_k C[i, k] * (sum_q psi_k(x_q) w_q f(x_q))

contract the (small, nexp x npts) orthonormal expansion against the
points FIRST, then apply the nodal change of basis to one nexp-vector
-- 2*nexp*npts + 2*rows*nexp flops and no (rows, npts) intermediate.
Associativity here is exactly gem's sum_factorise optimisation
(/root/reference/gem/optimise.py:385) applied to the dual-evaluation
contraction (/root/reference/finat/finiteelementbase.py:245-285); the
reference performs it symbolically, this module by construction.

``fiat_tpu.parallel.sharding`` shards the same contraction over a
device mesh (the point reduction becomes a psum over ICI).
"""

import jax
import jax.numpy as jnp
import numpy as np


def moment_rows(tabulator, points, wf):
    """Fused moments  M[i] = sum_q phi_i(x_q) wf_q  over every basis row
    of a BatchedTabulator's zoo (plain block + macro side programs, in
    the tabulator's row layout).  ``wf`` is the weighted integrand
    w_q * f(x_q), shape (npts,)."""
    base = tabulator._expansion_tables(points)
    sd = points.shape[-1]
    phi = base[(0,) * sd]                       # (nexp, npts)
    stacked = jnp.asarray(tabulator.stacked, dtype=points.dtype)
    parts = [stacked @ (phi @ wf)]
    for es, deg, flat in tabulator.special_progs:
        phi_s = es._tabulate(deg, points, order=0)[(0,) * sd]
        parts.append(jnp.asarray(flat, dtype=points.dtype) @ (phi_s @ wf))
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


_jitted_moment_rows = jax.jit(moment_rows, static_argnums=0)


def zoo_moments(tabulator, points, weights, f_at_pts=None):
    """Moments of a quadrature-weighted field against every basis
    function of the zoo, computed expansion-side (the nodal table is
    never built).  Returns the fused (total_rows,) vector; use
    ``unpack_moments`` for per-element views."""
    points = jnp.asarray(points)
    wf = jnp.asarray(weights)
    if f_at_pts is not None:
        wf = wf * jnp.asarray(f_at_pts)
    return _jitted_moment_rows(tabulator, points, wf)


def unpack_moments(tabulator, fused):
    """Split a fused moment vector into the per-element layout (each
    entry shaped like the element's (ndof, *value_shape))."""
    return [np.asarray(fused[lo:hi]).reshape(shape)
            for lo, hi, shape in tabulator.slices]
