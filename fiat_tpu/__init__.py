"""fiat_tpu: a TPU-native finite element tabulation framework.

A ground-up JAX/XLA rebuild of the capabilities of the FIAT/FInAT/gem
stack: reference cells, quadrature, orthogonal expansion bases, polynomial
sets, dual bases, and the finite element zoo -- with tabulation expressed
as jit-compiled, vmapped, MXU-friendly array programs instead of per-point
numpy loops.

Float64 is enabled at import: element construction (Vandermonde solves,
dual-basis Riesz maps) requires double precision to meet the 1e-10
reproduction tolerance of the reference tables.  Device tabulation can
still be run in lower precision by casting inputs.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

from fiat_tpu.core import cells  # noqa: E402,F401
from fiat_tpu.core.cells import (  # noqa: E402,F401
    ufc_simplex, ufc_cell, default_simplex, symmetric_simplex,
    TensorProductCell, UFCQuadrilateral, UFCHexahedron,
)

__version__ = "0.1.0"
