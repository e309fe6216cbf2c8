"""Test-only shim standing in for the external ``recursivenodes`` package
(no network egress in this environment), so that the *reference* FIAT at
/root/reference can be imported as a parity/benchmark oracle.

Backed by fiat_tpu's own implementations of the same published algorithms
(T. Isaac, SISC 2020; Golub-Welsch quadrature).  NOT part of the fiat_tpu
product API.
"""

from . import nodes, quadrature  # noqa: F401
