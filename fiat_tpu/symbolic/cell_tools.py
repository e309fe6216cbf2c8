"""Cell utilities pass-through (parity with finat/cell_tools.py): lets
symbolic-layer clients find the maximal complex without importing the
numeric core directly."""

from ..core.cells import max_complex  # noqa: F401
