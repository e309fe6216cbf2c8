"""Shim for recursivenodes.nodes: only the two private hooks the reference
FIAT uses (reference_element.py:30)."""

from fiat_tpu.core.recursive_nodes import decode_family as _decode_family_impl
from fiat_tpu.core.recursive_nodes import recursive_node


def _decode_family(family):
    return _decode_family_impl(family)


def _recursive(d, n, alpha, family):
    """Barycentric coordinates of the node with multi-index ``alpha`` on the
    d-simplex for 1D family ``family``."""
    return recursive_node(d, n, alpha, family)
