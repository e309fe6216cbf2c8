"""Variant-string parsing (parity with
/root/reference/FIAT/check_format_variant.py): '"integral(q)"', '"point"',
'"equispaced,Iso(2)"', '"Alfeld"', '"gll"', and quadrature-scheme strings.
"""

import re

CG_VARIANTS = {
    "spectral": "gll",
    "chebyshev": "lgc",
    "equispaced": "equispaced",
    "gll": "gll"}

DG_VARIANTS = {
    "spectral": "gl",
    "chebyshev": "gc",
    "equispaced": "equispaced",
    "equispaced_interior": "equispaced_interior",
    "gll": "gll",
    "gl": "gl"}


def _supported_splits():
    try:
        from .macro import (AlfeldSplit, IsoSplit, PowellSabin12Split,
                            PowellSabinSplit, WorseyFarinSplit)
    except ImportError:  # macro layer not built yet
        return {}
    return {
        "iso": IsoSplit,
        "alfeld": AlfeldSplit,
        "worsey-farin": WorseyFarinSplit,
        "powell-sabin": PowellSabinSplit,
        "powell-sabin(12)": PowellSabin12Split,
    }


def check_format_variant(variant, degree):
    """Parse moment-dual variants: (splitting, 'point'|'integral',
    interpolant degree)."""
    splitting, variant = parse_lagrange_variant(variant, integral=True)
    if variant is None:
        variant = "integral"
    interpolant_degree = None
    match = re.match(r"^integral(?:\((-?\d+)\))?$", variant)
    if match:
        variant = "integral"
        extra, = match.groups()
        interpolant_degree = degree + (int(extra) if extra is not None else 0)
        if interpolant_degree < degree:
            raise ValueError(f"Quadrature degree should be at least {degree}")
    if variant not in {"point", "integral"}:
        raise ValueError(
            'Choose variant="point", variant="integral" or variant="integral(q)"')
    return splitting, variant, interpolant_degree


def parse_lagrange_variant(variant, discontinuous=False, integral=False):
    """Parse a Lagrange variant string into (splitting constructor or None,
    point-family name)."""
    if variant is None:
        variant = "integral" if integral else "equispaced"
    options = variant.replace(" ", "").split(",")
    if len(options) > 2:
        raise ValueError("At most two comma-separated variant options")

    default = "integral" if integral else "spectral"
    if integral:
        supported = {"integral": None, "point": "point"}
    elif discontinuous:
        supported = DG_VARIANTS
    else:
        supported = CG_VARIANTS

    splits = _supported_splits()
    splitting = None
    splitting_args = ()
    call_split = None
    point_variant = supported[default]

    for raw in options:
        opt = raw.lower()
        if opt in splits:
            splitting = splits[opt]
        elif opt.startswith("iso"):
            match = re.match(r"^iso(?:\((\d+)\))?$", opt)
            k, = match.groups()
            call_split = splits["iso"]
            splitting_args = (int(k),)
        elif opt.startswith("integral"):
            point_variant = opt
        elif opt in supported:
            point_variant = supported[opt]
        else:
            raise ValueError(f"Illegal variant option {raw!r}")

    if discontinuous and splitting is not None and point_variant in CG_VARIANTS.values():
        raise ValueError("DG macroelements with DOFs on subcell boundaries "
                         "are not unisolvent.")
    if splitting_args:
        splitting = lambda T: call_split(T, *splitting_args, point_variant or "gll")
    return splitting, point_variant


def parse_quadrature_scheme(ref_el, degree, quad_scheme=None):
    """Build a quadrature rule from a scheme string, possibly with a
    splitting prefix or 'KMV(p)' degree override."""
    from .quadrature_schemes import create_quadrature
    splits = _supported_splits()
    scheme = None
    for opt in (quad_scheme or "").split(","):
        if opt in splits:
            ref_el = splits[opt](ref_el)
        elif opt.startswith("KMV") and opt != "KMV":
            match = re.match(r"^KMV(?:\((\d+)\))?$", opt)
            deg, = match.groups()
            degree = int(deg)
            scheme = "KMV"
        else:
            scheme = opt
    return create_quadrature(ref_el, degree, scheme or "default")
