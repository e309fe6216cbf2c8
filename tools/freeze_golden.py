#!/usr/bin/env python3
"""Freeze the parity sweep's reference tabulations to a compressed npz.

Run against a live reference (/root/reference importable); the output
(tests/golden/parity_tables.npz) lets tests/test_parity_sweep.py keep
guarding regressions when the reference is absent (reference pattern:
test/FIAT/regression/test_regression.py:39-78, JSON golden files in a
pinned data repo -- here a single npz keyed "label|alpha").

Usage: python tools/freeze_golden.py [--out PATH]
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (os.path.join(REPO, "shims"), "/root/reference",
          os.path.join(REPO, "tests"), REPO):
    if p not in sys.path:
        sys.path.insert(0, p)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        REPO, "tests", "golden", "parity_tables.npz"))
    args = ap.parse_args()

    import test_parity_sweep as sweep
    assert sweep._have_reference(), "freeze needs the live reference"

    arrays = {}
    frozen = skipped = 0
    for spec in sweep.SPECS:
        label = sweep._label(spec)
        try:
            ref = sweep._ref_build(spec)
        except Exception as exc:
            print(f"skip {label}: {type(exc).__name__}: {exc}")
            skipped += 1
            continue
        dim = ref.get_reference_element().get_spatial_dimension()
        if dim == 0:
            skipped += 1
            continue
        order = 2 if spec[0] in sweep._SECOND_ORDER else 1
        pts = sweep._interior_points(dim, label=label)
        for alpha, tab in ref.tabulate(order, pts).items():
            key = f"{label}|{','.join(map(str, alpha))}"
            arrays[key] = np.asarray(tab, dtype=np.float64)
        frozen += 1

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **arrays)
    size = os.path.getsize(args.out) / 1e6
    print(f"froze {frozen} specs ({skipped} skipped), "
          f"{len(arrays)} tables, {size:.1f} MB -> {args.out}")


if __name__ == "__main__":
    main()
