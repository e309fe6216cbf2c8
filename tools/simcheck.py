#!/usr/bin/env python3
"""Token-similarity + line-containment check of repo files vs reference files.

Usage: python tools/simcheck.py repo_file:ref_file [...]
Prints jaccard token-shingle similarity and the fraction of non-trivial
repo lines that appear verbatim in the reference file.
"""
import re
import sys


def tokens(text):
    return re.findall(r"[A-Za-z_]\w*|\d+\.?\d*|[^\sA-Za-z0-9_]", text)


def shingles(toks, k=6):
    return {tuple(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def nontrivial_lines(text):
    out = []
    for line in text.splitlines():
        s = line.strip()
        if len(s) < 10 or s.startswith("#") or s.startswith('"""') or s.startswith("'''"):
            continue
        out.append(s)
    return out


def main():
    for pair in sys.argv[1:]:
        a, b = pair.split(":")
        ta = open(a).read()
        tb = open(b).read()
        sa, sb = shingles(tokens(ta)), shingles(tokens(tb))
        jac = len(sa & sb) / max(1, len(sa | sb))
        la = nontrivial_lines(ta)
        lb = set(nontrivial_lines(tb))
        contain = sum(1 for line in la if line in lb) / max(1, len(la))
        print(f"{a:55s} vs {b:45s} jaccard={jac:.2f} containment={contain:.2%}")


if __name__ == "__main__":
    main()
