#!/usr/bin/env python3
"""Tabulate available logreg/count datasets (reference
examples/zellner_logreg/data_tabulate.py, which prints a hardcoded LaTeX
table; here the table is computed from the actual npz files found)."""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from betacores_tpu.data.loaders import load_npz

SEARCH_DIRS = ["/root/reference/examples/data", "data"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--latex", action="store_true")
    ap.add_argument("--dirs", nargs="*", default=SEARCH_DIRS)
    args = ap.parse_args()

    rows = []
    seen = set()
    for d in args.dirs:
        for path in sorted(glob.glob(os.path.join(d, "*.npz"))):
            name = os.path.splitext(os.path.basename(path))[0]
            if name in seen:
                continue
            seen.add(name)
            try:
                X, Y, Xt, Yt = load_npz(path)
            except Exception as e:  # malformed blob in a mirror
                print(f"skip {name}: {e}", file=sys.stderr)
                continue
            pos = int((np.asarray(Yt) > 0).sum()) if len(Yt) else 0
            rows.append([name.upper(), X.shape[1], X.shape[0], len(Yt), pos])

    headers = ["Dataset", "D", "N", "Ntest", "Pos. test data"]
    if args.latex:
        print("\\begin{tabular}{l" + "r" * (len(headers) - 1) + "}")
        print(" & ".join(headers) + " \\\\\\hline")
        for r in rows:
            print(" & ".join(str(c) for c in r) + " \\\\")
        print("\\end{tabular}")
    else:
        widths = [max(len(str(r[i])) for r in rows + [headers]) for i in range(len(headers))]
        fmt = "  ".join(f"{{:<{w}}}" for w in widths)
        print(fmt.format(*headers))
        for r in rows:
            print(fmt.format(*r))


if __name__ == "__main__":
    main()
