#!/usr/bin/env python3
"""Build bench_ref.json — the committed idle-box CPU reference vector.

Usage: make_bench_ref.py OUT ARTIFACT [ARTIFACT...]

Takes the element-wise MIN of the per-query executor-CPU cells
(queries_cpu_warm, falling back to queries_cpu for slow-list-only
artifacts) across the given bench artifacts. Contention only ever
INFLATES CPU time, so the per-query minimum over committed runs is the
best available estimate of the code-true cost — no forensic
subtraction, just min over measurements. Provenance is recorded in the
output so the ref is reproducible from the repo's committed artifacts.
"""
import json
import sys


def main() -> None:
    out, *paths = sys.argv[1:]
    ref: dict[str, float] = {}
    used = []
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        cells = d.get("queries_cpu_warm") or d.get("queries_cpu") or {}
        n = 0
        for q, c in cells.items():
            if not isinstance(c, (int, float)) or c <= 0:
                continue
            if q not in ref or c < ref[q]:
                ref[q] = round(float(c), 3)
            n += 1
        used.append({"path": p, "cells": n})
    art = {
        "kind": "bench_cpu_reference",
        "method": "elementwise min of per-query executor-CPU across artifacts",
        "sources": used,
        "queries_cpu_warm": dict(sorted(ref.items())),
    }
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(f"{out}: {len(ref)} queries from {len(paths)} artifacts")


if __name__ == "__main__":
    main()
