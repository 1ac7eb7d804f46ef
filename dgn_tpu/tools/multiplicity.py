"""Eigenvalue-multiplicity analysis: how often are direction fields degenerate?

Re-creation of the reference diagnostic (reference
realworld_benchmark/data/multiplicity_eig.py — broken in the snapshot: it
imports a nonexistent data.COLLAB, SURVEY.md §2 #21).  Near-equal low
eigenvalues mean the eigenvector directions are arbitrary within the
degenerate subspace — a known DGN failure mode the augmentations mitigate.

Usage:
  python -m dgn_tpu.tools.multiplicity --dataset ZINC [--first 1 --second 2]
      [--tol 1e-3] [--lap_norm none] [--data_dir ...]

Prints the fraction of graphs whose first/second chosen eigenvalues are
separated by more than tol (higher = fewer degenerate fields), plus a gap
histogram for context (an addition over the reference, which printed only
the fraction).
"""
from __future__ import annotations

import argparse
import json

import numpy as np
import scipy.linalg

from ..config import DataParams
from ..data.datasets import load_dataset
from .. import spectral


def eigvals_of(graph, k: int, norm: str) -> np.ndarray:
    L = spectral.laplacian(graph.num_nodes, graph.src, graph.dst, norm)
    vals = scipy.linalg.eigvalsh(L) if np.allclose(L, L.T) else \
        np.sort(np.real(scipy.linalg.eigvals(L)))
    return vals[:k]


def multiplicity(graphs, first: int = 1, second: int = 2, tol: float = 1e-3,
                 norm: str = "none"):
    """Fraction of graphs with |lambda_first - lambda_second| > tol
    (reference multiplicity_eig.py:30-55) + the gap distribution."""
    k = max(first, second) + 1
    gaps = []
    for g in graphs:
        vals = eigvals_of(g, k, norm)
        if len(vals) <= max(first, second):
            gaps.append(0.0)
            continue
        gaps.append(abs(float(vals[first] - vals[second])))
    gaps = np.asarray(gaps)
    distinct = int((gaps > tol).sum())
    return {
        "fraction_distinct": distinct / len(gaps) if len(gaps) else 1.0,
        "n_distinct": distinct,
        "n_graphs": len(gaps),
        "gap_percentiles": {p: float(np.percentile(gaps, p))
                            for p in (5, 25, 50, 75, 95)} if len(gaps) else {},
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--first", type=int, default=1)
    ap.add_argument("--second", type=int, default=2)
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--lap_norm", default="none")
    ap.add_argument("--data_dir", default="")
    ap.add_argument("--synthetic_size", type=int, default=256)
    args = ap.parse_args(argv)
    ds = load_dataset(args.dataset,
                      DataParams(data_dir=args.data_dir,
                                 lap_norm=args.lap_norm,
                                 synthetic_size=args.synthetic_size))
    graphs = ds.train + ds.val + ds.test
    out = multiplicity(graphs, args.first, args.second, args.tol,
                       args.lap_norm)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
