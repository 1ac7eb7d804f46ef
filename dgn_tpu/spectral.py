"""Host-side Laplacian eigenvector pipeline (one-time precompute + disk cache).

The reference computes per-graph Laplacian eigenvectors on CPU at dataset load
(reference /root/reference/realworld_benchmark/data/molecules.py:100-116,
SBMs.py:110-139, HIV.py:17-46, PCBA.py:23-78) via ARPACK's *nonsymmetric*
driver with loose tolerances (tol up to 0.5!).  We keep the pipeline identity —
Laplacian variant ('none' L=D-A | 'sym' I-D^-1/2 A D^-1/2 | 'walk' I-D^-1 A),
ascending eigenvalue sort, first k eigenvectors INCLUDING the trivial one —
but use the dense symmetric solver `scipy.linalg.eigh`, which is exact,
deterministic, and faster for these tiny graphs (<= a few hundred nodes).
Parity with the reference is therefore defined on identical eigenvector inputs
(BASELINE.md), not on reproducing ARPACK noise.

Results are cached to disk keyed by (adjacency hash, norm, k) so restarts skip
the spectral stage entirely (the reference recomputes every run).
"""
from __future__ import annotations

import hashlib
import os
import pickle
from typing import Optional

import numpy as np
import scipy.linalg
import scipy.sparse as sp


def laplacian(num_nodes: int, src: np.ndarray, dst: np.ndarray,
              norm: str = "none") -> np.ndarray:
    """Dense graph Laplacian from COO edges, matching the reference variants.

    Degrees are clipped at 1 exactly like the reference
    (data/molecules.py:105-113 `in_degrees().clip(1)`).
    """
    n = num_nodes
    A = np.zeros((n, n), dtype=np.float64)
    # adjacency_matrix_scipy gives A[dst, src] summed over multi-edges; the
    # benchmark graphs store both directions so A is symmetric.
    np.add.at(A, (np.asarray(dst, dtype=np.int64), np.asarray(src, dtype=np.int64)), 1.0)
    deg = np.zeros((n,), dtype=np.float64)
    np.add.at(deg, np.asarray(dst, dtype=np.int64), 1.0)
    deg = np.clip(deg, 1.0, None)
    if norm == "none":
        return np.diag(deg) - A
    if norm == "sym":
        d = deg ** -0.5
        return np.eye(n) - (d[:, None] * A) * d[None, :]
    if norm == "walk":
        return np.eye(n) - A / deg[:, None]
    raise ValueError(f"unknown laplacian norm {norm!r}")


def k_lowest_eigvecs(L: np.ndarray, k: int) -> np.ndarray:
    """First k eigenvectors by ascending eigenvalue (incl. the trivial one).

    Symmetric L ('none'/'sym' Laplacians) uses the symmetric dense solver
    (exact, unlike the reference's non-symmetric ARPACK driver with loose
    tolerances, data/molecules.py:114).  The 'walk' Laplacian is genuinely
    non-symmetric, so it takes scipy's general solver, sorts by the real part
    of the eigenvalues, and keeps real parts of the eigenvectors — mirroring
    the reference's `np.real(EigVec)` (data/molecules.py:116).
    """
    n = L.shape[0]
    k = min(k, n)
    if np.allclose(L, L.T, atol=1e-12):
        vals, vecs = scipy.linalg.eigh(L)
    else:
        vals, vecs = scipy.linalg.eig(L)
        order = np.argsort(vals.real)
        vals, vecs = vals[order], vecs[:, order]
        vals, vecs = vals.real, vecs.real
    out = np.real(vecs[:, :k]).astype(np.float32)
    if k < L.shape[0] and out.shape[1] < k:
        out = np.pad(out, ((0, 0), (0, k - out.shape[1])))
    return out


def graph_eig(num_nodes: int, src: np.ndarray, dst: np.ndarray, k: int,
              norm: str = "none") -> np.ndarray:
    """eig features for one graph: [n, k] float32, columns 0..k-1.

    Matches `g.ndata['eig'] = real(EigVec[:, :k])` (data/molecules.py:114-116).
    If the graph has fewer than k nodes, trailing columns are zero-padded.
    """
    L = laplacian(num_nodes, src, dst, norm)
    vecs = k_lowest_eigvecs(L, k)
    if vecs.shape[1] < k:
        vecs = np.pad(vecs, ((0, 0), (0, k - vecs.shape[1])))
    return vecs


class EigCache:
    """Disk cache of per-graph eig features keyed by content hash."""

    def __init__(self, cache_dir: Optional[str] = None):
        self.cache_dir = cache_dir
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)

    @staticmethod
    def _key(num_nodes, src, dst, k, norm) -> str:
        h = hashlib.sha256()
        h.update(np.int64(num_nodes).tobytes())
        h.update(np.asarray(src, dtype=np.int64).tobytes())
        h.update(np.asarray(dst, dtype=np.int64).tobytes())
        h.update(f"{k}:{norm}".encode())
        return h.hexdigest()[:32]

    def get(self, num_nodes, src, dst, k, norm="none") -> np.ndarray:
        if not self.cache_dir:
            return graph_eig(num_nodes, src, dst, k, norm)
        key = self._key(num_nodes, src, dst, k, norm)
        path = os.path.join(self.cache_dir, key + ".npy")
        if os.path.exists(path):
            return np.load(path)
        out = graph_eig(num_nodes, src, dst, k, norm)
        np.save(path, out)
        return out


def add_eig(graphs, k: int, norm: str = "none",
            cache: Optional[EigCache] = None) -> None:
    """Populate .eig on a list of GraphData in place (the `get_eig` stage)."""
    cache = cache or EigCache(None)
    for g in graphs:
        g.eig = cache.get(g.num_nodes, g.src, g.dst, k, norm)


def batch_eig_cache_path(root: str, dataset: str, norm: str, k: int) -> str:
    return os.path.join(root, f"eig_{dataset}_{norm}_{k}")
