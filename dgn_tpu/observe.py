"""Observability: metric stream, throughput counters, profiler, debug checks.

The reference's only observability is print + tqdm wall-clock timing
(reference main_molecules.py:109-126; tensorboardX is imported in
main_HIV.py:16 but never instantiated — SURVEY.md §5).  This module provides
the TPU-native equivalents:

  MetricStream     append-only JSONL of per-step/per-epoch records (loss, lr,
                   edges/s, padding efficiency) — greppable, plottable,
                   crash-safe (line-buffered appends).
  Throughput       edges/s/chip counters over REAL (unpadded) edges, the
                   north-star metric — padding cannot inflate it.
  profile_steps    jax.profiler trace capture around a step fn.
  poison_padding   NaN-poisons padded node/edge lanes of a GraphBatch; any
                   pad leak into a reduction turns the loss NaN immediately
                   (the race-detector analogue for this framework).
  step_fingerprint device-side parameter hash; under multi-host DP, comparing
                   fingerprints across hosts catches silent desync.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .graph import GraphBatch


# ---------------------------------------------------------------- streaming

class MetricStream:
    """Append-only JSONL metric log.  One record per call, timestamped."""

    def __init__(self, path: Optional[str] = None, also_print: bool = False):
        self.path = path
        self.also_print = also_print
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, kind: str, **fields):
        rec = {"t": round(time.time() - self._t0, 3), "kind": kind, **fields}
        line = json.dumps(rec, default=float)
        if self._fh:
            self._fh.write(line + "\n")
        if self.also_print:
            print(line)
        return rec

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


# --------------------------------------------------------------- throughput

class Throughput:
    """edges/s (and nodes/s, graphs/s) over real elements + padding stats."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.edges = 0
        self.nodes = 0
        self.graphs = 0
        self.pad_edges = 0
        self.pad_nodes = 0
        self.steps = 0
        self._t0 = time.perf_counter()

    def add_batch(self, gb: GraphBatch):
        em = np.asarray(gb.edge_mask)
        nm = np.asarray(gb.node_mask)
        gm = np.asarray(gb.graph_mask)
        self.edges += int(em.sum())
        self.nodes += int(nm.sum())
        self.graphs += int(gm.sum())
        self.pad_edges += int(em.size - em.sum())
        self.pad_nodes += int(nm.size - nm.sum())
        self.steps += 1

    def result(self) -> Dict[str, float]:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        tot_e = self.edges + self.pad_edges
        tot_n = self.nodes + self.pad_nodes
        return {
            "seconds": dt,
            "steps": self.steps,
            "edges_per_s": self.edges / dt,
            "nodes_per_s": self.nodes / dt,
            "graphs_per_s": self.graphs / dt,
            "edge_padding_efficiency": self.edges / tot_e if tot_e else 1.0,
            "node_padding_efficiency": self.nodes / tot_n if tot_n else 1.0,
        }


# ----------------------------------------------------------------- profiler

def profile_steps(step_fn, n_steps: int, trace_dir: str, *args, **kwargs):
    """Capture a jax.profiler trace of n_steps invocations of step_fn.

    Returns the last step's outputs.  View with tensorboard or xprof on the
    written trace_dir.
    """
    os.makedirs(trace_dir, exist_ok=True)
    out = None
    with jax.profiler.trace(trace_dir):
        for _ in range(n_steps):
            out = step_fn(*args, **kwargs)
        out = jax.block_until_ready(out)
    return out


# -------------------------------------------------------------- debug tools

def poison_padding(gb: GraphBatch) -> GraphBatch:
    """NaN every padded node/edge feature lane.

    A correct pipeline is padding-oblivious: all padded lanes are masked out
    of every reduction, so training on a poisoned batch must produce the
    same (finite) numbers.  If any output turns NaN, a pad value leaked into
    a reduction (SURVEY.md §5 'race detection' analogue).  Note int feature
    arrays can't hold NaN; their pad lanes are set to 0 (still exercised via
    the masks).
    """
    nan = float("nan")

    def poison(arr, mask, axis_rows):
        if arr is None:
            return None
        if not jnp.issubdtype(arr.dtype, jnp.floating):
            return arr
        m = mask
        while m.ndim < arr.ndim:
            m = m[..., None]
        return jnp.where(m, arr, nan)

    return dataclasses.replace(
        gb,
        eig=poison(gb.eig, gb.node_mask, 0),
        snorm_n=poison(gb.snorm_n, gb.node_mask, 0),
        snorm_e=poison(gb.snorm_e, gb.edge_mask, 0),
        node_feat=poison(gb.node_feat, gb.node_mask, 0),
        edge_feat=poison(gb.edge_feat, gb.edge_mask, 0),
        pos_enc=poison(gb.pos_enc, gb.node_mask, 0),
    )


def step_fingerprint(params) -> int:
    """ORDER-SENSITIVE fingerprint of a parameter pytree (FNV-1a-style mix).

    Multi-host runs log this per step; diverging fingerprints across hosts
    expose silent desync (SURVEY.md §5).  A plain sum of words would be
    permutation- and swap-invariant — blind to exactly the leaf-ordering /
    element-transposition desyncs this exists to catch — so every word is
    mixed with a position-dependent multiplicative hash before combining,
    and each leaf's contribution is further keyed by its flattened position.
    """
    PRIME = jnp.uint32(16777619)
    total = jnp.zeros((), jnp.uint32)
    for li, leaf in enumerate(jax.tree_util.tree_leaves(params)):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            bits = jax.lax.bitcast_convert_type(
                leaf.astype(jnp.float32), jnp.uint32)
        else:
            bits = leaf.astype(jnp.uint32)
        bits = bits.reshape(-1)
        # each element is scaled by a distinct ODD multiplier derived from
        # its (leaf, element) position, so swapping elements x, y at i, j
        # shifts the sum by (x - y)(m_i - m_j) != 0 — XOR-with-index mixes
        # are too weak here ((x ^ 1) == x + 1 for even bit patterns)
        idx = (jax.lax.iota(jnp.uint32, bits.shape[0])
               + jnp.uint32((li * 2654435761) & 0xFFFFFFFF))
        mult = (idx * jnp.uint32(2654435761)
                + jnp.uint32(2246822519)) | jnp.uint32(1)
        total = (total * PRIME) ^ jnp.sum(bits * mult + mult,
                                          dtype=jnp.uint32)
    return int(total)
