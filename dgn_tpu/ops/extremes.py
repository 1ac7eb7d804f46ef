"""Scatter-free max/min aggregation over the MXU block layout.

XLA:TPU scatter-max is per-row bound (~2.6 ms forward + ~3.9 ms autodiff
backward on a 168k-edge batch, v5e) and the HIV/PCBA configs
(`aggregators: "mean max min dir1-dx dir1-av"`, reference
realworld_benchmark/configs/molecules_graph_classification_DGN_PCBA.json)
spend ~85% of their step in it (RESULTS.md round 4).  This module computes
BOTH extremes with ZERO scatters either direction by exploiting the block
layout's packing guarantees (graph.py _mxu_edge_arrange):

  * edges come in 128-edge chunks sharing one (src_block, dst_block) pair;
  * within a chunk, edges are sorted by dst, so equal-dst edges form
    CONTIGUOUS runs no longer than the max in-degree.

Forward (per [E, F] edge values x, jointly on [x, -x]):
  1. segmented Hillis-Steele max: `ext_passes` = ceil(log2(max run length))
     masked shift-max passes over the [C, 128, 2F] chunk view — each pass is
     one fused element-wise VPU op, and molecule degrees (<= ~8) need only
     2-3 passes, vs log2(128)=7 for a degree-oblivious scan;
  2. the LAST edge of each within-chunk run now holds that (chunk, dst)'s
     max; route those rows to their dst slot with ONE one-hot matmul
     (HIGHEST precision so routed values are exact f32 — the backward
     compares against them);
  3. combine the per-chunk partials with a chunk-level segment-max
     ([C] rows, ~100x fewer than [E] — off the per-row-bound cliff).

Backward (custom VJP): the tie gradient of scatter-max splits EQUALLY among
argmax edges in both XLA and torch (CLAUDE.md; ReLU makes exact-zero ties
ubiquitous, so this is parity-critical — reference nets/aggregators.py:12-17).
Equal split = eq/count, and under the block layout every piece is a matmul:
gather the achieved max per edge (one-hot matmul, HIGHEST), compare, count
ties with a block scatter-sum (one-hot matmul), gather counts back, divide.
The round-4 equality-routed backward lost on the FLAT layout because the tie
count needed a true scatter; here it does not.

All index/mask operands cross the custom_vjp boundary as float32 arrays
(exact for values < 2^24) because integer primals would need float0
cotangents, and closed-over tracers break custom_vjp under differentiated
shard_maps (the EP trainer) — same convention as ops/mxu.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .mxu import TILE, _onehot, block_scatter_sum

_HI = jax.lax.Precision.HIGHEST


def _gather_rows(table, local_f, chunk_f, precision=None):
    """table[chunk*TILE + local] per edge as one-hot matmuls ([C]-row slice
    gather + [C,128,128]x[C,128,F] einsum); float index arrays (exact)."""
    f = table.shape[-1]
    c = chunk_f.shape[0]
    tb = table.reshape(-1, TILE, f)[chunk_f.astype(jnp.int32)]
    oh = _onehot(local_f.astype(jnp.int32).reshape(c, TILE), table.dtype)
    out = jnp.einsum("cen,cnf->cef", oh, tb, precision=precision,
                     preferred_element_type=table.dtype)
    return out.reshape(c * TILE, f)


def _fwd_impl(passes, nb, num_nodes, x, dl_f, ecd_f, em_f):
    e_pad, f2 = x.shape
    c = e_pad // TILE
    neg = jnp.array(-jnp.inf, x.dtype)
    real = em_f > 0.5
    xr = jnp.where(real[:, None], x, neg).reshape(c, TILE, f2)
    dl = dl_f.reshape(c, TILE)
    rm = real.reshape(c, TILE)

    # 1. segmented inclusive max-scan within chunks (runs are contiguous, so
    #    an equality mask IS the segment mask; shifts never cross chunks)
    for p in range(passes):
        s = 1 << p
        ok = (dl[:, s:] == dl[:, :-s]) & rm[:, s:] & rm[:, :-s]
        same = jnp.pad(ok, ((0, 0), (s, 0)))
        shifted = jnp.pad(xr[:, :-s], ((0, 0), (s, 0), (0, 0)),
                          constant_values=-jnp.inf)
        xr = jnp.maximum(xr, jnp.where(same[:, :, None], shifted, neg))

    # 2. route each run's last row to its dst slot (exactly one per
    #    (chunk, dst) by contiguity).  HIGHEST precision keeps routed f32
    #    values exact on the MXU (DEFAULT would bf16-round them and the
    #    backward equality test would miss).
    nxt = jnp.pad((dl[:, 1:] == dl[:, :-1]) & rm[:, 1:] & rm[:, :-1],
                  ((0, 0), (0, 1)))
    is_last = rm & ~nxt
    route = jnp.where(is_last, dl, float(TILE)).astype(jnp.int32)
    oh = _onehot(route, x.dtype)                       # sentinel -> zero row
    vals = jnp.where(jnp.isfinite(xr), xr, 0.0)        # -inf rows are masked
    part = jnp.einsum("cej,cef->cjf", oh, vals, precision=_HI,
                      preferred_element_type=x.dtype)  # [C, TILE, 2F]
    has = jnp.sum(oh, axis=1) > 0.5                    # [C, TILE]
    part = jnp.where(has[:, :, None], part, neg)

    # 3. cross-chunk combine: [C]-segment max into dst blocks
    ecd = ecd_f.astype(jnp.int32)
    outb = jax.ops.segment_max(part, ecd, nb, indices_are_sorted=True)
    out = jnp.where(jnp.isfinite(outb), outb, 0.0).reshape(nb * TILE, f2)
    return out  # [nb*TILE, 2F] as [max(x) | max(-x)] per node slot


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _extremes(passes, nb, num_nodes, ge, dl_f, ecd_f, em_f):
    x = jnp.concatenate([ge, -ge], axis=1)
    out = _fwd_impl(passes, nb, num_nodes, x, dl_f, ecd_f, em_f)
    f = ge.shape[1]
    return out[:num_nodes, :f], -out[:num_nodes, f:]


def _extremes_fwd(passes, nb, num_nodes, ge, dl_f, ecd_f, em_f):
    x = jnp.concatenate([ge, -ge], axis=1)
    out = _fwd_impl(passes, nb, num_nodes, x, dl_f, ecd_f, em_f)
    f = ge.shape[1]
    return ((out[:num_nodes, :f], -out[:num_nodes, f:]),
            (x, out, dl_f, ecd_f, em_f))


def _extremes_bwd(passes, nb, num_nodes, res, cts):
    x, m_pad, dl_f, ecd_f, em_f = res
    dmx, dmn = cts
    f = dmx.shape[1]
    # cotangent of the joint [max(x) | max(-x)] output (mn = -out[:, f:])
    g_both = jnp.concatenate([dmx, -dmn], axis=1)
    g_pad = jnp.pad(g_both, ((0, nb * TILE - g_both.shape[0]), (0, 0)))
    # achieved max per edge — must be EXACT (it is compared against x), hence
    # the HIGHEST-precision gather; the cotangent gather can round (DEFAULT).
    mg = _gather_rows(m_pad, dl_f, ecd_f, precision=_HI)
    gg = _gather_rows(g_pad, dl_f, ecd_f)
    real = em_f > 0.5
    eq = (x == mg) & real[:, None]
    cnt = block_scatter_sum(eq.astype(x.dtype), dl_f.astype(jnp.int32),
                            ecd_f.astype(jnp.int32), nb)
    cnt_e = _gather_rows(cnt, dl_f, ecd_f)   # integer counts <= 128: exact
    contrib = jnp.where(eq, gg / jnp.maximum(cnt_e, 1.0), 0.0)
    d_ge = contrib[:, :f] - contrib[:, f:]   # x = [ge, -ge]
    return (d_ge, jnp.zeros_like(dl_f), jnp.zeros_like(ecd_f),
            jnp.zeros_like(em_f))


_extremes.defvjp(_extremes_fwd, _extremes_bwd)


def mxu_segment_extremes(values: jax.Array, layout, edge_mask: jax.Array,
                         num_nodes: int):
    """(segment_max, segment_min) of per-edge values by dst, scatter-free.

    values: [E, F] (any per-edge data — decomposed g[src] or pretrans
    messages); layout: ops.mxu.MXULayout; returns ([num_nodes, F],)*2 with 0
    for message-less nodes (DGL zero-fill, like segment.segment_extremes).
    Tie gradients split equally among argmax edges (torch/XLA semantics).
    """
    passes = int(getattr(layout, "ext_passes", 7))
    return _extremes(passes, layout.n_node_blocks, num_nodes,
                     values,
                     layout.local_dst.astype(jnp.float32),
                     layout.edge_chunk_dst.astype(jnp.float32),
                     edge_mask.astype(jnp.float32))
