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
     max; route those rows to their dst slot with one one-hot matmul, EXACT
     in f32 on the MXU via _exact_einsum (3 DEFAULT passes over a manual
     bf16 triple-split — the backward compares against the routed values);
  3. combine the per-chunk partials into dst blocks with M sequential
     [nb]-row slot gathers + running max (M = pad-chunk-exclusive
     chunks-per-block bound, MXULayout.ext_block_chunks) — ~100x fewer
     indexed rows than [E], off the per-row-bound cliff, and cheaper than
     both a [C]-segment-max (0.84 ms measured) and a 4D slot gather (which
     XLA fused into a 17.5 GB intermediate).

Backward (custom VJP): the tie gradient of scatter-max splits EQUALLY among
argmax edges in both XLA and torch (CLAUDE.md; ReLU makes exact-zero ties
ubiquitous, so this is parity-critical — reference nets/aggregators.py:12-17).
Equal split = eq/count, and under the block layout every piece is a matmul:
exact-gather the achieved max per edge, compare, count ties with a block
scatter-sum (one-hot matmul), gather cotangents+counts back in one merged
einsum, divide.  The round-4 equality-routed backward lost on the FLAT
layout because the tie count needed a true scatter; here it does not.

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


def _split3(v):
    """v (f32) as three exactly-bf16-representable f32 terms summing to v.

    f32's 24 significand bits split into 3x8: hi = RN_bf16(v) takes the top
    8, mid the next 8 of the exact f32 residual, lo the remaining <=8 (exact
    in bf16 barring exponent underflow, irrelevant at these magnitudes).
    Recombination hi+mid+lo is exact in f32 (disjoint mantissa ranges)."""
    hi = v.astype(jnp.bfloat16).astype(v.dtype)
    r = v - hi
    mid = r.astype(jnp.bfloat16).astype(v.dtype)
    lo = r - mid
    return hi, mid, lo


def _exact_einsum(spec, oh, vals):
    """einsum(spec, oh, vals) EXACT in f32 on the TPU MXU, as 3 DEFAULT
    (single-bf16-pass) einsums over _split3(vals).

    One-hot operands are exact in bf16, each split term is exact in bf16,
    every output element accumulates exactly one nonzero product — so each
    pass is exact and the f32 recombination is exact.  Half the cost of
    precision=HIGHEST (6 passes), which needs no exactness assumption on
    the LHS that one-hots happen to satisfy."""
    hi, mid, lo = _split3(vals)
    out = jnp.einsum(spec, oh, hi, preferred_element_type=vals.dtype)
    out = out + jnp.einsum(spec, oh, mid, preferred_element_type=vals.dtype)
    return out + jnp.einsum(spec, oh, lo, preferred_element_type=vals.dtype)


def _gather_rows(table, local_f, chunk_f, exact=False):
    """table[chunk*TILE + local] per edge as one-hot matmuls ([C]-row slice
    gather + [C,128,128]x[C,128,F] einsum); float index arrays (exact)."""
    f = table.shape[-1]
    c = chunk_f.shape[0]
    tb = table.reshape(-1, TILE, f)[chunk_f.astype(jnp.int32)]
    oh = _onehot(local_f.astype(jnp.int32).reshape(c, TILE), table.dtype)
    if exact:
        out = _exact_einsum("cen,cnf->cef", oh, tb)
    else:
        out = jnp.einsum("cen,cnf->cef", oh, tb,
                         preferred_element_type=table.dtype)
    return out.reshape(c * TILE, f)


def _fwd_impl(passes, nb, num_nodes, m_slots, x, dl_f, ecd_f, em_f, slots_f):
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
    #    (chunk, dst) by contiguity).  The routed f32 values must be EXACT
    #    on the MXU (DEFAULT would bf16-round them and the backward equality
    #    test would miss) — _exact_einsum's split does it in 3 bf16 passes.
    nxt = jnp.pad((dl[:, 1:] == dl[:, :-1]) & rm[:, 1:] & rm[:, :-1],
                  ((0, 0), (0, 1)))
    is_last = rm & ~nxt
    route = jnp.where(is_last, dl, float(TILE)).astype(jnp.int32)
    oh = _onehot(route, x.dtype)                       # sentinel -> zero row
    vals = jnp.where(jnp.isfinite(xr), xr, 0.0)        # -inf rows are masked
    part = _exact_einsum("cej,cef->cjf", oh, vals)     # [C, TILE, 2F]
    has = jnp.sum(oh, axis=1) > 0.5                    # [C, TILE]
    part = jnp.where(has[:, :, None], part, neg)

    # 3. cross-chunk combine into dst blocks.  Chunks of one dst block are
    #    contiguous, so with the host-known chunks-per-block bound M the
    #    combine is a [nb*M]-row slot gather + dense max over the M axis —
    #    measured 0.84 ms cheaper than the [C]-segment-max on the PCBA batch
    #    (scatter-max rows here are whole [128, 2F] slices).
    if m_slots:
        pad_row = jnp.full((1, TILE, f2), neg, x.dtype)
        part_all = jnp.concatenate([part, pad_row], axis=0)
        # M sequential [nb]-row gathers + running max, NOT one 4D
        # part_all[slots] gather: XLA fused that into a [nb*M*TILE, TILE, 2F]
        # intermediate (17.5 GB on the PCBA batch — compile-time HBM OOM)
        slots = slots_f.astype(jnp.int32)
        outb = part_all[slots[:, 0]]                    # [nb, TILE, 2F]
        for mm in range(1, m_slots):
            outb = jnp.maximum(outb, part_all[slots[:, mm]])
    else:
        outb = jax.ops.segment_max(part, ecd_f.astype(jnp.int32), nb,
                                   indices_are_sorted=True)
    out = jnp.where(jnp.isfinite(outb), outb, 0.0).reshape(nb * TILE, f2)
    return out  # [nb*TILE, 2F] as [max(x) | max(-x)] per node slot


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _extremes(passes, nb, num_nodes, m_slots, ge, dl_f, ecd_f, em_f, slots_f):
    x = jnp.concatenate([ge, -ge], axis=1)
    out = _fwd_impl(passes, nb, num_nodes, m_slots, x, dl_f, ecd_f, em_f,
                    slots_f)
    f = ge.shape[1]
    return out[:num_nodes, :f], -out[:num_nodes, f:]


def _extremes_fwd(passes, nb, num_nodes, m_slots, ge, dl_f, ecd_f, em_f,
                  slots_f):
    x = jnp.concatenate([ge, -ge], axis=1)
    out = _fwd_impl(passes, nb, num_nodes, m_slots, x, dl_f, ecd_f, em_f,
                    slots_f)
    f = ge.shape[1]
    return ((out[:num_nodes, :f], -out[:num_nodes, f:]),
            (x, out, dl_f, ecd_f, em_f, slots_f))


def _extremes_bwd(passes, nb, num_nodes, m_slots, res, cts):
    x, m_pad, dl_f, ecd_f, em_f, slots_f = res
    dmx, dmn = cts
    f = dmx.shape[1]
    # cotangent of the joint [max(x) | max(-x)] output (mn = -out[:, f:])
    g_both = jnp.concatenate([dmx, -dmn], axis=1)
    g_pad = jnp.pad(g_both, ((0, nb * TILE - g_both.shape[0]), (0, 0)))
    # achieved max per edge — must be EXACT (it is compared against x), hence
    # the exact split gather; the cotangent/count gather can round (DEFAULT,
    # and counts <= 128 are exact integers in bf16 anyway) and runs as ONE
    # merged einsum.
    mg = _gather_rows(m_pad, dl_f, ecd_f, exact=True)
    real = em_f > 0.5
    eq = (x == mg) & real[:, None]
    cnt = block_scatter_sum(eq.astype(x.dtype), dl_f.astype(jnp.int32),
                            ecd_f.astype(jnp.int32), nb)
    gc = _gather_rows(jnp.concatenate([g_pad, cnt], axis=1), dl_f, ecd_f)
    gg, cnt_e = gc[:, :2 * f], gc[:, 2 * f:]
    contrib = jnp.where(eq, gg / jnp.maximum(cnt_e, 1.0), 0.0)
    d_ge = contrib[:, :f] - contrib[:, f:]   # x = [ge, -ge]
    return (d_ge, jnp.zeros_like(dl_f), jnp.zeros_like(ecd_f),
            jnp.zeros_like(em_f), jnp.zeros_like(slots_f))


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
    m = int(getattr(layout, "ext_block_chunks", 0))
    nb = layout.n_node_blocks
    ecd = layout.edge_chunk_dst
    if m:
        # chunk -> (block, rank-within-block) slot map, derived on device
        # from the sorted edge_chunk_dst ([C]-sized ops, batch-constant and
        # CSE'd across layers); pad slots point at the appended -inf row.
        c = ecd.shape[0]
        iota = jnp.arange(c, dtype=jnp.int32)
        first = jax.ops.segment_min(iota, ecd, nb, indices_are_sorted=True)
        pos = iota - first[ecd]
        slots = jnp.full((nb, m), c, jnp.int32).at[ecd, pos].set(
            iota, mode="drop")
        slots_f = slots.astype(jnp.float32)
    else:
        slots_f = jnp.zeros((nb, 1), jnp.float32)
    return _extremes(passes, nb, num_nodes, m, values,
                     layout.local_dst.astype(jnp.float32),
                     ecd.astype(jnp.float32),
                     edge_mask.astype(jnp.float32),
                     slots_f)
