"""Fused multi-family weighted block-SpMM — the DGN edge stage in ONE kernel.

Under the linear-pretrans decomposition (ops/aggregators.py:
aggregate_decomposed) the whole per-layer edge stage is, for weight families
f = 0..nf-1 (mean/dir weights, all batch constants):

    out[v, f*F:(f+1)*F] = sum_{e: dst[e]=v} W[f, e] * (g[src[e]] + c[e])

The XLA lowering of the block-diagonal layout (ops/mxu.py) materializes the
[C,128,128] one-hot tensors in HBM for the gather AND the scatter einsum,
plus the [E, nf*F] weighted wide tensor — ~150 MB of traffic per layer whose
only purpose is routing.  This kernel builds both one-hots ON-CHIP from the
[C,128] int32 local indices (~1 MB), streams the src node block per chunk via
Pallas's automatic HBM->VMEM pipeline, and accumulates each dst block in VMEM
across its run of chunks (chunks are sorted by dst block — ops/mxu.py
invariant), writing each output block exactly once.

Per chunk:  g_e = onehot(ls) @ g_block            (MXU, [128,128]@[128,F])
            wide = concat_f(W[f] * (g_e + c_e))   (VPU)
            out_block += onehot(ld)^T @ wide      (MXU, [128,128]@[128,nf*F])

The backward pass runs the transpose with the SAME chunk data visited in
src-sorted order (layout.src_order) so dg accumulation is also
block-contiguous:

    dg[u] = sum_{e: src[e]=u} sum_f W[f,e] * dout[dst[e], f*F:(f+1)*F]
    dc[e] =                   sum_f W[f,e] * dout[dst[e], f*F:(f+1)*F]

This replaces the hot `g.update_all` reduce of the reference DGL runtime
(reference realworld_benchmark/nets/dgn_layer.py:115) at TPU speed-of-light:
traffic = node blocks + output, zero scatters, zero one-hot materialization.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _fwd_kernel(nf, f, has_c, g_resident,
                cs_ref, cd_ref, ls_ref, ld_ref, w_ref, g_ref, *rest):
    if has_c:
        c_ref, out_ref = rest
    else:
        (out_ref,) = rest
    c = pl.program_id(0)
    prev = jnp.maximum(c - 1, 0)
    first = jnp.logical_or(c == 0, cd_ref[c] != cd_ref[prev])

    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    oh_s = (ls_ref[c, 0, :][:, None] == iota).astype(jnp.float32)  # [e, n]
    # g is whole-array VMEM-resident when it fits (zero per-step input DMAs;
    # the chunk's src block is a dynamic in-VMEM slice), else streamed per
    # chunk by the BlockSpec pipeline
    g_blk = g_ref[pl.ds(cs_ref[c] * TILE, TILE), :] if g_resident \
        else g_ref[:, :]
    ge = jnp.dot(oh_s, g_blk, preferred_element_type=jnp.float32)
    if has_c:
        ge = ge + c_ref[:, :]
    wide = jnp.concatenate([ge * w_ref[c, i, :][:, None] for i in range(nf)],
                           axis=1)                               # [e, nf*F]
    oh_d = (ld_ref[c, 0, :][:, None] == iota).astype(jnp.float32)  # [e, n]
    contrib = jax.lax.dot_general(
        oh_d, wide, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                      # [n, nf*F]

    @pl.when(first)
    def _():
        out_ref[:, :] = contrib

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:, :] = out_ref[:, :] + contrib


def _bwd_kernel(nf, f, has_c,
                cs_ref, cd_ref, so_ref, ls_ref, ld_ref, w_ref, dout_ref,
                *rest):
    if has_c:
        dg_ref, dc_ref = rest
    else:
        (dg_ref,) = rest
    j = pl.program_id(0)
    ch = so_ref[j]
    prev = jnp.maximum(j - 1, 0)
    first = jnp.logical_or(j == 0, cs_ref[ch] != cs_ref[so_ref[prev]])

    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    oh_d = (ld_ref[ch, 0, :][:, None] == iota).astype(jnp.float32)  # [e, n]
    t = jnp.dot(oh_d, dout_ref[:, :],
                preferred_element_type=jnp.float32)              # [e, nf*F]
    s = t[:, :f] * w_ref[ch, 0, :][:, None]
    for i in range(1, nf):
        s = s + t[:, i * f:(i + 1) * f] * w_ref[ch, i, :][:, None]
    if has_c:
        dc_ref[:, :] = s
    oh_s = (ls_ref[ch, 0, :][:, None] == iota).astype(jnp.float32)
    contrib = jax.lax.dot_general(
        oh_s, s, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                      # [n, F]

    @pl.when(first)
    def _():
        dg_ref[:, :] = contrib

    @pl.when(jnp.logical_not(first))
    def _():
        dg_ref[:, :] = dg_ref[:, :] + contrib


# keep whole-array-resident operands (indices + weights + g) under ~3/4 of
# the ~16 MB/core VMEM so block pipelining still has headroom
_VMEM_RESIDENT_BUDGET = 10 * 2 ** 20


def _run_fwd(g, W, c_edge, layout, interpret):
    nf, e_pad = W.shape
    f = g.shape[1]
    n_chunks = e_pad // TILE
    nb = layout.n_node_blocks
    has_c = c_edge is not None
    ls = layout.local_src.reshape(n_chunks, 1, TILE)
    ld = layout.local_dst.reshape(n_chunks, 1, TILE)
    w3 = jnp.swapaxes(W.reshape(nf, n_chunks, TILE), 0, 1)   # [C, nf, TILE]
    # indices/weights are always resident (a few MB); g joins them when it
    # fits — then the ONLY per-step DMA left is the dst-block output write,
    # which fires once per run of same-dst chunks
    g_resident = (ls.size + ld.size) * 4 + w3.size * 4 + g.size * 4 \
        <= _VMEM_RESIDENT_BUDGET

    in_specs = [
        pl.BlockSpec(ls.shape, lambda c, cs, cd: (0, 0, 0)),
        pl.BlockSpec(ld.shape, lambda c, cs, cd: (0, 0, 0)),
        pl.BlockSpec(w3.shape, lambda c, cs, cd: (0, 0, 0)),
        pl.BlockSpec(g.shape, lambda c, cs, cd: (0, 0)) if g_resident
        else pl.BlockSpec((TILE, f), lambda c, cs, cd: (cs[c], 0)),
    ]
    args = [ls, ld, w3, g]
    if has_c:
        in_specs.append(pl.BlockSpec((TILE, f), lambda c, cs, cd: (c, 0)))
        args.append(c_edge)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE, nf * f), lambda c, cs, cd: (cd[c], 0)),
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, nf, f, has_c, g_resident),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * TILE, nf * f), jnp.float32),
        interpret=interpret,
    )(layout.edge_chunk_src, layout.edge_chunk_dst, *args)
    # blocks no chunk maps to are uninitialized -> zero them
    cov = jnp.repeat(layout.dst_covered, TILE)[:, None]
    return jnp.where(cov, out, 0.0)


def _run_bwd(dout, g_shape, W, has_c, layout, interpret):
    nf, e_pad = W.shape
    f = g_shape[1]
    n_chunks = e_pad // TILE
    nb = layout.n_node_blocks
    ls = layout.local_src.reshape(n_chunks, 1, TILE)
    ld = layout.local_dst.reshape(n_chunks, 1, TILE)
    w3 = jnp.swapaxes(W.reshape(nf, n_chunks, TILE), 0, 1)   # [C, nf, TILE]

    in_specs = [
        pl.BlockSpec(ls.shape, lambda j, cs, cd, so: (0, 0, 0)),
        pl.BlockSpec(ld.shape, lambda j, cs, cd, so: (0, 0, 0)),
        pl.BlockSpec(w3.shape, lambda j, cs, cd, so: (0, 0, 0)),
        # dout is nf*F wide (too big to sit in VMEM) — streamed per visited
        # dst block, auto-pipelined by the grid
        pl.BlockSpec((TILE, nf * f), lambda j, cs, cd, so: (cd[so[j]], 0)),
    ]
    out_shapes = [jax.ShapeDtypeStruct((nb * TILE, f), jnp.float32)]
    out_specs = [pl.BlockSpec((TILE, f), lambda j, cs, cd, so: (cs[so[j]], 0))]
    if has_c:
        out_shapes.append(jax.ShapeDtypeStruct((e_pad, f), jnp.float32))
        out_specs.append(pl.BlockSpec((TILE, f),
                                      lambda j, cs, cd, so: (so[j], 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=out_specs if has_c else out_specs[0],
    )
    res = pl.pallas_call(
        functools.partial(_bwd_kernel, nf, f, has_c),
        grid_spec=grid_spec,
        out_shape=out_shapes if has_c else out_shapes[0],
        interpret=interpret,
    )(layout.edge_chunk_src, layout.edge_chunk_dst, layout.src_order,
      ls, ld, w3, dout)
    if has_c:
        dg, dc = res
    else:
        dg, dc = res, None
    cov = jnp.repeat(layout.src_covered, TILE)[:, None]
    dg = jnp.where(cov, dg, 0.0)
    return dg, dc


def fused_weighted_spmm(g, W, c_edge, layout, interpret=False):
    """out[v, f*F:(f+1)*F] = sum_{e->v} W[f,e] * (g[src_e] + c_edge[e]).

    g: [nb*TILE, F] node array; W: [nf, E] per-family edge weights (pad edges
    must carry weight 0 — aggregate_decomposed folds the edge mask in);
    c_edge: optional [E, F] (edge_feat runs).  Differentiable in g and c_edge;
    W is treated as a constant (directional weights are stop-gradient batch
    constants, so its cotangent is symbolically zero).  The custom VJP runs
    the transpose kernel in src-sorted chunk order (layout.src_order).
    Returns [nb*TILE, nf*F] float32.
    """
    @jax.custom_vjp
    def f(g, W, c_edge):
        return _run_fwd(g, W, c_edge, layout, interpret)

    def fwd(g, W, c_edge):
        return f(g, W, c_edge), (g.shape, W, c_edge is not None)

    def bwd(res, dout):
        g_shape, W, has_c = res
        dg, dc = _run_bwd(dout, g_shape, W, has_c, layout, interpret)
        return dg, jnp.zeros_like(W), dc

    f.defvjp(fwd, bwd)
    return f(g, W, c_edge)
