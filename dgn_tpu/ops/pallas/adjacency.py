"""Pallas TPU kernel: build weighted adjacency blocks from int32 locals.

`mxu.build_pair_adjacency` turns [K, E] per-family edge weights into
[P, K, TILE, TILE] per-(src_block, dst_block) adjacency blocks — the batch
constants the decomposed edge stage matmuls against every layer
(reference op being replaced: realworld_benchmark/nets/dgn_layer.py:115
`g.update_all`, re-expressed as dense block matmuls).  The XLA lowering
materializes both one-hot routing tensors and a [C, TILE, K*TILE] weighted
intermediate in HBM (~450 MB round-trip on the ZINC bench batch — measured
0.61 ms, HBM-bound).  This kernel reads only the int32 local indices and the
weights (~2 MB), generates the one-hots in VMEM via iota comparison, and
accumulates each pair's block in an f32 VMEM scratch with MXU matmuls,
storing the [P, K, 128, 128] result exactly once per pair.

Precision: the scatter itself is exact when each (pair, local_src, local_dst)
cell receives at most one edge — accumulation is f32 in VMEM and the one-hot
matmuls run Precision.HIGHEST (one-hots are exact, so each product is an
exact f32 weight).  With duplicate/multigraph edges the per-cell f32 SUM
rounds like any f32 addition; simple graphs (all five benchmarks) never hit
that.  This is strictly MORE precise than the XLA lowering,
whose DEFAULT-precision einsum rounds the weights to bf16 on the MXU (both on
TPU and, measured, on the XLA CPU backend).

Chunks are visited in pair-sorted order (MXULayout.pair_chunk_order) so the
standard Pallas revisiting pattern applies: the output block for consecutive
grid steps with the same pair id stays resident in VMEM and is written back
only when the pair changes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _kernel(pair_ids_ref,         # scalar prefetch [C] int32, non-decreasing
            in_ref,               # [1, 2+K, TILE] f32: ls, ld, K weight rows
            out_ref,              # [1, K, TILE, TILE] output block
            acc_ref,              # [K, TILE, TILE] f32 VMEM accumulator
            *, n_fam: int, n_chunks: int):
    i = pl.program_id(0)
    is_first = jnp.logical_or(
        i == 0, pair_ids_ref[jnp.maximum(i, 1) - 1] != pair_ids_ref[i])
    is_last = jnp.logical_or(
        i == n_chunks - 1,
        pair_ids_ref[jnp.minimum(i + 1, n_chunks - 1)] != pair_ids_ref[i])

    @pl.when(is_first)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # locals carried as f32 (exact for values < TILE); one fused input DMA
    # per step — three separate tiny blocks cost ~3x the scalar-core DMA
    # issue overhead that dominates this kernel
    ls = in_ref[0, 0, :]
    ld = in_ref[0, 1, :]
    # one-hots generated in VMEM — never touch HBM
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1).astype(
        jnp.float32)
    oh_s = (cols == ls[:, None]).astype(jnp.float32)       # [e, i]
    oh_d = (cols == ld[:, None]).astype(jnp.float32)       # [e, j]
    for k in range(n_fam):
        w = in_ref[0, 2 + k, :]
        # acc[i, j] += sum_e oh_s[e, i] * w[e] * oh_d[e, j]
        acc_ref[k] += jax.lax.dot_general(
            oh_s * w[:, None], oh_d,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    # store once, on the pair's final chunk (the VMEM output block persists
    # across same-pair steps and is DMA'd back when the pair id moves on)
    @pl.when(is_last)
    def _():
        out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def build_pair_adjacency(weights: jax.Array, layout, out_dtype=None,
                         interpret: bool = False) -> jax.Array:
    """[K, E] edge weights -> [P, K, TILE, TILE] adjacency blocks.

    Semantically identical to the XLA lowering in mxu.build_pair_adjacency
    (pad edges must carry weight 0); requires layout.pair_chunk_order.
    """
    k, e_pad = weights.shape
    c = e_pad // TILE
    dt = jnp.dtype(out_dtype) if out_dtype is not None else weights.dtype
    order = layout.pair_chunk_order
    # reorder per-chunk rows into pair-sorted visit order and fuse ls/ld/w
    # into ONE [C, 2+K, TILE] array — one input DMA per grid step ([C]-row
    # gathers, negligible next to the blocks themselves)
    ls = layout.local_src.reshape(c, 1, TILE)
    ld = layout.local_dst.reshape(c, 1, TILE)
    ws = weights.reshape(k, c, TILE).transpose(1, 0, 2)          # [C, K, TILE]
    fused = jnp.concatenate(
        [ls.astype(jnp.float32), ld.astype(jnp.float32),
         ws.astype(jnp.float32)], axis=1)[order]                 # [C, 2+K, T]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, 2 + k, TILE), lambda i, pid: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, k, TILE, TILE),
                               lambda i, pid: (pid[i], 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((k, TILE, TILE), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_fam=k, n_chunks=c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((layout.n_pairs, k, TILE, TILE), dt),
        interpret=interpret,
    )(layout.pair_sorted_ids, fused)
    # pad pairs receive no chunks -> their blocks are uninitialized memory
    return jnp.where(layout.pair_covered[:, None, None, None], out,
                     jnp.zeros((), dt))
