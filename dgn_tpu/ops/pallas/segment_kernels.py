"""Pallas TPU kernels: fused weighted segment-sums (SpMM) over edge blocks.

The DGN hot path reduces per-edge messages into destination nodes under
several weight vectors at once (mean/sum, dir-av |w|, dir-dx w plus its
per-node weight total).  XLA lowers each `segment_sum` to a separate scatter;
this kernel computes ALL weighted sums in one pass over dst-sorted edge
chunks, turning the scatter into an MXU matmul:

    out[r, f] += sum_e onehot[e, r] * W[w, e] * msg[e, f]
               = ((onehot * W_w)^T @ msg)[r, f]

Layout (host-side, ops/pallas/layout.py): edges sorted by dst are re-packed so
each TILE_N-node block owns a whole number of E_CHUNK-edge chunks (padded with
masked edges).  The grid walks chunks in order; the output block for a chunk is
its node block — consecutive chunks of the same block accumulate in VMEM and
Pallas writes the block out when the index map moves on (standard revisiting
pattern).

An extra all-ones feature column is appended to msg so each weighted sum also
yields the per-node weight total Σ_e W[w,e] — the dir-dx centered term
(reference nets/aggregators.py:48-52) — for free in the same matmul.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128     # nodes per output block
E_CHUNK = 128    # edges per grid step


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["perm", "slot_valid", "local_dst",
                                "chunk_block", "block_visited"],
                   meta_fields=["n_blocks", "e_packed"])
@dataclasses.dataclass(frozen=True)
class BlockLayout:
    """Host-precomputed edge re-packing (see build_block_layout)."""
    perm: jax.Array          # [E_packed] int32: packed slot -> original edge id
    slot_valid: jax.Array    # [E_packed] bool
    local_dst: jax.Array     # [E_packed] int32 in [0, TILE_N)
    chunk_block: jax.Array   # [n_chunks] int32: node block id per chunk
    block_visited: jax.Array  # [n_blocks] bool (False -> kernel never writes it)
    n_blocks: int            # number of TILE_N node blocks
    e_packed: int


def build_block_layout(dst: np.ndarray, edge_mask: np.ndarray, n_pad: int,
                       tile_n: int = TILE_N, e_chunk: int = E_CHUNK
                       ) -> BlockLayout:
    """Rearrange dst-sorted edges so each node block owns whole chunks."""
    dst = np.asarray(dst)
    edge_mask = np.asarray(edge_mask)
    n_blocks = (n_pad + tile_n - 1) // tile_n
    order = np.argsort(np.where(edge_mask, dst, np.iinfo(np.int32).max),
                       kind="stable")
    sorted_ids = order[edge_mask[order]]          # real edges, dst-sorted
    block_of = dst[sorted_ids] // tile_n

    perm_parts, valid_parts, ldst_parts, chunk_blocks = [], [], [], []
    for b in range(n_blocks):
        ids = sorted_ids[block_of == b]
        k = len(ids)
        if k == 0:
            continue
        padded = ((k + e_chunk - 1) // e_chunk) * e_chunk
        pp = np.zeros(padded, np.int32)
        pp[:k] = ids
        vv = np.zeros(padded, bool)
        vv[:k] = True
        ld = np.zeros(padded, np.int32)
        ld[:k] = dst[ids] - b * tile_n
        perm_parts.append(pp)
        valid_parts.append(vv)
        ldst_parts.append(ld)
        chunk_blocks.extend([b] * (padded // e_chunk))
    if not perm_parts:
        perm_parts = [np.zeros(e_chunk, np.int32)]
        valid_parts = [np.zeros(e_chunk, bool)]
        ldst_parts = [np.zeros(e_chunk, np.int32)]
        chunk_blocks = [0]
    perm = np.concatenate(perm_parts)
    visited = np.zeros(n_blocks, bool)
    visited[np.unique(np.array(chunk_blocks, np.int32))] = True
    return BlockLayout(
        perm=jnp.asarray(perm),
        slot_valid=jnp.asarray(np.concatenate(valid_parts)),
        local_dst=jnp.asarray(np.concatenate(ldst_parts)),
        chunk_block=jnp.asarray(np.array(chunk_blocks, np.int32)),
        block_visited=jnp.asarray(visited),
        n_blocks=n_blocks,
        e_packed=len(perm),
    )


def _kernel(chunk_block_ref,      # scalar prefetch [n_chunks]
            msg_ref,              # [E_CHUNK, F1] VMEM (packed, ones col appended)
            w_ref,                # [n_w, E_CHUNK] VMEM
            ldst_ref,             # [n_chunks, E_CHUNK] VMEM int32 (full array)
            out_ref,              # [n_w, TILE_N, F1] VMEM (block)
            *, n_w: int):
    i = pl.program_id(0)
    is_first = jnp.logical_or(
        i == 0, chunk_block_ref[jnp.maximum(i, 1) - 1] != chunk_block_ref[i])

    @pl.when(is_first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    msg = msg_ref[...]
    ld = ldst_ref[i, :]
    # one-hot scatter matrix [E_CHUNK, TILE_N]
    rows = jax.lax.broadcasted_iota(jnp.int32, (E_CHUNK, TILE_N), 1)
    onehot = (rows == ld[:, None]).astype(jnp.float32)
    for w in range(n_w):
        ww = w_ref[w, :]
        mat = onehot * ww[:, None]
        out_ref[w] += jax.lax.dot_general(
            mat, msg, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)


def weighted_segment_sums(msg: jax.Array, weights: jax.Array,
                          layout: BlockLayout, n_pad: int,
                          interpret: bool = False) -> jax.Array:
    """out[w, v, :] = sum_e weights[w, e] * msg[e, :], plus weight totals.

    msg: [E, F] (original edge order); weights: [n_w, E] with pad edges already
    zero-weighted.  Returns (sums [n_w, n_pad, F], totals [n_w, n_pad]).
    """
    n_w, _ = weights.shape
    f = msg.shape[1]
    # pack into block layout order + append ones column (weight totals)
    pm = msg[layout.perm]
    ones = jnp.ones((pm.shape[0], 1), msg.dtype)
    pm = jnp.concatenate([pm, ones], axis=1)
    f1 = f + 1
    pw = weights[:, layout.perm] * layout.slot_valid[None, :].astype(msg.dtype)

    n_chunks = layout.e_packed // E_CHUNK

    # per-slot global destination node (for the backward gathers)
    packed_dst = (jnp.repeat(layout.chunk_block, E_CHUNK) * TILE_N
                  + layout.local_dst)

    @jax.custom_vjp
    def run(pm, pw):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((E_CHUNK, f1), lambda i, cb: (i, 0)),
                pl.BlockSpec((n_w, E_CHUNK), lambda i, cb: (0, i)),
                pl.BlockSpec((n_chunks, E_CHUNK), lambda i, cb: (0, 0)),
            ],
            out_specs=pl.BlockSpec((n_w, TILE_N, f1),
                                   lambda i, cb: (0, cb[i], 0)),
        )
        out = pl.pallas_call(
            functools.partial(_kernel, n_w=n_w),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (n_w, layout.n_blocks * TILE_N, f1), jnp.float32),
            interpret=interpret,
        )(layout.chunk_block, pm, pw,
          layout.local_dst.reshape(n_chunks, E_CHUNK))
        # zero node blocks the grid never visited (uninitialized memory)
        row_ok = jnp.repeat(layout.block_visited, TILE_N)
        return jnp.where(row_ok[None, :, None], out, 0.0)

    def run_fwd(pm, pw):
        return run(pm, pw), (pm, pw)

    def run_bwd(res, g_out):
        # transpose of the weighted segment-sum: pure edge-parallel gathers
        pm, pw = res
        gd = g_out[:, packed_dst, :]              # [n_w, e_packed, f1]
        d_pm = jnp.einsum("we,wef->ef", pw, gd)
        d_pw = jnp.einsum("ef,wef->we", pm, gd)
        return d_pm, d_pw

    run.defvjp(run_fwd, run_bwd)

    out = run(pm, pw)[:, :n_pad]
    return out[..., :f], out[..., f]


def weighted_segment_sums_xla(msg, weights, dst, edge_mask, n_pad):
    """XLA fallback with identical semantics (correctness oracle)."""
    m = edge_mask.astype(msg.dtype)
    sums = []
    totals = []
    for w in range(weights.shape[0]):
        ww = weights[w] * m
        sums.append(jax.ops.segment_sum(msg * ww[:, None], dst, n_pad))
        totals.append(jax.ops.segment_sum(ww, dst, n_pad))
    return jnp.stack(sums), jnp.stack(totals)
