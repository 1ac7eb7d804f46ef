"""Block-diagonal MXU execution layout: gather/scatter as 128x128 matmuls.

Measured on TPU v5e: XLA's dynamic gather and scatter are per-row bound
(~0.3/0.65 ms for ~50k rows, FLAT in feature width up to 128 lanes) — the
DGN train step is ~30 such ops, so they dominate wall time by ~30x over the
HBM speed-of-light.  The graphs in every benchmark are tiny (ZINC <=37 nodes,
SBM/superpixels <=~200), so packing can guarantee that BOTH endpoints of any
edge — and every node of any graph — live inside small aligned windows:

  * the node axis is cut into 128-node blocks; a graph never straddles a
    block boundary unless it is itself >128 nodes (then its edges are
    bucketed per (src_block, dst_block) pair);
  * the edge axis is cut into 128-edge chunks; all edges of a chunk share one
    src block and one dst block;
  * the graph axis is cut into 128-graph blocks; a 128-node chunk only holds
    nodes of graphs from one graph block.

Under that layout every hot indexed op becomes a *block-local one-hot batched
matmul* (einsum "cen,cnf->cef" / "cen,cef->cnf") whose forward AND backward
are MXU work with zero scatters; the only remaining indexed ops touch
chunk-level arrays (~hundreds of rows — negligible).

For the decomposed edge stage (aggregators.aggregate_decomposed) the layout
goes one step further: all weighted edge reductions collapse into batched
dense matmuls against per-(src_block, dst_block) *adjacency blocks*
(build_pair_adjacency / pair_adj_matmul) built once per forward pass from the
batch-constant directional weights — so the per-layer cost is one
[P,K,128,128] x [P,128,F] matmul read instead of materializing one-hot
routing tensors per layer (measured 0.20 vs 0.91 ms/layer fwd+bwd on the
ZINC bench batch, TPU v5e).

This is the TPU-native replacement for the DGL degree-bucketed mailbox
runtime (reference realworld_benchmark/nets/dgn_layer.py:115 `g.update_all`):
where DGL buckets nodes by in-degree, we bucket whole graphs into MXU tiles.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

TILE = 128


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MXULayout:
    """Host-precomputed block structure of a GraphBatch (see graph.pack_graphs).

    Edge axis (E = n_edge_chunks * TILE):
      local_src/local_dst: [E] int32 in [0, TILE) — index within the chunk's
        src/dst node block.
      edge_chunk_src/edge_chunk_dst: [E/TILE] int32 node-block id per chunk.
        edge_chunk_dst is non-decreasing (chunks sorted by dst block).
    Node axis (N = n_node_chunks * TILE):
      local_graph: [N] int32 in [0, TILE), TILE for pad nodes (sentinel — the
        one-hot row is zero, so pads never pollute graph pools).
      node_chunk_graph: [N/TILE] int32 graph-block id per node chunk
        (non-decreasing).
    """
    local_src: jax.Array
    local_dst: jax.Array
    edge_chunk_src: jax.Array
    edge_chunk_dst: jax.Array
    # graph-pooling blocks — None under edge-partitioned packing
    # (parallel/halo.py), where a shard's contiguous node range cannot honor
    # the one-graph-block-per-node-chunk invariant; per-graph pools then run
    # the flat masked segment path instead (models/readout.py)
    local_graph: Optional[jax.Array]
    node_chunk_graph: Optional[jax.Array]
    n_node_blocks: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_graph_blocks: int = dataclasses.field(metadata=dict(static=True), default=0)
    # --- block-adjacency extras (aggregators.aggregate_decomposed) ---
    # distinct (src_block, dst_block) pairs touched by any chunk, sorted
    # dst-major; with them the decomposed edge stage becomes a batched dense
    # [P,128,128] x [P,128,F] matmul over per-pair weighted adjacency blocks
    # built once per forward pass.
    chunk_pair: Optional[jax.Array] = None     # [C] int32 -> pair id
    pair_src: Optional[jax.Array] = None       # [P] int32 node block
    pair_dst: Optional[jax.Array] = None       # [P] int32, non-decreasing
    n_pairs: int = dataclasses.field(metadata=dict(static=True), default=0)
    # chunk visit order for the Pallas adjacency-build kernel
    # (ops/pallas/adjacency.py): chunks sorted by pair id so the kernel
    # accumulates each pair's block in VMEM and writes it out once
    pair_chunk_order: Optional[jax.Array] = None   # [C] int32
    pair_sorted_ids: Optional[jax.Array] = None    # [C] int32, non-decreasing
    pair_covered: Optional[jax.Array] = None       # [P] bool (pad pairs False)
    # --- edge-partitioned extras (build_mxu_layout_ep) ---
    # pairs are ordered [interior | boundary]: the first n_pairs_int pairs
    # read src blocks from the shard's OWN node region, the rest from the
    # halo region.  Static so the decomposed edge stage can aggregate
    # interior pairs while the halo all_to_all is still in flight
    # (aggregators.aggregate_decomposed split path).  None on non-EP layouts.
    n_pairs_int: Optional[int] = dataclasses.field(
        metadata=dict(static=True), default=None)
    # node blocks in the own region (boundary pair_src offsets index the halo
    # region as pair_src - n_own_blocks)
    n_own_blocks: Optional[int] = dataclasses.field(
        metadata=dict(static=True), default=None)
    # Hillis-Steele passes the scatter-free extremes reduction needs
    # (ops/extremes.py): ceil(log2(longest within-chunk run of equal-dst real
    # edges)), rounded UP to the {1,2,3,4,5,7} ladder so batches of one
    # loader geometry share a compiled program.  Default 7 (= log2(TILE)) is
    # always correct.
    ext_passes: int = dataclasses.field(metadata=dict(static=True), default=7)
    # max chunks sharing one dst block (power-of-2 ladder), for the extremes
    # cross-chunk combine as a slot-gather + dense max instead of a
    # segment-max (measured 0.84 ms on the PCBA batch).  0 = unknown ->
    # extremes falls back to segment-max (always correct).
    ext_block_chunks: int = dataclasses.field(metadata=dict(static=True),
                                              default=0)


# ===================================================================== host

def _ext_passes(dst: np.ndarray, edge_mask: np.ndarray) -> int:
    """ceil(log2(longest within-chunk equal-dst run)) on the {1,2,3,4,5,7}
    ladder (see MXULayout.ext_passes).  Runs are bounded by the max in-degree
    — a dataset property — so the ladder value is stable across batches."""
    e_pad = len(dst)
    if not edge_mask.any():
        return 1
    new = np.ones(e_pad, bool)
    new[1:] = (dst[1:] != dst[:-1]) | ~edge_mask[1:] | ~edge_mask[:-1]
    new[np.arange(0, e_pad, TILE)] = True
    lengths = np.bincount(np.cumsum(new)[edge_mask])
    max_run = int(lengths.max())
    p = max(int(np.ceil(np.log2(max(max_run, 2)))), 1)
    return p if p <= 5 else 7


def _ext_block_chunks(chunk_dst: np.ndarray, nb: int,
                      edge_mask: np.ndarray) -> int:
    """Power-of-2 upper bound on REAL chunks-per-dst-block (MXULayout
    ext_block_chunks); ladder-rounded for cross-batch stability.

    Fully-padded tail chunks (e_pad slack) all carry the last node block's
    id and sort AFTER that block's real chunks, so excluding them here is
    enough: the extremes slot map ranks chunks in order, pad chunks get
    ranks >= M and are dropped (they contribute only -inf anyway).  Counting
    them inflated M from 4 to 64 under loader slack geometry — 16x the
    combine's gather traffic."""
    real = edge_mask.reshape(-1, TILE).any(axis=1)
    if not real.any():
        return 1
    per = np.bincount(chunk_dst[real], minlength=nb)
    m = max(int(per.max()), 1)
    return 1 << int(np.ceil(np.log2(m)))


def build_mxu_layout(src: np.ndarray, dst: np.ndarray, edge_mask: np.ndarray,
                     node_graph: np.ndarray, node_mask: np.ndarray,
                     n_pad: int, g_pad: int,
                     n_pairs_pad: Optional[int] = None,
                     ext_caps=None) -> MXULayout:
    """Derive the layout arrays from already-block-aligned packed data.

    Validates the block invariants (cheap, host-side) so a mis-packed batch
    fails loudly instead of silently aggregating across blocks.

    ext_caps controls the STATIC extremes metadata (ext_passes /
    ext_block_chunks), which is part of the pytree structure — batches that
    must stack or share a compiled program (same pads) must share it:
      None      — structure-stable conservative defaults (7 passes,
                  segment-max combine): any two batches at the same pads get
                  identical treedefs;
      "batch"   — tight per-batch values (standalone single-batch use:
                  bench, tests, escape repacks);
      (p, m)    — loader-stable caps; raises ValueError if this batch
                  exceeds them (the loaders escape-repack, like geometry
                  overflow), so a too-tight cap can never corrupt results.
    """
    e_pad = len(src)
    if e_pad % TILE or n_pad % TILE or g_pad % TILE:
        raise ValueError("mxu layout needs TILE-multiple axes")
    cs = src.reshape(-1, TILE) // TILE
    cd = dst.reshape(-1, TILE) // TILE
    em = edge_mask.reshape(-1, TILE)
    # per chunk: all real edges share one src block / one dst block
    def _chunk_id(blocks, mask):
        first = blocks[:, 0]
        ok = np.all((blocks == first[:, None]) | ~mask, axis=1)
        if not np.all(ok):
            raise ValueError("edge chunk spans multiple node blocks")
        return first.astype(np.int32)
    chunk_src = _chunk_id(cs, em)
    chunk_dst = _chunk_id(cd, em)
    local_src = (src - chunk_src.repeat(TILE) * TILE).astype(np.int32)
    local_dst = (dst - chunk_dst.repeat(TILE) * TILE).astype(np.int32)
    if local_src.min() < 0 or local_src.max() >= TILE or \
       local_dst.min() < 0 or local_dst.max() >= TILE:
        raise ValueError("edge endpoints outside their chunk's node block")

    ng = node_graph.reshape(-1, TILE) // TILE
    nm = node_mask.reshape(-1, TILE)
    chunk_graph = _chunk_id(ng, nm)
    local_graph = (node_graph - chunk_graph.repeat(TILE) * TILE).astype(np.int32)
    local_graph = np.where(node_mask, local_graph, TILE).astype(np.int32)
    if local_graph[node_mask].min() < 0 or local_graph[node_mask].max() >= TILE:
        raise ValueError("node's graph outside its chunk's graph block")

    nb = n_pad // TILE
    # distinct (src_block, dst_block) pairs, dst-major so a pair->dst-block
    # segment reduction sees non-decreasing ids.  The pair axis is PADDED to
    # n_pairs_pad (a loader-stable bound) because n_pairs is static pytree
    # metadata: batches that share (n_pad, e_pad, g_pad, n_pairs_pad) must
    # share one compiled program and stack into super-batches.  Pad pairs
    # point at (src block 0, dst block nb-1) — nb-1 keeps pair_dst
    # non-decreasing — and receive no chunks, so their adjacency blocks are
    # zero and they contribute nothing.
    pair_key = chunk_dst.astype(np.int64) * nb + chunk_src
    uniq_key, chunk_pair = np.unique(pair_key, return_inverse=True)
    n_real_pairs = len(uniq_key)
    if n_pairs_pad is None:
        n_pairs_pad = -(-max(n_real_pairs, 1) // 64) * 64
    if n_real_pairs > n_pairs_pad:
        raise ValueError(
            f"mxu pair overflow: {n_real_pairs} > n_pairs_pad={n_pairs_pad}")
    pad = n_pairs_pad - n_real_pairs
    pair_src = np.concatenate(
        [(uniq_key % nb), np.zeros(pad, np.int64)]).astype(np.int32)
    pair_dst = np.concatenate(
        [(uniq_key // nb), np.full(pad, nb - 1, np.int64)]).astype(np.int32)
    pair_chunk_order = np.argsort(chunk_pair, kind="stable").astype(np.int32)
    pair_covered = np.zeros(n_pairs_pad, bool)
    pair_covered[:n_real_pairs] = True

    if ext_caps is None:
        ext_passes, ext_block_chunks = 7, 0   # always-correct, shape-stable
    elif ext_caps == "batch":
        ext_passes = _ext_passes(dst, edge_mask)
        ext_block_chunks = _ext_block_chunks(chunk_dst, nb, edge_mask)
    else:
        ext_passes, ext_block_chunks = ext_caps
        need_p = _ext_passes(dst, edge_mask)
        need_m = _ext_block_chunks(chunk_dst, nb, edge_mask)
        if need_p > ext_passes or need_m > ext_block_chunks:
            raise ValueError(
                f"mxu ext overflow: batch needs (passes={need_p}, "
                f"chunks={need_m}) > caps ({ext_passes}, {ext_block_chunks})")
    return MXULayout(
        local_src=jnp.asarray(local_src),
        local_dst=jnp.asarray(local_dst),
        edge_chunk_src=jnp.asarray(chunk_src),
        edge_chunk_dst=jnp.asarray(chunk_dst),
        local_graph=jnp.asarray(local_graph),
        node_chunk_graph=jnp.asarray(chunk_graph),
        n_node_blocks=nb,
        n_graph_blocks=g_pad // TILE,
        chunk_pair=jnp.asarray(chunk_pair.astype(np.int32)),
        pair_src=jnp.asarray(pair_src),
        pair_dst=jnp.asarray(pair_dst),
        n_pairs=n_pairs_pad,
        pair_chunk_order=jnp.asarray(pair_chunk_order),
        pair_sorted_ids=jnp.asarray(
            chunk_pair[pair_chunk_order].astype(np.int32)),
        pair_covered=jnp.asarray(pair_covered),
        ext_passes=ext_passes,
        ext_block_chunks=ext_block_chunks,
    )


def build_mxu_layout_ep(src: np.ndarray, dst: np.ndarray,
                        edge_mask: np.ndarray, n_ext: int, nb_own: int,
                        n_pairs_int_pad: int,
                        n_pairs_bnd_pad: int) -> MXULayout:
    """MXULayout for ONE edge-partition shard (parallel/halo.py).

    The shard's node axis is [own | halo] (both 128-aligned); edges are
    already arranged into (src_block, dst_block) chunks by _mxu_edge_arrange.
    Differences vs build_mxu_layout:
      * no graph-pooling blocks (local_graph=None — pooling runs the flat
        masked segment path);
      * pairs ordered [interior | boundary] by whether the src block lies in
        the own region (< nb_own), each group dst-major, each group padded to
        a static shard-uniform size — so the decomposed edge stage can run
        interior pair matmuls with NO data dependency on the halo exchange.
    Pad pairs in both groups point at (src 0 / nb_own, dst nb-1) and receive
    no chunks, so their adjacency blocks are zero.
    """
    e_pad = len(src)
    if e_pad % TILE or n_ext % TILE:
        raise ValueError("mxu ep layout needs TILE-multiple axes")
    cs = src.reshape(-1, TILE) // TILE
    cd = dst.reshape(-1, TILE) // TILE
    em = edge_mask.reshape(-1, TILE)

    def _chunk_id(blocks, mask):
        first = blocks[:, 0]
        ok = np.all((blocks == first[:, None]) | ~mask, axis=1)
        if not np.all(ok):
            raise ValueError("edge chunk spans multiple node blocks")
        return first.astype(np.int32)

    chunk_src = _chunk_id(cs, em)
    chunk_dst = _chunk_id(cd, em)
    local_src = (src - chunk_src.repeat(TILE) * TILE).astype(np.int32)
    local_dst = (dst - chunk_dst.repeat(TILE) * TILE).astype(np.int32)
    nb = n_ext // TILE

    # distinct pairs, interior group first, dst-major inside each group
    pair_key = chunk_dst.astype(np.int64) * nb + chunk_src
    is_bnd_chunk = chunk_src >= nb_own
    uniq_key, inv = np.unique(
        pair_key + np.where(is_bnd_chunk, np.int64(nb) * nb, 0),
        return_inverse=True)
    bnd_mask = uniq_key >= np.int64(nb) * nb
    n_int_real = int((~bnd_mask).sum())
    n_bnd_real = int(bnd_mask.sum())
    if n_int_real > n_pairs_int_pad or n_bnd_real > n_pairs_bnd_pad:
        raise ValueError(
            f"ep pair overflow: ({n_int_real},{n_bnd_real}) > "
            f"({n_pairs_int_pad},{n_pairs_bnd_pad})")
    key_mod = uniq_key % (np.int64(nb) * nb)
    # pair id remap: interior ids [0, n_int_real) then pad, boundary ids
    # [n_pairs_int_pad, ...) then pad
    new_id = np.where(bnd_mask,
                      n_pairs_int_pad + np.cumsum(bnd_mask) - 1,
                      np.cumsum(~bnd_mask) - 1).astype(np.int64)
    chunk_pair = new_id[inv].astype(np.int32)
    n_pairs = n_pairs_int_pad + n_pairs_bnd_pad
    pair_src = np.zeros(n_pairs, np.int32)
    pair_dst = np.full(n_pairs, nb - 1, np.int32)
    pair_src[n_pairs_int_pad:] = nb_own          # boundary pads: halo block 0
    pair_src[new_id] = (key_mod % nb).astype(np.int32)
    pair_dst[new_id] = (key_mod // nb).astype(np.int32)
    pair_covered = np.zeros(n_pairs, bool)
    pair_covered[new_id] = True
    pair_chunk_order = np.argsort(chunk_pair, kind="stable").astype(np.int32)
    return MXULayout(
        local_src=jnp.asarray(local_src),
        local_dst=jnp.asarray(local_dst),
        edge_chunk_src=jnp.asarray(chunk_src),
        edge_chunk_dst=jnp.asarray(chunk_dst),
        local_graph=None,
        node_chunk_graph=None,
        n_node_blocks=nb,
        n_graph_blocks=0,
        chunk_pair=jnp.asarray(chunk_pair),
        pair_src=jnp.asarray(pair_src),
        pair_dst=jnp.asarray(pair_dst),
        n_pairs=n_pairs,
        pair_chunk_order=jnp.asarray(pair_chunk_order),
        pair_sorted_ids=jnp.asarray(
            chunk_pair[pair_chunk_order].astype(np.int32)),
        pair_covered=jnp.asarray(pair_covered),
        n_pairs_int=n_pairs_int_pad,
        n_own_blocks=nb_own,
    )


# =================================================================== device

def _onehot(local: jax.Array, dtype) -> jax.Array:
    """[C, TILE] int32 -> [C, TILE, TILE] one-hot; values >= TILE give a zero
    row (pad sentinel)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, TILE), 2)
    return (local[:, :, None] == iota).astype(dtype)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 4))
def _onehot_einsum_cast(spec_fwd: str, spec_bwd: str, oh: jax.Array,
                        x: jax.Array, cd_name: str) -> jax.Array:
    cd = jnp.dtype(cd_name)
    return jnp.einsum(spec_fwd, oh.astype(cd), x.astype(cd),
                      preferred_element_type=x.dtype)


def _onehot_einsum_cast_fwd(spec_fwd, spec_bwd, oh, x, cd_name):
    return _onehot_einsum_cast(spec_fwd, spec_bwd, oh, x, cd_name), (oh,)


def _onehot_einsum_cast_bwd(spec_fwd, spec_bwd, cd_name, res, g):
    (oh,) = res
    cd = jnp.dtype(cd_name)
    # oh carries no gradient (one-hot routing of batch-constant indices) —
    # its zero cotangent is dropped/DCE'd.  The cotangent g carries the
    # output dtype (== x's dtype), which the transposed product must keep.
    return (jnp.zeros_like(oh),
            jnp.einsum(spec_bwd, oh.astype(cd), g.astype(cd),
                       preferred_element_type=g.dtype))


_onehot_einsum_cast.defvjp(_onehot_einsum_cast_fwd, _onehot_einsum_cast_bwd)


def _onehot_einsum(spec_fwd: str, spec_bwd: str, oh: jax.Array, x: jax.Array,
                   compute_dtype=None) -> jax.Array:
    """einsum(spec_fwd, oh, x), differentiable in x only.

    With compute_dtype (e.g. bfloat16) BOTH the forward and the backward
    matmul run with cast inputs and float32 accumulation — one-hot entries are
    exact in bf16, so the only rounding is on the data operand.  Without it,
    plain f32.  (A custom_vjp is needed because JAX's einsum transpose would
    otherwise promote the mixed f32-cotangent x bf16-residual product back to
    the slow f32 MXU path.  oh is an explicit argument, not a closure —
    closed-over tracers break custom_vjp when the surrounding shard_map is
    differentiated, as the edge-partitioned trainer does.)
    """
    if compute_dtype is None:
        return jnp.einsum(spec_fwd, oh, x, preferred_element_type=x.dtype)
    return _onehot_einsum_cast(spec_fwd, spec_bwd, oh, x,
                               jnp.dtype(compute_dtype).name)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _pair_adj_mm_cast(W, gp, cd_name):
    cd = jnp.dtype(cd_name)
    return jnp.einsum("pkij,pif->pkjf", W.astype(cd), gp.astype(cd),
                      preferred_element_type=gp.dtype)


def _pair_adj_mm_cast_fwd(W, gp, cd_name):
    return _pair_adj_mm_cast(W, gp, cd_name), (W,)


def _pair_adj_mm_cast_bwd(cd_name, res, dT):
    (W,) = res
    cd = jnp.dtype(cd_name)
    # W is a stop_gradient'd batch constant — zero cotangent, dropped/DCE'd;
    # the cotangent dT carries the output dtype (== gp's dtype)
    return (jnp.zeros_like(W),
            jnp.einsum("pkij,pkjf->pif", W.astype(cd), dT.astype(cd),
                       preferred_element_type=dT.dtype))


_pair_adj_mm_cast.defvjp(_pair_adj_mm_cast_fwd, _pair_adj_mm_cast_bwd)


def pair_adj_matmul(W: jax.Array, gp: jax.Array,
                    compute_dtype=None) -> jax.Array:
    """out[p,k,j,:] = sum_i W[p,k,i,j] * gp[p,i,:] — the decomposed edge
    stage as a batched dense matmul over per-pair adjacency blocks.

    W: [P, K, TILE, TILE] per-family weighted adjacency blocks (batch
    constants, stop_gradient'd by the caller); gp: [P, TILE, F] src node
    blocks gathered per pair.  With compute_dtype both directions run bf16
    inputs / f32 accumulation via a custom_vjp (W as an explicit argument —
    closed-over tracers break custom_vjp under differentiated shard_maps,
    the edge-partitioned trainer's structure); without it, a plain einsum
    whose transpose never reaches the stop_gradient'd W.
    """
    if compute_dtype is None:
        return jnp.einsum("pkij,pif->pkjf", W, gp,
                          preferred_element_type=gp.dtype)
    return _pair_adj_mm_cast(W, gp, jnp.dtype(compute_dtype).name)


# Route the adjacency-block build through the Pallas kernel
# (ops/pallas/adjacency.py) on TPU backends: the XLA lowering below is
# HBM-bound on materialized one-hots (~0.61 ms on the ZINC bench batch); the
# kernel generates them in VMEM (measured ~0.1 ms).  Module-level so tests
# and benchmarks can A/B the two lowerings.  TRACE-TIME switches, both of
# them: the branch is resolved against jax.default_backend() when the
# enclosing jit traces, so (a) jit(..., backend=...) overrides are not seen,
# and (b) flipping USE_ADJ_KERNEL after a step has been traced has no effect
# until the jit cache is dropped (e.g. fn.clear_cache()).  A/B comparisons
# must set the flag BEFORE first trace (bench.py does).
USE_ADJ_KERNEL = True


def build_pair_adjacency(weights: jax.Array, layout: MXULayout,
                         out_dtype=None) -> jax.Array:
    """[K, E] per-family edge weights -> [P, K, TILE, TILE] adjacency blocks.

    W[p, k, i, j] = sum of weights[k, e] over edges e of pair p with
    local_src[e]=i, local_dst[e]=j.  Pad edges must carry weight 0.  Built
    once per forward pass (weights are eig-dependent batch constants) and
    reused by every layer's pair_adj_matmul, forward and backward — this is
    what turns the reference's per-edge update_all reduce
    (reference realworld_benchmark/nets/dgn_layer.py:115) into pure MXU
    batched matmuls.
    """
    if USE_ADJ_KERNEL and layout.pair_chunk_order is not None \
            and jax.default_backend() in ("tpu", "axon"):
        from .pallas import adjacency
        return adjacency.build_pair_adjacency(weights, layout, out_dtype)
    k, e_pad = weights.shape
    c = e_pad // TILE
    # with out_dtype=bfloat16 the whole build AND the stored blocks run at
    # half the HBM traffic; one-hots are exact in bf16 and each block entry
    # sums <=TILE weights, so rounding stays at bf16 relative error
    dt = jnp.dtype(out_dtype) if out_dtype is not None else weights.dtype
    oh_s = _onehot(layout.local_src.reshape(c, TILE), dt)
    oh_d = _onehot(layout.local_dst.reshape(c, TILE), dt)
    ws = weights.astype(dt).reshape(k, c, TILE).transpose(1, 2, 0)  # [C,e,K]
    data = (oh_d[:, :, None, :] * ws[:, :, :, None]).reshape(
        c, TILE, k * TILE)                                    # [C, e, K*TILE]
    part = jnp.einsum("cei,cem->cim", oh_s, data,
                      preferred_element_type=dt)              # [C, i, K*TILE]
    wp = jax.ops.segment_sum(part, layout.chunk_pair, layout.n_pairs)
    return wp.reshape(layout.n_pairs, TILE, k, TILE).transpose(0, 2, 1, 3)


def block_gather(table: jax.Array, local: jax.Array, chunk_block: jax.Array,
                 compute_dtype=None) -> jax.Array:
    """rows[i] = table[chunk_block[i // TILE] * TILE + local[i]] as matmuls.

    table: [n_blocks*TILE, F].  Returns [C*TILE, F].  The only true gather is
    chunk-level ([C] rows); the within-block indexing is a one-hot matmul, so
    the backward pass is a matmul too (plus a [C]-row scatter — negligible).
    """
    squeeze = table.ndim == 1
    if squeeze:
        table = table[:, None]
    f = table.shape[-1]
    c = chunk_block.shape[0]
    tb = table.reshape(-1, TILE, f)[chunk_block]          # [C, TILE, F]
    oh = _onehot(local.reshape(c, TILE), table.dtype)
    out = _onehot_einsum("cen,cnf->cef", "cen,cef->cnf", oh, tb, compute_dtype)
    out = out.reshape(c * TILE, f)
    return out[:, 0] if squeeze else out


def block_scatter_sum(data: jax.Array, local: jax.Array,
                      chunk_block: jax.Array, n_blocks: int,
                      compute_dtype=None) -> jax.Array:
    """out[chunk_block[c]*TILE + local[c,e]] += data[c,e] as matmuls.

    data: [C*TILE, F].  Rows whose local index is >= TILE (pad sentinel) are
    dropped.  chunk_block must be non-decreasing.  Returns [n_blocks*TILE, F].
    """
    squeeze = data.ndim == 1
    if squeeze:
        data = data[:, None]
    f = data.shape[-1]
    c = chunk_block.shape[0]
    oh = _onehot(local.reshape(c, TILE), data.dtype)
    part = _onehot_einsum("cen,cef->cnf", "cen,cnf->cef", oh,
                          data.reshape(c, TILE, f), compute_dtype)
    out = jax.ops.segment_sum(part, chunk_block, n_blocks,
                              indices_are_sorted=True)
    out = out.reshape(n_blocks * TILE, f)
    return out[:, 0] if squeeze else out


def gather_src(h: jax.Array, layout: MXULayout, compute_dtype=None) -> jax.Array:
    """h[src] for every edge — replacement for segment.gather(h, gb.src)."""
    return block_gather(h, layout.local_src, layout.edge_chunk_src,
                        compute_dtype)


def gather_dst(h: jax.Array, layout: MXULayout, compute_dtype=None) -> jax.Array:
    return block_gather(h, layout.local_dst, layout.edge_chunk_dst,
                        compute_dtype)


def weighted_segment_sums(msg: jax.Array, weights: jax.Array,
                          layout: MXULayout, n_pad: int,
                          n_full: Optional[int] = None,
                          compute_dtype=None):
    """All weighted edge->dst reductions of the DGN layer in ONE matmul pass.

    msg: [E, F]; weights: [n_w, E] with pad edges already zero-weighted.
    The first `n_full` weight rows (default all) get full feature sums; every
    row gets its weight total (the directional normalizers S and the dir-dx
    centered term come from the totals).  Returns
    (sums [n_full, n_pad, F], totals [n_w, n_pad]).
    """
    n_w, e = weights.shape
    if n_full is None:
        n_full = n_w
    f = msg.shape[1]
    cols = [msg * weights[i][:, None] for i in range(n_full)]
    cols.append(weights.T)                                  # totals columns
    wide = jnp.concatenate(cols, axis=1)                    # [E, n_full*F + n_w]
    out = block_scatter_sum(wide, layout.local_dst, layout.edge_chunk_dst,
                            layout.n_node_blocks,
                            compute_dtype=compute_dtype)[:n_pad]
    sums = jnp.stack([out[:, i * f:(i + 1) * f] for i in range(n_full)]) \
        if n_full else jnp.zeros((0, n_pad, f), msg.dtype)
    totals = out[:, n_full * f:].T
    return sums, totals


def graph_pool_sum(h: jax.Array, layout: MXULayout, g_pad: int) -> jax.Array:
    """Per-graph sum over nodes (pad nodes excluded via the TILE sentinel)."""
    return block_scatter_sum(h, layout.local_graph, layout.node_chunk_graph,
                             layout.n_graph_blocks)[:g_pad]


def graph_broadcast(vg: jax.Array, layout: MXULayout) -> jax.Array:
    """Per-node copy of its graph's row (pad nodes get zeros)."""
    return block_gather(vg, layout.local_graph, layout.node_chunk_graph)


def onehot_embed(ids: jax.Array, table: jax.Array) -> jax.Array:
    """Embedding lookup as a one-hot matmul (backward = matmul, no scatter).

    Only worthwhile for small vocabularies (ZINC atoms/bonds, OGB atom/bond
    feature tables).
    """
    v = table.shape[0]
    oh = (ids[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, v), 1)
          ).astype(table.dtype)
    return jnp.dot(oh, table, preferred_element_type=table.dtype)
