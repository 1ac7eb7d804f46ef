"""GraphBatch: the static-shape batched-graph container at the heart of dgn_tpu.

TPU-first design: instead of DGL's dynamic object graph + degree-bucketed mailboxes
(reference: /root/reference/realworld_benchmark/nets/dgn_layer.py:115 `g.update_all`,
/root/reference/realworld_benchmark/data/molecules.py:219-230 `collate`), we pack a
list of small graphs into ONE flat, padded, fixed-shape struct:

  * node arrays  [N_pad, ...]  (features, eig vectors, per-node graph id, mask, degree)
  * edge arrays  [E_pad, ...]  (COO src/dst indices into the flat node axis, mask)
  * graph arrays [G_pad, ...]  (labels, node counts, mask)

All shapes are static per bucket -> XLA compiles once per bucket signature.
Padding is handled by explicit boolean masks; padded edges carry src=dst=0 with
mask False and are neutralized inside every segment reduction.  The true
in-degree is carried explicitly (`in_degree`) because the reference's scalers
use the real mailbox depth (reference nets/dgn_layer.py:96 `D = h.shape[-2]`),
which padding must never distort.

`snorm_n` / `snorm_e` replicate the reference collate normalizers
sqrt(1/num_nodes) / sqrt(1/num_edges) per graph
(reference data/molecules.py:219-228).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _field(**kw):
    return dataclasses.field(**kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloSpec:
    """Edge-partitioned execution: where each halo node slot's owner lives.

    Node axis layout under partitioning (parallel/halo.py):
      [0, n_local)          this shard's own nodes (incl. padding)
      [n_local, n_local+H)  halo slots — read-only copies of remote nodes

    After every layer updates h, the halo region is stale; halo_refresh()
    re-fetches it from the owners (the GNN analogue of ring-attention's
    block exchange, SURVEY.md §5) with BOUNDARY-ONLY traffic: each shard
    ships exactly the rows its peers' halos reference (send_idx), one
    all_to_all over `axis` swaps the buffers, and recv_perm routes received
    rows into halo slots.  Traffic per shard = P x S x F where S = max rows
    any (owner, peer) pair exchanges — proportional to the halo size, not
    to n_local (the legacy all_gather fallback shipped P x n_local x F).
    """
    halo_shard: jax.Array   # [H] int32 owner shard id per halo slot
    halo_local: jax.Array   # [H] int32 owner-local node index
    # boundary-only exchange plan (host-precomputed; None -> all_gather)
    send_idx: Optional[jax.Array] = None   # [P, S] own rows to send peer p
    recv_perm: Optional[jax.Array] = None  # [H] slot in the [P*S] recv buffer
    n_local: int = dataclasses.field(metadata=dict(static=True), default=0)
    axis: str = dataclasses.field(metadata=dict(static=True), default="ep")


def halo_pull(own: jax.Array, spec: HaloSpec) -> jax.Array:
    """Fetch fresh halo rows [H, ...] for this shard from the owner shards.

    Runs inside shard_map over spec.axis.  Boundary-only path: gather the
    requested own rows per peer ([P, S, F]), all_to_all (device q's received
    slot p = shard p's buffer for q — rides ICI), permute into halo slots.
    The gather/all_to_all are differentiable, so gradients flow back to the
    owner rows through the exchange transpose.  Returned separately from the
    own rows so callers can keep downstream work that only reads own rows
    free of any data dependency on the collective (exchange/compute overlap,
    ops/aggregators.aggregate_decomposed split path).
    """
    if spec.send_idx is None:              # legacy full-region exchange
        allh = jax.lax.all_gather(own, spec.axis)      # [P, n_local, ...]
        return allh[spec.halo_shard, spec.halo_local]
    send = own[spec.send_idx]                          # [P, S, ...]
    recv = jax.lax.all_to_all(send, spec.axis, split_axis=0, concat_axis=0,
                              tiled=True)              # [P, S, ...]
    flat = recv.reshape((-1,) + recv.shape[2:])        # [P*S, ...]
    return flat[spec.recv_perm]


def halo_refresh(h: jax.Array, spec: HaloSpec) -> jax.Array:
    """Refresh the halo region of per-node array h: [own | fresh halo]."""
    own = h[: spec.n_local]
    return jnp.concatenate([own, halo_pull(own, spec)], axis=0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphBatch:
    """A batch of graphs packed into flat padded arrays (a JAX pytree).

    Axes: N = padded node count, E = padded edge count, G = padded graph count.
    """

    # --- node axis [N, ...] ---
    node_feat: jax.Array            # [N] int32 (categorical) or [N, F] float
    node_mask: jax.Array            # [N] bool, True for real nodes
    node_graph: jax.Array           # [N] int32, graph id per node (pad -> G-1 slot ok, masked)
    eig: jax.Array                  # [N, K] float32 Laplacian eigvec features ('eig' ndata)
    in_degree: jax.Array            # [N] int32, true in-degree (0 for pad)
    snorm_n: jax.Array              # [N, 1] float32, sqrt(1/n_nodes(graph_of(v)))

    # --- edge axis [E, ...] ---
    src: jax.Array                  # [E] int32 source node index
    dst: jax.Array                  # [E] int32 destination node index
    edge_mask: jax.Array            # [E] bool
    edge_feat: Optional[jax.Array]  # [E] int32 or [E, Fe] float or None
    snorm_e: jax.Array              # [E, 1] float32

    # --- graph axis [G, ...] ---
    graph_mask: jax.Array           # [G] bool
    n_nodes: jax.Array              # [G] int32 true node count per graph
    n_edges: jax.Array              # [G] int32
    labels: Optional[jax.Array]     # [G, ...] task labels (graph-level) or None
    node_labels: Optional[jax.Array] = None   # [N] int32 (node-level tasks) or None
    pos_enc: Optional[jax.Array] = None       # [N, P] positional-encoding features or None
    # edge-partitioned execution: halo-region spec (parallel/halo.py)
    halo: Optional[HaloSpec] = None
    # block-diagonal MXU layout (ops/mxu.py): every gather/scatter on the
    # hot path becomes a 128x128 one-hot batched matmul
    mxu: Optional[object] = None
    # per-forward cached EdgeContext (ops/aggregators.py): eig deltas and
    # directional normalizers are constant across the L layers, so the model
    # attaches them once per forward pass instead of rebuilding per layer
    edge_ctx: Optional[object] = None

    # ------------------------------------------------------------------ sizes
    @property
    def num_nodes_padded(self) -> int:
        return self.node_mask.shape[0]

    @property
    def num_edges_padded(self) -> int:
        return self.edge_mask.shape[0]

    @property
    def num_graphs_padded(self) -> int:
        return self.graph_mask.shape[0]

    def real_edge_count(self):
        return jnp.sum(self.edge_mask.astype(jnp.int32))

    def real_node_count(self):
        return jnp.sum(self.node_mask.astype(jnp.int32))


# =====================================================================
# Host-side packing (numpy; feeds jit'd code with ready device arrays)
# =====================================================================

@dataclasses.dataclass
class GraphData:
    """One host-side graph: the minimal ingredients for packing.

    Mirrors what the reference stores on a DGLGraph: ndata['feat'], ndata['eig'],
    edata['feat'], edges COO (reference data/molecules.py:75-98).
    """
    num_nodes: int
    src: np.ndarray                 # [e] int
    dst: np.ndarray                 # [e] int
    node_feat: np.ndarray           # [n] or [n, F]
    eig: Optional[np.ndarray] = None          # [n, K]
    edge_feat: Optional[np.ndarray] = None    # [e] or [e, Fe]
    label: Optional[np.ndarray] = None        # graph label, any shape
    node_labels: Optional[np.ndarray] = None  # [n]
    pos_enc: Optional[np.ndarray] = None      # [n, P]

    @property
    def num_edges(self) -> int:
        return len(self.src)


def pack_graphs(
    graphs: Sequence[GraphData],
    *,
    n_pad: Optional[int] = None,
    e_pad: Optional[int] = None,
    g_pad: Optional[int] = None,
    k_eig: Optional[int] = None,
    sort_edges_by_dst: bool = True,
    mxu_layout: bool = False,
    native: Optional[bool] = None,
    n_pairs_pad: Optional[int] = None,
    ext_caps=None,
) -> GraphBatch:
    """Pack a list of graphs into one fixed-shape GraphBatch (numpy -> GraphBatch).

    The moral equivalent of `dgl.batch` + the reference collate
    (reference data/molecules.py:219-230), made shape-static: node/edge/graph
    axes are padded to (n_pad, e_pad, g_pad).  Edges are optionally sorted by
    destination so the segment reductions see monotone segment ids (lets
    XLA use sorted segment reductions).

    native: route the edge pipeline (offset + counting sort + degrees +
    normalizers) through the C++ packer
    (runtime/packer.cpp).  None = auto (use it when the library is
    available); output is bit-identical to the numpy path.
    """
    if mxu_layout:
        return _pack_graphs_mxu(graphs, n_pad=n_pad, e_pad=e_pad, g_pad=g_pad,
                                n_pairs_pad=n_pairs_pad,
                                k_eig=k_eig, ext_caps=ext_caps)
    if native is None:
        from . import runtime as _rt
        native = _rt.available()
    if native:
        return _pack_graphs_native(
            graphs, n_pad=n_pad, e_pad=e_pad, g_pad=g_pad, k_eig=k_eig,
            sort_edges_by_dst=sort_edges_by_dst)
    g = len(graphs)
    tot_n = sum(gr.num_nodes for gr in graphs)
    tot_e = sum(gr.num_edges for gr in graphs)
    n_pad = int(n_pad if n_pad is not None else tot_n)
    e_pad = int(e_pad if e_pad is not None else max(tot_e, 1))
    g_pad = int(g_pad if g_pad is not None else g)
    if tot_n > n_pad or tot_e > e_pad or g > g_pad:
        raise ValueError(
            f"pack overflow: need (n={tot_n}, e={tot_e}, g={g}) "
            f"but pad sizes are (n={n_pad}, e={e_pad}, g={g_pad})")

    if k_eig is None:
        k_eig = graphs[0].eig.shape[1] if (graphs and graphs[0].eig is not None) else 0

    nf0 = graphs[0].node_feat
    nf_shape = (n_pad,) + tuple(nf0.shape[1:])
    nf_dtype = nf0.dtype if nf0.dtype.kind == "f" else np.int32
    node_feat = np.zeros(nf_shape, dtype=nf_dtype)
    node_mask = np.zeros((n_pad,), dtype=bool)
    node_graph = np.full((n_pad,), max(g_pad - 1, 0), dtype=np.int32)
    eig = np.zeros((n_pad, k_eig), dtype=np.float32)
    snorm_n = np.zeros((n_pad, 1), dtype=np.float32)

    src = np.zeros((e_pad,), dtype=np.int32)
    dst = np.zeros((e_pad,), dtype=np.int32)
    edge_mask = np.zeros((e_pad,), dtype=bool)
    snorm_e = np.zeros((e_pad, 1), dtype=np.float32)

    has_ef = graphs[0].edge_feat is not None
    if has_ef:
        ef0 = graphs[0].edge_feat
        ef_shape = (e_pad,) + tuple(ef0.shape[1:])
        ef_dtype = ef0.dtype if ef0.dtype.kind == "f" else np.int32
        edge_feat = np.zeros(ef_shape, dtype=ef_dtype)
    else:
        edge_feat = None

    graph_mask = np.zeros((g_pad,), dtype=bool)
    n_nodes = np.zeros((g_pad,), dtype=np.int32)
    n_edges = np.zeros((g_pad,), dtype=np.int32)

    has_label = graphs[0].label is not None
    if has_label:
        lb0 = np.asarray(graphs[0].label)
        labels = np.zeros((g_pad,) + lb0.shape, dtype=np.float32 if lb0.dtype.kind == "f" else lb0.dtype)
    else:
        labels = None
    has_nl = graphs[0].node_labels is not None
    node_labels = np.zeros((n_pad,), dtype=np.int32) if has_nl else None
    has_pe = graphs[0].pos_enc is not None
    pos_enc = (np.zeros((n_pad, graphs[0].pos_enc.shape[1]), dtype=np.float32)
               if has_pe else None)

    n_off = 0
    e_off = 0
    for gi, gr in enumerate(graphs):
        n, e = gr.num_nodes, gr.num_edges
        sl_n = slice(n_off, n_off + n)
        sl_e = slice(e_off, e_off + e)
        node_feat[sl_n] = gr.node_feat
        node_mask[sl_n] = True
        node_graph[sl_n] = gi
        if k_eig and gr.eig is not None:
            eig[sl_n, : gr.eig.shape[1]] = gr.eig[:, :k_eig]
        snorm_n[sl_n] = np.sqrt(1.0 / max(n, 1))
        src[sl_e] = np.asarray(gr.src, dtype=np.int32) + n_off
        dst[sl_e] = np.asarray(gr.dst, dtype=np.int32) + n_off
        edge_mask[sl_e] = True
        snorm_e[sl_e] = np.sqrt(1.0 / max(e, 1))
        if has_ef:
            edge_feat[sl_e] = gr.edge_feat
        graph_mask[gi] = True
        n_nodes[gi] = n
        n_edges[gi] = e
        if has_label:
            labels[gi] = np.asarray(gr.label)
        if has_nl:
            node_labels[sl_n] = gr.node_labels
        if has_pe:
            pos_enc[sl_n] = gr.pos_enc
        n_off += n
        e_off += e

    if sort_edges_by_dst:
        # Stable sort real edges by dst; pad edges (dst=0, mask False) go first —
        # push them to the end instead by sorting on (not mask, dst).
        order = np.lexsort((src, dst, ~edge_mask))
        src, dst, edge_mask, snorm_e = src[order], dst[order], edge_mask[order], snorm_e[order]
        if has_ef:
            edge_feat = edge_feat[order]
        # pad edges carry the LAST node id so the dst sequence is truly
        # monotone — segment ops claim indices_are_sorted=True, and XLA:TPU
        # is entitled to exploit it
        src[~edge_mask] = n_pad - 1
        dst[~edge_mask] = n_pad - 1

    in_degree = np.zeros((n_pad,), dtype=np.int32)
    np.add.at(in_degree, dst[edge_mask], 1)

    return GraphBatch(
        node_feat=jnp.asarray(node_feat),
        node_mask=jnp.asarray(node_mask),
        node_graph=jnp.asarray(node_graph),
        eig=jnp.asarray(eig),
        in_degree=jnp.asarray(in_degree),
        snorm_n=jnp.asarray(snorm_n),
        src=jnp.asarray(src),
        dst=jnp.asarray(dst),
        edge_mask=jnp.asarray(edge_mask),
        edge_feat=None if edge_feat is None else jnp.asarray(edge_feat),
        snorm_e=jnp.asarray(snorm_e),
        graph_mask=jnp.asarray(graph_mask),
        n_nodes=jnp.asarray(n_nodes),
        n_edges=jnp.asarray(n_edges),
        labels=None if labels is None else jnp.asarray(labels),
        node_labels=None if node_labels is None else jnp.asarray(node_labels),
        pos_enc=None if pos_enc is None else jnp.asarray(pos_enc),
    )


def _pack_graphs_native(
    graphs: Sequence[GraphData],
    *,
    n_pad: Optional[int],
    e_pad: Optional[int],
    g_pad: Optional[int],
    k_eig: Optional[int],
    sort_edges_by_dst: bool,
) -> GraphBatch:
    """pack_graphs with the edge pipeline in C++ (runtime/packer.cpp):
    one native pass does offsetting, (dst, src) counting sort, masks,
    normalizers and in-degrees; features are packed with vectorized numpy
    concatenates and permuted by the returned edge permutation."""
    from . import runtime as rt

    g = len(graphs)
    n_nodes = np.array([gr.num_nodes for gr in graphs], np.int32)
    n_edges_arr = np.array([gr.num_edges for gr in graphs], np.int32)
    tot_n = int(n_nodes.sum())
    tot_e = int(n_edges_arr.sum())
    n_pad = int(n_pad if n_pad is not None else tot_n)
    e_pad = int(e_pad if e_pad is not None else max(tot_e, 1))
    g_pad = int(g_pad if g_pad is not None else g)
    if tot_n > n_pad or tot_e > e_pad or g > g_pad:
        raise ValueError(
            f"pack overflow: need (n={tot_n}, e={tot_e}, g={g}) "
            f"but pad sizes are (n={n_pad}, e={e_pad}, g={g_pad})")
    if k_eig is None:
        k_eig = graphs[0].eig.shape[1] if (graphs and graphs[0].eig is not None) else 0

    src_cat = (np.concatenate([np.asarray(gr.src, np.int32) for gr in graphs])
               if tot_e else np.zeros(0, np.int32))
    dst_cat = (np.concatenate([np.asarray(gr.dst, np.int32) for gr in graphs])
               if tot_e else np.zeros(0, np.int32))
    ed = rt.pack_edges(n_nodes, n_edges_arr, src_cat, dst_cat,
                       n_pad, e_pad, g_pad, sort_edges=sort_edges_by_dst)
    if sort_edges_by_dst:
        # mirror the numpy path: pad edges -> last node id (true monotonicity)
        pad = ~ed["edge_mask"]
        ed["src"][pad] = n_pad - 1
        ed["dst"][pad] = n_pad - 1

    # ---- vectorized feature packing
    nf0 = graphs[0].node_feat
    nf_dtype = nf0.dtype if nf0.dtype.kind == "f" else np.int32
    node_feat = np.zeros((n_pad,) + tuple(nf0.shape[1:]), dtype=nf_dtype)
    node_feat[:tot_n] = np.concatenate([gr.node_feat for gr in graphs])
    eig = np.zeros((n_pad, k_eig), dtype=np.float32)
    if k_eig and graphs[0].eig is not None:
        off = 0
        for gr in graphs:   # per-graph column pad (rare ragged k)
            if gr.eig is not None:
                w = min(gr.eig.shape[1], k_eig)
                eig[off:off + gr.num_nodes, :w] = gr.eig[:, :w]
            off += gr.num_nodes
    perm = ed["perm"]
    valid = perm >= 0
    edge_feat = None
    if graphs[0].edge_feat is not None:
        ef_cat = np.concatenate([gr.edge_feat for gr in graphs]) if tot_e \
            else np.zeros((0,) + np.shape(graphs[0].edge_feat)[1:])
        ef_dtype = ef_cat.dtype if ef_cat.dtype.kind == "f" else np.int32
        edge_feat = np.zeros((e_pad,) + tuple(ef_cat.shape[1:]), dtype=ef_dtype)
        edge_feat[valid] = ef_cat[perm[valid]]

    graph_mask = np.zeros((g_pad,), dtype=bool)
    graph_mask[:g] = True
    nn = np.zeros((g_pad,), np.int32)
    nn[:g] = n_nodes
    ne = np.zeros((g_pad,), np.int32)
    ne[:g] = n_edges_arr
    labels = None
    if graphs[0].label is not None:
        lb = np.stack([np.asarray(gr.label) for gr in graphs])
        labels = np.zeros((g_pad,) + lb.shape[1:],
                          dtype=np.float32 if lb.dtype.kind == "f" else lb.dtype)
        labels[:g] = lb
    node_labels = None
    if graphs[0].node_labels is not None:
        node_labels = np.zeros((n_pad,), dtype=np.int32)
        node_labels[:tot_n] = np.concatenate(
            [gr.node_labels for gr in graphs])
    pos_enc = None
    if graphs[0].pos_enc is not None:
        pos_enc = np.zeros((n_pad, graphs[0].pos_enc.shape[1]), np.float32)
        pos_enc[:tot_n] = np.concatenate([gr.pos_enc for gr in graphs])

    return GraphBatch(
        node_feat=jnp.asarray(node_feat),
        node_mask=jnp.asarray(ed["node_mask"]),
        node_graph=jnp.asarray(ed["node_graph"]),
        eig=jnp.asarray(eig),
        in_degree=jnp.asarray(ed["in_degree"]),
        snorm_n=jnp.asarray(ed["snorm_n"]),
        src=jnp.asarray(ed["src"]),
        dst=jnp.asarray(ed["dst"]),
        edge_mask=jnp.asarray(ed["edge_mask"]),
        edge_feat=None if edge_feat is None else jnp.asarray(edge_feat),
        snorm_e=jnp.asarray(ed["snorm_e"]),
        graph_mask=jnp.asarray(graph_mask),
        n_nodes=jnp.asarray(nn),
        n_edges=jnp.asarray(ne),
        labels=None if labels is None else jnp.asarray(labels),
        node_labels=None if node_labels is None else jnp.asarray(node_labels),
        pos_enc=None if pos_enc is None else jnp.asarray(pos_enc),
    )


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# =====================================================================
# Block-diagonal MXU packing (ops/mxu.py layout)
# =====================================================================

_TILE = 128


def _mxu_place(sizes: Sequence[int]) -> tuple[np.ndarray, int]:
    """Node offsets such that no graph straddles a 128-node block boundary
    (graphs >128 nodes are placed as-is; their edges get per-block-pair
    chunks) and node blocks never mix graphs from two 128-graph blocks."""
    offsets = np.zeros(len(sizes), np.int64)
    cur = 0
    for gi, n in enumerate(sizes):
        if gi > 0 and gi % _TILE == 0:
            cur = round_up(cur, _TILE)          # new graph block
        if n <= _TILE and (cur % _TILE) + n > _TILE:
            cur = round_up(cur, _TILE)          # doesn't fit the remainder
        offsets[gi] = cur
        cur += n
    return offsets, round_up(cur, _TILE)


def _mxu_edge_arrange(src: np.ndarray, dst: np.ndarray):
    """Sort edges by (dst_block, src_block, dst, src) and pad every
    (src_block, dst_block) run to whole 128-edge chunks.

    Returns (order into the original edge arrays, pad mask False rows,
    padded src, padded dst) with pad slots pointing at their chunk's block
    starts (masked everywhere downstream)."""
    db = dst // _TILE
    sb = src // _TILE
    order = np.lexsort((src, dst, sb, db))
    src_s, dst_s = src[order], dst[order]
    db_s, sb_s = db[order], sb[order]
    # run boundaries on (db, sb)
    if len(order):
        new_run = np.ones(len(order), bool)
        new_run[1:] = (db_s[1:] != db_s[:-1]) | (sb_s[1:] != sb_s[:-1])
        run_starts = np.nonzero(new_run)[0]
        run_ends = np.append(run_starts[1:], len(order))
    else:
        run_starts = run_ends = np.zeros(0, np.int64)
    out_order, out_src, out_dst, out_valid = [], [], [], []
    for s, e in zip(run_starts, run_ends):
        k = e - s
        padded = round_up(k, _TILE)
        idx = np.full(padded, -1, np.int64)
        idx[:k] = order[s:e]
        ss = np.full(padded, sb_s[s] * _TILE, np.int32)
        dd = np.full(padded, db_s[s] * _TILE, np.int32)
        ss[:k] = src_s[s:e]
        dd[:k] = dst_s[s:e]
        v = np.zeros(padded, bool)
        v[:k] = True
        out_order.append(idx)
        out_src.append(ss)
        out_dst.append(dd)
        out_valid.append(v)
    if not out_order:
        return (np.zeros(0, np.int64), np.zeros(0, np.int32),
                np.zeros(0, np.int32), np.zeros(0, bool))
    return (np.concatenate(out_order), np.concatenate(out_src),
            np.concatenate(out_dst), np.concatenate(out_valid))


def mxu_bucket_sizes(graphs: Sequence["GraphData"], batch_size: int,
                     slack: float = 1.05) -> tuple[int, int, int]:
    """(n_pad, e_pad, g_pad) so any `batch_size` subset packs under the MXU
    layout: simulate greedy placement on the worst (largest) graphs, then add
    slack for shuffling variance.  pack raises on overflow, so a too-tight
    estimate fails loudly, never silently."""
    ns = np.sort(np.array([g.num_nodes for g in graphs]))[::-1][:batch_size]
    _, n_used = _mxu_place(ns.tolist())
    es = np.sort(np.array([g.num_edges for g in graphs]))[::-1][:batch_size]
    n_blocks = n_used // _TILE
    e_used = int(es.sum()) + (_TILE - 1) * max(n_blocks, 1)
    n_pad = round_up(int(n_used * slack) + _TILE, _TILE)
    e_pad = round_up(int(e_used * slack) + _TILE, _TILE)
    return n_pad, e_pad, round_up(batch_size, _TILE)


def _pack_graphs_mxu(
    graphs: Sequence[GraphData],
    *,
    n_pad: Optional[int],
    e_pad: Optional[int],
    g_pad: Optional[int],
    k_eig: Optional[int],
    n_pairs_pad: Optional[int] = None,
    ext_caps=None,
) -> GraphBatch:
    """pack_graphs under the block-diagonal MXU layout (ops/mxu.py).

    Same GraphBatch semantics as the flat packing — node/edge/graph arrays,
    masks, degrees, normalizers — but nodes are placed so graphs never cross
    128-node blocks, edges are chunked per (src_block, dst_block), and the
    graph axis is 128-aligned.  gb.mxu carries the block structure; gb.dst is
    NOT globally sorted (segment ops must not claim sortedness).
    """
    from .ops.mxu import build_mxu_layout

    g = len(graphs)
    sizes = [gr.num_nodes for gr in graphs]
    offsets, n_used = _mxu_place(sizes)
    g_pad = round_up(int(g_pad if g_pad is not None else g), _TILE)
    n_pad = int(n_pad if n_pad is not None else n_used)
    if n_pad % _TILE:
        raise ValueError(f"mxu n_pad must be a multiple of {_TILE}")
    if n_used > n_pad or g > g_pad:
        raise ValueError(f"mxu pack overflow: need (n={n_used}, g={g}) "
                         f"but pad sizes are (n={n_pad}, g={g_pad})")
    if k_eig is None:
        k_eig = graphs[0].eig.shape[1] if (graphs and graphs[0].eig is not None) else 0

    # ---- node/graph arrays at the block-aligned offsets
    nf0 = graphs[0].node_feat
    nf_dtype = nf0.dtype if nf0.dtype.kind == "f" else np.int32
    node_feat = np.zeros((n_pad,) + tuple(nf0.shape[1:]), dtype=nf_dtype)
    node_mask = np.zeros((n_pad,), dtype=bool)
    node_graph = np.zeros((n_pad,), dtype=np.int32)
    eig = np.zeros((n_pad, k_eig), dtype=np.float32)
    snorm_n = np.zeros((n_pad, 1), dtype=np.float32)
    has_nl = graphs[0].node_labels is not None
    node_labels = np.zeros((n_pad,), dtype=np.int32) if has_nl else None
    has_pe = graphs[0].pos_enc is not None
    pos_enc = (np.zeros((n_pad, graphs[0].pos_enc.shape[1]), np.float32)
               if has_pe else None)

    graph_mask = np.zeros((g_pad,), dtype=bool)
    n_nodes = np.zeros((g_pad,), dtype=np.int32)
    n_edges = np.zeros((g_pad,), dtype=np.int32)
    has_label = graphs[0].label is not None
    if has_label:
        lb0 = np.asarray(graphs[0].label)
        labels = np.zeros((g_pad,) + lb0.shape,
                          dtype=np.float32 if lb0.dtype.kind == "f" else lb0.dtype)
    else:
        labels = None

    tot_e = sum(gr.num_edges for gr in graphs)
    src_flat = np.zeros((tot_e,), np.int64)
    dst_flat = np.zeros((tot_e,), np.int64)
    e_graph = np.zeros((tot_e,), np.int32)
    e_off = 0
    for gi, gr in enumerate(graphs):
        n, e = gr.num_nodes, gr.num_edges
        off = int(offsets[gi])
        sl_n = slice(off, off + n)
        node_feat[sl_n] = gr.node_feat
        node_mask[sl_n] = True
        node_graph[sl_n] = gi
        if k_eig and gr.eig is not None:
            eig[sl_n, : gr.eig.shape[1]] = gr.eig[:, :k_eig]
        snorm_n[sl_n] = np.sqrt(1.0 / max(n, 1))
        if has_nl:
            node_labels[sl_n] = gr.node_labels
        if has_pe:
            pos_enc[sl_n] = gr.pos_enc
        graph_mask[gi] = True
        n_nodes[gi] = n
        n_edges[gi] = e
        if has_label:
            labels[gi] = np.asarray(gr.label)
        src_flat[e_off:e_off + e] = np.asarray(gr.src, np.int64) + off
        dst_flat[e_off:e_off + e] = np.asarray(gr.dst, np.int64) + off
        e_graph[e_off:e_off + e] = gi
        e_off += e
    # pad nodes: keep node_graph monotone (flat segment ops may claim sorted)
    run = np.maximum.accumulate(np.where(node_mask, node_graph, 0))
    node_graph = np.where(node_mask, node_graph, run).astype(np.int32)

    # ---- edge arrangement into (src_block, dst_block) chunks
    order, src_p, dst_p, edge_valid = _mxu_edge_arrange(
        src_flat.astype(np.int32), dst_flat.astype(np.int32))
    e_used = len(src_p)
    e_pad = int(e_pad if e_pad is not None else max(e_used, _TILE))
    if e_pad % _TILE:
        raise ValueError(f"mxu e_pad must be a multiple of {_TILE}")
    if e_used > e_pad:
        raise ValueError(f"mxu pack overflow: need e={e_used} "
                         f"but e_pad={e_pad}")
    src = np.full((e_pad,), n_pad - _TILE, np.int32)
    dst = np.full((e_pad,), n_pad - _TILE, np.int32)
    edge_mask = np.zeros((e_pad,), bool)
    src[:e_used] = src_p
    dst[:e_used] = dst_p
    edge_mask[:e_used] = edge_valid
    snorm_e = np.zeros((e_pad, 1), np.float32)
    real = np.nonzero(edge_mask)[0]
    eg = e_graph[order[edge_valid]]
    snorm_e[real, 0] = np.sqrt(1.0 / np.maximum(n_edges[eg], 1))
    has_ef = graphs[0].edge_feat is not None
    edge_feat = None
    if has_ef:
        ef_cat = np.concatenate([np.asarray(gr.edge_feat) for gr in graphs]) \
            if tot_e else np.zeros((0,) + np.shape(graphs[0].edge_feat)[1:])
        ef_dtype = ef_cat.dtype if ef_cat.dtype.kind == "f" else np.int32
        edge_feat = np.zeros((e_pad,) + tuple(ef_cat.shape[1:]), dtype=ef_dtype)
        edge_feat[real] = ef_cat[order[edge_valid]]

    in_degree = np.zeros((n_pad,), dtype=np.int32)
    np.add.at(in_degree, dst[edge_mask], 1)

    layout = build_mxu_layout(src, dst, edge_mask, node_graph, node_mask,
                              n_pad, g_pad, n_pairs_pad=n_pairs_pad,
                              ext_caps=ext_caps)

    return GraphBatch(
        node_feat=jnp.asarray(node_feat),
        node_mask=jnp.asarray(node_mask),
        node_graph=jnp.asarray(node_graph),
        eig=jnp.asarray(eig),
        in_degree=jnp.asarray(in_degree),
        snorm_n=jnp.asarray(snorm_n),
        src=jnp.asarray(src),
        dst=jnp.asarray(dst),
        edge_mask=jnp.asarray(edge_mask),
        edge_feat=None if edge_feat is None else jnp.asarray(edge_feat),
        snorm_e=jnp.asarray(snorm_e),
        graph_mask=jnp.asarray(graph_mask),
        n_nodes=jnp.asarray(n_nodes),
        n_edges=jnp.asarray(n_edges),
        labels=None if labels is None else jnp.asarray(labels),
        node_labels=None if node_labels is None else jnp.asarray(node_labels),
        pos_enc=None if pos_enc is None else jnp.asarray(pos_enc),
        mxu=layout,
    )


def bucket_sizes_for(
    graphs: Sequence[GraphData],
    batch_size: int,
    *,
    node_multiple: int = 128,
    edge_multiple: int = 128,
) -> tuple[int, int]:
    """Choose (n_pad, e_pad) so ANY subset of `batch_size` graphs fits.

    Bound = sum of the batch_size largest graphs (safe under shuffling),
    rounded up to TPU-lane-friendly multiples so downstream kernels tile
    cleanly.
    """
    ns = np.sort(np.array([g.num_nodes for g in graphs]))[::-1]
    es = np.sort(np.array([g.num_edges for g in graphs]))[::-1]
    cn = int(ns[:batch_size].sum())
    ce = int(max(es[:batch_size].sum(), 1))
    return (round_up(cn + 1, node_multiple), round_up(ce, edge_multiple))


def mxu_pairs_needed(batch: Sequence[GraphData]) -> int:
    """Distinct (src_block, dst_block) pair count this batch needs under the
    MXU layout (descending next-fit placement, the loaders' order)."""
    batch = sorted(batch, key=lambda g: -g.num_nodes)
    offsets, _ = _mxu_place([g.num_nodes for g in batch])
    if not batch:
        return 1
    src = np.concatenate([np.asarray(g.src, np.int64) + offsets[i]
                          for i, g in enumerate(batch)])
    dst = np.concatenate([np.asarray(g.dst, np.int64) + offsets[i]
                          for i, g in enumerate(batch)])
    if not len(src):
        return 1
    return len(np.unique((dst // _TILE) << 32 | (src // _TILE)))


def mxu_ext_caps(graphs: Sequence[GraphData]) -> tuple[int, int]:
    """Loader-stable (ext_passes, ext_block_chunks) caps for batches of these
    graphs (MXULayout static extremes metadata — every batch a loader yields
    at one geometry must share it, like n_pairs).

    ext_passes is a SOUND bound (within-chunk runs never exceed the max
    in-degree).  ext_block_chunks is a heuristic (chunks-per-dst-block
    depends on placement); a rare batch that exceeds it makes
    build_mxu_layout raise and takes the loader's escape-repack path, so
    tightness can never corrupt results.
    """
    maxdeg = 1
    span = 1
    for g in graphs:
        if g.num_edges:
            maxdeg = max(maxdeg, int(np.bincount(
                np.asarray(g.dst), minlength=g.num_nodes).max()))
        span = max(span, -(-g.num_nodes // _TILE))
    p = max(int(np.ceil(np.log2(min(max(maxdeg, 2), _TILE)))), 1)
    passes = p if p <= 5 else 7
    # per dst block: <= #pairs into it + in-edges/128; heuristic margin for
    # multi-block graphs sharing blocks (escape covers the tail)
    m = maxdeg + 2 * span + 2
    return passes, 1 << int(np.ceil(np.log2(m)))


def mxu_pair_pad(graphs: Sequence[GraphData], batch_size: int,
                 n_pad: int, e_pad: int) -> int:
    """Loader-stable bound on the (src_block, dst_block) pair count of ANY
    batch_size-subset packed at (n_pad, e_pad).

    n_pairs is STATIC pytree metadata of MXULayout: every batch a loader
    yields at one bucket geometry must share it, or each batch would compile
    its own program (and super-batch stacking would fail).  Within-block
    (diagonal) pairs are bounded by the node-block count; off-diagonal pairs
    only come from graphs spanning multiple 128-node blocks, each
    contributing at most B*(B-1) with B = blocks spanned (+1 for unaligned
    placement); everything is capped by the chunk count e_pad/128.  A batch
    that still overflows raises in build_mxu_layout and takes the loader's
    escape-repack path like any other geometry overflow.
    """
    nb = max(n_pad // _TILE, 1)
    big = sorted((g.num_nodes for g in graphs if g.num_nodes > _TILE),
                 reverse=True)[:batch_size]
    off = sum((n // _TILE + 2) * (n // _TILE + 1) for n in big)
    return min(round_up(nb + off, 64), max(e_pad // _TILE, 1))


def pack_requirements(batch: Sequence[GraphData],
                      mxu_layout: bool = False) -> tuple[int, int]:
    """EXACT (n_used, e_used) slots pack_graphs needs for this batch.

    flat: total nodes (+1 ghost) and total edges.
    mxu: simulate block placement (_mxu_place) and per-(src_block, dst_block)
    run padding (_mxu_edge_arrange) — cheap host numpy, no arrays retained.
    Assumes the batch is packed in DESCENDING num_nodes order (what the
    loaders do under the mxu layout): block placement is order-sensitive,
    and descending next-fit is the order all geometry estimates simulate.
    """
    if not mxu_layout:
        tot_n = sum(g.num_nodes for g in batch)
        tot_e = max(sum(g.num_edges for g in batch), 1)
        return tot_n + 1, tot_e
    batch = sorted(batch, key=lambda g: -g.num_nodes)
    sizes = [g.num_nodes for g in batch]
    offsets, n_used = _mxu_place(sizes)
    src = np.concatenate([np.asarray(g.src, np.int64) + offsets[i]
                          for i, g in enumerate(batch)]).astype(np.int32) \
        if batch else np.zeros(0, np.int32)
    dst = np.concatenate([np.asarray(g.dst, np.int64) + offsets[i]
                          for i, g in enumerate(batch)]).astype(np.int32) \
        if batch else np.zeros(0, np.int32)
    _, src_p, _, _ = _mxu_edge_arrange(src, dst)
    return n_used, max(len(src_p), _TILE)


def typical_bucket_sizes(
    graphs: Sequence[GraphData],
    batch_size: int,
    *,
    mxu_layout: bool = False,
    probe_epochs: int = 4,
    slack: float = 1.10,
    seed: int = 0,
    multiple: int = 128,
) -> tuple[int, int]:
    """(n_pad, e_pad) sized for TYPICAL shuffled batches, not the worst case.

    The any-subset bound (bucket_sizes_for / mxu_bucket_sizes) is the sum of
    the batch_size LARGEST graphs — on ZINC-shaped data that leaves ~60% of
    edge slots permanently padded, and padded slots cost real MXU compute
    under the block layout.  This instead simulates `probe_epochs` shuffled
    epochs, takes the max exact requirement seen, and adds `slack`.  A batch
    that still overflows makes pack_graphs raise — callers (data/loader.py)
    catch that and repack at the worst-case geometry (one extra compiled
    shape, rare by construction), so tightness can never corrupt results.
    """
    rng = np.random.default_rng(seed)
    idx = np.arange(len(graphs))
    need_n = need_e = 1
    for _ in range(probe_epochs):
        rng.shuffle(idx)
        for i in range(0, len(idx), batch_size):
            chunk = [graphs[j] for j in idx[i:i + batch_size]]
            n_used, e_used = pack_requirements(chunk, mxu_layout=mxu_layout)
            need_n = max(need_n, n_used)
            need_e = max(need_e, e_used)
    n_pad = round_up(int(need_n * slack) + 1, multiple)
    e_pad = round_up(int(need_e * slack), multiple)
    if mxu_layout:
        worst = mxu_bucket_sizes(graphs, batch_size)
        return min(n_pad, worst[0]), min(e_pad, worst[1])
    worst = bucket_sizes_for(graphs, batch_size)
    return min(n_pad, worst[0]), min(e_pad, worst[1])
