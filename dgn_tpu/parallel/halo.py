"""Edge-partitioned graph parallelism: shard ONE batch's node/edge axes.

The reference never scales a single large structure (SURVEY.md §5); this is
the framework's graph analogue of sequence/context parallelism: the packed
node axis is cut into P contiguous ranges balanced by edge count, every edge
lives on the shard that OWNS its destination node (owner-compute), and each
shard carries a read-only halo region with copies of the remote source nodes
its edges reference.  Per layer, one boundary-only all_to_all over the 'ep'
mesh axis refreshes the halo (graph.halo_refresh): each shard ships exactly
the rows its peers' halos reference (send_idx/recv_perm exchange plan built
below; an all_gather fallback exists only for specs without a plan);
per-graph readouts psum partial pools.  The per-node segment-sums distribute exactly like ring attention's
softmax-free accumulations — associative reductions over a sharded axis.

Gradients are taken OUTSIDE shard_map (loss is a replicated scalar function
of the shard_mapped forward), so cross-shard terms flow through the
all_gather/psum transposes and no manual gradient collectives are needed.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..graph import GraphBatch, GraphData, HaloSpec
from ..train.trainer import TrainParams, Trainer, TrainState


def _round_up(x: int, m: int) -> int:
    return max(((x + m - 1) // m) * m, m)


def partition_batch(graphs: Sequence[GraphData], n_shards: int,
                    g_pad: Optional[int] = None, axis: str = "ep",
                    multiple: int = 8, layout: str = "flat") -> GraphBatch:
    """Pack graphs into ONE batch partitioned over n_shards (leading axis P).

    Node axis cut into contiguous ranges with ~balanced edge counts; all
    shards share static shapes (max local nodes / edges / halo, rounded up).
    Graph-level arrays (labels, masks, counts) are replicated per shard.

    layout="mxu": each shard's [own | halo] node axis is 128-block-aligned
    and its edges are arranged into (src_block, dst_block) chunks, so the
    decomposed edge stage runs the block-adjacency MXU matmuls
    (ops/mxu.build_mxu_layout_ep) — with pairs split interior/boundary so
    interior aggregation overlaps the halo exchange.  layout="flat" keeps the
    plain COO segment path.
    """
    g = len(graphs)
    g_pad = int(g_pad or g)

    # ---- global host-side concat (no padding)
    tot_n = sum(gr.num_nodes for gr in graphs)
    node_feat = np.concatenate([np.asarray(gr.node_feat) for gr in graphs])
    if node_feat.dtype.kind != "f":
        node_feat = node_feat.astype(np.int32)
    k_eig = graphs[0].eig.shape[1] if graphs[0].eig is not None else 0
    eig = (np.concatenate([gr.eig for gr in graphs]).astype(np.float32)
           if k_eig else np.zeros((tot_n, 0), np.float32))
    node_graph = np.concatenate([np.full(gr.num_nodes, i, np.int32)
                                 for i, gr in enumerate(graphs)])
    snorm_n = np.concatenate([np.full((gr.num_nodes, 1),
                                      np.float32(np.sqrt(1.0 / max(gr.num_nodes, 1))))
                              for gr in graphs])
    node_labels = (np.concatenate([gr.node_labels for gr in graphs]).astype(np.int32)
                   if graphs[0].node_labels is not None else None)
    pos_enc = (np.concatenate([gr.pos_enc for gr in graphs]).astype(np.float32)
               if graphs[0].pos_enc is not None else None)

    offs = np.cumsum([0] + [gr.num_nodes for gr in graphs])
    src = np.concatenate([np.asarray(gr.src, np.int64) + offs[i]
                          for i, gr in enumerate(graphs)])
    dst = np.concatenate([np.asarray(gr.dst, np.int64) + offs[i]
                          for i, gr in enumerate(graphs)])
    snorm_e = np.concatenate([np.full((gr.num_edges, 1),
                                      np.float32(np.sqrt(1.0 / max(gr.num_edges, 1))))
                              for gr in graphs])
    edge_feat = None
    if graphs[0].edge_feat is not None:
        edge_feat = np.concatenate([gr.edge_feat for gr in graphs])
        if edge_feat.dtype.kind != "f":
            edge_feat = edge_feat.astype(np.int32)

    # ---- cut node axis into P ranges balancing edge count (by dst)
    deg = np.bincount(dst, minlength=tot_n)
    cum = np.concatenate([[0], np.cumsum(deg)])
    total_e = cum[-1]
    cuts = [0]
    for p in range(1, n_shards):
        target = total_e * p / n_shards
        cuts.append(int(np.searchsorted(cum, target)))
    cuts.append(tot_n)
    cuts = sorted(set(cuts))
    while len(cuts) < n_shards + 1:      # degenerate tiny inputs
        cuts.append(tot_n)
    los, his = np.array(cuts[:-1]), np.array(cuts[1:])

    shard_of_node = np.zeros(tot_n, np.int32)
    for p in range(n_shards):
        shard_of_node[los[p]:his[p]] = p

    # ---- per-shard membership
    e_shard = shard_of_node[dst]
    per_e = [np.nonzero(e_shard == p)[0] for p in range(n_shards)]
    halos: List[np.ndarray] = []
    for p in range(n_shards):
        s = src[per_e[p]]
        remote = np.unique(s[(s < los[p]) | (s >= his[p])])
        halos.append(remote)

    if layout not in ("flat", "mxu"):
        raise ValueError(f"unknown ep layout {layout!r}")
    if layout == "mxu":
        multiple = 128
    n_loc_pad = _round_up(int((his - los).max()), multiple)
    h_pad = _round_up(max((len(h) for h in halos), default=1), multiple)
    e_pad = _round_up(max((len(e) for e in per_e), default=1), multiple)
    n_ext = n_loc_pad + h_pad

    # ---- per-shard local edge endpoints (dst always own; src own or halo)
    shard_lsrc, shard_ldst = [], []
    for p in range(n_shards):
        lo, hi = int(los[p]), int(his[p])
        halo_pos = {int(v): i for i, v in enumerate(halos[p])}
        gsrc = src[per_e[p]]
        lsrc = np.where((gsrc >= lo) & (gsrc < hi), gsrc - lo, 0)
        is_remote = (gsrc < lo) | (gsrc >= hi)
        if is_remote.any():
            lsrc = lsrc.copy()
            lsrc[is_remote] = np.array(
                [n_loc_pad + halo_pos[int(v)] for v in gsrc[is_remote]])
        shard_lsrc.append(lsrc.astype(np.int32))
        shard_ldst.append((dst[per_e[p]] - lo).astype(np.int32))

    # ---- edge arrangement per layout: (slot->edge perm with -1 pads,
    # src, dst, mask) all at a shard-uniform e_pad, plus the block layout
    mxu_layouts = None
    if layout == "mxu":
        from ..graph import _mxu_edge_arrange
        from ..ops.mxu import TILE, build_mxu_layout_ep
        arranged = [_mxu_edge_arrange(shard_lsrc[p], shard_ldst[p])
                    for p in range(n_shards)]
        e_pad = _round_up(max((len(a[1]) for a in arranged), default=1), TILE)
        nb, nb_own = n_ext // TILE, n_loc_pad // TILE
        shard_arr = []
        for order, src_p, dst_p, valid in arranged:
            e_used = len(src_p)
            s_arr = np.full(e_pad, n_ext - TILE, np.int32)
            d_arr = np.full(e_pad, n_ext - TILE, np.int32)
            em = np.zeros(e_pad, bool)
            perm = np.full(e_pad, -1, np.int64)
            s_arr[:e_used] = src_p
            d_arr[:e_used] = dst_p
            em[:e_used] = valid
            perm[:e_used] = order
            csb = s_arr.reshape(-1, TILE)[:, 0] // TILE
            cdb = d_arr.reshape(-1, TILE)[:, 0] // TILE
            keys = np.unique(cdb.astype(np.int64) * nb + csb)
            n_int = int(((keys % nb) < nb_own).sum())
            shard_arr.append((perm, s_arr, d_arr, em, n_int,
                              len(keys) - n_int))
        ip = _round_up(max(x[4] for x in shard_arr), 8)
        bp = _round_up(max(x[5] for x in shard_arr), 8)
        mxu_layouts = [
            build_mxu_layout_ep(s, d, em, n_ext, nb_own, ip, bp)
            for _, s, d, em, _, _ in shard_arr]
        shard_edge_plan = [(x[0], x[1], x[2], x[3]) for x in shard_arr]
    else:
        shard_edge_plan = []
        for p in range(n_shards):
            lsrc, ldst = shard_lsrc[p], shard_ldst[p]
            order = np.lexsort((lsrc, ldst))
            e_real = len(order)
            perm = np.full(e_pad, -1, np.int64)
            s_arr = np.zeros(e_pad, np.int32)
            d_arr = np.zeros(e_pad, np.int32)
            em = np.zeros(e_pad, bool)
            perm[:e_real] = order
            s_arr[:e_real] = lsrc[order]
            d_arr[:e_real] = ldst[order]
            em[:e_real] = True
            shard_edge_plan.append((perm, s_arr, d_arr, em))

    # ---- boundary-only exchange plan (graph.halo_refresh): send_lists[p][q]
    # = p-local row ids that q's halo references, in q's (sorted) halo order
    send_lists = [[halos[q][shard_of_node[halos[q]] == p] - los[p]
                   for q in range(n_shards)] for p in range(n_shards)]
    s_max = max((len(l) for row in send_lists for l in row), default=1)
    s_max = max(int(s_max), 1)

    # ---- build each shard's arrays
    def zeros_like_cols(a, rows):
        return np.zeros((rows,) + a.shape[1:], a.dtype)

    out_shards = []
    for p in range(n_shards):
        lo, hi = int(los[p]), int(his[p])
        n_loc = hi - lo
        halo = halos[p]
        n_halo = len(halo)
        # extended node arrays: [own | pad | halo | pad]
        def ext(a):
            e_ = zeros_like_cols(a, n_ext)
            e_[:n_loc] = a[lo:hi]
            e_[n_loc_pad:n_loc_pad + n_halo] = a[halo]
            return e_
        nf = ext(node_feat)
        eg = ext(eig)
        sn = ext(snorm_n)
        ng = np.full(n_ext, g_pad - 1, np.int32)
        ng[:n_loc] = node_graph[lo:hi]     # halo rows masked -> ghost graph id
        nm = np.zeros(n_ext, bool)
        nm[:n_loc] = True
        nl = ext(node_labels) if node_labels is not None else None
        pe = ext(pos_enc) if pos_enc is not None else None

        # edge arrays from the per-layout arrangement; perm maps edge slots
        # back into this shard's edge list (-1 for pad slots)
        perm, s_arr, d_arr, em = shard_edge_plan[p]
        es = per_e[p]
        sel = perm >= 0
        se = np.zeros((e_pad, 1), np.float32)
        se[sel] = snorm_e[es][perm[sel]]
        ef = None
        if edge_feat is not None:
            ef = zeros_like_cols(edge_feat, e_pad)
            ef[sel] = edge_feat[es][perm[sel]]
        indeg = np.zeros(n_ext, np.int32)
        np.add.at(indeg, d_arr[em], 1)

        # graph arrays: replicated
        gm = np.zeros(g_pad, bool)
        gm[:g] = True
        nn = np.zeros(g_pad, np.int32)
        nn[:g] = [gr.num_nodes for gr in graphs]
        ne = np.zeros(g_pad, np.int32)
        ne[:g] = [gr.num_edges for gr in graphs]
        labels = None
        if graphs[0].label is not None:
            lb = np.stack([np.asarray(gr.label) for gr in graphs])
            labels = np.zeros((g_pad,) + lb.shape[1:],
                              np.float32 if lb.dtype.kind == "f" else lb.dtype)
            labels[:g] = lb

        hs = np.zeros(h_pad, np.int32)
        hl = np.zeros(h_pad, np.int32)
        hs[:n_halo] = shard_of_node[halo]
        hl[:n_halo] = halo - los[shard_of_node[halo]]

        # sender plan: rows of p to ship to each peer q (0-padded)
        si = np.zeros((n_shards, s_max), np.int32)
        for q in range(n_shards):
            l = send_lists[p][q]
            si[q, :len(l)] = l
        # receiver plan: halo slot j <- recv buffer [owner * S + rank], rank
        # = j's position among this halo's entries with the same owner (the
        # order send_lists was built in)
        owners = shard_of_node[halo]
        rank = np.zeros(n_halo, np.int64)
        for o in np.unique(owners):
            m = owners == o
            rank[m] = np.arange(int(m.sum()))
        rp = np.zeros(h_pad, np.int32)
        rp[:n_halo] = owners * s_max + rank

        out_shards.append(dict(
            node_feat=nf, node_mask=nm, node_graph=ng, eig=eg,
            in_degree=indeg, snorm_n=sn, src=s_arr, dst=d_arr,
            edge_mask=em, edge_feat=ef, snorm_e=se, graph_mask=gm,
            n_nodes=nn, n_edges=ne, labels=labels, node_labels=nl,
            pos_enc=pe, halo_shard=hs, halo_local=hl,
            send_idx=si, recv_perm=rp))

    def stk(key):
        if out_shards[0][key] is None:
            return None
        return jnp.asarray(np.stack([s[key] for s in out_shards]))

    halo_spec = HaloSpec(halo_shard=stk("halo_shard"),
                         halo_local=stk("halo_local"),
                         send_idx=stk("send_idx"),
                         recv_perm=stk("recv_perm"),
                         n_local=n_loc_pad, axis=axis)
    mxu_stacked = None
    if mxu_layouts is not None:
        # stack per-shard layouts leaf-wise into one [P, ...] MXULayout
        # (static fields are shard-uniform by construction)
        mxu_stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                             *mxu_layouts)
    return GraphBatch(
        node_feat=stk("node_feat"), node_mask=stk("node_mask"),
        node_graph=stk("node_graph"), eig=stk("eig"),
        in_degree=stk("in_degree"), snorm_n=stk("snorm_n"),
        src=stk("src"), dst=stk("dst"), edge_mask=stk("edge_mask"),
        edge_feat=stk("edge_feat"), snorm_e=stk("snorm_e"),
        graph_mask=stk("graph_mask"), n_nodes=stk("n_nodes"),
        n_edges=stk("n_edges"), labels=stk("labels"),
        node_labels=stk("node_labels"), pos_enc=stk("pos_enc"),
        halo=halo_spec, mxu=mxu_stacked)


def _peel(tree):
    return jax.tree_util.tree_map(lambda x: x[0], tree)


class EdgeParallelTrainer(Trainer):
    """Trainer for edge-partitioned batches (leading [P] axis over 'ep').

    The forward runs inside shard_map (halo all_gathers + readout psums);
    loss and autodiff live OUTSIDE, so gradient correctness falls out of the
    shard_map transpose rules rather than hand-placed collectives.

    node_level=True returns per-node scores (all shards' local regions,
    flattened) for SBM-style tasks.
    """

    def __init__(self, model, loss_fn, params: TrainParams, mesh: Mesh,
                 task: str = "zinc", node_level: bool = False):
        self.node_level = node_level
        self.axis = "ep"
        self.mesh = mesh
        super().__init__(model, loss_fn, params, task=task, mesh=mesh,
                         donate=False)
        axis = self.axis

        def fwd_core(params, batch_stats, gb, rng, train: bool):
            gb = _peel(gb)
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            if train:
                out, mut = self.model.apply(
                    variables, gb, deterministic=False,
                    rngs={"dropout": rng}, mutable=["batch_stats"])
                new_bs = mut.get("batch_stats", {})
            else:
                out = self.model.apply(variables, gb, deterministic=True)
                new_bs = batch_stats
            if node_level:
                # per-node scores stay sharded; stack for the outer loss
                return out[None], new_bs
            # graph-level scores are replicated (readout psums) — any copy
            return out, new_bs

        out_score_spec = P(axis) if node_level else P()
        self._fwd_train = shard_map(
            lambda p_, bs, gb, rng: fwd_core(p_, bs, gb, rng, True),
            mesh=mesh, in_specs=(P(), P(), P(axis), P()),
            out_specs=(out_score_spec, P()), check_vma=False)
        self._fwd_eval = shard_map(
            lambda p_, bs, gb: fwd_core(p_, bs, gb, None, False),
            mesh=mesh, in_specs=(P(), P(), P(axis)),
            out_specs=(out_score_spec, P()), check_vma=False)

        def loss_gb(gb):
            """The gb view the loss/metric functions consume (jit-safe)."""
            if node_level:
                return jax.tree_util.tree_map(
                    lambda x: jnp.reshape(x, (-1,) + x.shape[2:]), gb)
            return _peel(gb)

        def train_step(state: TrainState, gb: GraphBatch, rng, lr):
            def loss_of(p_):
                scores, new_bs = self._fwd_train(p_, state.batch_stats, gb,
                                                 rng)
                if node_level:
                    scores = scores.reshape((-1,) + scores.shape[2:])
                loss = self.loss_fn(scores, loss_gb(gb))
                return loss, (scores, new_bs)

            (loss, (scores, new_bs)), grads = jax.value_and_grad(
                loss_of, has_aux=True)(state.params)
            state.opt_state.hyperparams["learning_rate"] = lr
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = jax.tree_util.tree_map(lambda a, u: a + u,
                                                state.params, updates)
            return (TrainState(new_params, new_bs, new_opt, state.step + 1),
                    loss, scores)

        def eval_step(state: TrainState, gb: GraphBatch):
            scores, _ = self._fwd_eval(state.params, state.batch_stats, gb)
            if node_level:
                scores = scores.reshape((-1,) + scores.shape[2:])
            return scores, self.loss_fn(scores, loss_gb(gb))

        self._train_step = jax.jit(train_step)
        self._eval_step = jax.jit(eval_step)
        self._loss_gb = loss_gb

    def init_state(self, example_batch: GraphBatch, seed=None) -> TrainState:
        """Init params on one shard's local view OUTSIDE shard_map — the halo
        spec must be stripped (its collectives only exist inside the map)."""
        if example_batch.graph_mask.ndim == 2:      # still shard-stacked
            example_batch = _peel(example_batch)
        if example_batch.halo is not None:
            example_batch = dataclasses.replace(example_batch, halo=None)
        return super().init_state(example_batch, seed=seed)

    # metric accumulation consumes the flattened / peeled view
    def train_epoch(self, state: TrainState, loader, epoch: int):
        from ..train.trainer import _MetricAccumulator
        key = jax.random.PRNGKey((self.p.seed * 100003 + epoch) & 0x7FFFFFFF)
        acc = _MetricAccumulator(self.task)
        lr = jnp.asarray(self.scheduler.lr, jnp.float32)
        for gb in loader:
            key, sub = jax.random.split(key)
            state, loss, scores = self._train_step(state, gb, sub, lr)
            acc.add(self._loss_gb(gb), np.asarray(scores), float(loss))
        return state, acc.result()

    def evaluate(self, state: TrainState, loader):
        from ..train.trainer import _MetricAccumulator
        acc = _MetricAccumulator(self.task)
        for gb in loader:
            scores, loss = self._eval_step(state, gb)
            acc.add(self._loss_gb(gb), np.asarray(scores), float(loss))
        return acc.result()


class PartitionedLoader:
    """Yields edge-partitioned batches over a graph list (batch granularity
    identical to BatchLoader; each batch is itself sharded over 'ep')."""

    def __init__(self, graphs: Sequence[GraphData], batch_size: int,
                 n_shards: int, shuffle: bool = False, seed: int = 0,
                 g_pad: Optional[int] = None, axis: str = "ep",
                 multiple: int = 8, layout: str = "flat"):
        self.graphs = list(graphs)
        self.bs = batch_size
        self.n_shards = n_shards
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.g_pad = g_pad or batch_size
        self.axis = axis
        self.multiple = multiple
        self.layout = layout

    def __len__(self):
        return (len(self.graphs) + self.bs - 1) // self.bs

    def __iter__(self):
        idx = np.arange(len(self.graphs))
        if self.shuffle:
            self.rng.shuffle(idx)
        for i in range(0, len(idx), self.bs):
            sel = [self.graphs[j] for j in idx[i:i + self.bs]]
            yield partition_batch(sel, self.n_shards, g_pad=self.g_pad,
                                  axis=self.axis, multiple=self.multiple,
                                  layout=self.layout)
