"""Faithful torch re-implementation of the COMPOSED reference DGN model.

The component-level parity suite (tests/test_reference_parity.py) pins every
aggregator/scaler/FCLayer against the reference's own torch code, but the
reference *composition* — pretrans wiring, aggregator+scaler concat order,
posttrans input concat, graph_norm -> batchnorm -> relu -> residual order,
readouts, loss, Adam — lives in DGL-dependent modules that cannot be imported
here (no DGL).  This module transcribes that composition line-for-line from:

  /root/reference/realworld_benchmark/nets/dgn_layer.py:52-132   (complex)
  /root/reference/realworld_benchmark/nets/dgn_layer.py:135-202  (simple)
  /root/reference/realworld_benchmark/nets/dgn_layer.py:205-325  (towers)
  /root/reference/realworld_benchmark/nets/aggregators.py:8-71   (mailbox ops)
  /root/reference/realworld_benchmark/nets/scalers.py            (D scalers)
  /root/reference/realworld_benchmark/nets/layers.py:120-149     (MLP/FCLayer)
  /root/reference/realworld_benchmark/nets/mlp_readout_layer.py  (readout MLP)
  /root/reference/realworld_benchmark/nets/molecules_graph_regression/
      dgn_net.py:57-92                                           (net + L1)

DGL's degree-bucketed mailbox reduce is replaced by per-destination
index_add segment math — numerically identical (each mailbox row IS the set
of incoming edges of one destination; every reduction and normalizer is
per-row).  DGL zero-fills nodes with no incoming message; segment sums give
the same zeros, and scaler guards keep 0 * anything = 0.

Also provides the weight/grad tree mappings to the flax DGNModel param
structure so tests can copy state_dicts across and compare gradients
leaf-for-leaf (tests/test_fullmodel_parity.py).
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

EPS = 1e-8


# ================================================================= segments

def seg_sum(x, dst, n):
    out = torch.zeros((n,) + x.shape[1:], dtype=x.dtype)
    return out.index_add(0, dst, x)


def _seg_extreme(x, dst, n, mode):
    init = float("-inf") if mode == "amax" else float("inf")
    out = torch.full((n,) + x.shape[1:], init, dtype=x.dtype)
    idx = dst[:, None].expand(-1, x.shape[1])
    out = out.scatter_reduce(0, idx, x, reduce=mode, include_self=True)
    return torch.where(torch.isfinite(out), out, torch.zeros(()))


# ============================================================== aggregators

def mailbox_aggregate(name, msg, src, dst, n, eig, h_in, deg):
    """One reference mailbox aggregator over flat COO edges.

    msg [E,F]; eig [N,K]; h_in [N,F]; deg [N] true in-degree.  Matches
    nets/aggregators.py exactly (per-destination reductions)."""
    degc = deg.clamp(min=1).unsqueeze(-1).to(msg.dtype)
    if name == "mean":
        return seg_sum(msg, dst, n) / degc
    if name == "sum":
        return seg_sum(msg, dst, n)
    if name == "max":
        return _seg_extreme(msg, dst, n, "amax")
    if name == "min":
        return _seg_extreme(msg, dst, n, "amin")
    if name in ("var", "std"):
        m1 = seg_sum(msg, dst, n) / degc
        m2 = seg_sum(msg * msg, dst, n) / degc
        var = torch.relu(m2 - m1 * m1)
        return var if name == "var" else torch.sqrt(var + EPS)
    assert name.startswith("dir")
    body = name[3:]
    k = int(body.split("-")[0])
    kind = body[body.index("-") + 1:]
    d = eig[src.long(), k] - eig[dst.long(), k]                   # [E]
    if kind in ("av", "smooth"):
        S = seg_sum(d.abs(), dst, n)
        w = d.abs() / (S[dst] + EPS)
        return seg_sum(msg * w.unsqueeze(-1), dst, n)
    if kind in ("dx", "dx-no-abs"):
        S = seg_sum(d.abs(), dst, n)
        w = d / (S[dst] + EPS)
        wh = seg_sum(msg * w.unsqueeze(-1), dst, n)
        wsum = seg_sum(w, dst, n)
        out = wh - wsum.unsqueeze(-1) * h_in
        return out.abs() if kind == "dx" else out
    if kind == "dx-balanced":
        front = torch.relu(d) / (seg_sum(torch.relu(d), dst, n)[dst] + EPS)
        back = torch.relu(-d) / (seg_sum(torch.relu(-d), dst, n)[dst] + EPS)
        w = (front + back) / 2
        wh = seg_sum(msg * w.unsqueeze(-1), dst, n)
        wsum = seg_sum(w, dst, n)
        return (wh - wsum.unsqueeze(-1) * h_in).abs()
    if kind in ("0.1", "neg-0.1"):
        alpha = 0.1 if kind == "0.1" else -0.1
        ex = torch.exp(alpha * d.abs())
        w = ex / seg_sum(ex, dst, n)[dst]
        return seg_sum(msg * w.unsqueeze(-1), dst, n)
    raise KeyError(name)


def scale(name, h, deg, avg_d):
    d = deg.to(h.dtype)
    if name == "identity":
        return h
    if name == "amplification":
        return h * (torch.log(d + 1) / avg_d["log"]).unsqueeze(-1)
    if name == "attenuation":
        logd = torch.log(d + 1)
        f = torch.where(logd > 0, avg_d["log"] / logd.clamp(min=1e-30),
                        torch.zeros(()))
        return h * f.unsqueeze(-1)
    raise KeyError(name)


def reduce_stage(aggs, scalers, msg, src, dst, n, eig, h_in, deg, avg_d):
    """reduce_func: aggregator concat, then scaler concat ONLY if >1 scaler
    (nets/dgn_layer.py:94-96)."""
    h = torch.cat([mailbox_aggregate(a, msg, src, dst, n, eig, h_in, deg)
                   for a in aggs], dim=1)
    if len(scalers) > 1:
        h = torch.cat([scale(s, h, deg, avg_d) for s in scalers], dim=1)
    return h


# ==================================================================== layers

class TFCLayer(nn.Module):
    """nets/layers.py FCLayer (dropout 0): Linear -> activation -> (dropout)
    -> BatchNorm1d, in that order (nets/layers.py:101-112; b_norm used by the
    VirtualNode FCLayer, nets/dgn_layer.py:16-17)."""

    def __init__(self, in_size, out_size, activation="relu", b_norm=False):
        super().__init__()
        self.linear = nn.Linear(in_size, out_size)
        self.activation = activation
        self.b_norm = nn.BatchNorm1d(out_size) if b_norm else None

    def forward(self, x):
        h = self.linear(x)
        if self.activation == "relu":
            h = torch.relu(h)
        elif self.activation == "leakyrelu":
            h = F.leaky_relu(h, 0.01)
        elif self.activation != "none":
            raise ValueError(self.activation)
        if self.b_norm is not None:
            h = self.b_norm(h)
        return h


class TMLP(nn.Module):
    """nets/layers.py MLP structure (mid relu, last none)."""

    def __init__(self, in_size, hidden_size, out_size, layers):
        super().__init__()
        fcs = []
        if layers <= 1:
            fcs.append(TFCLayer(in_size, out_size, "none"))
        else:
            fcs.append(TFCLayer(in_size, hidden_size, "relu"))
            for _ in range(layers - 2):
                fcs.append(TFCLayer(hidden_size, hidden_size, "relu"))
            fcs.append(TFCLayer(hidden_size, out_size, "none"))
        self.fully_connected = nn.ModuleList(fcs)

    def forward(self, x):
        for fc in self.fully_connected:
            x = fc(x)
        return x


class OracleComplexLayer(nn.Module):
    """nets/dgn_layer.py:52-132 DGNLayerComplex."""

    def __init__(self, in_dim, out_dim, aggs, scalers, avg_d, edge_features,
                 edge_dim, pretrans_layers=1, posttrans_layers=1,
                 graph_norm=True, batch_norm=True, residual=True):
        super().__init__()
        self.aggs, self.scalers, self.avg_d = aggs, scalers, avg_d
        self.edge_features = edge_features
        self.graph_norm, self.batch_norm = graph_norm, batch_norm
        self.residual = residual and (in_dim == out_dim)
        self.pretrans = TMLP(2 * in_dim + (edge_dim if edge_features else 0),
                             in_dim, in_dim, pretrans_layers)
        n_scal = len(scalers) if len(scalers) > 1 else 1
        self.posttrans = TMLP((len(aggs) * n_scal + 1) * in_dim,
                              out_dim, out_dim, posttrans_layers)
        self.batchnorm_h = nn.BatchNorm1d(out_dim)

    def forward(self, b, h, e):
        h_in = h
        src, dst, n = b["src"], b["dst"], h.shape[0]
        z = [h[src.long()], h[dst.long()]]
        if self.edge_features:
            z.append(e)
        msg = self.pretrans(torch.cat(z, dim=1))
        agg = reduce_stage(self.aggs, self.scalers, msg, src, dst, n,
                           b["eig"], h_in, b["deg"], self.avg_d)
        h = self.posttrans(torch.cat([h_in, agg], dim=1))
        if self.graph_norm:
            h = h * b["snorm_n"]
        if self.batch_norm:
            h = self.batchnorm_h(h)
        h = torch.relu(h)
        if self.residual:
            h = h_in + h
        return h


class OracleSimpleLayer(nn.Module):
    """nets/dgn_layer.py:135-202 DGNLayerSimple — message IS h[src], no input
    concat into posttrans."""

    def __init__(self, in_dim, out_dim, aggs, scalers, avg_d,
                 posttrans_layers=1, graph_norm=True, batch_norm=True,
                 residual=True):
        super().__init__()
        self.aggs, self.scalers, self.avg_d = aggs, scalers, avg_d
        self.graph_norm, self.batch_norm = graph_norm, batch_norm
        self.residual = residual and (in_dim == out_dim)
        n_scal = len(scalers) if len(scalers) > 1 else 1
        self.posttrans = TMLP(len(aggs) * n_scal * in_dim, out_dim, out_dim,
                              posttrans_layers)
        self.batchnorm_h = nn.BatchNorm1d(out_dim)

    def forward(self, b, h, e):
        h_in = h
        src, dst, n = b["src"], b["dst"], h.shape[0]
        msg = h[src.long()]
        agg = reduce_stage(self.aggs, self.scalers, msg, src, dst, n,
                           b["eig"], h_in, b["deg"], self.avg_d)
        h = self.posttrans(agg)
        if self.graph_norm:
            h = h * b["snorm_n"]
        if self.batch_norm:
            h = self.batchnorm_h(h)
        h = torch.relu(h)
        if self.residual:
            h = h_in + h
        return h


class OracleTower(nn.Module):
    """nets/dgn_layer.py:205-276 DGNTower — complex conv, NO relu/residual."""

    def __init__(self, in_dim, out_dim, aggs, scalers, avg_d, edge_features,
                 edge_dim, pretrans_layers=1, posttrans_layers=1,
                 graph_norm=True, batch_norm=True):
        super().__init__()
        self.aggs, self.scalers, self.avg_d = aggs, scalers, avg_d
        self.edge_features = edge_features
        self.graph_norm, self.batch_norm = graph_norm, batch_norm
        self.pretrans = TMLP(2 * in_dim + (edge_dim if edge_features else 0),
                             in_dim, in_dim, pretrans_layers)
        n_scal = len(scalers) if len(scalers) > 1 else 1
        self.posttrans = TMLP((len(aggs) * n_scal + 1) * in_dim,
                              out_dim, out_dim, posttrans_layers)
        self.batchnorm_h = nn.BatchNorm1d(out_dim)

    def forward(self, b, h, e):
        src, dst, n = b["src"], b["dst"], h.shape[0]
        z = [h[src.long()], h[dst.long()]]
        if self.edge_features:
            z.append(e)
        msg = self.pretrans(torch.cat(z, dim=1))
        agg = reduce_stage(self.aggs, self.scalers, msg, src, dst, n,
                           b["eig"], h, b["deg"], self.avg_d)
        out = self.posttrans(torch.cat([h, agg], dim=1))
        if self.graph_norm:
            out = out * b["snorm_n"]
        if self.batch_norm:
            out = self.batchnorm_h(out)
        return out


class OracleTowerLayer(nn.Module):
    """nets/dgn_layer.py:279-325 DGNLayerTower."""

    def __init__(self, in_dim, out_dim, aggs, scalers, avg_d, towers,
                 divide_input, edge_features, edge_dim, residual,
                 pretrans_layers=1, posttrans_layers=1,
                 graph_norm=True, batch_norm=True):
        super().__init__()
        self.divide_input = divide_input
        self.input_tower = in_dim // towers if divide_input else in_dim
        self.output_tower = out_dim // towers
        self.residual = residual and (in_dim == out_dim)
        self.towers = nn.ModuleList([
            OracleTower(self.input_tower, self.output_tower, aggs, scalers,
                        avg_d, edge_features, edge_dim, pretrans_layers,
                        posttrans_layers, graph_norm, batch_norm)
            for _ in range(towers)])
        self.mixing_network = TFCLayer(out_dim, out_dim, "leakyrelu")

    def forward(self, b, h, e):
        h_in = h
        if self.divide_input:
            outs = [t(b, h[:, i * self.input_tower:(i + 1) * self.input_tower],
                      e) for i, t in enumerate(self.towers)]
        else:
            outs = [t(b, h, e) for t in self.towers]
        h_cat = torch.cat(outs, dim=1)
        h_out = self.mixing_network(h_cat) if len(self.towers) > 1 else h_cat
        if self.residual:
            h_out = h_in + h_out
        return h_out


class TMLPReadout(nn.Module):
    """nets/mlp_readout_layer.py MLPReadout."""

    def __init__(self, input_dim, output_dim, L=2, decreasing_dim=True):
        super().__init__()
        if decreasing_dim:
            fcs = [nn.Linear(input_dim // 2 ** l, input_dim // 2 ** (l + 1))
                   for l in range(L)]
            fcs.append(nn.Linear(input_dim // 2 ** L, output_dim))
        else:
            fcs = [nn.Linear(input_dim, input_dim) for _ in range(L)]
            fcs.append(nn.Linear(input_dim, output_dim))
        self.FC_layers = nn.ModuleList(fcs)
        self.L = L

    def forward(self, x):
        y = x
        for l in range(self.L):
            y = torch.relu(self.FC_layers[l](y))
        return self.FC_layers[self.L](y)


class TMultiEmbedding(nn.Module):
    """OGB AtomEncoder/BondEncoder: per-column embedding tables summed,
    xavier-uniform initialized (ogb.graphproppred.mol_encoder, imported by
    reference nets/HIV_graph_classification/dgn_net.py:6)."""

    def __init__(self, dims, emb_dim):
        super().__init__()
        self.embs = nn.ModuleList()
        for d in dims:
            e = nn.Embedding(d, emb_dim)
            nn.init.xavier_uniform_(e.weight.data)
            self.embs.append(e)

    def forward(self, x):
        out = 0
        for i, e in enumerate(self.embs):
            out = out + e(x[:, i])
        return out


# OGB full_atom/bond_feature_dims (must match dgn_tpu/models/encoders.py)
T_ATOM_DIMS = (119, 4, 12, 12, 10, 6, 6, 2, 2)
T_BOND_DIMS = (5, 6, 2)


class OracleVirtualNode(nn.Module):
    """nets/dgn_layer.py:12-49 VirtualNode: pool -> FCLayer(vn_h + pool) with
    residual -> broadcast-add back to nodes."""

    def __init__(self, dim, batch_norm, residual, vn_type):
        super().__init__()
        self.fc_layer = TFCLayer(dim, dim, "relu", b_norm=batch_norm)
        self.residual = residual
        self.vn_type = vn_type

    def forward(self, b, h, vn_h):
        gid, G = b["gid"], b["n_nodes"].shape[0]
        nn_ = b["n_nodes"].clamp(min=1).unsqueeze(-1).to(h.dtype)
        pool = seg_sum(h, gid, G) / nn_            # dgl.mean_nodes
        if self.vn_type == "sum":
            pool = seg_sum(h, gid, G)
        elif self.vn_type == "logsum":
            pool = pool * torch.log(b["n_nodes"].to(h.dtype)).unsqueeze(-1)
        vn_tmp = self.fc_layer(vn_h + pool)
        vn_h = vn_h + vn_tmp if self.residual else vn_tmp
        h = h + vn_h[gid]                          # per-graph repeat (:44-47)
        return vn_h, h


class OracleNet(nn.Module):
    """nets/molecules_graph_regression/dgn_net.py DGNNet (dropout 0)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        h, out = cfg.hidden_dim, cfg.out_dim
        aggs = cfg.aggregators.split()
        scalers = cfg.scalers.split()
        if cfg.node_encoder == "atom":            # HIV/PCBA nets
            self.embedding_h = TMultiEmbedding(T_ATOM_DIMS, h)
        elif cfg.node_encoder == "linear":        # superpixels net
            self.embedding_h = nn.Linear(
                cfg.num_node_types, h)            # num_node_types = in_dim
        else:
            self.embedding_h = nn.Embedding(cfg.num_node_types, h)
        if cfg.edge_feat:
            if cfg.edge_encoder == "bond":
                self.embedding_e = TMultiEmbedding(T_BOND_DIMS, cfg.edge_dim)
            elif cfg.edge_encoder == "linear":
                self.embedding_e = nn.Linear(cfg.num_edge_types, cfg.edge_dim)
            else:
                self.embedding_e = nn.Embedding(cfg.num_edge_types,
                                                cfg.edge_dim)
        if cfg.pos_enc_dim > 0:
            self.embedding_pos_enc = nn.Linear(cfg.pos_enc_dim, h)
        use_vn = cfg.virtual_node and cfg.virtual_node.lower() != "none"
        self.virtual_node_layers = nn.ModuleList(
            [OracleVirtualNode(h, cfg.batch_norm, cfg.residual,
                               cfg.virtual_node) for _ in range(cfg.L - 1)]
        ) if use_vn else None

        def mk(in_dim, out_dim):
            kw = dict(aggs=aggs, scalers=scalers, avg_d=cfg.avg_d,
                      graph_norm=cfg.graph_norm, batch_norm=cfg.batch_norm,
                      pretrans_layers=cfg.pretrans_layers,
                      posttrans_layers=cfg.posttrans_layers)
            if cfg.type_net == "simple":
                kw.pop("pretrans_layers")
                return OracleSimpleLayer(in_dim, out_dim,
                                         residual=cfg.residual, **kw)
            if cfg.type_net == "complex":
                return OracleComplexLayer(
                    in_dim, out_dim, edge_features=cfg.edge_feat,
                    edge_dim=cfg.edge_dim, residual=cfg.residual, **kw)
            return OracleTowerLayer(
                in_dim, out_dim, towers=cfg.towers,
                divide_input=cfg.divide_input, edge_features=cfg.edge_feat,
                edge_dim=cfg.edge_dim, residual=cfg.residual, **kw)

        self.layers = nn.ModuleList(
            [mk(h, h) for _ in range(cfg.L - 1)] + [mk(h, out)])
        ro_in = 2 * out if cfg.readout.startswith("directional") else out
        self.MLP_layer = TMLPReadout(ro_in, cfg.n_out, L=cfg.readout_L,
                                     decreasing_dim=cfg.decreasing_dim)

    def forward(self, b):
        cfg = self.cfg
        x = b["x"]
        h = self.embedding_h(x.float() if cfg.node_encoder == "linear"
                             else x.long())
        if cfg.pos_enc_dim > 0:
            h = h + self.embedding_pos_enc(b["eig"][:, 1:cfg.pos_enc_dim + 1])
        e = None
        if cfg.edge_feat:
            e = self.embedding_e(b["e"].float()
                                 if cfg.edge_encoder == "linear"
                                 else b["e"].long())
        for i, conv in enumerate(self.layers):
            h = conv(b, h, e)
            # virtual-node interleave after each non-final layer
            # (PCBA dgn_net.py:78-83; vn_h starts as the scalar 0)
            if self.virtual_node_layers is not None:
                if i == 0:
                    vn_h = torch.zeros(1)
                if i < len(self.virtual_node_layers):
                    vn_h, h = self.virtual_node_layers[i](b, h, vn_h)
        if cfg.readout == "node":
            # SBM net: per-node head (SBMs dgn_net.py:52,64)
            return self.MLP_layer(h)

        gid, G = b["gid"], b["n_nodes"].shape[0]
        nn_ = b["n_nodes"].clamp(min=1).unsqueeze(-1).to(h.dtype)

        def mean_nodes(x):
            return seg_sum(x, gid, G) / nn_

        if cfg.readout == "sum":
            hg = seg_sum(h, gid, G)
        elif cfg.readout == "max":
            hg = _seg_extreme(h, gid, G, "amax")
        elif cfg.readout == "directional":
            # h * eig1/|eig1| == h * sign(eig1) (the dim=1 sum over the [N,1]
            # column is a no-op, dgn_net.py:81-84)
            hg = torch.cat([mean_nodes(h * torch.sign(b["eig"][:, 1:2])).abs(),
                            mean_nodes(h)], dim=1)
        elif cfg.readout == "directional_abs":
            hg = torch.cat([mean_nodes(h), mean_nodes(h)], dim=1)
        else:
            hg = mean_nodes(h)
        return self.MLP_layer(hg)

    def loss(self, scores, targets):
        return nn.L1Loss()(scores, targets)


def task_loss(task, scores, b, n_classes=None):
    """The five reference losses, applied the way the reference train loops
    apply them (NaN masking for PCBA happens in the LOOP,
    train_PCBA_graph_classification.py:32-33)."""
    t = b["targets"]
    if task == "zinc":
        return nn.L1Loss()(scores, t)
    if task == "superpixels":     # superpixels dgn_net.py:75-78
        return nn.CrossEntropyLoss()(scores, t.reshape(-1).long())
    if task == "hiv":             # HIV dgn_net.py:87-89
        return nn.BCEWithLogitsLoss()(scores, t.float())
    if task == "pcba":            # PCBA dgn_net.py:99-102 + train loop mask
        is_labeled = t == t
        return nn.BCEWithLogitsLoss()(scores[is_labeled],
                                      t.float()[is_labeled])
    if task == "sbm":             # SBMs dgn_net.py:66-81, transcribed
        label = b["node_labels"]
        V = label.size(0)
        label_count = torch.bincount(label)
        label_count = label_count[label_count.nonzero()].squeeze()
        cluster_sizes = torch.zeros(n_classes).long()
        cluster_sizes[torch.unique(label)] = label_count
        weight = (V - cluster_sizes).float() / V
        weight *= (cluster_sizes > 0).float()
        return nn.CrossEntropyLoss(weight=weight)(scores, label)
    raise KeyError(task)


# ============================================================ batch building

def torch_batch(graphs):
    """Reference-style batched-graph tensors from a GraphData list (the exact
    moral of dgl.batch + collate, data/molecules.py:219-230)."""
    off = 0
    srcs, dsts, xs, eigs, sn, gids, es = [], [], [], [], [], [], []
    for i, g in enumerate(graphs):
        srcs.append(np.asarray(g.src, np.int64) + off)
        dsts.append(np.asarray(g.dst, np.int64) + off)
        xs.append(np.asarray(g.node_feat))
        eigs.append(np.asarray(g.eig, np.float32))
        sn.append(np.full((g.num_nodes, 1), np.sqrt(1.0 / g.num_nodes),
                          np.float32))
        gids.append(np.full((g.num_nodes,), i, np.int64))
        if g.edge_feat is not None:
            es.append(np.asarray(g.edge_feat))
        off += g.num_nodes
    dst = torch.from_numpy(np.concatenate(dsts))
    deg = torch.zeros(off).index_add_(0, dst, torch.ones(dst.shape[0]))
    out = dict(
        src=torch.from_numpy(np.concatenate(srcs)),
        dst=dst,
        x=torch.from_numpy(np.concatenate(xs)),
        eig=torch.from_numpy(np.concatenate(eigs)),
        snorm_n=torch.from_numpy(np.concatenate(sn)),
        gid=torch.from_numpy(np.concatenate(gids)),
        e=(torch.from_numpy(np.concatenate(es)) if es else None),
        n_nodes=torch.tensor([g.num_nodes for g in graphs]),
        deg=deg,
        targets=torch.from_numpy(
            np.stack([np.asarray(g.label, np.float32) for g in graphs])),
    )
    if graphs[0].node_labels is not None:
        out["node_labels"] = torch.from_numpy(np.concatenate(
            [np.asarray(g.node_labels, np.int64) for g in graphs]))
    return out


# ====================================================== flax param mapping

def _t(x):
    return x.detach().cpu().numpy()


def _lin(linear, grad):
    w = linear.weight.grad if grad else linear.weight
    b = linear.bias.grad if grad else linear.bias
    return {"kernel": _t(w).T.copy(), "bias": _t(b).copy()}


def _mlp(tmlp, grad):
    return {f"FCLayer_{i}": _lin(fc.linear, grad)
            for i, fc in enumerate(tmlp.fully_connected)}


def _bn_params(bn, grad):
    w = bn.weight.grad if grad else bn.weight
    b = bn.bias.grad if grad else bn.bias
    return {"scale": _t(w).copy(), "bias": _t(b).copy()}


def _layer_tree(tl, type_net, grad):
    if type_net == "towers":
        d = {f"tower_{i}": {"pretrans": _mlp(t.pretrans, grad),
                            "posttrans": _mlp(t.posttrans, grad),
                            "batchnorm_h": _bn_params(t.batchnorm_h, grad)}
             for i, t in enumerate(tl.towers)}
        d["mixing"] = _lin(tl.mixing_network.linear, grad)
        return d
    d = {"posttrans": _mlp(tl.posttrans, grad),
         "batchnorm_h": _bn_params(tl.batchnorm_h, grad)}
    if type_net == "complex":
        d["pretrans"] = _mlp(tl.pretrans, grad)
    return d


def _multi_emb(menc: TMultiEmbedding, name, grad):
    return {name: {f"emb_{i}": _t(e.weight.grad if grad else e.weight).copy()
                   for i, e in enumerate(menc.embs)}}


def flax_tree(net: OracleNet, grad: bool = False):
    """The flax DGNModel 'params' pytree (values from torch params or grads)."""
    cfg = net.cfg
    if cfg.node_encoder == "atom":
        tree = {"embedding_h": _multi_emb(net.embedding_h, "atom", grad)}
    elif cfg.node_encoder == "linear":
        tree = {"embedding_h": _lin(net.embedding_h, grad)}
    else:
        emb = net.embedding_h.weight
        tree = {"embedding_h": {"embedding":
                                _t(emb.grad if grad else emb).copy()}}
    if cfg.edge_feat:
        if cfg.edge_encoder == "bond":
            tree["embedding_e"] = _multi_emb(net.embedding_e, "bond", grad)
        elif cfg.edge_encoder == "linear":
            tree["embedding_e"] = _lin(net.embedding_e, grad)
        else:
            w = net.embedding_e.weight
            tree["embedding_e"] = {"embedding":
                                   _t(w.grad if grad else w).copy()}
    if cfg.pos_enc_dim > 0:
        tree["embedding_pos_enc"] = _lin(net.embedding_pos_enc, grad)
    for i, tl in enumerate(net.layers):
        tree[f"layer_{i}"] = _layer_tree(tl, cfg.type_net, grad)
    if net.virtual_node_layers is not None:
        for i, vn in enumerate(net.virtual_node_layers):
            fc = {"kernel": _lin(vn.fc_layer.linear, grad)["kernel"],
                  "bias": _lin(vn.fc_layer.linear, grad)["bias"]}
            if vn.fc_layer.b_norm is not None:
                fc["MaskedBatchNorm_0"] = _bn_params(vn.fc_layer.b_norm, grad)
            tree[f"virtual_node_{i}"] = {"fc_layer": fc}
    tree["MLP_layer"] = {f"Linear_{i}": _lin(l, grad)
                         for i, l in enumerate(net.MLP_layer.FC_layers)}
    return tree


def flax_batch_stats(net: OracleNet):
    """The flax 'batch_stats' pytree from torch BN running buffers."""
    cfg = net.cfg

    def bn(m):
        return {"mean": _t(m.running_mean).copy(),
                "var": _t(m.running_var).copy()}

    tree = {}
    for i, tl in enumerate(net.layers):
        if cfg.type_net == "towers":
            tree[f"layer_{i}"] = {f"tower_{t}":
                                  {"batchnorm_h": bn(tw.batchnorm_h)}
                                  for t, tw in enumerate(tl.towers)}
        else:
            tree[f"layer_{i}"] = {"batchnorm_h": bn(tl.batchnorm_h)}
    if net.virtual_node_layers is not None:
        for i, vn in enumerate(net.virtual_node_layers):
            if vn.fc_layer.b_norm is not None:
                tree[f"virtual_node_{i}"] = {
                    "fc_layer": {"MaskedBatchNorm_0": bn(vn.fc_layer.b_norm)}}
    return tree
