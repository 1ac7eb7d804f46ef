"""The DGN task network: one configurable model covering all five benchmarks.

The reference ships five near-identical DGNNet copies
(reference nets/{molecules_graph_regression,SBMs_node_classification,
superpixels_graph_classification,HIV_graph_classification,
PCBA_graph_classification}/dgn_net.py) that differ only in input/edge
embedding, readout, head width, virtual-node use, and loss.  Here that is one
flax module + a typed config; task wrappers in models/__init__.py pin the
defaults per benchmark and pair the net with its loss (train/losses.py).

Structure (all tasks): embed -> in_feat_dropout -> (+pos_enc linear) ->
(L-1) DGN layers at hidden_dim + 1 DGN layer at out_dim (reference
molecules dgn_net.py:40-50), virtual-node interleave after each non-final
layer when enabled (PCBA dgn_net.py:78-83), readout, MLPReadout head.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from ..graph import GraphBatch, halo_refresh
from ..nn import Embedding, Linear, MLPReadout
from ..layers.dgn import VirtualNode, ep_fused_layout, make_dgn_layer
from ..ops import aggregators as agg_ops
from ..ops import scalers as scaler_ops
from .encoders import AtomEncoder, BondEncoder
from .readout import graph_readout


@dataclasses.dataclass(frozen=True)
class DGNConfig:
    """net_params, typed (reference configs/*.json net_params)."""
    hidden_dim: int = 45
    out_dim: int = 45
    L: int = 4
    type_net: str = "complex"             # simple | complex | towers
    aggregators: str = "mean dir1-dx dir1-av"
    scalers: str = "identity amplification attenuation"
    avg_d: Optional[dict] = None          # filled from train degree stats
    residual: bool = True
    edge_feat: bool = False
    edge_dim: int = 0
    readout: str = "mean"                 # sum|max|mean|directional|directional_abs|node
    in_feat_dropout: float = 0.0
    dropout: float = 0.0
    graph_norm: bool = True
    batch_norm: bool = True
    towers: int = 5
    divide_input: bool = True
    # reference configs split this per position: divide_input_first applies
    # to layers 0..L-2 (-> `divide_input`), divide_input_last to the final
    # layer (None -> same as divide_input)
    divide_input_last: Optional[bool] = None
    pretrans_layers: int = 1
    posttrans_layers: int = 1
    pos_enc_dim: int = 0
    # input encoders
    node_encoder: str = "embedding"       # embedding | linear | atom
    num_node_types: int = 28              # for embedding encoder (ZINC atoms)
    edge_encoder: str = "embedding"       # embedding | linear | bond
    num_edge_types: int = 4               # ZINC bonds
    # head
    n_out: int = 1                        # head output width (1, n_classes, 128)
    decreasing_dim: bool = True
    readout_L: int = 2
    # virtual node: none | mean | sum | logsum
    virtual_node: str = "none"
    # sync-BN collective axis (set when training under shard_map DP)
    bn_axis: Optional[str] = None
    # matmul input dtype for the MXU block ops ("bfloat16" for speed; None =
    # full f32).  Accumulation stays f32 either way.
    compute_dtype: Optional[str] = None
    # linear-pretrans decomposition (ops/aggregators.py:aggregate_decomposed):
    # one gather + one fused scatter per layer instead of the per-edge-message
    # pipeline.  Applies when pretrans is linear (pretrans_layers=1 — every
    # canonical config) or type_net == "simple"; False forces the legacy path.
    decompose: bool = True

    def agg_names(self) -> Tuple[str, ...]:
        return tuple(agg_ops.parse_names(self.aggregators))

    def scaler_names(self) -> Tuple[str, ...]:
        return tuple(scaler_ops.parse_names(self.scalers))


def edge_context_for(gb: GraphBatch, cfg: DGNConfig):
    """The EdgeContext DGNModel attaches: eig deltas, directional
    normalizers, decomposed weight families, adjacency blocks.

    Everything in it depends only on (eig, edges, layout) — NOT on params —
    so for fixed batches (eval loaders; aug-free training) it can be built
    once and reused across steps (Trainer eval-context cache): the build is
    ~0.9 ms of the 1.9 ms ZINC step (RESULTS.md round-4 stage accounting).
    """
    layout = gb.mxu
    decomposed = cfg.decompose and (cfg.type_net == "simple"
                                    or cfg.pretrans_layers == 1)
    return agg_ops.build_edge_context(
        gb.eig, gb.src, gb.dst, gb.edge_mask, gb.in_degree,
        names=cfg.agg_names(),
        need_norms=layout is None and not decomposed,
        mxu_layout=gb.mxu, decomposed=decomposed,
        adj_dtype=cfg.compute_dtype)


class DGNModel(fnn.Module):
    cfg: DGNConfig

    @fnn.compact
    def __call__(self, gb: GraphBatch, deterministic: bool = True):
        cfg = self.cfg
        avg_d = cfg.avg_d or {"log": 1.0, "lin": 1.0}

        # ---- input embedding
        x = gb.node_feat
        if cfg.node_encoder == "embedding":
            h = Embedding(cfg.num_node_types, cfg.hidden_dim,
                          name="embedding_h")(x.astype(jnp.int32))
        elif cfg.node_encoder == "linear":
            h = Linear(cfg.hidden_dim, name="embedding_h")(x)
        elif cfg.node_encoder == "atom":
            h = AtomEncoder(cfg.hidden_dim, name="embedding_h")(
                x.astype(jnp.int32))
        else:
            raise ValueError(cfg.node_encoder)
        if cfg.in_feat_dropout > 0:
            h = fnn.Dropout(rate=cfg.in_feat_dropout)(
                h, deterministic=deterministic)
        if cfg.pos_enc_dim > 0:
            if gb.pos_enc is not None:
                pe = gb.pos_enc
            else:
                # reference derives pos_enc = eig[:, 1:dim+1]
                # (data/molecules.py:118-121)
                pe = gb.eig[:, 1:cfg.pos_enc_dim + 1]
            h = h + Linear(cfg.hidden_dim, name="embedding_pos_enc")(pe)

        # ---- edge embedding
        e = None
        if cfg.edge_feat:
            ef = gb.edge_feat
            if cfg.edge_encoder == "embedding":
                e = Embedding(cfg.num_edge_types, cfg.edge_dim,
                              name="embedding_e")(ef.astype(jnp.int32))
            elif cfg.edge_encoder == "linear":
                e = Linear(cfg.edge_dim, name="embedding_e")(ef)
            elif cfg.edge_encoder == "bond":
                e = BondEncoder(cfg.edge_dim, name="embedding_e")(
                    ef.astype(jnp.int32))
            else:
                raise ValueError(cfg.edge_encoder)

        # ---- DGN layers (+ virtual node interleave)
        # eig deltas + directional normalizers are layer-invariant (eig is
        # fixed per batch, incl. after augmentation) — build them ONCE here
        # instead of once per layer.  A pre-attached context (Trainer's
        # eval-context cache, edge_context_for) is reused as-is.
        decomposed = cfg.decompose and (cfg.type_net == "simple"
                                        or cfg.pretrans_layers == 1)
        if gb.edge_ctx is None:
            gb = dataclasses.replace(gb, edge_ctx=edge_context_for(gb, cfg))
        common = dict(
            aggregators=cfg.agg_names(), scalers=cfg.scaler_names(),
            avg_d=avg_d, dropout=cfg.dropout, graph_norm=cfg.graph_norm,
            batch_norm=cfg.batch_norm, residual=cfg.residual,
            edge_features=cfg.edge_feat, pretrans_layers=cfg.pretrans_layers,
            posttrans_layers=cfg.posttrans_layers, towers=cfg.towers,
            divide_input=cfg.divide_input, bn_axis=cfg.bn_axis,
            compute_dtype=cfg.compute_dtype,
        )
        use_vn = cfg.virtual_node and cfg.virtual_node.lower() != "none"
        vn_h = jnp.zeros((gb.num_graphs_padded, cfg.hidden_dim), h.dtype)
        # EP x MXU + decomposed edge stage: the LAYER pulls its halo inside
        # the decomposed branch (layers/dgn.py _ep_pretrans_parts) so interior
        # pair matmuls never depend on the all_to_all — refreshing here would
        # serialize exchange before all compute
        layer_pulls_halo = ep_fused_layout(gb) and decomposed
        for i in range(cfg.L):
            if gb.halo is not None and not layer_pulls_halo:
                # edge-partitioned: pull fresh copies of remote (halo) node
                # features from their owners before aggregating over them
                h = halo_refresh(h, gb.halo)
            out_dim = cfg.out_dim if i == cfg.L - 1 else cfg.hidden_dim
            kw = dict(common)
            if i == cfg.L - 1 and cfg.divide_input_last is not None:
                kw["divide_input"] = cfg.divide_input_last
            layer = make_dgn_layer(cfg.type_net, out_dim=out_dim,
                                   name=f"layer_{i}", **kw)
            h = layer(gb, h, e, deterministic)
            if use_vn and i < cfg.L - 1:
                vn_h, h = VirtualNode(
                    dim=cfg.hidden_dim, dropout=cfg.dropout,
                    batch_norm=cfg.batch_norm, residual=cfg.residual,
                    vn_type=cfg.virtual_node, bn_axis=cfg.bn_axis,
                    name=f"virtual_node_{i}")(
                        gb, h, vn_h, deterministic)

        # ---- readout + head
        if cfg.readout == "none":
            return h     # raw node embeddings (link prediction, train/link_pred.py)
        if cfg.readout == "node":
            return MLPReadout(cfg.n_out, L=cfg.readout_L, name="MLP_layer")(h)
        hg = graph_readout(gb, h, cfg.readout)
        return MLPReadout(cfg.n_out, L=cfg.readout_L,
                          decreasing_dim=cfg.decreasing_dim,
                          name="MLP_layer")(hg)
