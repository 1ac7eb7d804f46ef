"""DGN layers (simple / complex / towers) + VirtualNode over GraphBatch.

Functional re-design of the reference DGL layers
(/root/reference/realworld_benchmark/nets/dgn_layer.py).  The DGL
apply_edges/update_all machinery becomes: gather node features per edge ->
edgewise compute (pretrans MLP, directional weights) -> masked segment
reductions (ops.aggregators) -> node MLP.  All shapes static; padding masked.

Parity-critical quirks kept on purpose:
  * scalers are applied ONLY when len(scalers) > 1 (nets/dgn_layer.py:95-96);
  * residual silently disabled when in_dim != out_dim (nets/dgn_layer.py:76-77);
  * towers: LeakyReLU mixing FCLayer applied only when >1 tower (:313-316);
  * layer order: posttrans -> graph_norm (h*snorm_n) -> batchnorm -> relu ->
    residual -> dropout (complex/simple); towers skip relu/residual inside the
    tower (:268-276).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from ..graph import GraphBatch, halo_pull
from ..nn import MLP, FCLayer, LinearParams, MaskedBatchNorm
from ..ops import aggregators as agg_ops
from ..ops import mxu
from ..ops import scalers as scaler_ops
from ..ops import segment


def _gather_src(gb: GraphBatch, h: jax.Array, compute_dtype=None) -> jax.Array:
    """h[src] per edge — one-hot matmul under the MXU layout (backward is a
    matmul instead of a scatter), plain gather otherwise."""
    if gb.mxu is not None:
        return mxu.gather_src(h, gb.mxu, compute_dtype)
    return segment.gather(h, gb.src)


def _gather_dst(gb: GraphBatch, h: jax.Array, compute_dtype=None) -> jax.Array:
    if gb.mxu is not None:
        return mxu.gather_dst(h, gb.mxu, compute_dtype)
    return segment.gather(h, gb.dst)


def _edge_aggregate(gb: GraphBatch, msg: jax.Array, h_in: jax.Array,
                    agg_names: Sequence[str], scaler_names: Sequence[str],
                    avg_d: Dict[str, float], compute_dtype=None) -> jax.Array:
    """aggregators concat -> (scalers concat if >1) — the reduce_func
    (reference nets/dgn_layer.py:86-98)."""
    layout = gb.mxu
    ctx = gb.edge_ctx
    if ctx is None:   # standalone layer use; DGNModel pre-attaches it
        ctx = agg_ops.build_edge_context(gb.eig, gb.src, gb.dst, gb.edge_mask,
                                         gb.in_degree, names=agg_names,
                                         need_norms=layout is None,
                                         mxu_layout=gb.mxu)
    h = agg_ops.aggregate(tuple(agg_names), ctx, msg, h_in, layout=layout,
                          compute_dtype=compute_dtype)
    if len(scaler_names) > 1:
        h = scaler_ops.apply_scalers(tuple(scaler_names), h, gb.in_degree, avg_d)
    return h


def _decomposed_ctx(gb: GraphBatch, agg_names: Sequence[str],
                    compute_dtype=None):
    """EdgeContext with the batch-constant weight families, or None when the
    caller must use the legacy per-edge-message path."""
    ctx = gb.edge_ctx
    if ctx is not None:
        return ctx if ctx.fam_w is not None else None
    return agg_ops.build_edge_context(gb.eig, gb.src, gb.dst, gb.edge_mask,
                                      gb.in_degree, names=agg_names,
                                      need_norms=False, mxu_layout=gb.mxu,
                                      decomposed=True,
                                      adj_dtype=compute_dtype)


def _decomposed_aggregate(gb: GraphBatch, ctx, g_node, q_node, c_edge,
                          h_in: jax.Array, agg_names: Sequence[str],
                          compute_dtype=None) -> jax.Array:
    """One gather + one wide fused scatter for the whole reduce_func — returns
    the UNSCALED aggregator concat (scalers are folded into the posttrans
    matmul by _fused_posttrans, or applied legacy-style for deep posttrans)."""
    layout = gb.mxu
    return agg_ops.aggregate_decomposed(tuple(agg_names), ctx, g_node, q_node,
                                        h_in, c_edge=c_edge, layout=layout,
                                        compute_dtype=compute_dtype)


def _dot(x, w):
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def ep_fused_layout(gb: GraphBatch) -> bool:
    """True when this batch runs the edge-partitioned MXU layout with the
    interior/boundary pair split — the layer then pulls its own halo
    (halo_pull) INSIDE the decomposed edge stage so interior aggregation can
    overlap the exchange; the model must NOT pre-refresh (models/dgn_net.py)."""
    return (gb.halo is not None and gb.mxu is not None
            and getattr(gb.mxu, "n_pairs_int", None) is not None)


def _ep_pretrans_parts(gb: GraphBatch, kernel, bias, h, e,
                       edge_features: bool):
    """_linear_pretrans_parts under the EP split: g as (g_own, g_halo) with
    the halo rows freshly exchanged, q only on own rows (halo-row outputs are
    masked garbage anyway — zeros keep them off the collective's dependency
    chain)."""
    f = h.shape[-1]
    own = h[: gb.halo.n_local]
    halo = halo_pull(own, gb.halo)
    g_node = (_dot(own, kernel[:f]), _dot(halo, kernel[:f]))
    q_own = _dot(own, kernel[f:2 * f]) + bias
    q_node = jnp.concatenate(
        [q_own, jnp.zeros((h.shape[0] - own.shape[0], q_own.shape[-1]),
                          q_own.dtype)], axis=0)
    c_edge = _dot(e, kernel[2 * f:]) if edge_features else None
    return g_node, q_node, c_edge


def _linear_pretrans_parts(kernel, bias, h, e, edge_features: bool):
    """Split a LINEAR pretrans over [h_src || h_dst (|| e)] into node/edge
    parts: (g_node = h@W1, q_node = h@W2 + b, c_edge = e@W3 or None) such
    that msg_e = g_node[src] + q_node[dst] (+ c_edge)."""
    f = h.shape[-1]
    g_node = _dot(h, kernel[:f])
    q_node = _dot(h, kernel[f:2 * f]) + bias
    c_edge = _dot(e, kernel[2 * f:]) if edge_features else None
    return g_node, q_node, c_edge


def _fused_posttrans(kernel, bias, h_in, h_agg, gb: GraphBatch,
                     scaler_names: Sequence[str], avg_d: Dict[str, float]):
    """Linear posttrans over concat([h_in?, scaler-scaled copies of h_agg])
    WITHOUT materializing the concats.

    Scalers are per-node scalars, so (s ⊙ x) @ W == s ⊙ (x @ W): the S scaled
    copies collapse into one matmul against the row-blocks of the posttrans
    kernel plus an [N, S]-column weighted sum.  h_in is None for the simple
    layer (no input concat, reference nets/dgn_layer.py:146-148).
    """
    f_in = 0 if h_in is None else h_in.shape[-1]
    out = bias if h_in is None else _dot(h_in, kernel[:f_in]) + bias
    w_agg = h_agg.shape[-1]
    s = len(scaler_names)
    if s <= 1:      # reference quirk: single scaler -> no scaling at all
        return out + _dot(h_agg, kernel[f_in:f_in + w_agg])
    blocks = jnp.concatenate(
        [kernel[f_in + i * w_agg: f_in + (i + 1) * w_agg] for i in range(s)],
        axis=1)                                   # [w_agg, S*out]
    t = _dot(h_agg, blocks)
    cols = scaler_ops.scaler_columns(scaler_names, gb.in_degree, avg_d,
                                     dtype=t.dtype)
    o = kernel.shape[-1]
    for i in range(s):
        out = out + cols[:, i:i + 1] * t[:, i * o:(i + 1) * o]
    return out


class DGNLayerSimple(fnn.Module):
    """No pretrans; message = src features (reference nets/dgn_layer.py:135-202)."""
    out_dim: int
    aggregators: Tuple[str, ...]
    scalers: Tuple[str, ...]
    avg_d: Dict[str, float]
    dropout: float = 0.0
    graph_norm: bool = True
    batch_norm: bool = True
    residual: bool = True
    posttrans_layers: int = 1
    bn_axis: str | None = None
    compute_dtype: str | None = None

    @fnn.compact
    def __call__(self, gb: GraphBatch, h, e=None, deterministic: bool = True):
        in_dim = h.shape[-1]
        residual = self.residual and (in_dim == self.out_dim)
        h_in = h
        n_scal = len(self.scalers) if len(self.scalers) > 1 else 1
        ctx = _decomposed_ctx(gb, self.aggregators, self.compute_dtype)
        if ctx is not None:   # message IS h[src]: decomposed with g=h, q=0
            if ep_fused_layout(gb):
                own = h[: gb.halo.n_local]
                g_in = (own, halo_pull(own, gb.halo))
            else:
                g_in = h
            agg = _decomposed_aggregate(gb, ctx, g_in, None, None, h_in,
                                        self.aggregators, self.compute_dtype)
            if self.posttrans_layers == 1:
                k, b = LinearParams(
                    len(self.aggregators) * in_dim * n_scal,
                    self.out_dim, name="posttrans")()
                h = _fused_posttrans(k, b, None, agg, gb, self.scalers,
                                     self.avg_d)
            else:
                if len(self.scalers) > 1:
                    agg = scaler_ops.apply_scalers(tuple(self.scalers), agg,
                                                   gb.in_degree, self.avg_d)
                h = MLP(hidden_size=self.out_dim, out_size=self.out_dim,
                        layers=self.posttrans_layers, mid_activation="relu",
                        last_activation="none", name="posttrans")(
                            agg, gb.node_mask, deterministic)
        else:
            msg = _gather_src(gb, h, self.compute_dtype)
            h = _edge_aggregate(gb, msg, h_in, self.aggregators, self.scalers,
                                self.avg_d, self.compute_dtype)
            h = MLP(hidden_size=self.out_dim, out_size=self.out_dim,
                    layers=self.posttrans_layers, mid_activation="relu",
                    last_activation="none", name="posttrans")(
                        h, gb.node_mask, deterministic)
        if self.graph_norm:
            h = h * gb.snorm_n
        if self.batch_norm:
            h = MaskedBatchNorm(self.out_dim, axis_name=self.bn_axis,
                                name="batchnorm_h")(
                h, gb.node_mask, use_running_average=deterministic)
        h = jax.nn.relu(h)
        if residual:
            h = h_in + h
        if self.dropout > 0:
            h = fnn.Dropout(rate=self.dropout)(h, deterministic=deterministic)
        return h


class DGNLayerComplex(fnn.Module):
    """Pretrans MLP on [h_src || h_dst || e], input-concat posttrans
    (reference nets/dgn_layer.py:52-132)."""
    out_dim: int
    aggregators: Tuple[str, ...]
    scalers: Tuple[str, ...]
    avg_d: Dict[str, float]
    dropout: float = 0.0
    graph_norm: bool = True
    batch_norm: bool = True
    residual: bool = True
    edge_features: bool = False
    pretrans_layers: int = 1
    posttrans_layers: int = 1
    bn_axis: str | None = None
    compute_dtype: str | None = None

    @fnn.compact
    def __call__(self, gb: GraphBatch, h, e=None, deterministic: bool = True):
        in_dim = h.shape[-1]
        residual = self.residual and (in_dim == self.out_dim)
        h_in = h
        n_scal = len(self.scalers) if len(self.scalers) > 1 else 1
        e_dim = e.shape[-1] if self.edge_features else 0
        ctx = _decomposed_ctx(gb, self.aggregators, self.compute_dtype) \
            if self.pretrans_layers == 1 else None
        if ctx is not None:   # linear pretrans: split into node/edge parts
            kern, bias = LinearParams(2 * in_dim + e_dim, in_dim,
                                      name="pretrans")()
            if ep_fused_layout(gb):
                g_node, q_node, c_edge = _ep_pretrans_parts(
                    gb, kern, bias, h, e, self.edge_features)
            else:
                g_node, q_node, c_edge = _linear_pretrans_parts(
                    kern, bias, h, e, self.edge_features)
            agg = _decomposed_aggregate(gb, ctx, g_node, q_node, c_edge,
                                        h_in, self.aggregators,
                                        self.compute_dtype)
            if self.posttrans_layers == 1:
                k, b = LinearParams(
                    in_dim + len(self.aggregators) * in_dim * n_scal,
                    self.out_dim, name="posttrans")()
                h = _fused_posttrans(k, b, h_in, agg, gb, self.scalers,
                                     self.avg_d)
            else:
                if len(self.scalers) > 1:
                    agg = scaler_ops.apply_scalers(tuple(self.scalers), agg,
                                                   gb.in_degree, self.avg_d)
                h = jnp.concatenate([h_in, agg], axis=-1)
                h = MLP(hidden_size=self.out_dim, out_size=self.out_dim,
                        layers=self.posttrans_layers, mid_activation="relu",
                        last_activation="none", name="posttrans")(
                            h, gb.node_mask, deterministic)
        else:
            pretrans = MLP(hidden_size=in_dim, out_size=in_dim,
                           layers=self.pretrans_layers, mid_activation="relu",
                           last_activation="none", name="pretrans")
            hs = _gather_src(gb, h, self.compute_dtype)
            hd = _gather_dst(gb, h, self.compute_dtype)
            z = jnp.concatenate([hs, hd, e], axis=-1) if self.edge_features \
                else jnp.concatenate([hs, hd], axis=-1)
            msg = pretrans(z, gb.edge_mask, deterministic)
            h_agg = _edge_aggregate(gb, msg, h_in, self.aggregators,
                                    self.scalers, self.avg_d,
                                    self.compute_dtype)
            h = jnp.concatenate([h_in, h_agg], axis=-1)
            h = MLP(hidden_size=self.out_dim, out_size=self.out_dim,
                    layers=self.posttrans_layers, mid_activation="relu",
                    last_activation="none", name="posttrans")(
                        h, gb.node_mask, deterministic)
        if self.graph_norm:
            h = h * gb.snorm_n
        if self.batch_norm:
            h = MaskedBatchNorm(self.out_dim, axis_name=self.bn_axis,
                                name="batchnorm_h")(
                h, gb.node_mask, use_running_average=deterministic)
        h = jax.nn.relu(h)
        if residual:
            h = h_in + h
        if self.dropout > 0:
            h = fnn.Dropout(rate=self.dropout)(h, deterministic=deterministic)
        return h


class DGNTower(fnn.Module):
    """One tower: complex-style conv, but posttrans -> graph_norm -> bn ->
    dropout, NO relu/residual (reference nets/dgn_layer.py:205-276)."""
    out_dim: int
    aggregators: Tuple[str, ...]
    scalers: Tuple[str, ...]
    avg_d: Dict[str, float]
    dropout: float = 0.0
    graph_norm: bool = True
    batch_norm: bool = True
    edge_features: bool = False
    pretrans_layers: int = 1
    posttrans_layers: int = 1
    bn_axis: str | None = None
    compute_dtype: str | None = None

    @fnn.compact
    def __call__(self, gb: GraphBatch, h, e=None, deterministic: bool = True):
        in_dim = h.shape[-1]
        n_scal = len(self.scalers) if len(self.scalers) > 1 else 1
        e_dim = e.shape[-1] if self.edge_features else 0
        ctx = _decomposed_ctx(gb, self.aggregators, self.compute_dtype) \
            if self.pretrans_layers == 1 else None
        if ctx is not None:
            kern, bias = LinearParams(2 * in_dim + e_dim, in_dim,
                                      name="pretrans")()
            if ep_fused_layout(gb):
                g_node, q_node, c_edge = _ep_pretrans_parts(
                    gb, kern, bias, h, e, self.edge_features)
            else:
                g_node, q_node, c_edge = _linear_pretrans_parts(
                    kern, bias, h, e, self.edge_features)
            agg = _decomposed_aggregate(gb, ctx, g_node, q_node, c_edge,
                                        h, self.aggregators,
                                        self.compute_dtype)
            if self.posttrans_layers == 1:
                k, b = LinearParams(
                    in_dim + len(self.aggregators) * in_dim * n_scal,
                    self.out_dim, name="posttrans")()
                out = _fused_posttrans(k, b, h, agg, gb, self.scalers,
                                       self.avg_d)
            else:
                if len(self.scalers) > 1:
                    agg = scaler_ops.apply_scalers(tuple(self.scalers), agg,
                                                   gb.in_degree, self.avg_d)
                hcat = jnp.concatenate([h, agg], axis=-1)
                out = MLP(hidden_size=self.out_dim, out_size=self.out_dim,
                          layers=self.posttrans_layers, mid_activation="relu",
                          last_activation="none", name="posttrans")(
                              hcat, gb.node_mask, deterministic)
        else:
            pretrans = MLP(hidden_size=in_dim, out_size=in_dim,
                           layers=self.pretrans_layers, mid_activation="relu",
                           last_activation="none", name="pretrans")
            hs = _gather_src(gb, h, self.compute_dtype)
            hd = _gather_dst(gb, h, self.compute_dtype)
            z = jnp.concatenate([hs, hd, e], axis=-1) if self.edge_features \
                else jnp.concatenate([hs, hd], axis=-1)
            msg = pretrans(z, gb.edge_mask, deterministic)
            h_agg = _edge_aggregate(gb, msg, h, self.aggregators, self.scalers,
                                    self.avg_d, self.compute_dtype)
            hcat = jnp.concatenate([h, h_agg], axis=-1)
            out = MLP(hidden_size=self.out_dim, out_size=self.out_dim,
                      layers=self.posttrans_layers, mid_activation="relu",
                      last_activation="none", name="posttrans")(
                          hcat, gb.node_mask, deterministic)
        if self.graph_norm:
            out = out * gb.snorm_n
        if self.batch_norm:
            out = MaskedBatchNorm(self.out_dim, axis_name=self.bn_axis,
                                  name="batchnorm_h")(
                out, gb.node_mask, use_running_average=deterministic)
        if self.dropout > 0:
            out = fnn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        return out


class DGNLayerTower(fnn.Module):
    """Multi-tower layer with input slicing + LeakyReLU mixing network
    (reference nets/dgn_layer.py:279-325)."""
    out_dim: int
    aggregators: Tuple[str, ...]
    scalers: Tuple[str, ...]
    avg_d: Dict[str, float]
    towers: int = 5
    divide_input: bool = True
    dropout: float = 0.0
    graph_norm: bool = True
    batch_norm: bool = True
    residual: bool = False
    edge_features: bool = False
    pretrans_layers: int = 1
    posttrans_layers: int = 1
    bn_axis: str | None = None
    compute_dtype: str | None = None

    @fnn.compact
    def __call__(self, gb: GraphBatch, h, e=None, deterministic: bool = True):
        in_dim = h.shape[-1]
        if self.divide_input and in_dim % self.towers != 0:
            raise ValueError("towers must divide in_dim when divide_input")
        if self.out_dim % self.towers != 0:
            raise ValueError("towers must divide out_dim")
        residual = self.residual and (in_dim == self.out_dim)
        input_tower = in_dim // self.towers if self.divide_input else in_dim
        output_tower = self.out_dim // self.towers

        h_in = h
        outs = []
        for t in range(self.towers):
            ht = (h[:, t * input_tower:(t + 1) * input_tower]
                  if self.divide_input else h)
            outs.append(DGNTower(
                out_dim=output_tower, aggregators=self.aggregators,
                scalers=self.scalers, avg_d=self.avg_d, dropout=self.dropout,
                graph_norm=self.graph_norm, batch_norm=self.batch_norm,
                edge_features=self.edge_features,
                pretrans_layers=self.pretrans_layers,
                posttrans_layers=self.posttrans_layers, bn_axis=self.bn_axis,
                compute_dtype=self.compute_dtype,
                name=f"tower_{t}")(gb, ht, e, deterministic))
        h_cat = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
        if self.towers > 1:
            h_out = FCLayer(self.out_dim, activation="leakyrelu",
                            name="mixing")(h_cat, gb.node_mask, deterministic)
        else:
            h_out = h_cat
        if residual:
            h_out = h_in + h_out
        return h_out


class VirtualNode(fnn.Module):
    """Graph-global virtual node (reference nets/dgn_layer.py:12-49).

    State (vn_h, one row per graph) is threaded by the caller.  Pooling uses
    masked per-graph segment reductions over the node axis.
    """
    dim: int
    dropout: float = 0.0
    batch_norm: bool = False
    residual: bool = True
    vn_type: str = "mean"
    bn_axis: str | None = None

    @fnn.compact
    def __call__(self, gb: GraphBatch, h, vn_h, deterministic: bool = True):
        g = gb.num_graphs_padded

        use_mxu_pool = gb.mxu is not None and gb.mxu.local_graph is not None

        def pool_sum(x):
            if use_mxu_pool:
                return mxu.graph_pool_sum(x, gb.mxu, g)
            return segment.segment_sum(x, gb.node_graph, g, gb.node_mask,
                                       indices_are_sorted=gb.halo is None)

        def pool_mean(x):
            s = pool_sum(x)
            n = gb.n_nodes.astype(s.dtype)[:, None]
            return jnp.where(n > 0, s / jnp.maximum(n, 1), 0)

        if self.vn_type == "mean":
            pool = pool_mean(h)
        elif self.vn_type == "sum":
            pool = pool_sum(h)
        elif self.vn_type == "logsum":
            pool = pool_mean(h)
            lognum = jnp.log(jnp.maximum(gb.n_nodes.astype(h.dtype), 1.0))
            pool = pool * lognum[:, None]
        else:
            raise ValueError(f"bad vn_type {self.vn_type!r}")
        if gb.halo is not None:
            # edge-partitioned: per-graph pools are partial sums (division by
            # the replicated n_nodes commutes with the psum)
            pool = jax.lax.psum(pool, gb.halo.axis)

        vn_tmp = FCLayer(self.dim, activation="relu", dropout=self.dropout,
                         b_norm=self.batch_norm, bn_axis=self.bn_axis,
                         name="fc_layer")(
                             vn_h + pool, gb.graph_mask, deterministic)
        vn_h = vn_h + vn_tmp if self.residual else vn_tmp
        if use_mxu_pool:
            h = h + mxu.graph_broadcast(vn_h, gb.mxu)
        else:
            h = h + segment.gather(vn_h, gb.node_graph)
        return vn_h, h


def make_dgn_layer(type_net: str, **kw) -> fnn.Module:
    """Dispatcher mirroring DGNLayer(type_net=...) (reference nets/dgn_layer.py:328)."""
    if type_net == "simple":
        kw.pop("edge_features", None)
        kw.pop("pretrans_layers", None)
        kw.pop("towers", None)
        kw.pop("divide_input", None)
        return DGNLayerSimple(**kw)
    if type_net == "complex":
        kw.pop("towers", None)
        kw.pop("divide_input", None)
        return DGNLayerComplex(**kw)
    if type_net == "towers":
        return DGNLayerTower(**kw)
    raise ValueError(f"unknown type_net {type_net!r}")
