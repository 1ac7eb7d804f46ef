"""Dense DGN layer: (B, N, N) adjacency path.

Re-design of /root/reference/models/pytorch/dgn_layer.py as flax modules:
DGNTower (pretrans MLP on [h_i || h_j] pairs, aggregator+scaler concat,
posttrans MLP with input concat, :38-52) and DGNLayer (feature-sliced
towers + LeakyReLU mixing FCLayer always applied, :97-107).

The reference discovers the aggregator stack width with a runtime probe on
dummy tensors (:27-28); here the width is computed statically from the
aggregator names (aggregators.total_channels), so the module is fully
shape-static for XLA.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from ..nn import FCLayer, MLP
from . import aggregators as dense_agg
from .scalers import SCALERS


class DenseDGNTower(fnn.Module):
    """One tower over dense adjacency (reference DGNTower, dgn_layer.py:9-57)."""
    out_features: int
    aggregators: Tuple[str, ...]
    scalers: Tuple[str, ...]
    avg_d: dict
    self_loop: bool = False
    pretrans_layers: int = 1
    posttrans_layers: int = 1

    @fnn.compact
    def __call__(self, x, adj, eigvec=None, deterministic: bool = True):
        n = x.shape[-2]
        h_i = jnp.broadcast_to(x[..., :, None, :], x.shape[:-2] + (n, n, x.shape[-1]))
        h_j = jnp.broadcast_to(x[..., None, :, :], x.shape[:-2] + (n, n, x.shape[-1]))
        h_cat = jnp.concatenate([h_i, h_j], axis=-1)
        in_f = x.shape[-1]
        h_mod = MLP(hidden_size=in_f, out_size=in_f,
                    layers=self.pretrans_layers, mid_activation="relu",
                    last_activation="none")(h_cat, deterministic=deterministic)
        m = dense_agg.aggregate(self.aggregators, h_mod, adj, eigvec=eigvec,
                                self_loop=self.self_loop, avg_d=self.avg_d)
        m = jnp.concatenate([SCALERS[s](m, adj, self.avg_d)
                             for s in self.scalers], axis=-1)
        m_cat = jnp.concatenate([x, m], axis=-1)
        return MLP(hidden_size=self.out_features, out_size=self.out_features,
                   layers=self.posttrans_layers, mid_activation="relu",
                   last_activation="none")(m_cat, deterministic=deterministic)


class DenseDGNLayer(fnn.Module):
    """Towers + mixing network (reference DGNLayer, dgn_layer.py:60-107)."""
    out_features: int
    aggregators: Tuple[str, ...]
    scalers: Tuple[str, ...]
    avg_d: dict
    towers: int = 1
    self_loop: bool = False
    pretrans_layers: int = 1
    posttrans_layers: int = 1
    divide_input: bool = True

    @fnn.compact
    def __call__(self, x, adj, eigvec: Optional[jax.Array] = None,
                 deterministic: bool = True):
        in_f = x.shape[-1]
        if self.divide_input and in_f % self.towers != 0:
            raise ValueError("towers must divide in_features with divide_input")
        if self.out_features % self.towers != 0:
            raise ValueError("towers must divide out_features")
        in_tower = in_f // self.towers if self.divide_input else in_f
        out_tower = self.out_features // self.towers
        ys = []
        for t in range(self.towers):
            xt = (x[..., t * in_tower:(t + 1) * in_tower]
                  if self.divide_input else x)
            ys.append(DenseDGNTower(
                out_features=out_tower, aggregators=self.aggregators,
                scalers=self.scalers, avg_d=self.avg_d,
                self_loop=self.self_loop,
                pretrans_layers=self.pretrans_layers,
                posttrans_layers=self.posttrans_layers)(
                    xt, adj, eigvec, deterministic))
        y = jnp.concatenate(ys, axis=-1)
        # mixing network: always applied in the dense variant (:107)
        return FCLayer(self.out_features, activation="leakyrelu")(
            y, deterministic=deterministic)
