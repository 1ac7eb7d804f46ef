"""Link prediction (OGB COLLAB-style): DGN node embeddings + edge predictor.

Re-creates the capability of the reference's orphaned COLLAB trainer
(reference train/train_COLLAB_edge_classification.py — its main_COLLAB.py /
data/COLLAB.py are missing from the snapshot, SURVEY.md §2 #27): one large
graph, batched positive edges with uniform random negative sampling
(:44-52), BCE on the edge scores, Hits@{10,50,100} evaluation against fixed
negative edge sets (:115-145), optional eigenvector-field rotation
augmentation (:31-38).

TPU design: the full graph's node embeddings are computed ONCE per step
(one jitted forward over the packed graph), then edge minibatches index into
them — both the forward and the per-batch predictor step are fixed-shape
jits.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from ..graph import GraphBatch
from ..nn import Linear
from ..ops import field
from . import metrics as M
from .optim import ReduceLROnPlateau, adam_l2
from .trainer import TrainParams


class EdgePredictor(fnn.Module):
    """score(u, v) = MLP(h_u * h_v) (OGB link-pred convention)."""
    hidden: int
    layers: int = 3

    @fnn.compact
    def __call__(self, h_u, h_v):
        x = h_u * h_v
        for _ in range(self.layers - 1):
            x = jax.nn.relu(Linear(self.hidden)(x))
        return Linear(1)(x)[..., 0]


class LinkPredModel(fnn.Module):
    """DGN backbone (readout='none') + edge predictor head."""
    backbone: fnn.Module
    hidden: int

    def setup(self):
        self.predictor = EdgePredictor(self.hidden)

    def __call__(self, gb: GraphBatch, deterministic: bool = True):
        return self.backbone(gb, deterministic=deterministic)

    def embed(self, gb: GraphBatch, deterministic: bool = True):
        return self.backbone(gb, deterministic=deterministic)

    def predict(self, h, u, v):
        return self.predictor(h[u], h[v])


def link_bce_loss(pos_scores, neg_scores):
    """-log sigma(pos) - log(1 - sigma(neg)) (the reference model.loss)."""
    pos = -jax.nn.log_sigmoid(pos_scores)
    neg = -jax.nn.log_sigmoid(-neg_scores)
    return jnp.mean(pos) + jnp.mean(neg)


class LinkPredTrainer:
    """Epoch driver for one-big-graph link prediction."""

    def __init__(self, model: LinkPredModel, params: TrainParams,
                 edge_batch: int = 4096):
        self.model = model
        self.p = params
        self.edge_batch = edge_batch
        self.tx = adam_l2(params.init_lr, params.weight_decay)
        self.scheduler = ReduceLROnPlateau(
            lr=params.init_lr, factor=params.lr_reduce_factor,
            patience=params.lr_schedule_patience, min_lr=params.min_lr)

        @jax.jit
        def train_step(variables, opt_state, gb, pos_edges, rng, lr):
            aug_rng, neg_rng, dropout_rng = jax.random.split(rng, 3)
            if self.p.augmentation > 1e-7:
                gb = dataclasses.replace(
                    gb, eig=field.rotate_field(gb.eig, aug_rng,
                                               self.p.augmentation))

            def loss_of(params):
                v = {**variables, "params": params}
                h, mut = self.model.apply(v, gb, deterministic=False,
                                          rngs={"dropout": dropout_rng},
                                          mutable=["batch_stats"],
                                          method=self.model.embed)
                pos = self.model.apply(v, h, pos_edges[:, 0],
                                       pos_edges[:, 1],
                                       method=self.model.predict)
                # negatives drawn from REAL nodes only (pack_graphs places
                # them first) — the reference samples torch.randint(0,
                # x.size(0)) over real nodes (train_COLLAB_edge_
                # classification.py:49); padded slots would be trivially
                # separable and inflate Hits@K
                neg_edges = jax.random.randint(
                    neg_rng, pos_edges.shape, 0, gb.real_node_count())
                neg = self.model.apply(v, h, neg_edges[:, 0],
                                       neg_edges[:, 1],
                                       method=self.model.predict)
                return link_bce_loss(pos, neg), mut

            (loss, mut), grads = jax.value_and_grad(
                loss_of, has_aux=True)(variables["params"])
            opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = self.tx.update(grads, opt_state,
                                                variables["params"])
            params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            variables["params"], updates)
            new_vars = {**variables, "params": params}
            if "batch_stats" in mut:
                new_vars["batch_stats"] = mut["batch_stats"]
            return new_vars, opt_state, loss

        @jax.jit
        def score_edges(variables, h, edges):
            return self.model.apply(variables, h, edges[:, 0], edges[:, 1],
                                    method=self.model.predict)

        @jax.jit
        def embed(variables, gb):
            return self.model.apply(variables, gb, deterministic=True,
                                    method=self.model.embed)

        self._train_step = train_step
        self._score = score_edges
        self._embed = embed

    def init(self, gb: GraphBatch, seed: Optional[int] = None):
        key = jax.random.PRNGKey(self.p.seed if seed is None else seed)
        variables = self.model.init(
            key, gb, jnp.zeros((4, 2), jnp.int32), method=_init_all)
        opt_state = self.tx.init(variables["params"])
        return variables, opt_state

    def train_epoch(self, variables, opt_state, gb: GraphBatch,
                    train_edges: np.ndarray, epoch: int):
        rng = np.random.default_rng(self.p.seed * 7919 + epoch)
        order = rng.permutation(len(train_edges))
        lr = jnp.asarray(self.scheduler.lr, jnp.float32)
        losses = []
        bs = self.edge_batch
        n_batches = max(len(order) // bs, 1)   # fixed-shape edge batches
        for i in range(n_batches):
            sel = order[i * bs:(i + 1) * bs]
            if len(sel) < bs:
                sel = np.concatenate([sel, order[: bs - len(sel)]])
            batch = jnp.asarray(train_edges[sel], jnp.int32)
            key = jax.random.PRNGKey((self.p.seed * 100003 + epoch * 1009 + i)
                                     & 0x7FFFFFFF)
            variables, opt_state, loss = self._train_step(
                variables, opt_state, gb, batch, key, lr)
            losses.append(float(loss))
        return variables, opt_state, float(np.mean(losses))

    def evaluate(self, variables, gb: GraphBatch, pos_edges: np.ndarray,
                 neg_edges: np.ndarray,
                 ks=(10, 50, 100)) -> Dict[str, float]:
        h = self._embed(variables, gb)
        pos = np.asarray(self._score(variables, h,
                                     jnp.asarray(pos_edges, jnp.int32)))
        neg = np.asarray(self._score(variables, h,
                                     jnp.asarray(neg_edges, jnp.int32)))
        return {f"hits@{k}": M.hits_at_k(pos, neg, k) for k in ks}


def _init_all(model: LinkPredModel, gb, edges):
    h = model.embed(gb)
    return model.predict(h, edges[:, 0], edges[:, 1])


def collab_model(cfg) -> LinkPredModel:
    """DGN backbone with raw node-embedding output + predictor head."""
    from ..models.dgn_net import DGNModel
    cfg = dataclasses.replace(cfg, readout="none")
    return LinkPredModel(backbone=DGNModel(cfg), hidden=cfg.out_dim)
