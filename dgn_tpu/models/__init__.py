"""Task model factories: the five benchmark networks as (model, loss) pairs.

Each factory pins the per-task DGNConfig defaults of the corresponding
reference net (see dgn_net.py docstring) and returns the matching masked loss
from train/losses.py.  `loss(scores, gb)` closes over task specifics.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax.numpy as jnp

from ..graph import GraphBatch
from ..train import losses
from .dgn_net import DGNConfig, DGNModel
from .encoders import AtomEncoder, BondEncoder
from .readout import graph_readout

LossFn = Callable[..., jnp.ndarray]


def zinc_model(cfg: DGNConfig = DGNConfig()) -> Tuple[DGNModel, LossFn]:
    """ZINC graph regression (reference molecules_graph_regression/dgn_net.py):
    atom-type Embedding input, optional bond-type edge Embedding, L1 loss."""
    cfg = dataclasses.replace(cfg, node_encoder="embedding",
                              edge_encoder="embedding", n_out=1)

    def loss(scores, gb: GraphBatch):
        return losses.l1_loss(scores, gb.labels, gb.graph_mask)

    return DGNModel(cfg), loss


def sbm_model(cfg: DGNConfig, n_classes: int) -> Tuple[DGNModel, LossFn]:
    """SBM PATTERN/CLUSTER node classification (reference
    SBMs_node_classification/dgn_net.py): node-level head, class-weighted CE."""
    cfg = dataclasses.replace(cfg, node_encoder="embedding", readout="node",
                              n_out=n_classes)

    def loss(logits, gb: GraphBatch):
        return losses.weighted_cross_entropy_sbm(
            logits, gb.node_labels, gb.node_mask, n_classes)

    return DGNModel(cfg), loss


def superpixels_model(cfg: DGNConfig, n_classes: int) -> Tuple[DGNModel, LossFn]:
    """MNIST/CIFAR10 superpixels (reference
    superpixels_graph_classification/dgn_net.py): Linear input/edge embed, CE."""
    cfg = dataclasses.replace(cfg, node_encoder="linear",
                              edge_encoder="linear", n_out=n_classes)

    def loss(logits, gb: GraphBatch):
        return losses.cross_entropy(logits, gb.labels.squeeze(-1)
                                    if gb.labels.ndim > 1 else gb.labels,
                                    gb.graph_mask)

    return DGNModel(cfg), loss


def hiv_model(cfg: DGNConfig = DGNConfig()) -> Tuple[DGNModel, LossFn]:
    """ogbg-molhiv (reference HIV_graph_classification/dgn_net.py):
    AtomEncoder/BondEncoder, BCE-with-logits."""
    cfg = dataclasses.replace(cfg, node_encoder="atom", edge_encoder="bond",
                              n_out=1)

    def loss(scores, gb: GraphBatch):
        labels = gb.labels.squeeze(-1) if gb.labels.ndim > 1 else gb.labels
        return losses.bce_with_logits(scores, labels.astype(jnp.float32),
                                      gb.graph_mask)

    return DGNModel(cfg), loss


def pcba_model(cfg: DGNConfig = DGNConfig()) -> Tuple[DGNModel, LossFn]:
    """ogbg-molpcba 128-task (reference PCBA_graph_classification/dgn_net.py):
    AtomEncoder, virtual-node interleave, NaN-masked multi-task BCE."""
    cfg = dataclasses.replace(cfg, node_encoder="atom", edge_encoder="bond",
                              n_out=128)

    def loss(scores, gb: GraphBatch):
        return losses.masked_bce_multitask(scores, gb.labels, gb.graph_mask)

    return DGNModel(cfg), loss


MODEL_FACTORIES = {
    "zinc": zinc_model,
    "sbm": sbm_model,
    "superpixels": superpixels_model,
    "hiv": hiv_model,
    "pcba": pcba_model,
}

__all__ = ["DGNConfig", "DGNModel", "AtomEncoder", "BondEncoder",
           "graph_readout", "zinc_model", "sbm_model", "superpixels_model",
           "hiv_model", "pcba_model", "MODEL_FACTORIES"]
