"""Model zoo: forward/grad smoke + loss parity vs torch."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import torch

from dgn_tpu.graph import GraphData, pack_graphs
from dgn_tpu.models import (DGNConfig, hiv_model, pcba_model, sbm_model,
                            superpixels_model, zinc_model)
from dgn_tpu.train import losses

from oracle import random_graph

AVG_D = {"log": 1.1, "lin": 2.5, "exp": 1.0}


def make_batch(rng, node_kind="int", edge_kind=None, label_shape=(1,),
               node_labels=False, k=4):
    graphs = []
    for n in (9, 13, 7):
        src, dst = random_graph(rng, n)
        e = len(src)
        if node_kind == "int":
            nf = rng.integers(0, 20, size=(n,)).astype(np.int32)
        elif node_kind == "float":
            nf = rng.normal(size=(n, 5)).astype(np.float32)
        else:  # atom
            nf = np.stack([rng.integers(0, 2, size=(n,)) for _ in range(9)],
                          axis=1).astype(np.int32)
        ef = None
        if edge_kind == "int":
            ef = rng.integers(0, 4, size=(e,)).astype(np.int32)
        elif edge_kind == "float":
            ef = rng.normal(size=(e, 3)).astype(np.float32)
        elif edge_kind == "bond":
            ef = np.stack([rng.integers(0, 2, size=(e,)) for _ in range(3)],
                          axis=1).astype(np.int32)
        lbl = rng.normal(size=label_shape).astype(np.float32)
        nl = rng.integers(0, 3, size=(n,)).astype(np.int32) if node_labels else None
        graphs.append(GraphData(num_nodes=n, src=src, dst=dst, node_feat=nf,
                                eig=rng.normal(size=(n, k)).astype(np.float32),
                                edge_feat=ef, label=lbl, node_labels=nl))
    return pack_graphs(graphs, n_pad=40, e_pad=160, g_pad=4)


def _run(model, loss_fn, gb):
    v = model.init(jax.random.PRNGKey(0), gb, deterministic=True)
    scores = model.apply(v, gb, deterministic=True)

    def loss_of(params):
        s = model.apply({"params": params, **{k: v[k] for k in v if k != "params"}},
                        gb, deterministic=True)
        return loss_fn(s, gb)

    val, grads = jax.jit(jax.value_and_grad(loss_of))(v["params"])
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    return scores, val


def test_zinc_forward_and_grad(rng):
    gb = make_batch(rng, node_kind="int")
    cfg = DGNConfig(hidden_dim=12, out_dim=12, L=2, avg_d=AVG_D,
                    num_node_types=28)
    model, loss_fn = zinc_model(cfg)
    scores, _ = _run(model, loss_fn, gb)
    assert scores.shape == (4, 1)


def test_zinc_complex_edge_features(rng):
    gb = make_batch(rng, node_kind="int", edge_kind="int")
    cfg = DGNConfig(hidden_dim=12, out_dim=12, L=2, avg_d=AVG_D,
                    edge_feat=True, edge_dim=6)
    model, loss_fn = zinc_model(cfg)
    scores, _ = _run(model, loss_fn, gb)
    assert scores.shape == (4, 1)


def test_sbm_node_classification(rng):
    gb = make_batch(rng, node_kind="int", node_labels=True)
    cfg = DGNConfig(hidden_dim=12, out_dim=12, L=2, avg_d=AVG_D,
                    num_node_types=20)
    model, loss_fn = sbm_model(cfg, n_classes=3)
    scores, _ = _run(model, loss_fn, gb)
    assert scores.shape == (gb.num_nodes_padded, 3)


def test_superpixels_towers(rng):
    gb = make_batch(rng, node_kind="float", edge_kind="float",
                    label_shape=())
    # labels must be int for CE
    gb = dataclasses.replace(gb, labels=jnp.asarray(
        np.array([1, 0, 2, 0], np.int32)))
    cfg = DGNConfig(hidden_dim=10, out_dim=10, L=2, avg_d=AVG_D,
                    type_net="towers", towers=5, edge_feat=True, edge_dim=5)
    model, loss_fn = superpixels_model(cfg, n_classes=10)
    scores, _ = _run(model, loss_fn, gb)
    assert scores.shape == (4, 10)


def test_hiv_simple(rng):
    gb = make_batch(rng, node_kind="atom", edge_kind="bond")
    gb = dataclasses.replace(gb, labels=jnp.asarray(
        np.array([[1.0], [0.0], [1.0], [0.0]], np.float32)))
    cfg = DGNConfig(hidden_dim=14, out_dim=14, L=2, avg_d=AVG_D,
                    type_net="simple", aggregators="mean max min dir1-dx dir1-av",
                    scalers="identity")
    model, loss_fn = hiv_model(cfg)
    scores, _ = _run(model, loss_fn, gb)
    assert scores.shape == (4, 1)


def test_pcba_virtual_node(rng):
    labels = np.full((4, 128), np.nan, np.float32)
    labels[0, :5] = 1.0
    labels[1, :5] = 0.0
    labels[2, 10:20] = 1.0
    gb = make_batch(rng, node_kind="atom", edge_kind="bond")
    gb = dataclasses.replace(gb, labels=jnp.asarray(labels))
    cfg = DGNConfig(hidden_dim=14, out_dim=14, L=3, avg_d=AVG_D,
                    type_net="simple", scalers="identity",
                    virtual_node="mean", decreasing_dim=False)
    model, loss_fn = pcba_model(cfg)
    scores, _ = _run(model, loss_fn, gb)
    assert scores.shape == (4, 128)


# ---------------------------------------------------------------- losses
def test_l1_matches_torch(rng):
    s = rng.normal(size=(6, 1)).astype(np.float32)
    t = rng.normal(size=(6,)).astype(np.float32)
    mask = np.array([1, 1, 1, 1, 0, 0], bool)
    got = float(losses.l1_loss(jnp.asarray(s), jnp.asarray(t),
                               jnp.asarray(mask)))
    want = torch.nn.L1Loss()(torch.from_numpy(s[:4, 0]),
                             torch.from_numpy(t[:4])).item()
    assert abs(got - want) < 1e-6


def test_weighted_ce_matches_torch(rng):
    n, c = 30, 4
    logits = rng.normal(size=(n, c)).astype(np.float32)
    labels = rng.integers(0, 3, size=(n,)).astype(np.int64)  # class 3 absent
    mask = np.ones(n, bool)
    got = float(losses.weighted_cross_entropy_sbm(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask), c))

    tl = torch.from_numpy(labels)
    V = n
    counts = torch.bincount(tl, minlength=c)
    weight = (V - counts).float() / V
    weight *= (counts > 0).float()
    want = torch.nn.CrossEntropyLoss(weight=weight)(
        torch.from_numpy(logits), tl).item()
    assert abs(got - want) < 1e-5


def test_bce_matches_torch(rng):
    s = rng.normal(size=(8,)).astype(np.float32)
    y = rng.integers(0, 2, size=(8,)).astype(np.float32)
    mask = np.ones(8, bool)
    got = float(losses.bce_with_logits(jnp.asarray(s), jnp.asarray(y),
                                       jnp.asarray(mask)))
    want = torch.nn.BCEWithLogitsLoss()(torch.from_numpy(s),
                                        torch.from_numpy(y)).item()
    assert abs(got - want) < 1e-6


def test_masked_bce_matches_torch(rng):
    g, t = 6, 7
    s = rng.normal(size=(g, t)).astype(np.float32)
    y = rng.integers(0, 2, size=(g, t)).astype(np.float32)
    y[y > 1.5] = np.nan
    y[0, 0] = np.nan
    y[2, 3:] = np.nan
    mask = np.array([1, 1, 1, 1, 1, 0], bool)
    got = float(losses.masked_bce_multitask(jnp.asarray(s), jnp.asarray(y),
                                            jnp.asarray(mask)))
    ts, ty = torch.from_numpy(s[:5]), torch.from_numpy(y[:5])
    lab = ty == ty
    want = torch.nn.BCEWithLogitsLoss()(ts[lab], ty[lab]).item()
    assert abs(got - want) < 1e-6
