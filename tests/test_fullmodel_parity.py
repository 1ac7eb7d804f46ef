"""FULL-MODEL numerical parity: flax DGNModel vs the torch reference oracle.

tests/test_reference_parity.py pins every component against the reference's
own code; this suite closes the COMPOSITION hole: the entire train step —
embed -> L x (pretrans -> aggregate -> scale -> posttrans -> graph_norm ->
BN -> relu -> residual) -> readout -> L1 loss -> parameter gradients -> one
Adam step — is compared against tests/torch_oracle.py (a line-for-line
transcription of reference nets/dgn_layer.py + molecules dgn_net.py), with
the torch state_dict copied into the flax params.

Covers simple/complex/towers x edge_feat on/off x flat/MXU layouts, the
single-scaler quirk (HIV config), pos_enc, and the directional readout.
A wiring error anywhere in the composed model fails here even if every
component is individually correct.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dgn_tpu.data import synthetic
from dgn_tpu.graph import mxu_bucket_sizes, pack_graphs
from dgn_tpu.models import DGNConfig, zinc_model
from dgn_tpu.ops.scalers import degree_stats
from dgn_tpu.train.trainer import TrainParams, Trainer, TrainState

import torch_oracle as orc

H = 12
L = 3
LR = 1e-3
WD = 3e-6

CASES = [
    # the ZINC headline config shape (complex, 3 scalers)
    dict(type_net="complex", edge_feat=False, layout="flat"),
    dict(type_net="complex", edge_feat=False, layout="mxu"),
    dict(type_net="complex", edge_feat=True, layout="flat"),
    dict(type_net="complex", edge_feat=True, layout="mxu"),
    # HIV config shape: simple net, 5 aggregators, SINGLE scaler (the
    # len(scalers)>1 quirk -> no scaling at all).  The mxu variant exercises
    # the scatter-free block extremes (ops/extremes.py) end to end.
    dict(type_net="simple", edge_feat=False, layout="flat",
         aggregators="mean max min dir1-dx dir1-av", scalers="identity"),
    dict(type_net="simple", edge_feat=False, layout="mxu",
         aggregators="mean max min dir1-dx dir1-av", scalers="identity"),
    dict(type_net="simple", edge_feat=False, layout="mxu"),
    # towers (divide_input, LeakyReLU mixing, no relu/residual inside)
    dict(type_net="towers", edge_feat=True, layout="flat"),
    dict(type_net="towers", edge_feat=False, layout="mxu"),
    # directional readout + pos_enc + legacy (non-decomposed) edge stage
    dict(type_net="complex", edge_feat=False, layout="flat",
         readout="directional", pos_enc_dim=3, decompose=False),
    # deep pretrans/posttrans MLPs (the non-linear pretrans path)
    dict(type_net="complex", edge_feat=True, layout="flat",
         pretrans_layers=2, posttrans_layers=2),
]


def _ids(c):
    extra = [k for k in ("aggregators", "readout", "pos_enc_dim",
                         "pretrans_layers") if k in c]
    return f"{c['type_net']}-ef{int(c['edge_feat'])}-{c['layout']}" + \
        ("-" + "-".join(extra) if extra else "")


def _build(case):
    graphs = synthetic.synthetic_zinc(10, seed=5)
    degs = np.concatenate([np.bincount(g.dst, minlength=g.num_nodes)
                           for g in graphs])
    avg_d = degree_stats(degs)
    cfg = DGNConfig(
        hidden_dim=H, out_dim=H, L=L,
        type_net=case["type_net"],
        aggregators=case.get("aggregators", "mean dir1-dx dir1-av"),
        scalers=case.get("scalers", "identity amplification attenuation"),
        avg_d=avg_d, edge_feat=case["edge_feat"], edge_dim=H,
        readout=case.get("readout", "mean"),
        pos_enc_dim=case.get("pos_enc_dim", 0),
        towers=3,
        pretrans_layers=case.get("pretrans_layers", 1),
        posttrans_layers=case.get("posttrans_layers", 1),
        decompose=case.get("decompose", True))

    torch.manual_seed(7)
    net = orc.OracleNet(cfg)
    tb = orc.torch_batch(graphs)

    model, loss_fn = zinc_model(cfg)
    if case["layout"] == "mxu":
        n_pad, e_pad, g_pad = mxu_bucket_sizes(graphs, len(graphs))
        gb = pack_graphs(graphs, n_pad=n_pad, e_pad=e_pad, g_pad=g_pad,
                         mxu_layout=True)
    else:
        gb = pack_graphs(graphs)
    return net, tb, model, loss_fn, gb, len(graphs)


def _tree_allclose(got, want, rtol, atol, path=""):
    assert set(got) == set(want), (path, set(got), set(want))
    for k in want:
        p = f"{path}/{k}"
        if isinstance(want[k], dict):
            _tree_allclose(got[k], want[k], rtol, atol, p)
        else:
            np.testing.assert_allclose(np.asarray(got[k]), want[k],
                                       rtol=rtol, atol=atol, err_msg=p)


@pytest.mark.parametrize("case", CASES, ids=_ids)
def test_fullmodel_train_step_parity(case):
    net, tb, model, loss_fn, gb, n_graphs = _build(case)
    params = orc.flax_tree(net)
    batch_stats = orc.flax_batch_stats(net)
    gmask = np.asarray(gb.graph_mask)

    # ---- eval-mode forward (running-stats BN)
    net.eval()
    with torch.no_grad():
        want_scores = net(tb).numpy()
    got = np.asarray(model.apply({"params": params,
                                  "batch_stats": batch_stats},
                                 gb, deterministic=True))
    np.testing.assert_allclose(got[gmask][:n_graphs], want_scores,
                               rtol=1e-4, atol=2e-5)

    # ---- train-mode forward + loss + grads
    net.train()
    scores_t = net(tb)
    loss_t = net.loss(scores_t, tb["targets"])
    loss_t.backward()
    loss_t = loss_t.detach()

    def loss_of(p):
        out, mut = model.apply({"params": p, "batch_stats": batch_stats},
                               gb, deterministic=False,
                               mutable=["batch_stats"])
        return loss_fn(out, gb), (out, mut["batch_stats"])

    (loss_j, (scores_j, new_bs)), grads = jax.value_and_grad(
        loss_of, has_aux=True)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(scores_j)[gmask][:n_graphs],
                               scores_t.detach().numpy(),
                               rtol=1e-4, atol=2e-5)
    _tree_allclose(grads, orc.flax_tree(net, grad=True),
                   rtol=1e-3, atol=1e-5)
    # BN running stats updated identically (torch updates during the train
    # forward; flax in the mutable apply)
    _tree_allclose(new_bs, orc.flax_batch_stats(net), rtol=1e-4, atol=1e-6)

    # ---- one Adam(+L2) optimizer step
    opt = torch.optim.Adam(net.parameters(), lr=LR, weight_decay=WD)
    opt.step()
    trainer = Trainer(model, loss_fn,
                      TrainParams(seed=41, init_lr=LR, weight_decay=WD),
                      task="zinc", donate=False)
    state = TrainState(params=jax.tree_util.tree_map(jnp.asarray, params),
                       batch_stats=batch_stats,
                       opt_state=trainer.tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    state2, loss2, _ = trainer._train_step(state, gb, jax.random.PRNGKey(0),
                                           jnp.asarray(LR, jnp.float32))
    np.testing.assert_allclose(float(loss2), float(loss_t),
                               rtol=1e-5, atol=1e-6)
    # atol 1e-5 = 1% of one lr=1e-3 Adam step: near-zero gradients make the
    # normalized update lr*g/(|g|+eps) hypersensitive to f32 rounding in g,
    # while any real wiring bug shows up at the full 1e-3 step scale
    _tree_allclose(state2.params, orc.flax_tree(net), rtol=1e-4, atol=1e-5)
