"""Link prediction (COLLAB-style): predictor, trainer, Hits@K."""
import numpy as np
import jax
import jax.numpy as jnp

from dgn_tpu.data import synthetic
from dgn_tpu.graph import pack_graphs
from dgn_tpu.models import DGNConfig
from dgn_tpu.train import metrics as M
from dgn_tpu.train.link_pred import (LinkPredTrainer, collab_model,
                                     link_bce_loss)
from dgn_tpu.train.trainer import TrainParams


def test_hits_at_k_semantics():
    pos = np.array([5.0, 3.0, 1.0, 0.5])
    neg = np.array([4.0, 2.0, 0.0, -1.0, -2.0])
    # k=2: 2nd best negative = 2.0 -> pos > 2.0 are 5.0, 3.0 -> 0.5
    assert M.hits_at_k(pos, neg, 2) == 0.5
    assert M.hits_at_k(pos, neg, 10) == 1.0     # fewer negs than k


def test_link_bce_loss_direction():
    good = link_bce_loss(jnp.array([5.0]), jnp.array([-5.0]))
    bad = link_bce_loss(jnp.array([-5.0]), jnp.array([5.0]))
    assert float(good) < float(bad)


def test_collab_trainer_learns_and_evaluates():
    g, splits = synthetic.synthetic_collab(num_nodes=200, seed=3, avg_deg=6)
    gb = pack_graphs([g], g_pad=1)
    cfg = DGNConfig(hidden_dim=24, out_dim=24, L=2, type_net="simple",
                    aggregators="mean dir1-dx", scalers="identity",
                    avg_d={"log": 1.5, "lin": 5.0},
                    node_encoder="linear", edge_feat=False, dropout=0.0)
    model = collab_model(cfg)
    trainer = LinkPredTrainer(model, TrainParams(init_lr=3e-3, seed=1),
                              edge_batch=256)
    variables, opt_state = trainer.init(gb)

    first_loss = None
    for epoch in range(12):
        variables, opt_state, loss = trainer.train_epoch(
            variables, opt_state, gb, splits["train"], epoch)
        if first_loss is None:
            first_loss = loss
    assert loss < first_loss, (first_loss, loss)

    res = trainer.evaluate(variables, gb, splits["valid"],
                           splits["valid_neg"])
    assert set(res) == {"hits@10", "hits@50", "hits@100"}
    assert all(0.0 <= v <= 1.0 for v in res.values())
    # the model must rank held-out positives above random negatives far
    # better than chance once trained
    assert res["hits@100"] > 0.3, res


def test_collab_rotation_augmentation_path():
    g, splits = synthetic.synthetic_collab(num_nodes=120, seed=4)
    gb = pack_graphs([g], g_pad=1)
    cfg = DGNConfig(hidden_dim=8, out_dim=8, L=1, type_net="simple",
                    aggregators="mean dir1-dx", scalers="identity",
                    avg_d={"log": 1.5, "lin": 5.0}, node_encoder="linear")
    model = collab_model(cfg)
    trainer = LinkPredTrainer(model, TrainParams(augmentation=20.0, seed=2),
                              edge_batch=128)
    variables, opt_state = trainer.init(gb)
    variables, opt_state, loss = trainer.train_epoch(
        variables, opt_state, gb, splits["train"], 0)
    assert np.isfinite(loss)
