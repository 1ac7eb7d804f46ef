"""Micro-batched train step == full-batch step (gradient accumulation).

Verdict-r4 #4: batches above the ~1024-graphs/chip knee ran a silently
degraded regime; the fix splits them into K micro-batches inside one jitted
step.  These tests pin the semantics: with BatchNorm off the K-micro step
reproduces the full-batch loss AND the post-update parameters exactly
(micro losses averaged with the task loss's own denominator weights —
Trainer._loss_weight); BatchNorm statistics are per-micro by documented
choice (like per-shard DP with sync-BN off).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgn_tpu.data import BatchLoader, synthetic
from dgn_tpu.graph import pack_graphs
from dgn_tpu.models import DGNConfig, pcba_model, zinc_model
from dgn_tpu.ops.scalers import degree_stats
from dgn_tpu.train.trainer import TrainParams, Trainer


def _tree_close(a, b, rtol=2e-5, atol=2e-6):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def _avg_d(graphs):
    degs = np.concatenate([np.bincount(g.dst, minlength=g.num_nodes)
                           for g in graphs])
    return degree_stats(degs)


@pytest.mark.parametrize("task", ["zinc", "pcba"])
def test_micro_step_equals_full_batch_step(task):
    if task == "zinc":
        graphs = synthetic.synthetic_zinc(48, seed=21)
        cfg = DGNConfig(hidden_dim=10, out_dim=10, L=2, avg_d=_avg_d(graphs),
                        batch_norm=False, edge_feat=False)
        model, loss_fn = zinc_model(cfg)
    else:
        graphs = synthetic.synthetic_ogb_mol(48, seed=22, n_tasks=128,
                                             k_eig=3, nan_frac=0.4)
        cfg = DGNConfig(hidden_dim=10, out_dim=10, L=2, type_net="simple",
                        aggregators="mean max min dir1-dx dir1-av",
                        scalers="identity", avg_d=_avg_d(graphs),
                        batch_norm=False, graph_norm=False,
                        virtual_node="mean", node_encoder="atom")
        model, loss_fn = pcba_model(cfg)
    trainer = Trainer(model, loss_fn, TrainParams(seed=41, init_lr=1e-3),
                      task=task, donate=False)

    full_loader = BatchLoader(graphs, 48, layout="mxu")
    micro_loader = BatchLoader(graphs, 48, layout="mxu", micro_batches=4)
    gb_full = next(iter(full_loader))
    micros = next(iter(micro_loader))
    assert isinstance(micros, list) and len(micros) == 4
    # same graphs overall
    assert sum(int(g.graph_mask.sum()) for g in micros) == len(graphs)

    state = trainer.init_state(gb_full)
    lr = jnp.asarray(1e-3, jnp.float32)
    rng = jax.random.PRNGKey(7)
    s_full, loss_full, _ = trainer._train_step(state, gb_full, rng, lr)
    s_micro, loss_micro, scores = trainer._train_step(state, micros, rng, lr)

    np.testing.assert_allclose(float(loss_micro), float(loss_full),
                               rtol=2e-6, atol=2e-7)
    _tree_close(s_micro.params, s_full.params)
    # stacked per-micro scores come back for the metric accumulators
    assert np.asarray(scores).shape[0] == 4


def test_micro_loader_epoch_runs_and_learns():
    graphs = synthetic.synthetic_zinc(96, seed=5)
    cfg = DGNConfig(hidden_dim=12, out_dim=12, L=2, avg_d=_avg_d(graphs))
    model, loss_fn = zinc_model(cfg)
    p = TrainParams(seed=41, epochs=4, batch_size=48, init_lr=5e-3,
                    lr_schedule_patience=50, print_epoch_interval=100)
    trainer = Trainer(model, loss_fn, p, task="zinc")
    loader = BatchLoader(graphs, 48, shuffle=True, seed=3, layout="mxu",
                         micro_batches=3)
    first_batch = next(iter(loader))
    state = trainer.init_state(first_batch[0])
    first = None
    for epoch in range(p.epochs):
        state, m = trainer.train_epoch(state, loader, epoch)
        if first is None:
            first = m["mae"]
    assert m["mae"] < first, (first, m)
    ev = trainer.evaluate(state, BatchLoader(graphs[:48], 48, layout="mxu",
                                             micro_batches=3))
    assert np.isfinite(ev["mae"])


def test_micro_pack_static_metadata_uniform():
    """All micros of a super-batch share identical pytree structure (the
    trainer stacks them for lax.scan) — including ext_passes."""
    graphs = synthetic.synthetic_zinc(60, seed=8)
    loader = BatchLoader(graphs, 60, layout="mxu", micro_batches=4)
    micros = next(iter(loader))
    trees = {jax.tree_util.tree_structure(g) for g in micros}
    assert len(trees) == 1
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *micros)
    assert stacked.node_feat.shape[0] == len(micros)
