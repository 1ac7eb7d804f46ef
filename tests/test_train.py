"""End-to-end training: loss decreases, scheduler works, eval runs."""
import numpy as np
import jax

from dgn_tpu.data import BatchLoader, synthetic
from dgn_tpu.models import DGNConfig, zinc_model
from dgn_tpu.ops.scalers import degree_stats
from dgn_tpu.train.optim import ReduceLROnPlateau
from dgn_tpu.train.trainer import TrainParams, Trainer


def test_zinc_end_to_end_learns():
    graphs = synthetic.synthetic_zinc(96, seed=7)
    degs = np.concatenate([np.bincount(g.dst, minlength=g.num_nodes)
                           for g in graphs])
    avg_d = degree_stats(degs)
    cfg = DGNConfig(hidden_dim=16, out_dim=16, L=2, avg_d=avg_d,
                    aggregators="mean dir1-dx dir1-av",
                    scalers="identity amplification attenuation")
    model, loss_fn = zinc_model(cfg)
    params = TrainParams(seed=41, epochs=8, batch_size=32, init_lr=5e-3,
                         lr_schedule_patience=50, print_epoch_interval=100)
    trainer = Trainer(model, loss_fn, params, task="zinc")

    train_loader = BatchLoader(graphs, 32, shuffle=True, seed=1)
    val_loader = BatchLoader(graphs[:32], 32)
    gb0 = next(iter(train_loader))
    state = trainer.init_state(gb0)

    first = None
    for epoch in range(params.epochs):
        state, m = trainer.train_epoch(state, train_loader, epoch)
        if first is None:
            first = m["mae"]
    assert m["mae"] < first * 0.7, (first, m)

    ev = trainer.evaluate(state, val_loader)
    assert np.isfinite(ev["mae"]) and np.isfinite(ev["loss"])


def test_fit_loop_with_plateau_and_min_lr_stop():
    graphs = synthetic.synthetic_zinc(32, seed=3)
    cfg = DGNConfig(hidden_dim=8, out_dim=8, L=1,
                    avg_d={"log": 1.0, "lin": 2.0},
                    aggregators="mean", scalers="identity")
    model, loss_fn = zinc_model(cfg)
    params = TrainParams(epochs=6, batch_size=16, init_lr=1e-3,
                         lr_reduce_factor=0.5, lr_schedule_patience=0,
                         min_lr=6e-4, print_epoch_interval=100)
    trainer = Trainer(model, loss_fn, params, task="zinc")
    loader = BatchLoader(graphs, 16)
    state = trainer.init_state(next(iter(loader)))
    out = trainer.fit(state, loader, val_loader=loader,
                      log=lambda s: None)
    # patience 0 and non-improving-ish val -> lr halves quickly, hits floor, stops
    assert len(out["history"]) <= params.epochs
    assert out["best_epoch"] >= 0


def test_reduce_lr_on_plateau_torch_semantics():
    import torch
    tsch_opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    tsch = torch.optim.lr_scheduler.ReduceLROnPlateau(
        tsch_opt, mode="min", factor=0.5, patience=2, min_lr=0.01)
    mine = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=2, min_lr=0.01)
    metrics = [1.0, 0.9, 0.9, 0.9, 0.9, 0.85, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5]
    for m in metrics:
        tsch.step(m)
        mine.step(m)
        assert abs(tsch_opt.param_groups[0]["lr"] - mine.lr) < 1e-12, m


def test_augmentations_applied_in_train_step():
    graphs = synthetic.synthetic_zinc(8, seed=5)
    cfg = DGNConfig(hidden_dim=8, out_dim=8, L=1,
                    avg_d={"log": 1.0, "lin": 2.0},
                    aggregators="mean dir1-dx", scalers="identity")
    model, loss_fn = zinc_model(cfg)
    params = TrainParams(epochs=1, batch_size=8, flip=True, augmentation=15.0,
                         distortion=0.1, print_epoch_interval=100)
    trainer = Trainer(model, loss_fn, params, task="zinc")
    loader = BatchLoader(graphs, 8)
    state = trainer.init_state(next(iter(loader)))
    state, m = trainer.train_epoch(state, loader, 0)
    assert np.isfinite(m["loss"])


def test_sbm_planted_pattern_is_learnable():
    """Node labels must be structurally detectable (planted denser pattern).

    Guards against regressing to arbitrary-community-id labels, which are
    unlearnable by symmetry (every community is statistically identical) —
    a model on those sits at chance balanced accuracy (~50% for 2 classes).
    """
    from dgn_tpu.models import MODEL_FACTORIES

    graphs = synthetic.synthetic_sbm(48, seed=1, n_classes=2)
    # patterns exist and are denser than background
    labels = np.concatenate([g.node_labels for g in graphs])
    assert set(np.unique(labels)) == {0, 1}
    degs = np.concatenate([np.bincount(g.dst, minlength=g.num_nodes)
                           for g in graphs])
    pat_deg = degs[labels == 1].mean()
    bg_deg = degs[labels == 0].mean()
    assert pat_deg > bg_deg * 1.3, (pat_deg, bg_deg)

    cfg = DGNConfig(hidden_dim=16, out_dim=16, L=2, avg_d=degree_stats(degs),
                    aggregators="mean dir1-dx", scalers="identity",
                    num_node_types=3)
    model, loss_fn = MODEL_FACTORIES["sbm"](cfg, 2)
    tr = Trainer(model, loss_fn,
                 TrainParams(seed=41, epochs=20, batch_size=24, init_lr=5e-3,
                             lr_schedule_patience=100,
                             print_epoch_interval=1000), task="sbm")
    loader = BatchLoader(graphs, 24, shuffle=True, seed=1)
    state = tr.init_state(next(iter(loader)))
    for ep in range(20):
        state, m = tr.train_epoch(state, loader, ep)
    assert m["acc"] > 62.0, m   # well above the ~50% symmetry ceiling


def test_superpixels_labels_learnable_and_generalize():
    """Class signal is injected at generation (cluster count/spread shape the
    kNN graph), so a model must generalize to a HELD-OUT split — guards
    against hash-style labels (unlearnable) and post-hoc quantile bins
    (fit train, barely beat chance on val)."""
    from dgn_tpu.models import MODEL_FACTORIES

    train = synthetic.synthetic_superpixels(96, seed=1, n_classes=2)
    val = synthetic.synthetic_superpixels(64, seed=2, n_classes=2)
    labels = np.array([int(g.label) for g in train])
    assert np.bincount(labels, minlength=2).min() >= 24  # roughly balanced
    degs = np.concatenate([np.bincount(g.dst, minlength=g.num_nodes)
                           for g in train])
    cfg = DGNConfig(hidden_dim=20, out_dim=20, L=2, avg_d=degree_stats(degs),
                    aggregators="mean dir1-dx dir2-dx", scalers="identity")
    model, loss_fn = MODEL_FACTORIES["superpixels"](cfg, 2)
    tr = Trainer(model, loss_fn,
                 TrainParams(seed=41, epochs=20, batch_size=32, init_lr=5e-3,
                             lr_schedule_patience=100,
                             print_epoch_interval=1000), task="superpixels")
    loader = BatchLoader(train, 32, shuffle=True, seed=1)
    state = tr.init_state(next(iter(loader)))
    for ep in range(20):
        state, m = tr.train_epoch(state, loader, ep)
    ev = tr.evaluate(state, BatchLoader(val, 32))
    assert ev["acc"] > 70.0, (m, ev)   # held-out; chance = 50%


def test_eval_context_cache_matches_rebuild():
    """BatchLoader(cache=True) + Trainer eval-context reuse: identical
    metrics to the rebuild-every-step path, and the cache actually hits."""
    graphs = synthetic.synthetic_zinc(48, seed=9)
    degs = np.concatenate([np.bincount(g.dst, minlength=g.num_nodes)
                           for g in graphs])
    cfg = DGNConfig(hidden_dim=12, out_dim=12, L=2, avg_d=degree_stats(degs),
                    aggregators="mean dir1-dx dir1-av",
                    scalers="identity amplification attenuation")
    model, loss_fn = zinc_model(cfg)
    trainer = Trainer(model, loss_fn, TrainParams(seed=41), task="zinc")

    plain = BatchLoader(graphs, 16, layout="mxu")
    cached = BatchLoader(graphs, 16, layout="mxu", cache=True)
    state = trainer.init_state(next(iter(plain)))

    want = trainer.evaluate(state, plain)
    got1 = trainer.evaluate(state, cached)
    got2 = trainer.evaluate(state, cached)        # second epoch: cache hits
    np.testing.assert_allclose(got1["mae"], want["mae"], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(got1["loss"], want["loss"], rtol=1e-6,
                               atol=1e-7)
    assert got2 == got1
    assert len(trainer._ctx_cache) == len(cached)  # one entry per batch
    # the cached loader replays identical objects across epochs
    a = [id(gb) for gb in cached]
    b = [id(gb) for gb in cached]
    assert a == b
