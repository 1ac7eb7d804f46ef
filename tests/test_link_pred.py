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


def test_negative_sampling_never_hits_padding():
    """Negatives must come from REAL node slots only (the reference samples
    torch.randint(0, x.size(0)) over real nodes; padded-slot embeddings are
    degenerate and would inflate Hits@K)."""
    g, splits = synthetic.synthetic_collab(num_nodes=100, seed=5)
    gb = pack_graphs([g], n_pad=256, g_pad=1)   # 156 pad slots
    cfg = DGNConfig(hidden_dim=8, out_dim=8, L=1, type_net="simple",
                    aggregators="mean", scalers="identity",
                    avg_d={"log": 1.5, "lin": 5.0}, node_encoder="linear")
    model = collab_model(cfg)
    trainer = LinkPredTrainer(model, TrainParams(init_lr=1e-3, seed=1),
                              edge_batch=64)
    variables, opt_state = trainer.init(gb)

    seen = []
    orig = jax.random.randint

    def spy(key, shape, minval, maxval, *a, **k):
        out = orig(key, shape, minval, maxval, *a, **k)
        if shape == (64, 2):
            seen.append(out)
        return out

    jax.random.randint = spy
    try:
        with jax.disable_jit():
            trainer.train_epoch(variables, opt_state, gb, splits["train"], 0)
    finally:
        jax.random.randint = orig
    assert seen, "negative sampling path not exercised"
    for s in seen:
        assert int(jnp.max(s)) < 100, "negative edge hit a padded node slot"


def test_collab_raw_loader_fixture(tmp_path):
    """Round-trip the ogbl-collab raw csv layout through load_collab."""
    import gzip

    from dgn_tpu.config import DataParams
    from dgn_tpu.data.datasets import load_collab

    root = tmp_path / "ogbl_collab"
    raw = root / "raw"
    split = root / "split" / "time"
    raw.mkdir(parents=True)
    split.mkdir(parents=True)

    n = 12
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(n, 5)).astype(np.float32)
    train_e = np.array([[i, (i + 1) % n] for i in range(n)] +
                       [[i, (i + 3) % n] for i in range(n)])
    val_e = np.array([[0, 5], [2, 7]])
    val_neg = np.array([[1, 8], [3, 9], [4, 10]])
    test_e = np.array([[1, 6]])
    test_neg = np.array([[2, 9], [5, 11]])

    def wcsv(path, arr, fmt="%d"):
        with gzip.open(path, "wt") as f:
            np.savetxt(f, np.atleast_2d(arr), fmt=fmt, delimiter=",")

    wcsv(raw / "num-node-list.csv.gz", np.array([[n]]))
    wcsv(raw / "num-edge-list.csv.gz", np.array([[len(train_e)]]))
    wcsv(raw / "edge.csv.gz", train_e)
    wcsv(raw / "node-feat.csv.gz", feat, fmt="%.6f")

    # .pt split files, the real OGB artifact shape
    import torch
    torch.save({"edge": torch.from_numpy(train_e)}, split / "train.pt")
    torch.save({"edge": torch.from_numpy(val_e),
                "edge_neg": torch.from_numpy(val_neg)}, split / "valid.pt")
    torch.save({"edge": torch.from_numpy(test_e),
                "edge_neg": torch.from_numpy(test_neg)}, split / "test.pt")

    g, splits, meta = load_collab(DataParams(data_dir=str(tmp_path)),
                                  k_eig=3)
    assert g.num_nodes == n
    assert meta["in_dim"] == 5
    np.testing.assert_array_equal(splits["train"], train_e)
    np.testing.assert_array_equal(splits["valid"], val_e)
    np.testing.assert_array_equal(splits["valid_neg"], val_neg)
    np.testing.assert_array_equal(splits["test_neg"], test_neg)
    # message-passing graph = train edges, both directions
    assert len(g.src) == 2 * len(train_e)
    assert g.eig.shape == (n, 3)
    np.testing.assert_allclose(g.node_feat, feat, atol=1e-5)  # %.6f fixture


def test_collab_cli_driver_runs():
    from dgn_tpu.run import run
    report = run(["--dataset", "COLLAB", "--epochs", "1",
                  "--synthetic_size", "96", "--hidden_dim", "8",
                  "--out_dim", "8", "--L", "1",
                  "--aggregators", "mean", "--scalers", "identity",
                  "--batch_size", "64"])
    assert "test_at_best_val" in report
    assert 0.0 <= report["best_val_hits@50"] <= 1.0
