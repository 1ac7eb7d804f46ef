"""BucketedLoader: K tight bucket shapes vs BatchLoader's one worst-case shape.

Checks the padding-vs-recompilation tradeoff machinery (SURVEY §7 hard part 6):
coverage (every graph packed exactly once per epoch), strictly better slot
efficiency on size-skewed data, and exact eval-metric equivalence with the
single-bucket loader (metrics are accumulated from per-graph scores, so batch
composition must not matter).
"""
import numpy as np

from dgn_tpu.data import BatchLoader, synthetic
from dgn_tpu.data.loader import BucketedLoader
from dgn_tpu.models import DGNConfig, zinc_model
from dgn_tpu.ops.scalers import degree_stats
from dgn_tpu.train.trainer import TrainParams, Trainer


def _skewed_graphs(n=96, seed=11):
    """Half tiny (9-12 nodes), half large (30-37): worst case for one bucket."""
    small = [g for g in synthetic.synthetic_zinc(n * 6, seed=seed)
             if g.num_nodes <= 12][: n // 2]
    large = [g for g in synthetic.synthetic_zinc(n * 4, seed=seed + 1)
             if g.num_nodes >= 30][: n // 2]
    assert len(small) == n // 2 and len(large) == n // 2
    return small + large


def test_bucketed_covers_each_graph_once_and_packs():
    graphs = _skewed_graphs(64)
    loader = BucketedLoader(graphs, batch_size=16, n_buckets=4,
                            shuffle=True, seed=3)
    seen_nodes = 0
    n_batches = 0
    for gb in loader:  # pack_graphs raises on overflow — iteration IS the check
        seen_nodes += int(np.asarray(gb.node_mask).sum())
        n_batches += 1
    assert seen_nodes == sum(g.num_nodes for g in graphs)
    assert n_batches == len(loader)


def test_bucketed_padding_beats_single_bucket_on_skewed_sizes():
    graphs = _skewed_graphs(256)  # 4 buckets x 2 full batches of 32
    single = BatchLoader(graphs, batch_size=32)
    multi = BucketedLoader(graphs, batch_size=32, n_buckets=4)
    stats = multi.padding_stats()
    # single bucket: every batch padded to sum of 16 LARGEST graphs
    single_eff = (sum(g.num_nodes for g in graphs)
                  / (len(single) * single.n_pad))
    assert stats["node_slot_efficiency"] > single_eff * 1.3, (
        stats, single_eff)
    assert len(stats["geometry"]) >= 2  # actually produced distinct shapes


def test_bucketed_eval_metrics_match_single_bucket():
    graphs = _skewed_graphs(64, seed=5)
    degs = np.concatenate([np.bincount(g.dst, minlength=g.num_nodes)
                           for g in graphs])
    cfg = DGNConfig(hidden_dim=8, out_dim=8, L=1, avg_d=degree_stats(degs),
                    aggregators="mean dir1-dx", scalers="identity")
    model, loss_fn = zinc_model(cfg)
    trainer = Trainer(model, loss_fn, TrainParams(seed=41), task="zinc")
    single = BatchLoader(graphs, batch_size=16)
    state = trainer.init_state(next(iter(single)))
    m1 = trainer.evaluate(state, single)
    m2 = trainer.evaluate(state, BucketedLoader(graphs, batch_size=16,
                                                n_buckets=4))
    # MAE is over per-graph scores -> exact regardless of batch composition
    assert abs(m1["mae"] - m2["mae"]) < 1e-5, (m1, m2)


def test_bucketed_mxu_layout():
    graphs = _skewed_graphs(64, seed=9)
    loader = BucketedLoader(graphs, batch_size=16, n_buckets=2, layout="mxu")
    gb = next(iter(loader))
    assert gb.mxu is not None
    total = sum(int(np.asarray(b.node_mask).sum()) for b in loader)
    assert total == sum(g.num_nodes for g in graphs)


def test_exact_geometry_for_unshuffled_loader():
    graphs = _skewed_graphs(64, seed=21)
    worst = BatchLoader(graphs, batch_size=16, shuffle=True,
                        geometry="worst")
    exact = BatchLoader(graphs, batch_size=16, shuffle=False)
    # unshuffled loader sizes to its fixed partition -> never larger
    assert exact.n_pad <= worst.n_pad and exact.e_pad <= worst.e_pad
    total = sum(int(np.asarray(b.node_mask).sum()) for b in exact)
    assert total == sum(g.num_nodes for g in graphs)


def test_typical_geometry_tighter_and_escape_repacks():
    graphs = _skewed_graphs(128, seed=23)
    typ = BatchLoader(graphs, batch_size=16, shuffle=True, seed=7,
                      geometry="typical")
    worst = BatchLoader(graphs, batch_size=16, shuffle=True, seed=7,
                        geometry="worst")
    assert typ.e_pad <= worst.e_pad
    # force the escape path: shrink the pads below what batches need
    tight = BatchLoader(graphs, batch_size=16, shuffle=True, seed=7,
                        n_pad=128, e_pad=128)
    tight.n_escapes = 0
    batches = list(tight)
    assert tight.n_escapes > 0                       # escape actually fired
    total = sum(int(np.asarray(b.node_mask).sum()) for b in batches)
    assert total == sum(g.num_nodes for g in graphs)  # nothing dropped
    # escaped batches land on exact-requirement shapes, coarsely rounded
    shapes = {(b.num_nodes_padded, b.num_edges_padded) for b in batches}
    assert any(n > 128 or e > 128 for n, e in shapes)


def test_typical_geometry_mxu_layout_iterates():
    graphs = _skewed_graphs(96, seed=25)
    loader = BatchLoader(graphs, batch_size=32, shuffle=True, seed=1,
                         layout="mxu", geometry="typical")
    for _ in range(2):   # two shuffled epochs, escape hatch covers outliers
        total = sum(int(np.asarray(b.node_mask).sum()) for b in loader)
        assert total == sum(g.num_nodes for g in graphs)


def test_mxu_order_sensitive_overflow_is_escaped():
    """Regression: block placement is order-sensitive (next-fit), so the
    'worst-case' descending-order bound is NOT a true bound for shuffled
    SBM-sized batches (~60-100 nodes, ~1-2 graphs per 128-block).  The
    loader must sort mxu batches descending AND escape any residual
    overflow instead of raising mid-epoch."""
    from dgn_tpu.data import synthetic
    graphs = synthetic.synthetic_sbm(96, seed=3, n_classes=2, nodes=80)
    loader = BatchLoader(graphs, batch_size=32, shuffle=True, seed=11,
                         layout="mxu", geometry="typical")
    want = sum(g.num_nodes for g in graphs)
    for _ in range(6):   # many shuffled epochs: no ValueError, full coverage
        total = sum(int(np.asarray(b.node_mask).sum()) for b in loader)
        assert total == want
