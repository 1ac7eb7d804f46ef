"""Observability: metric stream, throughput, padding poison, fingerprints,
multiplicity tool."""
import json

import jax
import jax.numpy as jnp
import numpy as np

from dgn_tpu import observe
from dgn_tpu.data import synthetic
from dgn_tpu.graph import pack_graphs
from dgn_tpu.models import DGNConfig, zinc_model


def test_metric_stream_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    ms = observe.MetricStream(path)
    ms.log("step", loss=1.5, lr=1e-3)
    ms.log("epoch", epoch=0, mae=0.7)
    ms.close()
    recs = [json.loads(l) for l in open(path)]
    assert recs[0]["kind"] == "step" and recs[0]["loss"] == 1.5
    assert recs[1]["epoch"] == 0


def test_throughput_counts_real_elements_only():
    graphs = synthetic.synthetic_zinc(4, seed=0)
    gb = pack_graphs(graphs, n_pad=512, e_pad=1024, g_pad=8)
    tp = observe.Throughput()
    tp.add_batch(gb)
    tp.add_batch(gb)
    r = tp.result()
    real_e = sum(g.num_edges for g in graphs)
    assert r["steps"] == 2
    assert abs(r["edges_per_s"] * r["seconds"] - 2 * real_e) < 1e-6
    assert 0 < r["edge_padding_efficiency"] < 1


def test_poison_padding_is_harmless_when_masks_correct():
    """NaN-poisoned pads must not change the (finite) model output."""
    graphs = synthetic.synthetic_zinc(6, seed=2)
    gb = pack_graphs(graphs, n_pad=384, e_pad=512, g_pad=8)
    cfg = DGNConfig(hidden_dim=10, out_dim=10, L=2, type_net="complex",
                    aggregators="mean dir1-dx dir1-av max min",
                    scalers="identity amplification attenuation",
                    avg_d={"log": 1.0, "lin": 2.0})
    model, loss_fn = zinc_model(cfg)
    v = model.init(jax.random.PRNGKey(0), gb, deterministic=True)
    clean = model.apply(v, gb, deterministic=True)
    poisoned = model.apply(v, observe.poison_padding(gb), deterministic=True)
    pg = np.asarray(poisoned)[np.asarray(gb.graph_mask)]
    cg = np.asarray(clean)[np.asarray(gb.graph_mask)]
    assert np.all(np.isfinite(pg))
    np.testing.assert_allclose(pg, cg, rtol=1e-5, atol=1e-6)
    # the loss also stays finite and equal
    np.testing.assert_allclose(float(loss_fn(poisoned, gb)),
                               float(loss_fn(clean, gb)), rtol=1e-5)


def test_step_fingerprint_detects_divergence():
    p1 = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    p2 = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    assert observe.step_fingerprint(p1) == observe.step_fingerprint(p2)
    p3 = {"w": jnp.ones((4, 4)).at[0, 0].set(1.0000001),
          "b": jnp.zeros((4,))}
    assert observe.step_fingerprint(p1) != observe.step_fingerprint(p3)


def test_step_fingerprint_is_order_sensitive():
    """A commutative sum would miss element swaps and leaf permutations —
    exactly the cross-host leaf-ordering desyncs the fingerprint exists to
    catch."""
    a = {"w": jnp.asarray([1.0, 2.0, 3.0, 4.0])}
    b = {"w": jnp.asarray([2.0, 1.0, 3.0, 4.0])}    # element swap
    assert observe.step_fingerprint(a) != observe.step_fingerprint(b)
    c = {"x": jnp.asarray([1.0, 2.0]), "y": jnp.asarray([3.0, 4.0])}
    d = {"x": jnp.asarray([3.0, 4.0]), "y": jnp.asarray([1.0, 2.0])}
    assert observe.step_fingerprint(c) != observe.step_fingerprint(d)


def test_profile_steps_writes_trace(tmp_path):
    f = jax.jit(lambda x: x * 2 + 1)
    out = observe.profile_steps(f, 3, str(tmp_path / "trace"),
                                jnp.arange(8.0))
    assert np.allclose(np.asarray(out), np.arange(8.0) * 2 + 1)
    assert any((tmp_path / "trace").rglob("*"))


def test_multiplicity_tool():
    from dgn_tpu.tools.multiplicity import main, multiplicity
    out = main(["--dataset", "ZINC", "--synthetic_size", "12"])
    assert 0.0 <= out["fraction_distinct"] <= 1.0
    assert out["n_graphs"] == 12 + 2 * 16   # train + val + test
    # path graph P4: lambda1 != lambda2 -> distinct
    from dgn_tpu.graph import GraphData
    g = GraphData(num_nodes=4, src=np.array([0, 1, 1, 2, 2, 3]),
                  dst=np.array([1, 0, 2, 1, 3, 2]),
                  node_feat=np.zeros(4, np.int32))
    r = multiplicity([g], tol=1e-3)
    assert r["fraction_distinct"] == 1.0
    # star K1,3 has a degenerate lambda_1 = lambda_2 = 1
    s = GraphData(num_nodes=4, src=np.array([0, 1, 0, 2, 0, 3]),
                  dst=np.array([1, 0, 2, 0, 3, 0]),
                  node_feat=np.zeros(4, np.int32))
    r2 = multiplicity([s], tol=1e-3)
    assert r2["fraction_distinct"] == 0.0
