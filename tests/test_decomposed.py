"""Decomposed linear-pretrans edge stage == legacy per-edge-message pipeline.

The canonical configs all use pretrans_layers=1 (reference
realworld_benchmark/configs/*.json), so messages factor as
msg_e = g[src] + q[dst] (+ c_e) and every aggregator reduces to weighted
segment-sums of g[src] plus node-local terms with batch-constant weight
totals (ops/aggregators.py:aggregate_decomposed).  These tests pin the
decomposed path to the legacy path — same params, same batch — for every
layer type, layout, and aggregator family, outputs and gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgn_tpu.data import synthetic
from dgn_tpu.graph import bucket_sizes_for, mxu_bucket_sizes, pack_graphs
from dgn_tpu.models import DGNConfig
from dgn_tpu.models.dgn_net import DGNModel

ALL_AGGS = ("mean sum max min std var dir1-dx dir1-av dir2-dx-no-abs "
            "dir1-dx-balanced dir1-0.1 dir2-neg-0.1")


def _batch(layout, n=12, seed=3):
    graphs = synthetic.synthetic_zinc(n, seed=seed)
    if layout == "mxu":
        n_pad, e_pad, g_pad = mxu_bucket_sizes(graphs, n)
        return pack_graphs(graphs, n_pad=n_pad, e_pad=e_pad, g_pad=g_pad,
                           mxu_layout=True)
    n_pad, e_pad = bucket_sizes_for(graphs, n)
    return pack_graphs(graphs, n_pad=n_pad, e_pad=e_pad, g_pad=n)


def _compare(gb, **cfg_kw):
    cfg = dict(hidden_dim=20, out_dim=20, L=1, towers=5,
               scalers="identity amplification attenuation",
               avg_d={"log": 1.2, "lin": 2.0}, readout="mean", n_out=1)
    cfg.update(cfg_kw)
    has_ties = any(a in cfg.get("aggregators", "").split()
                   for a in ("max", "min"))
    m_dec = DGNModel(DGNConfig(**cfg, decompose=True))
    m_leg = DGNModel(DGNConfig(**cfg, decompose=False))
    params = m_leg.init(jax.random.PRNGKey(0), gb)
    out_leg = m_leg.apply(params, gb)
    out_dec = m_dec.apply(params, gb)
    scale = max(float(jnp.max(jnp.abs(out_leg))), 1e-3)
    np.testing.assert_allclose(np.asarray(out_dec), np.asarray(out_leg),
                               rtol=0, atol=5e-5 * scale)

    def loss(p, model):
        return jnp.sum(model.apply(p, gb) ** 2)

    g_leg = jax.grad(lambda p: loss(p, m_leg))(params)
    g_dec = jax.grad(lambda p: loss(p, m_dec))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_leg),
                    jax.tree_util.tree_leaves(g_dec)):
        gs = max(float(jnp.max(jnp.abs(a))), 1e-3)
        # max/min subgradients split among VALUE-equal argmax edges; when
        # the two paths compute a message 1 ulp apart near a tie, the
        # cotangent hops to a different edge — a knife-edge, not an error
        # (absolute size stays ~1e-6).  Tie-free families keep the tight
        # tolerance.
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0,
                                   atol=(2e-3 if has_ties else 5e-4) * gs)


@pytest.mark.parametrize("layout", ["flat", "mxu"])
@pytest.mark.parametrize("type_net", ["simple", "complex"])
def test_headline_aggs(layout, type_net):
    _compare(_batch(layout), type_net=type_net,
             aggregators="mean dir1-dx dir1-av")


def test_all_aggregator_families_flat():
    _compare(_batch("flat"), type_net="complex", aggregators=ALL_AGGS)


def test_all_aggregator_families_mxu():
    _compare(_batch("mxu"), type_net="complex", aggregators=ALL_AGGS)


def test_towers():
    _compare(_batch("flat"), type_net="towers",
             aggregators="mean dir1-dx dir1-av")


def test_edge_features_complex():
    gb = _batch("mxu")
    _compare(gb, type_net="complex", aggregators="mean dir1-dx dir1-av",
             edge_feat=True, edge_dim=20, num_edge_types=4)


def test_single_scaler_hiv_shape():
    # HIV config: simple net, identity scaler only (scaling skipped)
    _compare(_batch("flat"), type_net="simple",
             aggregators="mean max min dir1-dx dir1-av", scalers="identity")


def test_param_tree_identical():
    """decompose=True must not change the parameter pytree (checkpoints,
    reference parity mappings)."""
    gb = _batch("flat")
    cfg = dict(hidden_dim=20, out_dim=20, L=2, type_net="complex",
               aggregators="mean dir1-dx dir1-av",
               scalers="identity amplification attenuation",
               avg_d={"log": 1.2, "lin": 2.0}, readout="mean", n_out=1)
    p_dec = DGNModel(DGNConfig(**cfg, decompose=True)).init(
        jax.random.PRNGKey(0), gb)
    p_leg = DGNModel(DGNConfig(**cfg, decompose=False)).init(
        jax.random.PRNGKey(0), gb)
    assert jax.tree_util.tree_structure(p_dec) == \
        jax.tree_util.tree_structure(p_leg)
    for a, b in zip(jax.tree_util.tree_leaves(p_dec),
                    jax.tree_util.tree_leaves(p_leg)):
        assert a.shape == b.shape
        # same path -> same flax RNG fold -> identical init values
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
