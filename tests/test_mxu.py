"""Block-diagonal MXU layout: ops vs segment oracle, model parity vs flat path.

The MXU layout (dgn_tpu/ops/mxu.py, pack_graphs(mxu_layout=True)) must be a
pure execution-layout change: identical math to the flat scatter path, for
forward AND gradients, across layer types and aggregator families.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgn_tpu.graph import GraphData, mxu_bucket_sizes, pack_graphs
from dgn_tpu.models import DGNConfig, pcba_model, sbm_model, zinc_model
from dgn_tpu.ops import mxu

from oracle import random_graph

AVG_D = {"log": 1.1, "lin": 2.5, "exp": 1.0}


# ------------------------------------------------------------------ op units

def test_block_gather_matches_take(rng):
    n_blocks, c = 3, 5
    table = jnp.asarray(rng.normal(size=(n_blocks * 128, 7)).astype(np.float32))
    chunk_block = jnp.asarray(rng.integers(0, n_blocks, size=(c,)).astype(np.int32))
    local = jnp.asarray(rng.integers(0, 128, size=(c * 128,)).astype(np.int32))
    got = mxu.block_gather(table, local, chunk_block)
    idx = np.asarray(chunk_block).repeat(128) * 128 + np.asarray(local)
    want = np.asarray(table)[idx]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_block_scatter_sum_matches_segment(rng):
    n_blocks, c = 4, 6
    chunk_block = np.sort(rng.integers(0, n_blocks, size=(c,))).astype(np.int32)
    local = rng.integers(0, 150, size=(c * 128,)).astype(np.int32)  # >=128 pads
    data = rng.normal(size=(c * 128, 5)).astype(np.float32)
    got = mxu.block_scatter_sum(jnp.asarray(data), jnp.asarray(local),
                                jnp.asarray(chunk_block), n_blocks)
    want = np.zeros((n_blocks * 128, 5), np.float32)
    gid = chunk_block.repeat(128) * 128 + local
    valid = local < 128
    np.add.at(want, gid[valid], data[valid])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_onehot_embed_matches_take(rng):
    table = jnp.asarray(rng.normal(size=(28, 9)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 28, size=(200,)).astype(np.int32))
    np.testing.assert_allclose(np.asarray(mxu.onehot_embed(ids, table)),
                               np.asarray(table)[np.asarray(ids)],
                               rtol=1e-6, atol=1e-6)


# --------------------------------------------------------------- pack + model

def _graphs(rng, sizes, node_kind="int", edge_kind=None, label_shape=(1,),
            node_labels=False, k=4):
    graphs = []
    for n in sizes:
        src, dst = random_graph(rng, n)
        e = len(src)
        if node_kind == "int":
            nf = rng.integers(0, 20, size=(n,)).astype(np.int32)
        else:
            nf = rng.normal(size=(n, 5)).astype(np.float32)
        ef = None
        if edge_kind == "int":
            ef = rng.integers(0, 4, size=(e,)).astype(np.int32)
        lbl = rng.normal(size=label_shape).astype(np.float32)
        nl = (rng.integers(0, 3, size=(n,)).astype(np.int32)
              if node_labels else None)
        graphs.append(GraphData(num_nodes=n, src=src, dst=dst, node_feat=nf,
                                eig=rng.normal(size=(n, k)).astype(np.float32),
                                edge_feat=ef, label=lbl, node_labels=nl))
    return graphs


def test_mxu_pack_invariants(rng):
    graphs = _graphs(rng, [9, 13, 7, 30, 21, 17])
    gb = pack_graphs(graphs, mxu_layout=True)
    n_pad = gb.node_mask.shape[0]
    assert n_pad % 128 == 0 and gb.edge_mask.shape[0] % 128 == 0
    assert gb.graph_mask.shape[0] % 128 == 0
    # masks/degrees agree with the flat pack
    flat = pack_graphs(graphs)
    assert int(gb.real_edge_count()) == int(flat.real_edge_count())
    assert int(gb.real_node_count()) == int(flat.real_node_count())
    # degrees per (graph, within-graph node) identical
    ng = np.asarray(gb.node_graph)[np.asarray(gb.node_mask)]
    deg = np.asarray(gb.in_degree)[np.asarray(gb.node_mask)]
    ngf = np.asarray(flat.node_graph)[np.asarray(flat.node_mask)]
    degf = np.asarray(flat.in_degree)[np.asarray(flat.node_mask)]
    np.testing.assert_array_equal(ng, ngf)
    np.testing.assert_array_equal(deg, degf)
    # node_graph stays monotone (flat segment ops may claim sortedness)
    assert np.all(np.diff(np.asarray(gb.node_graph)) >= 0)


def _compare_paths(rng, cfg_kw, model_fn, sizes=(9, 13, 7, 30, 21),
                   node_kind="int", edge_kind=None, label_shape=(1,),
                   node_labels=False):
    graphs = _graphs(rng, list(sizes), node_kind=node_kind,
                     edge_kind=edge_kind, label_shape=label_shape,
                     node_labels=node_labels)
    flat = pack_graphs(graphs, g_pad=len(graphs))
    blk = pack_graphs(graphs, mxu_layout=True)
    cfg = DGNConfig(hidden_dim=12, out_dim=12, L=2, avg_d=AVG_D, **cfg_kw)
    model, loss_fn = model_fn(cfg)
    v = model.init(jax.random.PRNGKey(0), flat, deterministic=True)

    s_flat = model.apply(v, flat, deterministic=True)
    s_blk = model.apply(v, blk, deterministic=True)
    g = len(graphs)
    if s_flat.shape[0] == flat.num_graphs_padded:   # graph-level scores
        np.testing.assert_allclose(np.asarray(s_blk)[:g], np.asarray(s_flat)[:g],
                                   rtol=2e-4, atol=2e-5)
    else:                                           # node-level scores
        a = np.asarray(s_flat)[np.asarray(flat.node_mask)]
        b = np.asarray(s_blk)[np.asarray(blk.node_mask)]
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-5)

    def loss_of(params, gb):
        s = model.apply({"params": params,
                         **{k: v[k] for k in v if k != "params"}},
                        gb, deterministic=True)
        return loss_fn(s, gb)

    g_flat = jax.grad(loss_of)(v["params"], flat)
    g_blk = jax.grad(loss_of)(v["params"], blk)
    for a, b in zip(jax.tree_util.tree_leaves(g_flat),
                    jax.tree_util.tree_leaves(g_blk)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_mxu_model_parity_complex(rng):
    _compare_paths(rng, dict(num_node_types=28), zinc_model)


def test_mxu_model_parity_complex_edge_feat(rng):
    _compare_paths(rng, dict(edge_feat=True, edge_dim=6), zinc_model,
                   edge_kind="int")


def test_mxu_model_parity_simple_minmax(rng):
    # min/max fall back to flat segment ops (unsorted dst under mxu)
    _compare_paths(rng, dict(type_net="simple",
                             aggregators="mean max min dir1-dx dir1-av",
                             scalers="identity"), zinc_model)


def test_mxu_model_parity_towers(rng):
    _compare_paths(rng, dict(type_net="towers", towers=3), zinc_model)


def test_mxu_model_parity_virtual_node(rng):
    _compare_paths(rng, dict(type_net="simple", virtual_node="mean",
                             node_encoder="embedding", num_node_types=20),
                   pcba_model, label_shape=(128,))


def test_mxu_model_parity_node_task(rng):
    _compare_paths(rng, dict(type_net="simple", readout="node", n_out=3,
                             num_node_types=20),
                   lambda cfg: sbm_model(cfg, n_classes=3), node_labels=True)


def test_mxu_large_graph_multiblock(rng):
    # a 200-node graph spans two node blocks -> per-(src_block,dst_block) chunks
    _compare_paths(rng, dict(num_node_types=28), zinc_model,
                   sizes=(200, 9, 13))


def test_mxu_bucket_sizes_fit(rng):
    graphs = _graphs(rng, list(rng.integers(5, 38, size=64)))
    n_pad, e_pad, g_pad = mxu_bucket_sizes(graphs, 16)
    for start in range(0, 64, 16):
        batch = graphs[start:start + 16]
        gb = pack_graphs(batch, n_pad=n_pad, e_pad=e_pad, g_pad=g_pad,
                         mxu_layout=True)
        assert gb.node_mask.shape[0] == n_pad
        assert gb.edge_mask.shape[0] == e_pad


# ----------------------------------------------------- pair-axis stability

def test_pair_pad_static_across_batches():
    """n_pairs is static pytree metadata: two different batches packed at one
    loader geometry (n_pad, e_pad, g_pad, n_pairs_pad) must produce
    structurally identical GraphBatches (one compiled program, stackable
    into super-batches), with pad pairs contributing zero adjacency."""
    from dgn_tpu.data import synthetic
    from dgn_tpu.graph import mxu_pair_pad

    a = synthetic.synthetic_zinc(12, seed=1)
    b = synthetic.synthetic_zinc(12, seed=2)
    n_pad, e_pad, g_pad = mxu_bucket_sizes(a + b, 12)
    pp = mxu_pair_pad(a + b, 12, n_pad, e_pad)

    def pack(gs):
        gs = sorted(gs, key=lambda g: -g.num_nodes)
        return pack_graphs(gs, n_pad=n_pad, e_pad=e_pad, g_pad=g_pad,
                           mxu_layout=True, n_pairs_pad=pp)

    ga, gb = pack(a), pack(b)
    assert ga.mxu.n_pairs == gb.mxu.n_pairs == pp
    assert jax.tree_util.tree_structure(ga) == jax.tree_util.tree_structure(gb)
    for x, y in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        assert x.shape == y.shape
    # pad pairs keep pair_dst non-decreasing (sorted segment reduction)
    pd = np.asarray(ga.mxu.pair_dst)
    assert np.all(np.diff(pd) >= 0)


def test_pair_overflow_raises():
    from dgn_tpu.data import synthetic

    gs = sorted(synthetic.synthetic_zinc(12, seed=3),
                key=lambda g: -g.num_nodes)
    n_pad, e_pad, g_pad = mxu_bucket_sizes(gs, 12)
    with pytest.raises(ValueError, match="pair overflow"):
        pack_graphs(gs, n_pad=n_pad, e_pad=e_pad, g_pad=g_pad,
                    mxu_layout=True, n_pairs_pad=1)
