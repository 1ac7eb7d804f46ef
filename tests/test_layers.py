"""DGN layer parity: flax layers vs explicit numpy math with extracted weights."""
import numpy as np
import jax
import jax.numpy as jnp

from dgn_tpu.graph import GraphData, pack_graphs
from dgn_tpu.layers import (DGNLayerComplex, DGNLayerSimple, DGNLayerTower,
                            VirtualNode)

from oracle import random_graph, reduce_stage

AVG_D = {"log": 1.1, "lin": 2.5}
AGGS = ("mean", "dir1-dx", "dir1-av")
SCALS = ("identity", "amplification", "attenuation")


def make_batch(rng, f=6, with_edge_feat=False):
    graphs = []
    for n in (9, 13):
        src, dst = random_graph(rng, n)
        g = GraphData(
            num_nodes=n, src=src, dst=dst,
            node_feat=rng.normal(size=(n, f)).astype(np.float32),
            eig=rng.normal(size=(n, 3)).astype(np.float32),
            edge_feat=(rng.normal(size=(len(src), 4)).astype(np.float32)
                       if with_edge_feat else None),
            label=np.array([0.0], np.float32),
        )
        graphs.append(g)
    gb = pack_graphs(graphs, n_pad=32, e_pad=96, g_pad=3)
    return gb, graphs


def np_batchnorm_train(x, mask, gamma, beta, eps=1e-5):
    m = mask.astype(np.float64)[:, None]
    cnt = m.sum()
    mean = (x * m).sum(0) / cnt
    var = (((x - mean) ** 2) * m).sum(0) / cnt
    return (x - mean) / np.sqrt(var + eps) * gamma + beta


def np_forward_complex(gb, params, h, residual=True):
    """Explicit numpy replay of DGNLayerComplex.forward (train mode)."""
    src = np.asarray(gb.src)
    dst = np.asarray(gb.dst)
    emask = np.asarray(gb.edge_mask)
    nmask = np.asarray(gb.node_mask)
    eig = np.asarray(gb.eig)
    snorm = np.asarray(gb.snorm_n)

    wpre = np.asarray(params["pretrans"]["FCLayer_0"]["kernel"])
    bpre = np.asarray(params["pretrans"]["FCLayer_0"]["bias"])
    wpost = np.asarray(params["posttrans"]["FCLayer_0"]["kernel"])
    bpost = np.asarray(params["posttrans"]["FCLayer_0"]["bias"])
    gamma = np.asarray(params["batchnorm_h"]["scale"])
    beta = np.asarray(params["batchnorm_h"]["bias"])

    rs, rd, rm = src[emask], dst[emask], None
    z = np.concatenate([h[rs], h[rd]], axis=1)
    msg = z @ wpre + bpre
    n = h.shape[0]
    agg = reduce_stage(AGGS, SCALS, n, rs, rd, msg, eig, h, AVG_D)
    out = np.concatenate([h, agg], axis=1) @ wpost + bpost
    out = out * snorm
    out = np_batchnorm_train(out, nmask, gamma, beta)
    out = np.maximum(out, 0)
    if residual:
        out = h + out
    return out


def test_complex_layer_matches_numpy(rng):
    gb, _ = make_batch(rng)
    f = 6
    h = np.asarray(gb.node_feat)
    layer = DGNLayerComplex(out_dim=f, aggregators=AGGS, scalers=SCALS,
                            avg_d=AVG_D, dropout=0.0)
    v = layer.init(jax.random.PRNGKey(0), gb, jnp.asarray(h),
                   deterministic=False)
    got, _ = layer.apply(v, gb, jnp.asarray(h), deterministic=False,
                         mutable=["batch_stats"])
    want = np_forward_complex(gb, v["params"], h.astype(np.float64))
    nmask = np.asarray(gb.node_mask)
    np.testing.assert_allclose(np.asarray(got)[nmask], want[nmask],
                               rtol=2e-4, atol=2e-4)


def test_simple_layer_single_scaler_skips_scaling(rng):
    """With one scaler the reduce stage must NOT scale (reference quirk)."""
    gb, _ = make_batch(rng)
    f = 6
    h = jnp.asarray(np.asarray(gb.node_feat))
    l1 = DGNLayerSimple(out_dim=f, aggregators=("mean",),
                        scalers=("amplification",), avg_d=AVG_D)
    v = l1.init(jax.random.PRNGKey(0), gb, h, deterministic=False)
    out1, _ = l1.apply(v, gb, h, deterministic=False, mutable=["batch_stats"])
    l2 = DGNLayerSimple(out_dim=f, aggregators=("mean",),
                        scalers=("identity",), avg_d=AVG_D)
    out2, _ = l2.apply(v, gb, h, deterministic=False, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_tower_layer_shapes_and_mixing(rng):
    gb, _ = make_batch(rng, f=10)
    h = jnp.asarray(np.asarray(gb.node_feat))
    layer = DGNLayerTower(out_dim=10, aggregators=AGGS, scalers=SCALS,
                          avg_d=AVG_D, towers=5, divide_input=True,
                          residual=True)
    v = layer.init(jax.random.PRNGKey(0), gb, h, deterministic=False)
    out, _ = layer.apply(v, gb, h, deterministic=False,
                         mutable=["batch_stats"])
    assert out.shape == h.shape
    assert "mixing" in v["params"]
    assert len([k for k in v["params"] if k.startswith("tower_")]) == 5


def test_virtual_node_mean(rng):
    gb, graphs = make_batch(rng)
    f = 6
    h = np.asarray(gb.node_feat)
    vn = VirtualNode(dim=f, vn_type="mean", residual=True)
    vn_h0 = jnp.zeros((gb.num_graphs_padded, f))
    v = vn.init(jax.random.PRNGKey(0), gb, jnp.asarray(h), vn_h0)
    (vn_h, h_out) = vn.apply(v, gb, jnp.asarray(h), vn_h0)

    # numpy: pool means per graph, fc(relu) with extracted weights, residual 0+
    w = np.asarray(v["params"]["fc_layer"]["kernel"])
    b = np.asarray(v["params"]["fc_layer"]["bias"])
    node_graph = np.asarray(gb.node_graph)
    nmask = np.asarray(gb.node_mask)
    for gi, g in enumerate(graphs):
        sel = (node_graph == gi) & nmask
        pool = h[sel].mean(0)
        want_vn = np.maximum(pool @ w + b, 0)   # vn_h starts at 0, residual adds 0
        np.testing.assert_allclose(np.asarray(vn_h)[gi], want_vn, rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_out)[sel], h[sel] + want_vn,
                                   rtol=1e-4, atol=1e-5)


def test_residual_disabled_on_dim_change(rng):
    gb, _ = make_batch(rng)
    h = jnp.asarray(np.asarray(gb.node_feat))
    layer = DGNLayerSimple(out_dim=12, aggregators=("mean",),
                           scalers=("identity",), avg_d=AVG_D, residual=True)
    v = layer.init(jax.random.PRNGKey(0), gb, h, deterministic=False)
    out, _ = layer.apply(v, gb, h, deterministic=False,
                         mutable=["batch_stats"])
    assert out.shape == (h.shape[0], 12)
