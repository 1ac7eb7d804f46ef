"""Pallas kernel == XLA fallback (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from dgn_tpu.ops.pallas import segment_kernels as sk

from oracle import random_graph


def test_weighted_segment_sums_matches_xla(rng):
    n, f = 200, 13
    src, dst = random_graph(rng, n, avg_deg=4)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    e = len(src)
    e_pad = ((e + 127) // 128) * 128
    n_pad = 256
    dst_p = np.zeros(e_pad, np.int32); dst_p[:e] = dst
    mask = np.zeros(e_pad, bool); mask[:e] = True
    msg = rng.normal(size=(e_pad, f)).astype(np.float32)
    weights = rng.normal(size=(3, e_pad)).astype(np.float32)
    weights[:, ~mask] = 7.7   # pad garbage must be neutralized by the layout

    layout = sk.build_block_layout(dst_p, mask, n_pad)
    got_s, got_t = sk.weighted_segment_sums(
        jnp.asarray(msg), jnp.asarray(weights), layout, n_pad, interpret=True)
    want_s, want_t = sk.weighted_segment_sums_xla(
        jnp.asarray(msg), jnp.asarray(weights), jnp.asarray(dst_p),
        jnp.asarray(mask), n_pad)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=1e-5, atol=1e-5)


def test_layout_handles_empty_blocks(rng):
    # all edges into one node -> most blocks empty
    e = 64
    dst = np.zeros(128, np.int32)
    mask = np.zeros(128, bool); mask[:e] = True
    msg = rng.normal(size=(128, 4)).astype(np.float32)
    w = np.ones((1, 128), np.float32)
    layout = sk.build_block_layout(dst, mask, 512)
    s, t = sk.weighted_segment_sums(jnp.asarray(msg), jnp.asarray(w), layout,
                                    512, interpret=True)
    np.testing.assert_allclose(np.asarray(s)[0, 0], msg[:e].sum(0), rtol=1e-5)
    assert abs(float(t[0, 0]) - e) < 1e-4
    np.testing.assert_allclose(np.asarray(s)[0, 1:], 0, atol=1e-6)


def test_model_with_kernel_layout_matches_xla_path(rng):
    """Full DGN forward: fused-kernel path == XLA path (interpret on CPU)."""
    import jax
    from dgn_tpu.data import synthetic
    from dgn_tpu.graph import pack_graphs
    from dgn_tpu.models import DGNConfig, zinc_model

    graphs = synthetic.synthetic_zinc(8, seed=4)
    cfg = DGNConfig(hidden_dim=10, out_dim=10, L=2,
                    avg_d={"log": 1.0, "lin": 2.0},
                    aggregators="mean dir1-dx dir1-av std",
                    scalers="identity amplification attenuation")
    model, _ = zinc_model(cfg)
    gb_plain = pack_graphs(graphs, n_pad=384, e_pad=640)
    gb_kern = pack_graphs(graphs, n_pad=384, e_pad=640, kernel_layout=True)
    v = model.init(jax.random.PRNGKey(0), gb_plain, deterministic=True)
    a = model.apply(v, gb_plain, deterministic=True)
    b = model.apply(v, gb_kern, deterministic=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                               atol=2e-4)


def test_kernel_path_gradients_match(rng):
    import jax
    from dgn_tpu.data import synthetic
    from dgn_tpu.graph import pack_graphs
    from dgn_tpu.models import DGNConfig, zinc_model

    graphs = synthetic.synthetic_zinc(6, seed=9)
    cfg = DGNConfig(hidden_dim=8, out_dim=8, L=1,
                    avg_d={"log": 1.0, "lin": 2.0},
                    aggregators="mean dir1-dx dir1-av", scalers="identity")
    model, loss_fn = zinc_model(cfg)
    gb_plain = pack_graphs(graphs, n_pad=256, e_pad=512)
    gb_kern = pack_graphs(graphs, n_pad=256, e_pad=512, kernel_layout=True)
    v = model.init(jax.random.PRNGKey(0), gb_plain, deterministic=True)

    def loss(params, gb):
        s = model.apply({"params": params, **{k: v[k] for k in v if k != "params"}},
                        gb, deterministic=True)
        return loss_fn(s, gb)

    ga = jax.grad(loss)(v["params"], gb_plain)
    gk = jax.grad(loss)(v["params"], gb_kern)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-4)
