"""NN primitive parity vs torch (FCLayer order, BatchNorm semantics, readout)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from dgn_tpu import nn as dnn


def test_masked_batchnorm_matches_torch_train_and_eval(rng):
    n, f = 32, 9
    x = rng.normal(size=(n, f)).astype(np.float32) * 3 + 1
    tbn = torch.nn.BatchNorm1d(f)
    bn = dnn.MaskedBatchNorm(f)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))

    # 3 training steps: outputs and running stats must track torch
    state = variables["batch_stats"]
    params = variables["params"]
    for step in range(3):
        xs = rng.normal(size=(n, f)).astype(np.float32) * (step + 1)
        ty = tbn(torch.from_numpy(xs)).detach().numpy()
        jy, mut = bn.apply({"params": params, "batch_stats": state},
                           jnp.asarray(xs), use_running_average=False,
                           mutable=["batch_stats"])
        state = mut["batch_stats"]
        np.testing.assert_allclose(np.asarray(jy), ty, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state["var"]),
                               tbn.running_var.numpy(), rtol=1e-4, atol=1e-5)

    # eval mode
    tbn.eval()
    xe = rng.normal(size=(n, f)).astype(np.float32)
    te = tbn(torch.from_numpy(xe)).detach().numpy()
    je = bn.apply({"params": params, "batch_stats": state}, jnp.asarray(xe),
                  use_running_average=True)
    np.testing.assert_allclose(np.asarray(je), te, rtol=1e-4, atol=1e-5)


def test_masked_batchnorm_ignores_padding(rng):
    """Stats from masked rows must equal stats from the unpadded array."""
    n, f, pad = 20, 5, 13
    x = rng.normal(size=(n, f)).astype(np.float32)
    xp = np.concatenate([x, np.full((pad, f), 1e6, np.float32)])
    mask = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    bn = dnn.MaskedBatchNorm(f)
    v = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    a, _ = bn.apply(v, jnp.asarray(x), use_running_average=False,
                    mutable=["batch_stats"])
    b, _ = bn.apply(v, jnp.asarray(xp), mask=jnp.asarray(mask),
                    use_running_average=False, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b)[:n], rtol=1e-5,
                               atol=1e-5)


def test_fclayer_order_matches_torch(rng):
    """Linear -> ReLU -> BN (dropout off) with identical weights."""
    in_f, out_f, n = 7, 11, 64
    x = rng.normal(size=(n, in_f)).astype(np.float32)
    w = rng.normal(size=(in_f, out_f)).astype(np.float32) * 0.3

    lin = torch.nn.Linear(in_f, out_f)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w.T))
        lin.bias.zero_()
    tbn = torch.nn.BatchNorm1d(out_f)
    ty = tbn(torch.relu(lin(torch.from_numpy(x)))).detach().numpy()

    fc = dnn.FCLayer(out_f, activation="relu", b_norm=True)
    v = fc.init(jax.random.PRNGKey(0), jnp.asarray(x), deterministic=False)
    v = jax.tree_util.tree_map(lambda a: a, v)
    params = dict(v["params"])
    params["kernel"] = jnp.asarray(w)
    jy, _ = fc.apply({"params": params, "batch_stats": v["batch_stats"]},
                     jnp.asarray(x), deterministic=False,
                     mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(jy), ty, rtol=1e-4, atol=1e-5)


def test_mlp_readout_shapes(rng):
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    m = dnn.MLPReadout(output_dim=3, L=2, decreasing_dim=True)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (4, 3)
    # halving dims: 64 -> 32 -> 16 -> 3
    ks = jax.tree_util.tree_map(lambda a: a.shape, v["params"])
    assert ks["Linear_0"]["kernel"] == (64, 32)
    assert ks["Linear_1"]["kernel"] == (32, 16)
    assert ks["Linear_2"]["kernel"] == (16, 3)


def test_mlp_readout_constant_width(rng):
    x = jnp.asarray(rng.normal(size=(4, 70)).astype(np.float32))
    m = dnn.MLPReadout(output_dim=128, L=2, decreasing_dim=False)
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (4, 128)


@pytest.mark.parametrize("name", ["relu", "leakyrelu", "glu", "elu", "selu",
                                  "tanh", "sigmoid", "softplus"])
def test_activations_match_torch(rng, name):
    x = rng.normal(size=(16, 8)).astype(np.float32)
    fn = dnn.get_activation(name)
    got = np.asarray(fn(jnp.asarray(x)))
    tmap = {"relu": torch.nn.ReLU(), "leakyrelu": torch.nn.LeakyReLU(),
            "glu": torch.nn.GLU(), "elu": torch.nn.ELU(),
            "selu": torch.nn.SELU(), "tanh": torch.nn.Tanh(),
            "sigmoid": torch.nn.Sigmoid(), "softplus": torch.nn.Softplus()}
    want = tmap[name](torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fc_init_distribution():
    """FCLayer init: U(-a, a) with a = sqrt(6/(in+out))/in; bias zero."""
    fc = dnn.FCLayer(50, activation="none")
    v = fc.init(jax.random.PRNGKey(1), jnp.zeros((2, 100)))
    k = np.asarray(v["params"]["kernel"])
    a = np.sqrt(6.0 / 150.0) / 100.0
    assert np.abs(k).max() <= a + 1e-9
    assert np.abs(k).max() > 0.5 * a
    np.testing.assert_array_equal(np.asarray(v["params"]["bias"]), 0)
