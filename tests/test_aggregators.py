"""Aggregator/scaler parity vs the dense numpy oracle, incl. padding safety."""
import numpy as np
import jax.numpy as jnp
import pytest

from dgn_tpu.ops import aggregators as agg_ops
from dgn_tpu.ops import scalers as scaler_ops

from oracle import mailbox_aggregate, random_graph, reduce_stage

ALL_AGGS = ["mean", "sum", "max", "min", "std", "var",
            "dir1-av", "dir2-av", "dir3-av",
            "dir1-dx", "dir2-dx", "dir3-dx",
            "dir1-dx-no-abs", "dir1-dx-balanced",
            "dir1-0.1", "dir1-neg-0.1"]


def build(rng, n=13, k=4, f=7, e_pad=None, n_pad=None):
    src, dst = random_graph(rng, n)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    e = len(src)
    n_pad = n_pad or n
    e_pad = e_pad or e
    eig = rng.normal(size=(n, k)).astype(np.float32)
    h_in = rng.normal(size=(n, f)).astype(np.float32)
    msg = rng.normal(size=(e, f)).astype(np.float32)

    src_p = np.zeros(e_pad, np.int32); src_p[:e] = src
    dst_p = np.zeros(e_pad, np.int32); dst_p[:e] = dst
    mask_p = np.zeros(e_pad, bool); mask_p[:e] = True
    eig_p = np.zeros((n_pad, k), np.float32); eig_p[:n] = eig
    h_p = np.zeros((n_pad, f), np.float32); h_p[:n] = h_in
    # poison the padding lanes: garbage must not leak into real outputs
    msg_p = np.full((e_pad, f), 1e9, np.float32); msg_p[:e] = msg
    deg = np.zeros(n_pad, np.int32)
    np.add.at(deg, dst, 1)
    ctx = agg_ops.build_edge_context(jnp.asarray(eig_p), jnp.asarray(src_p),
                                     jnp.asarray(dst_p), jnp.asarray(mask_p),
                                     jnp.asarray(deg))
    return dict(src=src, dst=dst, eig=eig, h_in=h_in, msg=msg, n=n,
                ctx=ctx, msg_p=jnp.asarray(msg_p), h_p=jnp.asarray(h_p),
                deg=deg)


@pytest.mark.parametrize("name", ALL_AGGS)
def test_aggregator_matches_oracle(rng, name):
    d = build(rng)
    got = np.asarray(agg_ops.aggregate([name], d["ctx"], d["msg_p"], d["h_p"]))
    want = mailbox_aggregate(name, d["n"], d["src"], d["dst"], d["msg"],
                             d["eig"], d["h_in"])
    np.testing.assert_allclose(got[:d["n"]], want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("name", ALL_AGGS)
def test_aggregator_padding_invariance(rng, name):
    """Same graph, two padding layouts -> identical real-node outputs."""
    d1 = build(rng)
    rng2 = np.random.default_rng(41)
    d2 = build(rng2, e_pad=d1["msg_p"].shape[0] + 37,
               n_pad=d1["h_p"].shape[0] + 11)
    a = np.asarray(agg_ops.aggregate([name], d1["ctx"], d1["msg_p"], d1["h_p"]))
    b = np.asarray(agg_ops.aggregate([name], d2["ctx"], d2["msg_p"], d2["h_p"]))
    np.testing.assert_allclose(a[:d1["n"]], b[:d1["n"]], rtol=1e-6, atol=1e-6)


def test_full_reduce_stage_with_scalers(rng):
    d = build(rng)
    aggs = ["mean", "dir1-dx", "dir1-av"]
    scals = ["identity", "amplification", "attenuation"]
    avg_d = {"log": 1.234, "lin": 3.3}
    h = agg_ops.aggregate(aggs, d["ctx"], d["msg_p"], d["h_p"])
    h = scaler_ops.apply_scalers(scals, h, jnp.asarray(d["deg"]), avg_d)
    want = reduce_stage(aggs, scals, d["n"], d["src"], d["dst"], d["msg"],
                        d["eig"], d["h_in"], avg_d)
    np.testing.assert_allclose(np.asarray(h)[:d["n"]], want, rtol=2e-4, atol=2e-4)


def test_single_scaler_gate():
    """len(scalers)==1 must skip scaling entirely (layer handles the gate)."""
    # Gate lives in layers; here just check apply_scalers with one name is identity-applied
    h = jnp.ones((4, 3))
    out = scaler_ops.apply_scalers(["amplification"], h, jnp.array([1, 2, 3, 4]),
                                   {"log": 0.5})
    assert out.shape == (4, 3)


def test_zero_degree_node_zero_fill(rng):
    """Nodes with no incoming edges aggregate to exactly 0 (DGL zero-fill)."""
    src = np.array([0, 1], np.int32)
    dst = np.array([1, 0], np.int32)   # node 2 isolated
    n, f, k = 3, 5, 2
    eig = rng.normal(size=(n, k)).astype(np.float32)
    h_in = rng.normal(size=(n, f)).astype(np.float32)
    msg = rng.normal(size=(2, f)).astype(np.float32)
    deg = np.array([1, 1, 0], np.int32)
    ctx = agg_ops.build_edge_context(jnp.asarray(eig), jnp.asarray(src),
                                     jnp.asarray(dst),
                                     jnp.ones(2, bool), jnp.asarray(deg))
    for name in ["mean", "max", "min", "std", "var", "dir1-dx", "dir1-av"]:
        out = np.asarray(agg_ops.aggregate([name], ctx, jnp.asarray(msg),
                                           jnp.asarray(h_in)))
        if name == "std":
            # std of zero messages is sqrt(EPS), but zero-degree -> mean=0 -> std=sqrt(0+EPS)
            assert np.all(np.abs(out[2]) < 1e-3), name
        else:
            np.testing.assert_allclose(out[2], 0.0, atol=1e-6, err_msg=name)
