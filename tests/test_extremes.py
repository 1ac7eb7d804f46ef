"""Scatter-free MXU extremes (ops/extremes.py) vs the flat scatter path.

Pins forward values AND gradients (incl. the equal-tie-split semantics that
torch scatter_reduce and XLA scatter-max share — CLAUDE.md: full-model parity
fails without it because ReLU makes exact-zero ties ubiquitous) against
segment.segment_extremes on the same packed batch.  Reference behavior:
nets/aggregators.py:12-17 (max/min aggregators).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgn_tpu.data import synthetic
from dgn_tpu.graph import GraphData, mxu_bucket_sizes, pack_graphs
from dgn_tpu.ops import segment
from dgn_tpu.ops.extremes import mxu_segment_extremes


def _pack(graphs):
    n_pad, e_pad, g_pad = mxu_bucket_sizes(graphs, len(graphs))
    return pack_graphs(graphs, n_pad=n_pad, e_pad=e_pad, g_pad=g_pad,
                       mxu_layout=True, ext_caps="batch")


def _flat(vals, gb):
    return segment.segment_extremes(vals, gb.dst, gb.num_nodes_padded,
                                    gb.edge_mask, indices_are_sorted=False)


def _vals(gb, f=7, seed=0, quantize=True):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(gb.num_edges_padded, f)).astype(np.float32)
    if quantize:                      # force exact ties (incl. across edges)
        v = np.round(v * 2.0) / 2.0
    return jnp.asarray(v)


CASES = [
    ("molecules", lambda: synthetic.synthetic_zinc(40, seed=3)),
    # >128-node graphs straddle node blocks -> off-diagonal (src,dst) block
    # pairs; one dst's edges then span chunks of DIFFERENT pairs
    ("large", lambda: synthetic.synthetic_superpixels(6, seed=4, nodes=150)),
]


@pytest.mark.parametrize("name,mk", CASES, ids=[c[0] for c in CASES])
def test_forward_matches_flat(name, mk):
    gb = _pack(mk())
    vals = _vals(gb)
    mx, mn = mxu_segment_extremes(vals, gb.mxu, gb.edge_mask,
                                  gb.num_nodes_padded)
    wmx, wmn = _flat(vals, gb)
    np.testing.assert_array_equal(np.asarray(mx), np.asarray(wmx))
    np.testing.assert_array_equal(np.asarray(mn), np.asarray(wmn))


@pytest.mark.parametrize("name,mk", CASES, ids=[c[0] for c in CASES])
def test_grad_matches_flat_with_ties(name, mk):
    gb = _pack(mk())
    vals = _vals(gb, seed=1)
    w1 = jnp.asarray(np.random.default_rng(2).normal(
        size=(gb.num_nodes_padded, vals.shape[1])).astype(np.float32))

    def loss_mxu(v):
        mx, mn = mxu_segment_extremes(v, gb.mxu, gb.edge_mask,
                                      gb.num_nodes_padded)
        return jnp.sum(w1 * mx) + jnp.sum(jnp.sin(w1) * mn)

    def loss_flat(v):
        mx, mn = _flat(v, gb)
        return jnp.sum(w1 * mx) + jnp.sum(jnp.sin(w1) * mn)

    g_mxu = jax.grad(loss_mxu)(vals)
    g_flat = jax.grad(loss_flat)(vals)
    # quantized values force multi-way ties; equal-split backward must agree
    np.testing.assert_allclose(np.asarray(g_mxu), np.asarray(g_flat),
                               rtol=1e-6, atol=1e-6)
    # pad edges carry zero gradient
    pad = ~np.asarray(gb.edge_mask)
    assert np.all(np.asarray(g_mxu)[pad] == 0)


def test_high_degree_star():
    """In-degree ~100 exercises the full 7-pass ladder value."""
    n = 120
    src = np.arange(1, n, dtype=np.int32)
    dst = np.zeros(n - 1, np.int32)
    # both directions so every node has an in-edge
    g = GraphData(num_nodes=n, src=np.concatenate([src, dst]),
                  dst=np.concatenate([dst, src]),
                  node_feat=np.zeros(n, np.int32),
                  eig=np.zeros((n, 3), np.float32),
                  label=np.array([0.0], np.float32))
    gb = _pack([g])
    assert gb.mxu.ext_passes == 7
    vals = _vals(gb, seed=5)
    mx, mn = mxu_segment_extremes(vals, gb.mxu, gb.edge_mask,
                                  gb.num_nodes_padded)
    wmx, wmn = _flat(vals, gb)
    np.testing.assert_array_equal(np.asarray(mx), np.asarray(wmx))
    np.testing.assert_array_equal(np.asarray(mn), np.asarray(wmn))


def test_ext_passes_ladder():
    gbs = _pack(synthetic.synthetic_zinc(20, seed=0))
    # molecule in-degree <= ~6 -> 2 or 3 passes, never the degree-oblivious 7
    assert 1 <= gbs.mxu.ext_passes <= 3


def test_isolated_nodes_zero():
    g = GraphData(num_nodes=5, src=np.array([0, 1], np.int32),
                  dst=np.array([1, 0], np.int32),
                  node_feat=np.zeros(5, np.int32),
                  eig=np.zeros((5, 3), np.float32),
                  label=np.array([0.0], np.float32))
    gb = _pack([g])
    vals = _vals(gb, seed=6, quantize=False) - 5.0   # all-negative values
    mx, mn = mxu_segment_extremes(vals, gb.mxu, gb.edge_mask,
                                  gb.num_nodes_padded)
    mx, mn = np.asarray(mx), np.asarray(mn)
    deg = np.asarray(gb.in_degree)
    assert np.all(mx[deg == 0] == 0) and np.all(mn[deg == 0] == 0)
    assert np.all(mx[deg > 0] < 0)   # negative maxima survive (no 0-clamp)


def test_aggregate_nondecomposed_wiring():
    """aggregate() (per-edge-message path) routes max/min through the block
    reduction when a layout is present — same values as the flat path."""
    from dgn_tpu.ops import aggregators as agg_ops

    gb = _pack(synthetic.synthetic_zinc(12, seed=17))
    ctx = agg_ops.build_edge_context(gb.eig, gb.src, gb.dst, gb.edge_mask,
                                     gb.in_degree,
                                     names=["mean", "max", "min"],
                                     mxu_layout=gb.mxu)
    msg = _vals(gb, f=5, seed=18)
    h = jnp.zeros((gb.num_nodes_padded, 5), jnp.float32)
    got = agg_ops.aggregate(("mean", "max", "min"), ctx, msg, h,
                            layout=gb.mxu)
    mx, mn = _flat(msg, gb)
    np.testing.assert_array_equal(np.asarray(got[:, 5:10]), np.asarray(mx))
    np.testing.assert_array_equal(np.asarray(got[:, 10:15]), np.asarray(mn))


def test_pad_chunk_slack_does_not_inflate_combine():
    """e_pad slack creates fully-padded tail chunks that all carry the last
    node block's id; they must not inflate ext_block_chunks (16x combine
    traffic under loader slack geometry) and must not corrupt results."""
    graphs = synthetic.synthetic_zinc(16, seed=2)
    n_pad, e_pad, g_pad = mxu_bucket_sizes(graphs, 16)
    gb = pack_graphs(graphs, n_pad=n_pad, e_pad=e_pad + 128 * 60,
                     g_pad=g_pad, mxu_layout=True, ext_caps="batch")
    assert gb.mxu.ext_block_chunks <= 8, gb.mxu.ext_block_chunks
    vals = _vals(gb, seed=9)
    mx, mn = mxu_segment_extremes(vals, gb.mxu, gb.edge_mask,
                                  gb.num_nodes_padded)
    wmx, wmn = _flat(vals, gb)
    np.testing.assert_array_equal(np.asarray(mx), np.asarray(wmx))
    np.testing.assert_array_equal(np.asarray(mn), np.asarray(wmn))
