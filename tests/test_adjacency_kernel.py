"""Pallas adjacency-block build == XLA lowering == exact oracle (interpret).

The kernel (ops/pallas/adjacency.py) is the shipped TPU lowering of
mxu.build_pair_adjacency; tests run it in interpret mode on CPU against
both the XLA lowering and an exact f64 numpy scatter oracle.
"""
import numpy as np
import jax.numpy as jnp

from dgn_tpu.graph import mxu_bucket_sizes, pack_graphs
from dgn_tpu.ops import mxu
from dgn_tpu.ops.pallas import adjacency


def _oracle(weights, layout):
    """Exact f64 scatter of [K, E] weights into [P, K, T, T] blocks."""
    k, e_pad = weights.shape
    ls = np.asarray(layout.local_src)
    ld = np.asarray(layout.local_dst)
    cp = np.asarray(layout.chunk_pair)
    out = np.zeros((layout.n_pairs, k, mxu.TILE, mxu.TILE))
    w64 = np.asarray(weights, np.float64)
    for e in range(e_pad):
        out[cp[e // mxu.TILE], :, ls[e], ld[e]] += w64[:, e]
    return out


def _packed(graphs_fn, n, seed):
    graphs = graphs_fn(n, seed=seed)
    n_pad, e_pad, g_pad = mxu_bucket_sizes(graphs, n)
    return pack_graphs(graphs, n_pad=n_pad, e_pad=e_pad, g_pad=g_pad,
                       mxu_layout=True)


def _check(gb, k, rng):
    e_pad = len(np.asarray(gb.src))
    w = rng.normal(size=(k, e_pad)).astype(np.float32)
    w *= np.asarray(gb.edge_mask, np.float32)   # pad edges carry weight 0
    w = jnp.asarray(w)
    want = _oracle(w, gb.mxu)
    got = adjacency.build_pair_adjacency(w, gb.mxu, interpret=True)
    # kernel is exact: f32 VMEM accumulation, HIGHEST-precision one-hot dots
    np.testing.assert_allclose(np.asarray(got, np.float64), want,
                               rtol=1e-6, atol=1e-6)
    # bf16 storage: same scatter, entries rounded once
    got16 = adjacency.build_pair_adjacency(w, gb.mxu, out_dtype=jnp.bfloat16,
                                           interpret=True)
    assert got16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got16, np.float64), want,
                               rtol=1e-2, atol=1e-2)


def test_kernel_exact_zinc(rng):
    from dgn_tpu.data import synthetic
    gb = _packed(synthetic.synthetic_zinc, 24, 7)   # many graphs per block
    _check(gb, 3, rng)


def test_kernel_exact_multiblock(rng):
    """Graphs wider than one 128-node block -> off-diagonal pairs.

    nodes=150 guarantees 135-170-node graphs, i.e. every graph spans two
    128-node blocks and REAL cross-block (src_block != dst_block) chunks
    exist — the accumulation path this test exists to pin.  (At the default
    nodes=80 every graph fits one block and only pad pairs would be
    off-diagonal.)"""
    from dgn_tpu.data import synthetic
    gb = _packed(lambda n, seed: synthetic.synthetic_sbm(n, seed=seed,
                                                         nodes=150), 4, 11)
    layout = gb.mxu
    covered = np.asarray(layout.pair_covered)
    off_diag = (np.asarray(layout.pair_src) != np.asarray(layout.pair_dst))
    assert np.any(off_diag & covered), "no real off-diagonal pairs packed"
    _check(gb, 2, rng)


def test_kernel_single_family(rng):
    from dgn_tpu.data import synthetic
    gb = _packed(synthetic.synthetic_zinc, 8, 5)
    _check(gb, 1, rng)


def test_dispatch_uses_xla_on_cpu():
    """On the CPU backend build_pair_adjacency must not route to Pallas."""
    from dgn_tpu.data import synthetic
    gb = _packed(synthetic.synthetic_zinc, 4, 3)
    w = jnp.ones((1, len(np.asarray(gb.src))), jnp.float32) \
        * jnp.asarray(gb.edge_mask, jnp.float32)
    out = mxu.build_pair_adjacency(w, gb.mxu)    # would crash if pallas-TPU
    assert out.shape == (gb.mxu.n_pairs, 1, mxu.TILE, mxu.TILE)
