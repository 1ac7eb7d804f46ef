"""Native C++ packer == numpy packer, bit for bit."""
import numpy as np
import pytest

from dgn_tpu import runtime
from dgn_tpu.data import synthetic
from dgn_tpu.graph import pack_graphs

pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native packer not built")


def _compare(a, b):
    import jax
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("gen,kw", [
    ("synthetic_zinc", {}),
    ("synthetic_sbm", {}),
    ("synthetic_superpixels", {}),
    ("synthetic_ogb_mol", dict(n_tasks=128, nan_frac=0.2)),
])
def test_native_matches_python(gen, kw):
    graphs = getattr(synthetic, gen)(10, seed=3, **kw)
    a = pack_graphs(graphs, n_pad=2048, e_pad=16384, g_pad=16, native=False)
    b = pack_graphs(graphs, n_pad=2048, e_pad=16384, g_pad=16, native=True)
    _compare(a, b)


def test_native_overflow_raises():
    graphs = synthetic.synthetic_zinc(4, seed=1)
    with pytest.raises(ValueError):
        pack_graphs(graphs, n_pad=8, e_pad=8, native=True)


def test_native_empty_edge_batch():
    from dgn_tpu.graph import GraphData
    g = GraphData(num_nodes=3, src=np.zeros(0, np.int32),
                  dst=np.zeros(0, np.int32),
                  node_feat=np.zeros(3, np.int32),
                  eig=np.zeros((3, 2), np.float32),
                  label=np.array([0.0], np.float32))
    a = pack_graphs([g], n_pad=8, e_pad=4, native=False)
    b = pack_graphs([g], n_pad=8, e_pad=4, native=True)
    _compare(a, b)


def test_native_speedup_large_batch():
    """Native pipeline should not be slower than numpy on a big batch (it is
    typically several x faster; assert a generous bound to avoid flakes)."""
    import time
    graphs = synthetic.synthetic_zinc(512, seed=7)
    for native in (True, False):   # warm both paths
        pack_graphs(graphs, n_pad=16384, e_pad=32768, g_pad=512,
                    native=native)
    t = {}
    for native in (True, False):
        t0 = time.perf_counter()
        for _ in range(3):
            pack_graphs(graphs, n_pad=16384, e_pad=32768, g_pad=512,
                        native=native)
        t[native] = time.perf_counter() - t0
    assert t[True] < t[False] * 1.5, t
