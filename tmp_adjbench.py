"""Micro-bench: build_pair_adjacency lowering variants on the real TPU."""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dgn_tpu.data import synthetic
from dgn_tpu.graph import mxu_bucket_sizes, pack_graphs
from dgn_tpu.ops import mxu

TILE = mxu.TILE
BATCH = 1024

graphs = synthetic.synthetic_zinc(BATCH, seed=41)
n_pad, e_pad, g_pad = mxu_bucket_sizes(graphs, BATCH)
gb = pack_graphs(graphs, n_pad=n_pad, e_pad=e_pad, g_pad=g_pad, mxu_layout=True)
layout = gb.mxu
K = 3
rng = np.random.default_rng(0)
W = jnp.asarray(rng.standard_normal((K, e_pad)).astype(np.float32))
c = e_pad // TILE
print("chunks", c, "pairs", layout.n_pairs, "n_blocks", layout.n_node_blocks)


def v_current(weights):
    return mxu.build_pair_adjacency(weights, layout)


def v_perk(weights):
    """Per-family 3-operand einsum; no [C,e,K*T] materialization."""
    oh_s = mxu._onehot(layout.local_src.reshape(c, TILE), weights.dtype)
    oh_d = mxu._onehot(layout.local_dst.reshape(c, TILE), weights.dtype)
    ws = weights.reshape(K, c, TILE)
    parts = [jnp.einsum("cei,ce,cej->cij", oh_s, ws[k], oh_d,
                        preferred_element_type=weights.dtype)
             for k in range(K)]
    part = jnp.stack(parts, axis=1)                       # [C,K,128,128]
    wp = jax.ops.segment_sum(part, layout.chunk_pair, layout.n_pairs)
    return wp


def v_single(weights):
    """One einsum with K folded into the dst operand via weight scaling,
    contracting oh_s against (oh_d * w) without the explicit wide reshape."""
    oh_s = mxu._onehot(layout.local_src.reshape(c, TILE), weights.dtype)
    oh_d = mxu._onehot(layout.local_dst.reshape(c, TILE), weights.dtype)
    ws = weights.reshape(K, c, TILE)
    part = jnp.einsum("cei,kce,cej->ckij", oh_s, ws, oh_d,
                      preferred_element_type=weights.dtype)
    return jax.ops.segment_sum(part, layout.chunk_pair, layout.n_pairs)


def timeit(name, fn):
    def body(carry, _):
        out = fn(W + carry)
        return carry + out.reshape(-1)[0] * 1e-20, out.sum()

    f = jax.jit(lambda w, n: jax.lax.scan(body, w[0, 0], None,
                                          length=n)[1].sum(),
                static_argnums=1)
    for n in (8, 40):
        float(f(W, n))
    ts = {}
    for n in (8, 40):
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(W, n))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    slope = (ts[40] - ts[8]) / 32
    print(f"{name}: {slope*1e3:.3f} ms/build")
    return slope


from dgn_tpu.ops.pallas import adjacency


mxu.USE_ADJ_KERNEL = False
a = timeit("current", v_current)
timeit("kernel-f32 ", partial(adjacency.build_pair_adjacency, layout=layout))
timeit("kernel-bf16",
       partial(adjacency.build_pair_adjacency, layout=layout,
               out_dtype=jnp.bfloat16))
ref = v_current(W)
got = adjacency.build_pair_adjacency(W, layout)
print("kernel maxdiff", float(jnp.max(jnp.abs(ref - got))))
