"""Full ZINC train step on real TPU: adjacency kernel vs XLA build."""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dgn_tpu.data import synthetic
from dgn_tpu.graph import mxu_bucket_sizes, pack_graphs
from dgn_tpu.models import DGNConfig, zinc_model
from dgn_tpu.ops import mxu
from dgn_tpu.ops.scalers import degree_stats
from dgn_tpu.train.trainer import TrainParams, Trainer

BATCH = 1024
graphs = synthetic.synthetic_zinc(BATCH, seed=41)
degs = np.concatenate([np.bincount(g.dst, minlength=g.num_nodes)
                       for g in graphs])
avg_d = degree_stats(degs)
real_edges = sum(g.num_edges for g in graphs)
n_pad, e_pad, g_pad = mxu_bucket_sizes(graphs, BATCH)
gb = pack_graphs(graphs, n_pad=n_pad, e_pad=e_pad, g_pad=g_pad,
                 mxu_layout=True)


def run_mode(use_kernel, compute_dtype=None):
    mxu.USE_ADJ_KERNEL = use_kernel
    cfg = DGNConfig(hidden_dim=45, out_dim=45, L=4, type_net="complex",
                    aggregators="mean dir1-dx dir1-av",
                    scalers="identity amplification attenuation",
                    avg_d=avg_d, compute_dtype=compute_dtype)
    model, loss_fn = zinc_model(cfg)
    params = TrainParams(seed=41, init_lr=1e-3, weight_decay=3e-6)
    trainer = Trainer(model, loss_fn, params, task="zinc", donate=False)
    state = trainer.init_state(gb)
    lr = jnp.asarray(1e-3, jnp.float32)

    def body(carry, _):
        st, rng = carry
        rng, sub = jax.random.split(rng)
        st, loss, _ = trainer._train_step_impl(st, gb, sub, lr)
        return (st, rng), loss

    @partial(jax.jit, static_argnums=(2,))
    def run(st, rng, n):
        (st, _), losses = jax.lax.scan(body, (st, rng), None, length=n)
        leaf = jax.tree_util.tree_leaves(st.params)[0]
        return losses, losses.sum() + 0.0 * leaf.reshape(-1)[0]

    rng = jax.random.PRNGKey(0)

    def total(n):
        _, probe = run(state, rng, n)
        assert np.isfinite(float(probe))
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            float(run(state, rng, n)[1])
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = total(16), total(144)
    step_ms = (t_hi - t_lo) / 128 * 1e3
    losses, _ = run(state, rng, 16)
    return step_ms, np.asarray(losses)


ms_xla, l_xla = run_mode(False)
ms_ker, l_ker = run_mode(True)
print(f"xla build   : {ms_xla:.3f} ms/step  {real_edges/ms_xla*1e3/1e6:.1f}M e/s")
print(f"pallas build: {ms_ker:.3f} ms/step  {real_edges/ms_ker*1e3/1e6:.1f}M e/s")
print("loss traj maxdiff:", np.abs(l_xla - l_ker).max(),
      "final:", l_xla[-1], l_ker[-1])
ms16, _ = run_mode(True, "bfloat16")
print(f"pallas+bf16 : {ms16:.3f} ms/step  {real_edges/ms16*1e3/1e6:.1f}M e/s")

# force bf16 adjacency storage on the otherwise-f32 path
_orig = mxu.build_pair_adjacency
def _bf16_build(w, layout, out_dtype=None):
    return _orig(w, layout, out_dtype=jnp.bfloat16)
mxu.build_pair_adjacency = _bf16_build
import dgn_tpu.ops.aggregators as agg
ms_b, l_b = run_mode(True)
print(f"pallas build, bf16 blocks, f32 rest: {ms_b:.3f} ms/step  "
      f"{real_edges/ms_b*1e3/1e6:.1f}M e/s")
print("loss traj maxdiff vs f32 blocks:", np.abs(l_ker - l_b).max(),
      "final:", l_b[-1])
