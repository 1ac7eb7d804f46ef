"""Edge-partitioned (halo-exchange) execution == single-device execution.

Runs on the 8-virtual-CPU-device mesh (conftest).  The partitioned forward,
loss and GRADIENTS must match the unpartitioned ones — gradient equivalence
is the acid test that the all_gather/psum transposes do the cross-shard
bookkeeping correctly (SURVEY.md §4 distributed tests).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dgn_tpu.data import synthetic
from dgn_tpu.graph import pack_graphs
from dgn_tpu.models import DGNConfig, sbm_model, zinc_model
from dgn_tpu.parallel import make_mesh
from dgn_tpu.parallel.halo import (EdgeParallelTrainer, PartitionedLoader,
                                   partition_batch)
from dgn_tpu.train.trainer import TrainParams

N_DEV = 8


def _mesh():
    return make_mesh(N_DEV, ("ep",))


def _zinc_setup(virtual_node="none", L=3):
    graphs = synthetic.synthetic_zinc(10, seed=11)
    cfg = DGNConfig(hidden_dim=12, out_dim=12, L=L, type_net="complex",
                    aggregators="mean dir1-dx dir1-av max",
                    scalers="identity amplification attenuation",
                    avg_d={"log": 1.1, "lin": 2.2},
                    virtual_node=virtual_node, dropout=0.0)
    cfg_ep = dataclasses.replace(cfg, bn_axis="ep")
    return graphs, cfg, cfg_ep


def test_partition_batch_structure():
    graphs = synthetic.synthetic_zinc(6, seed=3)
    pb = partition_batch(graphs, 4, g_pad=8)
    assert pb.node_feat.shape[0] == 4          # leading shard axis
    assert pb.halo is not None
    # every real edge's dst is local (owner-compute)
    for p in range(4):
        d = np.asarray(pb.dst[p])[np.asarray(pb.edge_mask[p])]
        assert d.max(initial=0) < pb.halo.n_local
    # total real nodes/edges preserved
    assert int(np.asarray(pb.node_mask).sum()) == sum(g.num_nodes
                                                      for g in graphs)
    assert int(np.asarray(pb.edge_mask).sum()) == sum(g.num_edges
                                                      for g in graphs)


@pytest.mark.parametrize("layout", ["flat", "mxu"])
def test_partitioned_forward_matches_single(layout):
    graphs, cfg, cfg_ep = _zinc_setup()
    model, loss_fn = zinc_model(cfg)
    model_ep, _ = zinc_model(cfg_ep)
    gb = pack_graphs(graphs, g_pad=10)
    pb = partition_batch(graphs, N_DEV, g_pad=10, layout=layout)
    if layout == "mxu":
        assert pb.mxu is not None and pb.mxu.n_pairs_int is not None
    v = model.init(jax.random.PRNGKey(0), gb, deterministic=True)

    want = model.apply(v, gb, deterministic=True)

    trainer = EdgeParallelTrainer(model_ep, loss_fn, TrainParams(),
                                  _mesh(), task="zinc")
    got, _ = jax.jit(trainer._fwd_eval)(v["params"],
                                        v.get("batch_stats", {}), pb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("layout", ["flat", "mxu"])
def test_partitioned_gradients_match_single(layout):
    graphs, cfg, cfg_ep = _zinc_setup()
    model, loss_fn = zinc_model(cfg)
    model_ep, _ = zinc_model(cfg_ep)
    gb = pack_graphs(graphs, g_pad=10)
    pb = partition_batch(graphs, N_DEV, g_pad=10, layout=layout)
    v = model.init(jax.random.PRNGKey(1), gb, deterministic=True)
    bs = v.get("batch_stats", {})

    def loss_single(p):
        out, mut = model.apply({"params": p, "batch_stats": bs}, gb,
                               deterministic=False,
                               rngs={"dropout": jax.random.PRNGKey(2)},
                               mutable=["batch_stats"])
        return loss_fn(out, gb)

    trainer = EdgeParallelTrainer(model_ep, loss_fn, TrainParams(),
                                  _mesh(), task="zinc")

    def loss_part(p):
        out, _ = trainer._fwd_train(p, bs, pb, jax.random.PRNGKey(2))
        gb0 = jax.tree_util.tree_map(lambda x: x[0], pb)
        return loss_fn(out, gb0)

    l1, g1 = jax.value_and_grad(loss_single)(v["params"])
    l2, g2 = jax.jit(jax.value_and_grad(loss_part))(v["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
    assert len(flat1) == len(flat2)
    for path, a in flat1:
        b = flat2[path]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_partitioned_virtual_node_matches_single():
    graphs, cfg, cfg_ep = _zinc_setup(virtual_node="mean", L=2)
    model, loss_fn = zinc_model(cfg)
    model_ep, _ = zinc_model(cfg_ep)
    gb = pack_graphs(graphs, g_pad=10)
    pb = partition_batch(graphs, N_DEV, g_pad=10)
    v = model.init(jax.random.PRNGKey(3), gb, deterministic=True)
    want = model.apply(v, gb, deterministic=True)
    trainer = EdgeParallelTrainer(model_ep, loss_fn, TrainParams(),
                                  _mesh(), task="zinc")
    got, _ = jax.jit(trainer._fwd_eval)(v["params"],
                                        v.get("batch_stats", {}), pb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("layout", ["flat", "mxu"])
def test_partitioned_node_level_sbm(layout):
    graphs = synthetic.synthetic_sbm(4, seed=5, n_classes=2, nodes=40)
    cfg = DGNConfig(hidden_dim=10, out_dim=10, L=2, type_net="simple",
                    aggregators="mean dir1-dx", scalers="identity",
                    avg_d={"log": 1.0, "lin": 2.0}, readout="node")
    cfg_ep = dataclasses.replace(cfg, bn_axis="ep")
    model, loss_fn = sbm_model(cfg, 2)
    model_ep, _ = sbm_model(cfg_ep, 2)
    gb = pack_graphs(graphs, g_pad=4)
    pb = partition_batch(graphs, N_DEV, g_pad=4, layout=layout)
    v = model.init(jax.random.PRNGKey(4), gb, deterministic=True)

    want = model.apply(v, gb, deterministic=True)
    want_loss = loss_fn(want, gb)

    trainer = EdgeParallelTrainer(model_ep, loss_fn, TrainParams(),
                                  _mesh(), task="sbm", node_level=True)
    stacked, _ = jax.jit(trainer._fwd_eval)(v["params"],
                                            v.get("batch_stats", {}), pb)
    scores = np.asarray(stacked).reshape((-1,) + stacked.shape[2:])
    loss = loss_fn(jnp.asarray(scores), trainer._loss_gb(pb))
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-4)
    # per-node scores match after inverting the partition layout
    flat = np.asarray(scores)
    gb_flat = trainer._loss_gb(pb)
    nm = np.asarray(gb_flat.node_mask)
    nl = np.asarray(gb_flat.node_labels)[nm]
    want_nm = np.asarray(gb.node_mask)
    np.testing.assert_allclose(
        np.sort(flat[nm], axis=0), np.sort(np.asarray(want)[want_nm], axis=0),
        rtol=2e-4, atol=2e-4)
    assert nl.sum() == np.asarray(gb.node_labels)[want_nm].sum()


def test_ep_mxu_partition_structure():
    """Block invariants of the EP MXU packing: every real edge chunk's pairs
    split interior-first, dsts always own blocks, srcs own or halo."""
    graphs = synthetic.synthetic_zinc(12, seed=9)
    pb = partition_batch(graphs, 4, g_pad=12, layout="mxu")
    lay = pb.mxu
    assert lay is not None and lay.local_graph is None
    nbo = lay.n_own_blocks
    ni = lay.n_pairs_int
    for p in range(4):
        ps = np.asarray(lay.pair_src[p])
        pd = np.asarray(lay.pair_dst[p])
        cov = np.asarray(lay.pair_covered[p])
        # interior group: own src blocks; boundary group: halo src blocks
        assert np.all(ps[:ni][cov[:ni]] < nbo)
        assert np.all(ps[ni:][cov[ni:]] >= nbo)
        # both groups dst-major (their segment sums claim sortedness)
        assert np.all(np.diff(pd[:ni]) >= 0)
        assert np.all(np.diff(pd[ni:]) >= 0)
        # real edges: dst own, in range
        em = np.asarray(pb.edge_mask[p])
        assert np.asarray(pb.dst[p])[em].max(initial=0) < pb.halo.n_local
    # real node/edge totals preserved
    assert int(np.asarray(pb.node_mask).sum()) == sum(g.num_nodes
                                                      for g in graphs)
    assert int(np.asarray(pb.edge_mask).sum()) == sum(g.num_edges
                                                      for g in graphs)


def test_ep_mxu_interior_matmuls_independent_of_exchange():
    """The overlap property (SURVEY §5 'overlapped with local aggregation'):
    in the traced EP program, each layer's INTERIOR pair matmul must not be
    a (transitive) data dependent of the halo all_to_all — that independence
    is what lets XLA's scheduler run interior aggregation while the exchange
    is in flight.  Boundary pair matmuls must depend on it."""
    graphs, cfg, cfg_ep = _zinc_setup(L=2)
    cfg_ep = dataclasses.replace(cfg_ep, aggregators="mean dir1-dx dir1-av")
    model_ep, loss_fn = zinc_model(cfg_ep)
    pb = partition_batch(graphs, N_DEV, g_pad=10, layout="mxu")
    trainer = EdgeParallelTrainer(model_ep, loss_fn, TrainParams(),
                                  _mesh(), task="zinc")
    init_gb = jax.tree_util.tree_map(
        lambda x: x[0], dataclasses.replace(pb, halo=None))
    v = model_ep.init(jax.random.PRNGKey(0), init_gb, deterministic=True)
    jaxpr = jax.make_jaxpr(
        lambda p: trainer._fwd_eval(p, v.get("batch_stats", {}), pb))(
            v["params"])

    def find_inner(jx):
        for eqn in jx.eqns:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                inner = eqn.params.get(key) if eqn.params else None
                if inner is None:
                    continue
                cj = inner.jaxpr if hasattr(inner, "jaxpr") else inner
                if any(e.primitive.name == "all_to_all" for e in cj.eqns):
                    return cj
                r = find_inner(cj)
                if r is not None:
                    return r
        return None

    inner = find_inner(jaxpr.jaxpr)
    assert inner is not None, "no all_to_all in the traced EP program"
    a2a_ids = [i for i, e in enumerate(inner.eqns)
               if e.primitive.name == "all_to_all"]
    assert len(a2a_ids) == 2, a2a_ids          # one exchange per layer (L=2)

    def pair_dots_independent_of(a2a_idx):
        """Pair matmuls NOT in the forward dependency cone of that a2a."""
        tainted, free = set(), 0
        for i, eqn in enumerate(inner.eqns):
            deps = any(str(iv) in tainted for iv in eqn.invars
                       if hasattr(iv, "aval"))
            if i == a2a_idx or deps:
                tainted.update(str(ov) for ov in eqn.outvars)
            if eqn.primitive.name == "dot_general":
                shp = eqn.invars[0].aval.shape
                if len(shp) == 4 and shp[-2:] == (128, 128) and not deps:
                    free += 1
        return free

    # layer i's interior matmul must be independent of layer i's exchange:
    # for the i-th all_to_all (1-indexed), the dots of layers < i (2 each)
    # plus layer i's interior dot are outside its cone -> >= 2i-1
    for i, idx in enumerate(a2a_ids, start=1):
        free = pair_dots_independent_of(idx)
        assert free >= 2 * i - 1, (i, free)


def test_partitioned_train_step_runs_and_learns():
    graphs, cfg, cfg_ep = _zinc_setup(L=2)
    model_ep, loss_fn = zinc_model(cfg_ep)
    pb = partition_batch(graphs, N_DEV, g_pad=10, layout="mxu")
    trainer = EdgeParallelTrainer(model_ep, loss_fn,
                                  TrainParams(init_lr=1e-2), _mesh(),
                                  task="zinc")
    state = trainer.init_state(jax.tree_util.tree_map(lambda x: x[0], pb))
    lr = jnp.asarray(1e-2, jnp.float32)
    losses = []
    for i in range(8):
        state, loss, _ = trainer._train_step(state, pb,
                                             jax.random.PRNGKey(i), lr)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_partitioned_loader_epoch():
    graphs, cfg, cfg_ep = _zinc_setup(L=1)
    model_ep, loss_fn = zinc_model(cfg_ep)
    loader = PartitionedLoader(graphs, batch_size=5, n_shards=N_DEV)
    trainer = EdgeParallelTrainer(model_ep, loss_fn, TrainParams(),
                                  _mesh(), task="zinc")
    first = next(iter(loader))
    state = trainer.init_state(jax.tree_util.tree_map(lambda x: x[0], first))
    state, metrics = trainer.train_epoch(state, loader, epoch=0)
    assert np.isfinite(metrics["loss"])
    ev = trainer.evaluate(state, loader)
    assert np.isfinite(ev["mae"])


def test_boundary_exchange_matches_all_gather_and_shrinks_traffic():
    """The boundary-only all_to_all exchange moves exactly the same rows as
    the legacy full-region all_gather, with traffic proportional to the halo
    size instead of to n_local."""
    from jax.sharding import PartitionSpec as P

    from dgn_tpu.graph import HaloSpec, halo_refresh

    graphs = synthetic.synthetic_zinc(64, seed=7)
    pb = partition_batch(graphs, N_DEV)
    spec = pb.halo
    n_local = spec.n_local
    f_dim = 5
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(
        size=(N_DEV, pb.node_mask.shape[1], f_dim)).astype(np.float32))

    def core(h, hs, hl, si, rp):
        new = HaloSpec(hs[0], hl[0], si[0], rp[0], n_local=n_local, axis="ep")
        old = HaloSpec(hs[0], hl[0], None, None, n_local=n_local, axis="ep")
        a = halo_refresh(h[0], new)
        b = halo_refresh(h[0], old)
        return jnp.max(jnp.abs(a - b))[None]

    diff = jax.jit(jax.shard_map(
        core, mesh=_mesh(),
        in_specs=(P("ep"), P("ep"), P("ep"), P("ep"), P("ep")),
        out_specs=P("ep")))(h, spec.halo_shard, spec.halo_local,
                            spec.send_idx, spec.recv_perm)
    assert float(jnp.max(diff)) == 0.0

    # traffic: P x S rows vs P x n_local rows
    s_max = spec.send_idx.shape[-1]
    assert N_DEV * s_max < n_local, (s_max, n_local)


def test_ep_mxu_var_std_matches_single():
    """var/std under EP-MXU demote the interior/boundary split and take the
    non-split adjacency path, whose pair_dst segment sums must NOT claim
    sortedness (EP pair order is [interior | boundary] — each group sorted,
    the concatenation not).  Regression for the round-4 review finding."""
    graphs = synthetic.synthetic_zinc(10, seed=13)
    cfg = DGNConfig(hidden_dim=10, out_dim=10, L=2, type_net="complex",
                    aggregators="mean var std dir1-dx",
                    scalers="identity amplification attenuation",
                    avg_d={"log": 1.1, "lin": 2.2})
    cfg_ep = dataclasses.replace(cfg, bn_axis="ep")
    model, loss_fn = zinc_model(cfg)
    model_ep, _ = zinc_model(cfg_ep)
    gb = pack_graphs(graphs, g_pad=10)
    pb = partition_batch(graphs, N_DEV, g_pad=10, layout="mxu")
    v = model.init(jax.random.PRNGKey(5), gb, deterministic=True)
    want = model.apply(v, gb, deterministic=True)
    trainer = EdgeParallelTrainer(model_ep, loss_fn, TrainParams(),
                                  _mesh(), task="zinc")
    got, _ = jax.jit(trainer._fwd_eval)(v["params"],
                                        v.get("batch_stats", {}), pb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
