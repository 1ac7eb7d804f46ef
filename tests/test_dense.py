"""Dense backend parity vs an independent numpy transcription of the
reference math (/root/reference/models/pytorch/*, formulas documented in
SURVEY.md §2 #1-4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.linalg
import scipy.sparse as sp
import scipy.sparse.csgraph as csgraph

from dgn_tpu import dense
from dgn_tpu.dense import aggregators as dagg

from oracle import random_graph

EPS = 1e-5


def dense_adj(rng, n, p=0.35, seed_connect=True):
    """Random symmetric binary adjacency, guaranteed connected if asked."""
    A = (rng.random((n, n)) < p).astype(np.float64)
    A = np.triu(A, 1)
    if seed_connect:
        for v in range(1, n):
            A[rng.integers(0, v), v] = 1.0
    A = A + A.T
    return A


# ---------------------------------------------------------------- laplacian

def test_laplacian_matches_definition(rng):
    A = dense_adj(rng, 9)
    L = np.asarray(dense.laplacian(jnp.asarray(A)))
    want = np.diag(A.sum(1)) - A
    np.testing.assert_allclose(L, want, atol=1e-6)
    Ln = np.asarray(dense.laplacian(jnp.asarray(A), normalize_L=True))
    np.testing.assert_allclose(Ln, want / A.sum(1)[:, None], atol=1e-6)


# --------------------------------------------------------------- components

def test_component_labels_match_scipy(rng):
    for trial in range(4):
        blocks = [dense_adj(rng, k) for k in (5, 7, 4)]
        A = scipy.linalg.block_diag(*blocks)
        perm = rng.permutation(A.shape[0])
        A = A[np.ix_(perm, perm)]
        labels = np.asarray(dense.component_labels(jnp.asarray(A)))
        _, want = csgraph.connected_components(sp.csr_matrix(A))
        # same partition (label values differ: ours are min node indices)
        for c in np.unique(want):
            ours = labels[want == c]
            assert len(np.unique(ours)) == 1
        assert len(np.unique(labels)) == len(np.unique(want))


# ------------------------------------------------------------- k lowest eig

def _match_sign(got, want):
    """Align column signs (eigenvector sign ambiguity)."""
    s = np.sign(np.sum(got * want, axis=0))
    s = np.where(s == 0, 1.0, s)
    return got * s


def test_k_lowest_connected(rng):
    A = dense_adj(rng, 11)
    k = 4
    got = np.asarray(dense.k_lowest_eigvecs(jnp.asarray(A), k))
    L = np.diag(A.sum(1)) - A
    vals, vecs = scipy.linalg.eigh(L)
    want = vecs[:, np.argsort(np.abs(vals))][:, :k]
    np.testing.assert_allclose(_match_sign(got, want), want, atol=1e-4)


def test_k_lowest_batched_shape(rng):
    A = np.stack([dense_adj(rng, 8) for _ in range(3)])
    out = dense.k_lowest_eigvecs(jnp.asarray(A), 3)
    assert out.shape == (3, 8, 3)


def test_k_lowest_disconnected_semantics(rng):
    """Two components: col 0 zero, cols 1.. hold each component's own
    lowest non-null eigenvectors (reference eigen_agg.py:117-153).

    Components are regenerated until their spectra are disjoint — under
    cross-component eigenvalue degeneracy ANY eigensolver (the reference's
    torch.symeig included) returns a mixed basis and per-component
    assignment is ill-defined."""
    while True:
        A1, A2 = dense_adj(rng, 6), dense_adj(rng, 5)
        v1 = scipy.linalg.eigh(np.diag(A1.sum(1)) - A1, eigvals_only=True)
        v2 = scipy.linalg.eigh(np.diag(A2.sum(1)) - A2, eigvals_only=True)
        union = np.sort(np.concatenate([v1[1:], v2[1:]]))  # non-null spectrum
        if np.diff(union).min() > 1e-3 and union.min() > 1e-3:
            break
    A = scipy.linalg.block_diag(A1, A2)
    k = 3
    got = np.asarray(dense.k_lowest_eigvecs(jnp.asarray(A), k))
    np.testing.assert_allclose(got[:, 0], 0, atol=1e-6)
    # per-component expectation: lowest non-null eigvecs of the component
    for sl, Ai in ((slice(0, 6), A1), (slice(6, 11), A2)):
        Li = np.diag(Ai.sum(1)) - Ai
        vals, vecs = scipy.linalg.eigh(Li)
        order = np.argsort(np.abs(vals))
        nonnull = [j for j in order if abs(vals[j]) >= EPS][:k - 1]
        want = vecs[:, nonnull]
        sub = got[sl, 1:1 + len(nonnull)]
        np.testing.assert_allclose(_match_sign(sub, want), want, atol=1e-4)


# ------------------------------------------------------------ grad adjacency

def grad_adj_oracle(A, f, normalization, add_diag, absolute):
    n = len(f)
    g = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            g[i, j] = A[i, j] * (f[j] - f[i] + EPS)
    if normalization == "row-abs":
        for i in range(n):
            s = sum(abs(g[i, j]) for j in range(n) if abs(g[i, j]) > EPS)
            g[i] = g[i] / (s + EPS)
    elif normalization == "in-out-field":
        pos = g * (g > EPS)
        neg = g * (g < -EPS)
        denom = (np.sqrt((pos ** 2).sum(1)) + EPS
                 + np.sqrt((neg ** 2).sum(1)) + EPS)
        g = (pos + neg) / denom[:, None]
    if add_diag:
        g = g - np.eye(n) * g.sum(1)[:, None]
    if absolute:
        g = np.abs(g)
    return g


@pytest.mark.parametrize("norm", ["none", "row-abs", "in-out-field"])
@pytest.mark.parametrize("add_diag", [True, False])
def test_grad_adjacency(rng, norm, add_diag):
    A = dense_adj(rng, 10)
    f = rng.normal(size=10)
    for absolute in (False, True):
        got = np.asarray(dense.grad_adjacency(
            jnp.asarray(A), jnp.asarray(f), normalization=norm,
            add_diag=add_diag, absolute_adj=absolute))
        want = grad_adj_oracle(A, f, norm, add_diag, absolute)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_eig_adjacency_dir0_and_acos(rng):
    A = dense_adj(rng, 8)
    eigvec = rng.normal(size=(8, 3)) * 0.3
    out = dense.eig_adjacency(jnp.asarray(A), [0, 1], jnp.asarray(eigvec),
                              normalization="row-abs", eig_acos=True)
    want0 = A / (np.abs(A).sum(1, keepdims=True) + EPS)
    np.testing.assert_allclose(np.asarray(out[0]), want0, atol=1e-6)
    v = eigvec[:, 1]
    v_acos = np.arccos(v / np.abs(eigvec[:, 1:2]).max()
                       if False else v / np.abs(v).max())
    want1 = grad_adj_oracle(A, v_acos, "row-abs", True, False)
    np.testing.assert_allclose(np.asarray(out[1]), want1, atol=1e-5)


# -------------------------------------------------------------- aggregators

def agg_oracle(name, X, A, avg_d=None):
    """Loop transcription of the dense aggregator formulas."""
    n = A.shape[0]
    D = A.sum(1)
    F = X.shape[-1]
    out = np.zeros((n, F))
    for i in range(n):
        nb = [j for j in range(n) if A[i, j] > 0]
        w = np.array([A[i, j] for j in nb])
        M = X[i, nb]  # [deg, F]
        if name == "identity":
            out[i] = X[i, i]
        elif name == "sum":
            out[i] = (M * w[:, None]).sum(0)
        elif name == "mean":
            out[i] = (M * w[:, None]).sum(0) / D[i]
        elif name == "max":
            # the reference reduces max/min over the -3 (row i') axis, not j
            Mi = X[[a for a in range(n) if A[a, i] > 0], i]
            out[i] = Mi.max(0)
        elif name == "min":
            Mi = X[[a for a in range(n) if A[a, i] > 0], i]
            out[i] = Mi.min(0)
        elif name == "var":
            mu = (M * w[:, None]).sum(0) / D[i]
            mu2 = (M * M * w[:, None]).sum(0) / D[i]
            out[i] = np.maximum(mu2 - mu * mu, 0)
        elif name == "std":
            # reference quirk: aggregate_std passes its args positionally
            # into aggregate_var, so the variance is ALWAYS computed with a
            # self-loop added (verified in tests/test_reference_parity.py)
            wl = np.append(w, 1.0 + A[i, i])
            Ml = np.vstack([M, X[i, i][None]])
            Dl = D[i] + 1.0
            mu = (Ml * wl[:, None]).sum(0) / Dl
            mu2 = (Ml * Ml * wl[:, None]).sum(0) / Dl
            out[i] = np.sqrt(np.maximum(mu2 - mu * mu, 0) + EPS)
        elif name == "normalised_mean":
            out[i] = sum(A[i, j] * X[i, j] / np.sqrt(D[i] * D[j])
                         for j in nb)
        elif name == "softmax":
            ex = np.exp(M)
            out[i] = ((ex / ex.sum(0)) * M).sum(0)
        elif name == "softmin":
            ex = np.exp(-M)
            out[i] = ((ex / ex.sum(0)) * M).sum(0)
        elif name.startswith("moment"):
            p = int(name[-1])
            mu = (M * w[:, None]).sum(0) / D[i]
            mn = ((M - mu) ** p * w[:, None]).sum(0) / D[i]
            mn = np.where(np.abs(mn) < 1e-6, 0.0, mn)
            out[i] = np.sign(mn) * (np.abs(mn) + EPS) ** (1 / p)
        elif name in ("mean_amplified", "mean_attenuated"):
            # same positional-arg quirk: the inner mean ALWAYS self-loops;
            # the scaler's degree does NOT (it re-reads the raw adjacency)
            wl = np.append(w, 1.0 + A[i, i])
            Ml = np.vstack([M, X[i, i][None]])
            mu = (Ml * wl[:, None]).sum(0) / (D[i] + 1.0)
            scale = (np.log(D[i] + 1) / avg_d["log"]
                     if name == "mean_amplified"
                     else avg_d["log"] / np.log(D[i] + 1))
            out[i] = mu * scale
        else:
            raise KeyError(name)
    return out


STANDARD = ["mean", "sum", "max", "min", "identity", "std", "var",
            "normalised_mean", "softmax", "softmin", "moment3", "moment4",
            "moment5", "mean_amplified", "mean_attenuated"]


@pytest.mark.parametrize("name", STANDARD)
def test_standard_aggregators(rng, name):
    A = dense_adj(rng, 9)
    X = rng.normal(size=(9, 9, 5)).astype(np.float64)
    avg_d = {"log": 1.3, "lin": 2.0}
    got = np.asarray(dagg.AGGREGATORS[name](jnp.asarray(X), jnp.asarray(A),
                                            avg_d=avg_d))
    want = agg_oracle(name, X, A, avg_d)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_directional_aggregator_matches_explicit_pipeline(rng):
    """dir2-dx == derivative aggregation over eig_adjacency([1,2])."""
    A = dense_adj(rng, 10)
    X = rng.normal(size=(10, 10, 4))
    eigvec = rng.normal(size=(10, 4)) * 0.5
    got = np.asarray(dagg.AGGREGATORS["dir2-dx"](
        jnp.asarray(X), jnp.asarray(A), eigvec=jnp.asarray(eigvec)))
    assert got.shape == (10, 8)  # 2 eig channels x 4 features
    outs = []
    for k in (1, 2):
        v = eigvec[:, k]
        v = np.arccos(v / np.abs(v).max())
        g = grad_adj_oracle(A, v, "row-abs", True, False)
        outs.append(np.einsum("ij,ijd->id", g, X))
    want = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_dir_both_and_smooth_channels(rng):
    A = dense_adj(rng, 7)
    X = rng.normal(size=(7, 7, 3))
    eigvec = rng.normal(size=(7, 3)) * 0.5
    both = np.asarray(dagg.AGGREGATORS["dir1-both"](
        jnp.asarray(X), jnp.asarray(A), eigvec=jnp.asarray(eigvec)))
    smooth = np.asarray(dagg.AGGREGATORS["dir1-smooth"](
        jnp.asarray(X), jnp.asarray(A), eigvec=jnp.asarray(eigvec)))
    dx = np.asarray(dagg.AGGREGATORS["dir1-dx"](
        jnp.asarray(X), jnp.asarray(A), eigvec=jnp.asarray(eigvec)))
    assert both.shape == (7, 6)
    np.testing.assert_allclose(both[:, :3], dx, atol=1e-6)
    np.testing.assert_allclose(both[:, 3:], smooth, atol=1e-6)
    assert dagg.total_channels(["mean", "dir2-dx", "dir3-both"]) == 1 + 2 + 6


def test_aggregate_eigs_runtime_eig(rng):
    """eigvec=None computes the spectrum on device inside the aggregation
    (the eigen_agg research path, fixing its latent normalize_L bug)."""
    A = dense_adj(rng, 8)
    X = rng.normal(size=(8, 8, 2))
    out = dense.aggregate_eigs(jnp.asarray(X), jnp.asarray(A), [1],
                               normalization="row-abs", agg_type="both")
    assert out.shape == (8, 4)
    assert np.all(np.isfinite(np.asarray(out)))


# ------------------------------------------------------------------- scalers

def test_dense_scalers(rng):
    A = dense_adj(rng, 8)
    X = rng.normal(size=(8, 6))
    avg_d = {"log": 1.1, "lin": 2.3}
    D = A.sum(1)
    checks = {
        "identity": X,
        "amplification": X * (np.log(D + 1) / avg_d["log"])[:, None],
        "attenuation": X * (avg_d["log"] / np.log(D + 1))[:, None],
        "linear": X * (D / avg_d["lin"])[:, None],
        "inverse_linear": X * (avg_d["lin"] / D)[:, None],
    }
    for name, want in checks.items():
        got = np.asarray(dense.apply_scaler(name, jnp.asarray(X),
                                            jnp.asarray(A), avg_d))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# -------------------------------------------------------------------- layer

def test_dense_layer_shapes_and_towers(rng):
    B, N, F = 2, 10, 12
    A = np.stack([dense_adj(rng, N) for _ in range(B)])
    x = rng.normal(size=(B, N, F)).astype(np.float32)
    eig = rng.normal(size=(B, N, 3)).astype(np.float32) * 0.4
    layer = dense.DenseDGNLayer(
        out_features=12, aggregators=("mean", "dir1-dx", "max"),
        scalers=("identity", "amplification"),
        avg_d={"log": 1.0, "lin": 2.0}, towers=2)
    v = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(A),
                   jnp.asarray(eig))
    out = layer.apply(v, jnp.asarray(x), jnp.asarray(A), jnp.asarray(eig))
    assert out.shape == (B, N, 12)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dense_layer_jits(rng):
    N, F = 8, 6
    A = dense_adj(rng, N)[None]
    x = rng.normal(size=(1, N, F)).astype(np.float32)
    layer = dense.DenseDGNLayer(
        out_features=6, aggregators=("mean", "sum"), scalers=("identity",),
        avg_d={"log": 1.0, "lin": 2.0})
    v = layer.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(A))
    f = jax.jit(lambda x, a: layer.apply(v, x, a))
    out = f(jnp.asarray(x), jnp.asarray(A))
    assert out.shape == (1, N, 6)
