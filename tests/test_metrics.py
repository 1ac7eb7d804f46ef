"""Metric parity vs sklearn (the reference's metric dependency)."""
import numpy as np
import pytest

from dgn_tpu.train import metrics

sklearn = pytest.importorskip("sklearn")
from sklearn import metrics as skm  # noqa: E402


def test_roc_auc_matches_sklearn(rng):
    y = rng.integers(0, 2, size=200)
    s = rng.normal(size=200)
    s[::7] = s[0]  # inject ties
    got = metrics.roc_auc(s, y)
    want = skm.roc_auc_score(y, s)
    assert abs(got - want) < 1e-10


def test_average_precision_matches_sklearn(rng):
    y = rng.integers(0, 2, size=300)
    s = rng.normal(size=300)
    got = metrics.average_precision(s, y)
    want = skm.average_precision_score(y, s)
    assert abs(got - want) < 1e-10


def test_multitask_ap_nan_masking(rng):
    g, t = 100, 5
    s = rng.normal(size=(g, t))
    y = rng.integers(0, 2, size=(g, t)).astype(float)
    y[rng.random(size=(g, t)) < 0.3] = np.nan
    y[:, 4] = np.nan  # fully unlabeled task must be skipped
    got = metrics.multitask_ap(s, y)
    aps = []
    for i in range(4):
        v = y[:, i] == y[:, i]
        if v.sum() and 0 < y[v, i].sum() < v.sum():
            aps.append(skm.average_precision_score(y[v, i], s[v, i]))
    assert abs(got - float(np.mean(aps))) < 1e-10


def test_accuracy_sbm_balanced():
    logits = np.array([[2, 0], [2, 0], [0, 2], [2, 0]], float)
    labels = np.array([0, 0, 1, 1])
    # class 0: 2/2, class 1: 1/2 -> 75%
    assert abs(metrics.accuracy_sbm(logits, labels) - 75.0) < 1e-9


def test_mae():
    s = np.array([1.0, 2.0, 3.0])
    t = np.array([2.0, 2.0, 1.0])
    assert abs(metrics.mae(s, t) - 1.0) < 1e-9


def test_hits_at_k():
    pos = np.array([5.0, 1.0, 3.0])
    neg = np.linspace(0, 4, 50)  # 50 negatives, top-10th is ~3.27
    h = metrics.hits_at_k(pos, neg, 10)
    kth = np.sort(neg)[-10]
    want = (pos > kth).mean()
    assert abs(h - want) < 1e-9
