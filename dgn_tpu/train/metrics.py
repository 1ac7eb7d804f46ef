"""Host-side task metrics (numpy), replacing reference train/metrics.py + the
OGB Evaluator scoring rules (ROC-AUC, multi-task AP, Hits@K).

All functions take numpy arrays of REAL (unpadded) elements; the trainer strips
padding before accumulating.
"""
from __future__ import annotations

import numpy as np


def mae(scores: np.ndarray, targets: np.ndarray) -> float:
    """reference train/metrics.py:14-16 (F.l1_loss)."""
    return float(np.mean(np.abs(scores.reshape(-1) - targets.reshape(-1))))


def accuracy(logits: np.ndarray, labels: np.ndarray) -> float:
    """Plain argmax accuracy ×100 over samples (superpixels/MNIST/CIFAR,
    reference metrics.py:19-28 returns a count; drivers divide by n)."""
    pred = logits.argmax(-1)
    return float((pred == labels).mean() * 100.0)


def accuracy_sbm(logits: np.ndarray, labels: np.ndarray) -> float:
    """Per-class balanced accuracy ×100 from the confusion matrix
    (reference metrics.py:37-54): mean over classes PRESENT in targets of
    recall_c."""
    pred = logits.argmax(-1)
    classes = np.unique(labels)
    accs = []
    for c in classes:
        sel = labels == c
        accs.append((pred[sel] == c).mean())
    return float(np.mean(accs) * 100.0)


def binary_f1(logits_or_scores: np.ndarray, labels: np.ndarray) -> float:
    pred = (logits_or_scores.reshape(-1) > 0).astype(int)
    y = labels.reshape(-1).astype(int)
    tp = int(((pred == 1) & (y == 1)).sum())
    fp = int(((pred == 1) & (y == 0)).sum())
    fn = int(((pred == 0) & (y == 1)).sum())
    denom = 2 * tp + fp + fn
    return float(2 * tp / denom) if denom else 0.0


def roc_auc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Rank-based ROC-AUC with tie handling (OGB Evaluator('ogbg-molhiv'))."""
    s = scores.reshape(-1).astype(np.float64)
    y = labels.reshape(-1).astype(np.int64)
    pos = int(y.sum())
    neg = len(y) - pos
    if pos == 0 or neg == 0:
        return float("nan")
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s), dtype=np.float64)
    sorted_s = s[order]
    i = 0
    r = 1.0
    while i < len(s):
        j = i
        while j + 1 < len(s) and sorted_s[j + 1] == sorted_s[i]:
            j += 1
        avg_rank = (r + r + (j - i)) / 2.0
        ranks[order[i:j + 1]] = avg_rank
        r += j - i + 1
        i = j + 1
    return float((ranks[y == 1].sum() - pos * (pos + 1) / 2.0) / (pos * neg))


def average_precision(scores: np.ndarray, labels: np.ndarray) -> float:
    """Binary AP (area under precision-recall via step interpolation,
    sklearn/OGB convention)."""
    s = scores.reshape(-1).astype(np.float64)
    y = labels.reshape(-1).astype(np.int64)
    npos = int(y.sum())
    if npos == 0:
        return float("nan")
    order = np.argsort(-s, kind="mergesort")
    y_sorted = y[order]
    tp = np.cumsum(y_sorted)
    precision = tp / np.arange(1, len(y) + 1)
    return float((precision * y_sorted).sum() / npos)


def multitask_ap(scores: np.ndarray, labels: np.ndarray) -> float:
    """OGB Evaluator('ogbg-molpcba'): mean AP over tasks that have at least
    one positive and one negative label; NaN labels ignored per task."""
    aps = []
    for t in range(labels.shape[1]):
        col = labels[:, t]
        valid = col == col
        yv = col[valid]
        if valid.sum() == 0 or yv.sum() == 0 or yv.sum() == valid.sum():
            continue
        aps.append(average_precision(scores[valid, t], yv))
    return float(np.mean(aps)) if aps else float("nan")


def accuracy_voc(logits: np.ndarray, labels: np.ndarray) -> float:
    """Mean per-class recall x100, classes absent from targets skipped
    (reference metrics.py:57-71 accuracy_VOC via nanmean of the confusion
    diagonal)."""
    return accuracy_sbm(logits, labels)


def accuracy_citation(logits: np.ndarray, labels: np.ndarray) -> float:
    """Plain accuracy fraction (reference metrics.py:30-34)."""
    return float((logits.argmax(-1) == labels).mean())


def hits_at_k(pos_scores: np.ndarray, neg_scores: np.ndarray, k: int) -> float:
    """OGB link-prediction Hits@K (reference
    train_COLLAB_edge_classification.py:115-145): fraction of positive edges
    ranked above the K-th best negative."""
    if len(neg_scores) < k:
        return 1.0
    kth = np.sort(neg_scores.reshape(-1))[-k]
    return float((pos_scores.reshape(-1) > kth).mean())
