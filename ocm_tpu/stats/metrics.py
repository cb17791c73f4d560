"""Conformity and classification metrics as pure jittable functions.

Mirrors the metric definitions of the reference:
- one-class conformity metrics  (utils/SIMCA.py:238-266)
- binary precision/recall/F1 + per-class false-acceptance
  (utils/final_vaesimca.py:536-566)
- ROC-AUC of a score (optim_bce_nuts.py:241), rank-based (ties averaged),
  identical to sklearn.metrics.roc_auc_score.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ConformityMetrics(NamedTuple):
    sensitivity: jnp.ndarray
    specificity: jnp.ndarray
    accuracy: jnp.ndarray
    efficiency: jnp.ndarray
    tp: jnp.ndarray
    tn: jnp.ndarray
    fp: jnp.ndarray
    fn: jnp.ndarray


def conformity_metrics(y_true, y_pred, class_index) -> ConformityMetrics:
    """One-class conformity metrics, x100 (utils/SIMCA.py:238-266).

    ``y_pred`` is 1 = accepted as in-class, 0 = rejected;
    in-class truth is ``y_true == class_index``.
    """
    true_class = (y_true == class_index).astype(jnp.int32)
    pred = jnp.asarray(y_pred)
    tp = jnp.sum((pred == 1) & (true_class == 1))
    tn = jnp.sum((pred == 0) & (true_class == 0))
    fp = jnp.sum((pred == 1) & (true_class == 0))
    fn = jnp.sum((pred == 0) & (true_class == 1))
    sens = tp / (tp + fn) * 100.0
    spec = tn / (tn + fp) * 100.0
    acc = (tp + tn) / (tp + tn + fp + fn) * 100.0
    eff = jnp.sqrt(sens * spec)
    return ConformityMetrics(sens, spec, acc, eff, tp, tn, fp, fn)


class BinaryMetrics(NamedTuple):
    accuracy: jnp.ndarray
    precision: jnp.ndarray
    recall: jnp.ndarray
    f1: jnp.ndarray
    fa_rates: jnp.ndarray       # false-acceptance rate per anomaly class
    mean_false_acceptance: jnp.ndarray


def vae_binary_metrics(pred_labels, labels_true, n_true_classes: int) -> BinaryMetrics:
    """Binary conform/unconform metrics against multi-class truth.

    Reproduces ``utils/final_vaesimca.py:536-566``: a (2, n_true) confusion
    matrix with predicted rows [conform=0, unconform=1]; class 0 is the
    target; per-class false-acceptance is column-normalized over the anomaly
    columns.  The reference's 1e-12 denominators are kept.
    """
    pred = jnp.asarray(pred_labels)
    conf = jnp.zeros((2, n_true_classes), dtype=jnp.int32)
    for i, p in enumerate((0, 1)):
        for j in range(n_true_classes):
            conf = conf.at[i, j].set(
                jnp.sum((pred == p) & (labels_true == j),
                        dtype=jnp.int32))
    tp = conf[0, 0]
    fn = conf[1, 0]
    fp = jnp.sum(conf[0, 1:])
    tn = jnp.sum(conf[1, 1:])
    accuracy = (tp + tn) / (tp + tn + fp + fn + 1e-12)
    precision = tp / (tp + fp + 1e-12)
    recall = tp / (tp + fn + 1e-12)
    f1 = 2.0 * precision * recall / (precision + recall + 1e-12)
    fa_rates = conf[0, 1:] / (jnp.sum(conf[:, 1:], axis=0) + 1e-12)
    return BinaryMetrics(accuracy, precision, recall, f1, fa_rates,
                         jnp.mean(fa_rates))


def confusion_matrix_2xc(pred_labels, labels_true, n_true_classes: int,
                         pred_row_order=(0, 1)):
    """(2, C) confusion matrix with configurable predicted-row order.

    The reference uses row order [1, 0] in the SIMCA drivers
    (simca_new_cheese.py:56, simca_nuts.py:198) and [0, 1] in the VAE
    drivers (utils/final_vaesimca.py:540-542) — SURVEY.md quirk Q8.
    """
    pred = jnp.asarray(pred_labels)
    rows = []
    for p in pred_row_order:
        rows.append(jnp.stack([
            jnp.sum((pred == p) & (labels_true == c))
            for c in range(n_true_classes)
        ]))
    return jnp.stack(rows)


def roc_auc(y_true, score):
    """ROC-AUC via the rank statistic (Mann-Whitney U), ties averaged.

    Equals sklearn.metrics.roc_auc_score(y_true, score) for binary y_true.
    """
    y_true = jnp.asarray(y_true)
    score = jnp.asarray(score)
    order = jnp.argsort(score)
    s_sorted = score[order]
    n = score.shape[0]
    ranks_ord = jnp.arange(1, n + 1, dtype=score.dtype)
    # average ranks over ties: for each element, mean of min/max rank of its value
    first = jnp.searchsorted(s_sorted, s_sorted, side="left") + 1
    last = jnp.searchsorted(s_sorted, s_sorted, side="right")
    avg_rank_sorted = 0.5 * (first + last).astype(score.dtype)
    ranks = jnp.zeros(n, dtype=score.dtype).at[order].set(avg_rank_sorted)
    del ranks_ord
    n_pos = jnp.sum(y_true == 1)
    n_neg = n - n_pos
    rank_sum_pos = jnp.sum(jnp.where(y_true == 1, ranks, 0.0))
    u = rank_sum_pos - n_pos * (n_pos + 1) / 2.0
    return u / (n_pos * n_neg)
