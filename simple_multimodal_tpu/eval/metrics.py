"""Evaluation metrics (reference: /root/reference/evaluate_model.py:139-203).

Same metric dict keys and semantics as the reference so downstream tooling
(reports, dashboards) sees an identical schema: accuracy, f1 macro/weighted/
micro, precision/recall macro/weighted, OvR ROC-AUC, per-class arrays,
sklearn classification report, and confidence statistics (incl. correct vs
incorrect mean confidence).
"""
from typing import Dict, List

import numpy as np


def calculate_metrics(targets: np.ndarray, predictions: np.ndarray,
                      probabilities: np.ndarray,
                      emotion_labels: List[str]) -> Dict:
    from sklearn.metrics import (
        classification_report,
        f1_score,
        precision_score,
        recall_score,
        roc_auc_score,
    )

    targets = np.asarray(targets)
    predictions = np.asarray(predictions)
    probabilities = np.asarray(probabilities)
    labels = list(range(len(emotion_labels)))

    kw = dict(labels=labels, zero_division=0)
    accuracy = float((targets == predictions).mean()) if len(targets) else 0.0

    try:
        roc_auc = float(roc_auc_score(
            targets, probabilities, multi_class="ovr", average="macro",
            labels=labels,
        ))
        if not np.isfinite(roc_auc):
            roc_auc = None
    except Exception:
        roc_auc = None

    max_probs = probabilities.max(axis=1) if len(probabilities) else np.zeros(0)
    correct = predictions == targets
    confidence_stats = {
        "mean_confidence": float(max_probs.mean()) if len(max_probs) else 0.0,
        "mean_confidence_correct": (
            float(max_probs[correct].mean()) if correct.any() else 0.0
        ),
        "mean_confidence_incorrect": (
            float(max_probs[~correct].mean()) if (~correct).any() else 0
        ),
        "confidence_std": float(max_probs.std()) if len(max_probs) else 0.0,
    }

    return {
        "accuracy": accuracy,
        "f1_macro": float(f1_score(targets, predictions, average="macro", **kw)),
        "f1_weighted": float(f1_score(targets, predictions, average="weighted", **kw)),
        "f1_micro": float(f1_score(targets, predictions, average="micro", **kw)),
        "precision_macro": float(precision_score(targets, predictions,
                                                 average="macro", **kw)),
        "precision_weighted": float(precision_score(targets, predictions,
                                                    average="weighted", **kw)),
        "recall_macro": float(recall_score(targets, predictions,
                                           average="macro", **kw)),
        "recall_weighted": float(recall_score(targets, predictions,
                                              average="weighted", **kw)),
        "roc_auc": roc_auc,
        "per_class_f1": f1_score(targets, predictions, average=None, **kw).tolist(),
        "per_class_precision": precision_score(
            targets, predictions, average=None, **kw).tolist(),
        "per_class_recall": recall_score(
            targets, predictions, average=None, **kw).tolist(),
        "classification_report": classification_report(
            targets, predictions, labels=labels, target_names=emotion_labels,
            output_dict=True, zero_division=0,
        ),
        "confidence_stats": confidence_stats,
    }
