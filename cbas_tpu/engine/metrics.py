"""Scientific metrics: classification reports and confusion matrices.

Thin wrappers over scikit-learn matching the reference's report shapes
(backend/cbas.py:1363-1382,1222-1251) so performance_report.yaml contents are
directly comparable.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
from sklearn.metrics import classification_report, confusion_matrix


class PerformanceReport:
    """Per-epoch train/val report pair (reference: backend/cbas.py:1267-1272)."""

    def __init__(
        self,
        train_report: dict,
        train_cm: np.ndarray,
        val_report: dict,
        val_cm: np.ndarray,
    ):
        self.train_report = train_report
        self.train_cm = train_cm
        self.val_report = val_report
        self.val_cm = val_cm


def report_and_cm(
    y_true: Sequence[int], y_pred: Sequence[int], behaviors: Sequence[str]
) -> tuple[dict, np.ndarray]:
    labels = list(range(len(behaviors)))
    rep = classification_report(
        y_true,
        y_pred,
        target_names=list(behaviors),
        output_dict=True,
        zero_division=0,
        labels=labels,
    )
    cm = confusion_matrix(y_true, y_pred, labels=labels)
    return rep, cm


def f1_of(report: dict, target: str) -> float:
    return float(report.get(target, {}).get("f1-score", -1.0))
