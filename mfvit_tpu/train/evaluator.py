"""Metric-driven evaluation loop — the training_tools/evaluator.py +
combiner.py equivalents (reference :46-163; imported by the finetune/fusion
mains though its call sites are commented out — SURVEY §2.5).

``Evaluator`` walks a loader, runs a jitted forward, accumulates outputs
host-side (combiner.recursive_append/concat semantics) and computes a
metric dict. Used by the CLIs' eval phases and available standalone.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, List, Optional

import numpy as np

from mfvit_tpu.train import metrics as metrics_mod


def recursive_append(acc: Dict, item: Dict) -> None:
    """combiner.py:13-24: append leaf arrays into per-key lists."""
    for k, v in item.items():
        if isinstance(v, dict):
            acc.setdefault(k, {})
            recursive_append(acc[k], v)
        else:
            acc.setdefault(k, []).append(np.asarray(v))


def recursive_concat(acc: Dict) -> Dict:
    """combiner.py:26-33: concatenate accumulated lists."""
    out = {}
    for k, v in acc.items():
        out[k] = recursive_concat(v) if isinstance(v, dict) else \
            np.concatenate(v)
    return out


METRIC_FNS: Dict[str, Callable] = {
    "auc": lambda lg, lb: metrics_mod.macro_ovr_auc(lg, lb, lg.shape[-1]),
    "acc": metrics_mod.top1_acc,
    "top1": metrics_mod.top1_acc,
    "top5": lambda lg, lb: metrics_mod.topk_acc(lg, lb, k=5),
    "precision": lambda lg, lb: metrics_mod.precision_recall_f1(
        lg, lb, lg.shape[-1])["precision"],
    "recall": lambda lg, lb: metrics_mod.precision_recall_f1(
        lg, lb, lg.shape[-1])["recall"],
    "f1": lambda lg, lb: metrics_mod.precision_recall_f1(
        lg, lb, lg.shape[-1])["f1"],
}


class Evaluator:
    """evaluator.py:78-163 rebuilt: accumulate (logits, labels) over a
    loader and compute the requested metrics.

    ``forward(batch) -> (logits, labels)`` adapts arbitrary batch layouts;
    ``n_total`` trims padded final batches.
    """

    def __init__(self, forward: Callable, metric_names: Iterable[str] = ("auc", "acc")):
        self.forward = forward
        self.metric_names = list(metric_names)

    def evaluate(self, loader, n_total: Optional[int] = None) -> Dict[str, Any]:
        acc: Dict[str, List] = {}
        seen = 0
        for batch in loader:
            logits, labels = self.forward(batch)
            logits = np.asarray(logits)
            labels = np.asarray(labels)
            if n_total is not None:
                take = min(len(logits), n_total - seen)
                logits, labels = logits[:take], labels[:take]
                seen += take
            recursive_append(acc, {"logits": logits, "labels": labels})
        if not acc:
            raise ValueError(
                "Evaluator got an empty loader (0 batches) — check the "
                "val/test manifest paths")
        out = recursive_concat(acc)
        results = {name: METRIC_FNS[name](out["logits"], out["labels"])
                   for name in self.metric_names}
        results["n"] = len(out["labels"])
        results["logits"] = out["logits"]
        results["labels"] = out["labels"]
        return results
