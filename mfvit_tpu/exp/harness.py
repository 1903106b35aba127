"""Semi-supervised 5-draws experiment harness.

Generalizes the nested ratio x draw loop every reference main duplicates
(pretrain :244-265, finetune :241-266, fusion :254-275): for each labeled
fraction in ``ratios`` run ``draws_for(ratio)`` independent draws, each
with its own split manifest, TensorBoard writer and checkpoint subfolder;
collect per-(ratio, draw) test AUC/ACC matrices and pickle them at the end
(finetune :641-644). The args snapshot (``commandline_args.txt`` JSON dump
— pretrain :214-215) is written once per experiment.
"""
from __future__ import annotations

import json
import os
import pickle
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence

from mfvit_tpu.exp import storage

# The reference's draw-count table (finetune :242-256): 5 draws per
# fractional ratio, a single draw at ratio 1.
DEFAULT_SEMI_ITERATIONS = {
    0.0005: 5, 0.00075: 5, 0.0009: 5, 0.001: 5, 0.0025: 5, 0.005: 5,
    0.01: 5, 0.1: 5, 0.2: 5, 0.3: 5, 0.5: 5, 0.7: 5, 0.9: 5, 1: 1,
}


def draws_for(ratio, table: Optional[Dict] = None) -> int:
    table = table or DEFAULT_SEMI_ITERATIONS
    return table.get(ratio, table.get(float(ratio), 5))


def snapshot_args(folder: Path, args: Any) -> None:
    """``commandline_args.txt`` JSON dump of the full config namespace.
    Multi-process runs write it once (primary process)."""
    if not storage.is_primary():
        return
    d = vars(args) if hasattr(args, "__dict__") else dict(args)
    with open(Path(folder) / "commandline_args.txt", "w") as f:
        json.dump({k: repr(v) if not isinstance(
            v, (int, float, str, bool, list, type(None))) else v
            for k, v in d.items()}, f, indent=2)


@dataclass
class DrawResult:
    ratio: Any
    draw: int
    test_auc: float = float("nan")
    test_acc: float = float("nan")
    extra: Dict[str, Any] = field(default_factory=dict)


def run_draws(exp_folder: Path, ratios: Sequence, train_one_draw: Callable,
              *, iterations: Optional[Dict] = None,
              tb_prefix: str = "tb_train_val_test") -> List[DrawResult]:
    """Run the ratio x draw grid.

    ``train_one_draw(ratio, draw, sub_folder, writer) -> DrawResult`` does
    the actual training/eval. Returns all results and pickles the AUC/ACC
    matrices next to the experiment folder (finetune :641-644 equivalent,
    JSON alongside for readability)."""
    try:
        from tensorboardX import SummaryWriter
    except ImportError:  # pragma: no cover
        SummaryWriter = None

    results: List[DrawResult] = []
    all_auc, all_acc = [], []
    primary = storage.is_primary()

    def dump():
        # written after EVERY draw (and in the crash path): a failure in
        # draw N must not discard days of completed-draw metrics.
        # Primary process only — every process computes identical values
        # on a multi-host run; concurrent writers would race the files.
        if not primary:
            return
        with open(Path(exp_folder) / "all_test_auc.pickle", "wb") as f:
            pickle.dump(all_auc, f)
        with open(Path(exp_folder) / "all_test_acc.pickle", "wb") as f:
            pickle.dump(all_acc, f)
        with open(Path(exp_folder) / "results.json", "w") as f:
            json.dump([{"ratio": r.ratio, "draw": r.draw,
                        "test_auc": r.test_auc, "test_acc": r.test_acc,
                        **r.extra} for r in results],
                      f, indent=2, default=float)

    try:
        for s in ratios:
            ratio_auc, ratio_acc = [], []
            all_auc.append(ratio_auc)
            all_acc.append(ratio_acc)
            for it in range(draws_for(s, iterations)):
                sub = storage.get_storage_sub_folder(exp_folder, s, it)
                writer = None
                if SummaryWriter is not None and primary:
                    writer = SummaryWriter(
                        os.path.join(exp_folder, f"{tb_prefix}_{s}_{it}"))
                try:
                    res = train_one_draw(s, it, sub, writer)
                finally:
                    if writer is not None:
                        writer.close()
                results.append(res)
                ratio_auc.append(res.test_auc)
                ratio_acc.append(res.test_acc)
                dump()
    finally:
        dump()
    return results


def verify_frozen(params, snapshot, label: str = "",
                  exempt_head: bool = True) -> None:
    """Assert every non-head leaf of ``params`` is bit-identical to
    ``snapshot`` — the reference's post-LP ``sanity_check`` (finetune
    :841-866, fusion :1013-1040), a regression test for optimizer leakage
    through a bad trainable mask. Raises ValueError (not ``assert``: must
    survive ``python -O``). Only the TOP-LEVEL ``head`` subtree (the
    classifier the LP protocol trains) is exempt — pass
    ``exempt_head=False`` where even the head is frozen (the fusion
    stage: branch heads never reach the reference optimizer, see
    cli/fuse.fusion_trainable_mask)."""
    import jax
    import numpy as np

    flat_now = {str(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(params)}
    for path, v in jax.tree_util.tree_leaves_with_path(snapshot):
        if (exempt_head and path
                and getattr(path[0], "key", None) == "head"):
            continue
        if str(path) not in flat_now:
            raise ValueError(
                f"sanity check failed: frozen weight {label}"
                f"{jax.tree_util.keystr(path)} is missing from the live "
                "params (structure changed during training)")
        if not np.array_equal(np.asarray(flat_now[str(path)]),
                              np.asarray(v)):
            raise ValueError(
                f"sanity check failed: frozen weight {label}"
                f"{jax.tree_util.keystr(path)} changed during training")
