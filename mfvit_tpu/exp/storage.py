"""Experiment storage layout.

Replicates /root/reference/moco_pretraining/moco/aihc_utils/storage_util.py:
``{exp_name}_{exp_type}_{YYYYmmdd-HHMMSS}[_SLURM{jobid}]`` under a
configurable storage root (the reference hardcodes a username-switched
root, :9-13 — here it's an env var / argument), with per-(ratio, draw)
subfolders ``train_{ratio}_{iteration}`` and the best-accuracy twin
``train_{ratio}_{iteration}_acc`` (:36-56).
"""
from __future__ import annotations

import datetime
import os
from pathlib import Path

DEFAULT_ROOT = os.environ.get("MFVIT_STORAGE_ROOT", "self-learning/logdir")


def _broadcast_path(path_str: str) -> str:
    """Agree on ONE experiment folder across a multi-process run: the
    primary process's (timestamped) choice is broadcast to everyone —
    otherwise second-granularity timestamps would put each host in its
    own folder and the collective checkpoint saves would write to
    different paths (the reference sidesteps this because only rank 0
    checkpoints at all, pretrain main :469-471)."""
    import jax
    if jax.process_count() == 1:
        return path_str
    import numpy as np
    from jax.experimental import multihost_utils
    buf = np.zeros(1024, np.uint8)
    b = path_str.encode()
    # validate COLLECTIVELY: a primary-only raise before the broadcast
    # would leave every other process blocked inside the collective, so
    # the primary's overflow flag is broadcast first and all ranks fail
    # together
    overflow = np.asarray(multihost_utils.broadcast_one_to_all(
        np.asarray(len(b) > buf.size)))
    if overflow:
        raise ValueError(
            f"storage path too long to broadcast (> {buf.size} bytes); "
            f"primary's path: {path_str!r}")
    buf[: len(b)] = np.frombuffer(b, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return bytes(out).rstrip(b"\x00").decode()


def is_primary() -> bool:
    """True when this process should write shared experiment artifacts
    (TB events, pickles, args snapshots) — the rank-0 writer policy
    (pretrain main :220-223, :469-471). Checkpoints are NOT gated by
    this: orbax saves are collective."""
    try:
        import jax
        return jax.process_index() == 0
    except Exception:  # pragma: no cover - jax always importable here
        return True


def get_storage_folder(exp_name: str, exp_type: str,
                       root: str | None = None) -> Path:
    path = ""
    if is_primary():
        jobid = os.environ.get("SLURM_JOB_ID")
        datestr = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
        fname = f"{exp_name}_{exp_type}_{datestr}"
        if jobid is not None:
            fname += f"_SLURM{jobid}"
        base = Path(root or DEFAULT_ROOT) / fname
        path = base
        for k in range(1, 1000):
            try:
                os.makedirs(path)
                break
            except FileExistsError:
                # second-granularity timestamps collide when several runs
                # launch back-to-back outside SLURM — suffix instead of dying
                path = Path(f"{base}_{k}")
        print(f"Experiment storage is at {path}")
    path = Path(_broadcast_path(str(path)))
    os.makedirs(path, exist_ok=True)  # non-primary on a non-shared FS
    return path


def get_storage_sub_folder(fname: Path, ratio, iteration: int,
                           acc: bool = False) -> Path:
    suffix = "_acc" if acc else ""
    path = Path(fname) / f"train_{ratio}_{iteration}{suffix}"
    os.makedirs(path, exist_ok=True)
    return path
