"""Manifest parsing for the COVID and CheXpert dataset families.

Replicates the reference's path/label conventions:

- COVID manifests (``Dataset_covid`` — loader.py:92-116): space-separated
  lines; ``path = join(fields[1], folder, fields[2])`` where ``folder``
  selects the image flavor (``data`` = original CXR, ``Train_Mix`` =
  enhanced), ``label = fields[-2]``.
- CheXpert CSV (``Dataset`` — loader.py:39-63): header row, disease-column
  lookup, label remap ``{'1.0':'1', '':'0', '0.0':'0', '-1.0':'1'}``.
- Split-manifest naming of the 5-draws harness (finetune main :438,
  pretrain main :377-380): ``{ratio}_labeled_train_{draw}.txt`` /
  ``{ratio}_unlabeled_train_{draw}.txt`` under ``create_covid_dataset/``,
  plus fixed ``val_ds.txt`` / ``test_ds.txt``.
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Sequence

import numpy as np

CHEXPERT_LABEL_MAP = {"1.0": "1", "": "0", "0.0": "0", "-1.0": "1"}


@dataclasses.dataclass
class Manifest:
    """A resolved list of image paths + integer labels.

    For paired flavors, ``paths`` holds the primary (CXR) path and
    ``paths_alt`` the enhanced one; plain manifests leave ``paths_alt``
    empty.
    """

    paths: List[str]
    labels: np.ndarray  # (N,) int32
    paths_alt: List[str] = dataclasses.field(default_factory=list)

    def __len__(self) -> int:
        return len(self.paths)


def parse_covid(img_csv: str, folder: str) -> Manifest:
    """Space-separated COVID manifest, one flavor (loader.py:92-116)."""
    paths, labels = [], []
    with open(img_csv) as f:
        for line in f:
            fields = line.rstrip("\n").split(" ")
            if len(fields) < 3:
                continue
            paths.append(os.path.join(fields[1], folder, fields[2]))
            labels.append(int(float(fields[-2])))
    return Manifest(paths, np.asarray(labels, np.int32))


def parse_covid_paired(img_csv: str, folder_cxr: str = "data",
                       folder_enh: str = "Train_Mix") -> Manifest:
    """One manifest -> both flavors, jointly indexed.

    This is the correct-by-construction replacement for the reference
    fusion main's two independently shuffled loaders that only align by
    luck (fusion main :834-845; SURVEY §3.3 hard-parts note).
    """
    cxr = parse_covid(img_csv, folder_cxr)
    enh = parse_covid(img_csv, folder_enh)
    return Manifest(cxr.paths, cxr.labels, paths_alt=enh.paths)


def parse_chexpert(img_csv: str, folder: str, disease_name: str) -> Manifest:
    """CheXpert-style CSV manifest (loader.py:39-63)."""
    paths, labels = [], []
    with open(img_csv) as f:
        header = f.readline().rstrip("\r\n").split(",")
        idx = [i for i, h in enumerate(header) if h == disease_name]
        if not idx:
            raise ValueError(f"disease {disease_name!r} not in header {header}")
        col = idx[0]
        for line in f:
            # rstrip CRLF too (a CRLF-saved CSV would otherwise crash the
            # label map on a last-column disease); skip blank/short lines
            fields = line.rstrip("\r\n").split(",")
            if len(fields) <= max(col, 1):
                continue
            paths.append(os.path.join(folder, fields[1]))
            labels.append(int(CHEXPERT_LABEL_MAP[fields[col]]))
    return Manifest(paths, np.asarray(labels, np.int32))


# -------------------------------------------------- 5-draws split naming

def split_manifest_path(root: str, ratio: float, draw: int, *,
                        labeled: bool = True) -> str:
    """Path of a semi-supervised split manifest.

    ``ratio`` formats as the reference writes it into filenames (finetune
    main :438 uses the float verbatim, e.g. ``0.1_labeled_train_0.txt``;
    ratio 1 -> ``1``).
    """
    kind = "labeled" if labeled else "unlabeled"
    return os.path.join(root, f"{ratio_tag(ratio)}_{kind}_train_{draw}.txt")


def ratio_tag(ratio: float):
    """The reference's filename/folder formatting of a labeled fraction:
    integral ratios print as ints (``train_1_0``), fractional verbatim
    (``0.1_labeled_train_0.txt`` — finetune main :438)."""
    return int(ratio) if float(ratio) == int(ratio) else ratio


def eval_manifest_paths(root: str) -> tuple:
    return os.path.join(root, "val_ds.txt"), os.path.join(root, "test_ds.txt")


def write_covid_manifest(path: str, data_root: str, filenames: Sequence[str],
                         labels: Sequence[int]) -> None:
    """Write a manifest in the reference's space-separated format.

    Line layout matches what ``parse_covid`` / the reference loader read:
    ``<idx> <root> <filename> <label> <extra>`` so that fields[1]=root,
    fields[2]=filename, fields[-2]=label.
    """
    with open(path, "w") as f:
        for i, (fn, lb) in enumerate(zip(filenames, labels)):
            f.write(f"{i} {data_root} {fn} {lb} .\n")
