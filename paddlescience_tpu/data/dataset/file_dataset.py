"""File-backed datasets: Mat/CSV/NPZ, finite + iterable variants
(reference ``ppsci/data/dataset/mat_dataset.py``, ``csv_dataset.py``,
``npz_dataset.py``)."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from paddlescience_tpu.data.dataset.array_dataset import IterableNamedArrayDataset, NamedArrayDataset
from paddlescience_tpu.utils import reader

__all__ = [
    "MatDataset",
    "IterableMatDataset",
    "CSVDataset",
    "IterableCSVDataset",
    "NPZDataset",
    "IterableNPZDataset",
]


def _load(
    loader,
    file_path: str,
    input_keys: Tuple[str, ...],
    label_keys: Tuple[str, ...],
    alias_dict: Optional[Dict[str, str]] = None,
    weight_dict: Optional[Dict[str, float]] = None,
    timestamps=None,
):
    raw = loader(file_path, tuple(input_keys) + tuple(label_keys), alias_dict)
    input = {k: raw[k] for k in input_keys}
    label = {k: raw[k] for k in label_keys}
    weight = None
    if weight_dict:
        n = len(next(iter(input.values())))
        weight = {}
        for k, w in weight_dict.items():
            weight[k] = np.full((n, 1), w, dtype=np.float32) if np.isscalar(w) else np.asarray(w)
    return input, label, weight


def _make(finite: bool, loader):
    base = NamedArrayDataset if finite else IterableNamedArrayDataset

    class _DS(base):
        def __init__(
            self,
            file_path: str,
            input_keys: Tuple[str, ...],
            label_keys: Tuple[str, ...] = (),
            alias_dict: Optional[Dict[str, str]] = None,
            weight_dict: Optional[Dict[str, float]] = None,
            timestamps=None,
            transforms=None,
        ):
            input, label, weight = _load(
                loader, file_path, input_keys, label_keys, alias_dict, weight_dict, timestamps
            )
            super().__init__(input, label, weight, transforms)
            self.input_keys = tuple(input_keys)
            self.label_keys = tuple(label_keys)

    return _DS


MatDataset = _make(True, reader.load_mat_file)
MatDataset.__name__ = "MatDataset"
IterableMatDataset = _make(False, reader.load_mat_file)
IterableMatDataset.__name__ = "IterableMatDataset"
CSVDataset = _make(True, reader.load_csv_file)
CSVDataset.__name__ = "CSVDataset"
IterableCSVDataset = _make(False, reader.load_csv_file)
IterableCSVDataset.__name__ = "IterableCSVDataset"
NPZDataset = _make(True, reader.load_npz_file)
NPZDataset.__name__ = "NPZDataset"
IterableNPZDataset = _make(False, reader.load_npz_file)
IterableNPZDataset.__name__ = "IterableNPZDataset"
