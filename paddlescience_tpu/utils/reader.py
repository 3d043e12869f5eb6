"""File readers: csv/mat/npz/dat (reference ``ppsci/utils/reader.py:39-266``)."""

from __future__ import annotations

import csv
from typing import Dict, Optional, Tuple

import numpy as np

__all__ = ["load_csv_file", "load_mat_file", "load_npz_file", "load_dat_file"]


def load_csv_file(
    file_path: str,
    keys: Tuple[str, ...],
    alias_dict: Optional[Dict[str, str]] = None,
    delimiter: str = ",",
    encoding: str = "utf-8",
) -> Dict[str, np.ndarray]:
    """Load named columns from a CSV with header; alias_dict maps
    {dst_key: src_column}."""
    if alias_dict is None:
        alias_dict = {}
    with open(file_path, "r", encoding=encoding) as f:
        reader = csv.DictReader(f, delimiter=delimiter)
        raw = {}
        for row in reader:
            for k, v in row.items():
                raw.setdefault(k, []).append(v)
    out = {}
    for key in keys:
        fetch = alias_dict.get(key, key)
        if fetch not in raw:
            raise KeyError(f"column '{fetch}' missing in {file_path}; have {list(raw)}")
        out[key] = np.asarray(raw[fetch], dtype=np.float32).reshape(-1, 1)
    return out


def load_mat_file(
    file_path: str, keys: Tuple[str, ...], alias_dict: Optional[Dict[str, str]] = None
) -> Dict[str, np.ndarray]:
    """Load variables from .mat (scipy for <=v7.2, h5py for v7.3)."""
    import scipy.io as sio

    if alias_dict is None:
        alias_dict = {}
    try:
        data = sio.loadmat(file_path)
    except NotImplementedError:  # MATLAB v7.3 (HDF5)
        import h5py

        with h5py.File(file_path, "r") as f:
            data = {k: np.array(f[k]).T for k in f.keys()}
    out = {}
    for key in keys:
        fetch = alias_dict.get(key, key)
        if fetch not in data:
            raise KeyError(f"variable '{fetch}' missing in {file_path}")
        arr = np.asarray(data[fetch], dtype=np.float32)
        if arr.ndim == 1:
            arr = arr.reshape(-1, 1)
        out[key] = arr
    return out


def load_npz_file(
    file_path: str, keys: Tuple[str, ...], alias_dict: Optional[Dict[str, str]] = None
) -> Dict[str, np.ndarray]:
    if alias_dict is None:
        alias_dict = {}
    data = np.load(file_path, allow_pickle=True)
    out = {}
    for key in keys:
        fetch = alias_dict.get(key, key)
        if fetch not in data:
            raise KeyError(f"array '{fetch}' missing in {file_path}")
        out[key] = np.asarray(data[fetch])
    return out


def load_dat_file(
    file_path: str,
    keys: Optional[Tuple[str, ...]] = None,
    alias_dict: Optional[Dict[str, str]] = None,
) -> Dict[str, np.ndarray]:
    """Load a pickled/npy dict .dat file (reference reader.py:dat)."""
    import pickle

    with open(file_path, "rb") as f:
        data = pickle.load(f)
    if alias_dict:
        data = {alias_dict.get(k, k): v for k, v in data.items()}
    if keys:
        data = {k: data[k] for k in keys}
    return {k: np.asarray(v) for k, v in data.items()}
