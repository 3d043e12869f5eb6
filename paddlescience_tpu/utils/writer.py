"""Result writers: CSV / Tecplot (reference ``ppsci/utils/writer.py:34,110``)."""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

__all__ = ["save_csv_file", "save_tecplot_file"]


def save_csv_file(
    filename: str,
    data_dict: Dict[str, np.ndarray],
    keys: Sequence[str],
    alias_dict: Optional[Dict[str, str]] = None,
    use_header: bool = True,
    delimiter: str = ",",
    encoding: str = "utf-8",
) -> None:
    """Write named columns to CSV; alias_dict maps {column_header: data_key}."""
    if alias_dict is None:
        alias_dict = {}
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    cols, headers = [], []
    for key in keys:
        fetch = alias_dict.get(key, key)
        cols.append(np.asarray(data_dict[fetch]).reshape(-1))
        headers.append(key)
    arr = np.stack(cols, axis=1)
    np.savetxt(
        filename,
        arr,
        delimiter=delimiter,
        header=delimiter.join(headers) if use_header else "",
        comments="",
        encoding=encoding,
    )


def save_tecplot_file(
    filename: str,
    data_dict: Dict[str, np.ndarray],
    keys: Sequence[str],
    alias_dict: Optional[Dict[str, str]] = None,
    title: str = "data",
    num_x: Optional[int] = None,
    num_y: Optional[int] = None,
    num_timestamps: int = 1,
) -> None:
    """Write an ordered-zone Tecplot ASCII .dat file."""
    if alias_dict is None:
        alias_dict = {}
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    if not filename.endswith(".dat"):
        filename += ".dat"
    cols = {key: np.asarray(data_dict[alias_dict.get(key, key)]).reshape(-1) for key in keys}
    n_total = len(next(iter(cols.values())))
    n_per = n_total // num_timestamps
    for ts in range(num_timestamps):
        out = filename if num_timestamps == 1 else filename.replace(".dat", f"_t-{ts}.dat")
        with open(out, "w") as f:
            f.write(f'TITLE = "{title}"\n')
            f.write("VARIABLES = " + ", ".join(f'"{k}"' for k in keys) + "\n")
            zone = f"ZONE T='zone_{ts}'"
            if num_x and num_y:
                zone += f", I={num_x}, J={num_y}, F=POINT"
            else:
                zone += f", I={n_per}, F=POINT"
            f.write(zone + "\n")
            sl = slice(ts * n_per, (ts + 1) * n_per)
            block = np.stack([cols[k][sl] for k in keys], axis=1)
            np.savetxt(f, block, fmt="%.8e")
