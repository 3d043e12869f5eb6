"""Scientific datasets: ERA5-style HDF5 windows, Darcy flow, VTU points.

TPU-native counterparts of reference ``ppsci/data/dataset/era5_dataset.py``,
``darcyflow_dataset.py``, ``vtu_dataset.py``. ERA5/SEVIR raw archives are
not downloadable in this environment; ERA5Dataset reads any HDF5 laid out
as (T, C, H, W) ("fields" key by default), and DarcyFlowDataset can
generate its own dataset with a finite-difference solver (scipy sparse) —
the same role as the reference's CUDA LBM data generators (SURVEY §2.4).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from paddlescience_tpu.data.dataset.array_dataset import NamedArrayDataset

__all__ = ["ERA5Dataset", "DarcyFlowDataset", "VtuDataset", "generate_darcy_dataset"]


class ERA5Dataset(NamedArrayDataset):
    """Autoregressive weather windows from an HDF5 file of shape
    (T, C, H, W): input t -> label t+stride (FourCastNet training contract).
    With ``num_label_timestamps=N > 1`` each of the N ``label_keys`` gets the
    frame at t+(i+1)*stride — the finetune rollout contract (reference
    ``era5_dataset.py`` num_label_timestamps / ``train_finetune.py:92``).
    """

    def __init__(
        self,
        file_path: str,
        input_keys: Tuple[str, ...],
        label_keys: Tuple[str, ...],
        size: Optional[int] = None,
        stride: int = 1,
        num_label_timestamps: int = 1,
        vars_channel: Optional[Tuple[int, ...]] = None,
        hdf_key: str = "fields",
        transforms=None,
        training: bool = True,
    ):
        import h5py

        with h5py.File(file_path, "r") as f:
            data = np.asarray(f[hdf_key])
        if vars_channel is not None:
            data = data[:, list(vars_channel)]
        if len(label_keys) != num_label_timestamps:
            raise ValueError(
                f"need {num_label_timestamps} label_keys, got {len(label_keys)}")
        T = data.shape[0] - stride * num_label_timestamps
        if size is not None:
            T = min(T, size)
        inputs = {input_keys[0]: data[:T].astype(np.float32)}
        labels = {
            key: data[stride * (i + 1) : T + stride * (i + 1)].astype(np.float32)
            for i, key in enumerate(label_keys[:num_label_timestamps])
        }
        super().__init__(inputs, labels, None, transforms)
        self.input_keys = tuple(input_keys)
        self.label_keys = tuple(label_keys)


def generate_darcy_dataset(
    n_samples: int = 64, resolution: int = 64, seed: int = 0, alpha: float = 2.0, tau: float = 3.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Generate (permeability a, solution u) pairs for 2-D Darcy flow
    -div(a grad u) = 1 on (0,1)^2, u|boundary = 0.

    a = exp of a Gaussian random field sampled spectrally (Matern-like
    covariance (tau^2 (-Δ + tau^2))^(-alpha)); u solved with a 5-point
    finite-difference scheme (scipy sparse LU). Returns
    a (N, 1, R, R) and u (N, 1, R, R).
    """
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    rng = np.random.default_rng(seed)
    R = resolution
    k = np.fft.fftfreq(R, d=1.0 / R)
    KX, KY = np.meshgrid(k, k, indexing="ij")
    spectrum = (4 * np.pi**2 * (KX**2 + KY**2) + tau**2) ** (-alpha / 2)
    spectrum[0, 0] = 0.0

    a_all, u_all = [], []
    h = 1.0 / (R + 1)
    for s in range(n_samples):
        noise = rng.normal(size=(R, R)) + 1j * rng.normal(size=(R, R))
        grf = np.real(np.fft.ifft2(noise * spectrum)) * R
        a = np.exp(grf / max(np.abs(grf).std(), 1e-9))

        # 5-point FD for -div(a grad u) = 1, Dirichlet 0
        N = R * R
        idx = np.arange(N).reshape(R, R)
        rows, cols, vals = [], [], []
        b = np.ones(N)

        def a_face(i1, j1, i2, j2):
            return 0.5 * (a[i1, j1] + a[i2, j2])

        for i in range(R):
            for j in range(R):
                c = idx[i, j]
                diag = 0.0
                for (di, dj) in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    ni, nj = i + di, j + dj
                    if 0 <= ni < R and 0 <= nj < R:
                        w = a_face(i, j, ni, nj) / h**2
                        rows.append(c)
                        cols.append(idx[ni, nj])
                        vals.append(-w)
                        diag += w
                    else:
                        diag += a[i, j] / h**2  # Dirichlet ghost
                rows.append(c)
                cols.append(c)
                vals.append(diag)
        A = sp.csr_matrix((vals, (rows, cols)), shape=(N, N))
        u = spla.spsolve(A, b).reshape(R, R)
        a_all.append(a)
        u_all.append(u)
    a_np = np.asarray(a_all, np.float32)[:, None]
    u_np = np.asarray(u_all, np.float32)[:, None]
    return a_np, u_np


class DarcyFlowDataset(NamedArrayDataset):
    """Darcy flow operator-learning dataset (reference darcyflow_dataset.py).
    Loads .npz with arrays named by keys, or generates via
    ``generate_darcy_dataset`` when file_path is None/missing."""

    def __init__(
        self,
        file_path: Optional[str],
        input_keys: Tuple[str, ...] = ("input",),
        label_keys: Tuple[str, ...] = ("output",),
        n_samples: int = 64,
        resolution: int = 32,
        transforms=None,
        **kwargs,
    ):
        if file_path and os.path.exists(file_path):
            d = np.load(file_path)
            a, u = d[input_keys[0]], d[label_keys[0]]
        else:
            a, u = generate_darcy_dataset(n_samples, resolution)
            if file_path:
                os.makedirs(os.path.dirname(os.path.abspath(file_path)), exist_ok=True)
                np.savez(file_path, **{input_keys[0]: a, label_keys[0]: u})
        super().__init__({input_keys[0]: a}, {label_keys[0]: u}, None, transforms)
        self.input_keys = tuple(input_keys)
        self.label_keys = tuple(label_keys)


class VtuDataset(NamedArrayDataset):
    """Point data from a .vtu written by psci.visualize (reference
    vtu_dataset.py reads via meshio; this parses our own XML)."""

    def __init__(
        self,
        file_path: str,
        input_keys: Tuple[str, ...] = ("x", "y", "z"),
        label_keys: Tuple[str, ...] = (),
        transforms=None,
    ):
        import xml.etree.ElementTree as ET

        root = ET.parse(file_path).getroot()
        piece = root.find(".//Piece")
        pts = np.fromstring(piece.find("Points/DataArray").text.strip(), sep=" ").reshape(-1, 3)
        inputs = {k: pts[:, i : i + 1].astype(np.float32) for i, k in enumerate(input_keys[:3])}
        labels = {}
        for arr in piece.findall("PointData/DataArray"):
            name = arr.get("Name")
            ncomp = int(arr.get("NumberOfComponents", 1))
            vals = np.fromstring(arr.text.strip(), sep=" ").reshape(-1, ncomp).astype(np.float32)
            if not label_keys or name in label_keys:
                labels[name] = vals
        super().__init__(inputs, labels, None, transforms)
