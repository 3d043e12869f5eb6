"""Data layer (reference ``ppsci/data``): datasets + host batch loader.

The reference builds paddle DataLoaders with worker processes and swaps in a
DistributedBatchSampler under DDP (``ppsci/data/__init__.py:59-209``). Here
loading is a plain host-side iterator (PINN data is small and generated, not
decoded); multi-host sharding is rank-strided indexing; and the TPU-native
fast path is ``DeviceSampledDataset`` where batches are drawn *inside* the
jitted step with a threaded PRNG key — no loader at all.
"""

from __future__ import annotations

import copy
from typing import Dict, Iterator, Optional, Tuple

import jax
import numpy as np

from paddlescience_tpu.data import dataset as dataset_mod  # noqa: F401
from paddlescience_tpu.data.dataset.array_dataset import (  # noqa: F401
    ContinuousNamedArrayDataset,
    DeviceSampledDataset,
    IterableNamedArrayDataset,
    NamedArrayDataset,
)
from paddlescience_tpu.data.dataset.file_dataset import (  # noqa: F401
    CSVDataset,
    IterableCSVDataset,
    IterableMatDataset,
    IterableNPZDataset,
    MatDataset,
    NPZDataset,
)
from paddlescience_tpu.data.dataset.science_dataset import (  # noqa: F401
    DarcyFlowDataset,
    ERA5Dataset,
    VtuDataset,
    generate_darcy_dataset,
)
from paddlescience_tpu.data.process.transform import Compose, build_transforms  # noqa: F401

__all__ = [
    "build_batch_transforms",
    "default_collate_fn",
    "BatchLoader",
    "build_dataset",
    "build_dataloader",
    "NamedArrayDataset",
    "IterableNamedArrayDataset",
    "ContinuousNamedArrayDataset",
    "DeviceSampledDataset",
    "MatDataset",
    "IterableMatDataset",
    "CSVDataset",
    "IterableCSVDataset",
    "NPZDataset",
    "IterableNPZDataset",
    "ERA5Dataset",
    "DarcyFlowDataset",
    "VtuDataset",
]

_DATASETS = {
    "NamedArrayDataset": NamedArrayDataset,
    "IterableNamedArrayDataset": IterableNamedArrayDataset,
    "ContinuousNamedArrayDataset": ContinuousNamedArrayDataset,
    "DeviceSampledDataset": DeviceSampledDataset,
    "MatDataset": MatDataset,
    "IterableMatDataset": IterableMatDataset,
    "CSVDataset": CSVDataset,
    "IterableCSVDataset": IterableCSVDataset,
    "NPZDataset": NPZDataset,
    "IterableNPZDataset": IterableNPZDataset,
    "ERA5Dataset": ERA5Dataset,
    "DarcyFlowDataset": DarcyFlowDataset,
    "VtuDataset": VtuDataset,
    "LorenzDataset": dataset.LorenzDataset,
    "RosslerDataset": dataset.RosslerDataset,
    "CylinderDataset": dataset.CylinderDataset,
    "ENSODataset": dataset.ENSODataset,
    "ExtMoEENSODataset": dataset.ExtMoEENSODataset,
    "DGMRDataset": dataset.DGMRDataset,
    "RadarDataset": dataset.RadarDataset,
    "MRMSDataset": dataset.MRMSDataset,
    "MRMSSampledDataset": dataset.MRMSSampledDataset,
    "SEVIRDataset": dataset.SEVIRDataset,
    "FWIDataset": dataset.FWIDataset,
    "PEMSDataset": dataset.PEMSDataset,
    "SphericalSWEDataset": dataset.SphericalSWEDataset,
    "ChipHeatDataset": dataset.ChipHeatDataset,
    "MeshAirfoilDataset": dataset.MeshAirfoilDataset,
    "MeshCylinderDataset": dataset.MeshCylinderDataset,
    "GridMeshAtmosphericDataset": dataset.GridMeshAtmosphericDataset,
    "CGCNNDataset": dataset.CGCNNDataset,
    "MOlFLOWDataset": dataset.MOlFLOWDataset,
    "ERA5SampledDataset": dataset.ERA5SampledDataset,
}


def register_dataset(name: str, cls) -> None:
    _DATASETS[name] = cls


def build_dataset(cfg):
    """Build a dataset from {"name": ..., **kwargs}; 'transforms' sub-config
    is compiled with build_transforms."""
    cfg = copy.deepcopy(dict(cfg))
    name = cfg.pop("name")
    if name not in _DATASETS:
        raise ValueError(f"unknown dataset '{name}', available: {sorted(_DATASETS)}")
    if "transforms" in cfg and cfg["transforms"] is not None and not callable(cfg["transforms"]):
        cfg["transforms"] = build_transforms(cfg["transforms"])
    return _DATASETS[name](**cfg)


class BatchLoader:
    """Infinite host-side batch iterator yielding (input, label, weight)
    numpy dict tuples with *static shapes* (jit-cache friendly).

    For indexed datasets: reshuffled epochs, rank-strided shard per process,
    drop_last semantics so every step sees exactly batch_size points.
    """

    def __init__(
        self,
        dataset,
        batch_size: Optional[int] = None,
        shuffle: bool = False,
        drop_last: bool = True,
        num_replicas: Optional[int] = None,
        rank: Optional[int] = None,
        seed: int = 42,
        batch_transforms=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.batch_transforms = batch_transforms
        self.num_replicas = num_replicas if num_replicas is not None else jax.process_count()
        self.rank = rank if rank is not None else jax.process_index()
        self.seed = seed
        mode = getattr(dataset, "batch_mode", "indexed")
        if mode == "indexed":
            n_local = len(dataset) // self.num_replicas
            if batch_size is None:
                self.batch_size = n_local
            self.num_batches = max(n_local // self.batch_size, 1) if drop_last else -(-n_local // self.batch_size)
        else:
            self.num_batches = 1

    def __len__(self):
        return self.num_batches

    def __iter__(self) -> Iterator[Tuple[Dict, Dict, Dict]]:
        mode = getattr(self.dataset, "batch_mode", "indexed")
        if mode in ("full", "generator"):
            yield from iter(self.dataset)
            return
        if mode == "device":
            raise TypeError("DeviceSampledDataset has no host loader; the solver samples it in-step")

        n = len(self.dataset)
        epoch = 0
        while True:
            # ALL ranks must draw the same permutation (seeded by seed+epoch,
            # not by rank) so the rank-strided shards below partition the
            # dataset; per-rank seeds would overlap and omit samples
            # (reference DistributedBatchSampler semantics; ADVICE r1).
            if self.shuffle:
                idx = np.random.default_rng(self.seed + epoch).permutation(n)
            else:
                idx = np.arange(n)
            epoch += 1
            idx = idx[self.rank :: self.num_replicas]  # per-process shard
            n_local = len(idx)
            nb = n_local // self.batch_size if self.drop_last else -(-n_local // self.batch_size)
            for b in range(max(nb, 1)):
                sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
                if len(sel) == 0:
                    sel = idx[: self.batch_size]
                batch = self.dataset[sel]
                if self.batch_transforms is not None:
                    batch = self.batch_transforms(*batch)
                yield batch


def default_collate_fn(samples):
    """Stack a list of (input, label, weight) sample dicts into one batch
    (reference process/batch_transform/__init__.py:43-106). Our fast path
    batch-indexes arrays directly, so this is only needed for per-sample
    pipelines and FunctionalBatchTransform composition."""
    def collate(values):
        v0 = values[0]
        if v0 is None:
            return None
        if isinstance(v0, dict):
            return {k: collate([v[k] for v in values]) for k in v0}
        if isinstance(v0, (list, tuple)):
            return type(v0)(collate(list(f)) for f in zip(*values))
        if isinstance(v0, (str, bytes)):
            return list(values)
        return np.stack([np.asarray(v) for v in values], axis=0)

    inp = collate([s[0] for s in samples])
    lab = collate([s[1] for s in samples])
    wgt = collate([s[2] for s in samples])
    return inp, lab, wgt


class FunctionalBatchTransform:
    """User function applied to the assembled (input, label, weight) batch
    (reference process/batch_transform FunctionalBatchTransform)."""

    def __init__(self, transform_func):
        self.transform_func = transform_func

    def __call__(self, inp, lab, wgt):
        return self.transform_func(inp, lab, wgt)


def build_batch_transforms(cfg):
    """[{name: {kwargs}}] -> composed callable over (input, label, weight)."""
    if not cfg:
        return None
    if callable(cfg):
        return cfg
    fns = []
    for item in cfg:
        name = next(iter(item.keys()))
        kwargs = item[name] or {}
        if name != "FunctionalBatchTransform":
            raise ValueError(f"unknown batch transform '{name}'")
        fns.append(FunctionalBatchTransform(**kwargs))

    def composed(inp, lab, wgt):
        for fn in fns:
            inp, lab, wgt = fn(inp, lab, wgt)
        return inp, lab, wgt

    return composed


def build_dataloader(dataset, cfg) -> BatchLoader:
    """cfg: {"batch_size": int, "sampler": {"name", "shuffle", "drop_last"},
    "batch_transforms": [...]} (reference data/__init__.py:59-209 contract)."""
    cfg = copy.deepcopy(dict(cfg or {}))
    sampler_cfg = dict(cfg.get("sampler", {}))
    return BatchLoader(
        dataset,
        batch_size=cfg.get("batch_size"),
        shuffle=sampler_cfg.get("shuffle", False),
        drop_last=sampler_cfg.get("drop_last", True),
        seed=cfg.get("seed", 42),
        batch_transforms=build_batch_transforms(cfg.get("batch_transforms")),
    )
