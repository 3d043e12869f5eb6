"""Array-backed datasets.

TPU-native counterparts of reference ``ppsci/data/dataset/array_dataset.py``:
  * NamedArrayDataset            (:29) — finite, index-batched
  * IterableNamedArrayDataset    (:88) — yields the full arrays every step
  * ContinuousNamedArrayDataset  (:154) — host generator functions per step

Plus a TPU-native addition with no reference equivalent:
  * DeviceSampledDataset — a pure ``sample(key) -> (input, label, weight)``
    function executed *inside* the jitted train step (device-side collocation
    resampling; zero host↔device traffic per step).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np

__all__ = [
    "NamedArrayDataset",
    "IterableNamedArrayDataset",
    "ContinuousNamedArrayDataset",
    "DeviceSampledDataset",
]


class NamedArrayDataset:
    """Finite dataset over aligned {key: (N, ...)} arrays."""

    batch_mode = "indexed"

    def __init__(
        self,
        input: Dict[str, np.ndarray],
        label: Optional[Dict[str, np.ndarray]] = None,
        weight: Optional[Dict[str, np.ndarray]] = None,
        transforms=None,
    ):
        self.input = {k: np.asarray(v) for k, v in input.items()}
        self.label = {k: np.asarray(v) for k, v in (label or {}).items()}
        self.weight = {k: np.asarray(v) for k, v in (weight or {}).items()}
        self.transforms = transforms
        lens = {len(v) for v in self.input.values()}
        if len(lens) != 1:
            raise ValueError(f"input arrays must share leading dim, got {lens}")
        self._len = lens.pop()

    def __len__(self):
        return self._len

    def __getitem__(self, idx):
        inp = {k: v[idx] for k, v in self.input.items()}
        lab = {k: v[idx] for k, v in self.label.items()}
        wgt = {k: v[idx] for k, v in self.weight.items()}
        if self.transforms is not None:
            inp, lab, wgt = self.transforms(inp, lab, wgt)
        return inp, lab, wgt


class IterableNamedArrayDataset:
    """Yields the complete arrays every iteration (full-batch training)."""

    batch_mode = "full"

    def __init__(
        self,
        input: Dict[str, np.ndarray],
        label: Optional[Dict[str, np.ndarray]] = None,
        weight: Optional[Dict[str, np.ndarray]] = None,
        transforms=None,
    ):
        self.input = {k: np.asarray(v) for k, v in input.items()}
        self.label = {k: np.asarray(v) for k, v in (label or {}).items()}
        self.weight = {k: np.asarray(v) for k, v in (weight or {}).items()}
        self.transforms = transforms

    @property
    def num_samples(self):
        return len(next(iter(self.input.values())))

    def __iter__(self):
        while True:
            inp, lab, wgt = self.input, self.label, self.weight
            if self.transforms is not None:
                inp, lab, wgt = self.transforms(inp, lab, wgt)
            yield inp, lab, wgt


class ContinuousNamedArrayDataset:
    """Fresh batches from host generator functions every step
    (reference array_dataset.py:154)."""

    batch_mode = "generator"

    def __init__(
        self,
        input: Callable[[], Dict[str, np.ndarray]],
        label: Callable[[Dict[str, np.ndarray]], Dict[str, np.ndarray]],
        weight: Optional[Callable] = None,
        transforms=None,
    ):
        self.input_fn = input
        self.label_fn = label
        self.weight_fn = weight
        self.transforms = transforms

    def __iter__(self):
        while True:
            inp = self.input_fn()
            lab = self.label_fn(inp)
            wgt = self.weight_fn(inp) if self.weight_fn is not None else {}
            if self.transforms is not None:
                inp, lab, wgt = self.transforms(inp, lab, wgt)
            yield inp, lab, wgt


class DeviceSampledDataset:
    """TPU-native: collocation batches sampled on device inside the jitted
    step. ``sample_fn(key) -> (input_dict, label_dict, weight_dict)`` must be
    pure jnp with static shapes. The solver threads a fresh PRNG key per step;
    no host work, no transfer, no recompilation.
    """

    batch_mode = "device"

    def __init__(self, sample_fn: Callable, example: Optional[Tuple[Dict, Dict, Dict]] = None):
        self.sample_fn = sample_fn
        self._example = example

    def example(self, key):
        """Trace-time structural example (shapes/dtypes) for building the step."""
        if self._example is not None:
            return self._example
        return self.sample_fn(key)
