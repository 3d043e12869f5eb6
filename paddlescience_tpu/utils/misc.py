"""Miscellaneous utilities.

TPU-native rebuild of the reference's ``ppsci/utils/misc.py`` (AverageMeter,
cartesian_product, set_random_seed, Timer, all_gather). JAX's explicit PRNG
keys make most global-seed plumbing unnecessary, but we keep a process-level
seed for numpy-side sampling (geometry, datasets).
"""

from __future__ import annotations

import collections
import functools
import random
import time
from typing import Callable, Dict, List, Mapping, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "AverageMeter",
    "PrettyOrderedDict",
    "Prettydefaultdict",
    "RankZeroOnly",
    "Timer",
    "all_gather",
    "cartesian_product",
    "concat_dict_list",
    "convert_to_array",
    "convert_to_dict",
    "flatten_dict_values",
    "run_at_rank0",
    "set_random_seed",
    "stack_dict_list",
    "typename",
    "combine_func",
]

_GLOBAL_SEED: int = 42


def set_random_seed(seed: int) -> None:
    """Seed numpy + python RNGs (host-side sampling). Device-side randomness
    uses explicit ``jax.random`` keys derived from this seed by the Solver."""
    global _GLOBAL_SEED
    _GLOBAL_SEED = int(seed)
    np.random.seed(seed)
    random.seed(seed)


def get_random_seed() -> int:
    return _GLOBAL_SEED


class AverageMeter:
    """Computes and stores the average and current value of a series.

    Mirrors reference ``ppsci/utils/misc.py:59`` semantics (avg/sum/count,
    ``history`` optional).
    """

    def __init__(self, name: str = "", fmt: str = "f", postfix: str = "", need_avg: bool = True):
        self.name = name
        self.fmt = fmt
        self.postfix = postfix
        self.need_avg = need_avg
        self.history: List[float] = []
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
        self.history.append(val)

    @property
    def total(self) -> str:
        return f"{self.name}_sum: {self.sum:.5f}{self.postfix}"

    @property
    def mean(self) -> str:
        return f"{self.name}_avg: {self.avg:.5f}{self.postfix}" if self.need_avg else ""

    def __str__(self):
        return f"{self.name}: {self.val:.5f}{self.postfix}"


class PrettyOrderedDict(collections.OrderedDict):
    def __str__(self):
        return "".join([str((k, v)) for k, v in self.items()])


class Prettydefaultdict(collections.defaultdict):
    def __str__(self):
        return "".join([str((k, v)) for k, v in self.items()])


class Timer:
    """Context-manager / decorator timer. ``block_until_ready`` is applied to
    jax values passed through so device time is measured, not dispatch."""

    def __init__(self, name: str = "Timer", auto_print: bool = True):
        self.name = name
        self.auto_print = auto_print
        self.interval = 0.0

    def __enter__(self):
        self.start_time = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.end_time = time.perf_counter()
        self.interval = self.end_time - self.start_time
        if self.auto_print:
            print(f"{self.name}.time_cost = {self.interval:.2f} s")

    def __call__(self, fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with self:
                result = fn(*args, **kwargs)
            return result

        return wrapper


def convert_to_dict(array: np.ndarray, keys: Sequence[str]) -> Dict[str, np.ndarray]:
    """Split a concatenated (N, len(keys)) array into {key: (N, 1)} columns."""
    if array.shape[-1] != len(keys):
        raise ValueError(f"dim of array({array.shape[-1]}) must equal to len(keys)({len(keys)})")
    split = np.split(array, len(keys), axis=-1)
    return {key: split[i] for i, key in enumerate(keys)}


def convert_to_array(dict_: Mapping[str, np.ndarray], keys: Sequence[str]) -> np.ndarray:
    """Concatenate {key: (N, 1)} columns into (N, len(keys))."""
    return np.concatenate([dict_[key] for key in keys], axis=-1)


def concat_dict_list(dict_list: Sequence[Mapping[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    ret = {}
    for key in dict_list[0]:
        ret[key] = np.concatenate([d[key] for d in dict_list], axis=0)
    return ret


def stack_dict_list(dict_list: Sequence[Mapping[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    ret = {}
    for key in dict_list[0]:
        ret[key] = np.stack([d[key] for d in dict_list], axis=0)
    return ret


def flatten_dict_values(dict_: Mapping) -> List:
    out = []
    for v in dict_.values():
        if isinstance(v, Mapping):
            out.extend(flatten_dict_values(v))
        else:
            out.append(v)
    return out


def typename(obj) -> str:
    return obj.__class__.__name__


def combine_func(funcs: Sequence[Callable]) -> Callable:
    def combined(*args, **kwargs):
        return [f(*args, **kwargs) for f in funcs]

    return combined


def cartesian_product(*arrays: np.ndarray) -> np.ndarray:
    """Cartesian product of 1-D arrays, row-major (first array varies slowest).

    Matches reference ``ppsci/utils/misc.py`` ``cartesian_product``:
    cartesian_product([1,2],[3,4]) -> [[1,3],[1,4],[2,3],[2,4]].
    """
    la = len(arrays)
    dtype = np.result_type(*arrays)
    arr = np.empty([len(a) for a in arrays] + [la], dtype=dtype)
    for i, a in enumerate(np.ix_(*arrays)):
        arr[..., i] = a
    return arr.reshape(-1, la)


def all_gather(tensor: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Gather a per-process array across hosts.

    Single-process (the common TPU-slice-per-process case with GSPMD) is the
    identity: jit+sharding already sees the global array. Multi-process uses
    ``jax.experimental.multihost_utils.process_allgather``.
    """
    if jax.process_count() == 1:
        return tensor
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(tensor)
    # (num_processes, ...) -> concat on requested axis
    return jnp.concatenate(list(gathered), axis=axis)


def run_at_rank0(fn: Callable) -> Callable:
    """Decorator: run only on process 0 (metric logging, checkpoint writes)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if jax.process_index() == 0:
            return fn(*args, **kwargs)
        return None

    return wrapper


class RankZeroOnly:
    """Context manager executing the body only at rank 0 (with barrier-free
    semantics: other ranks simply skip)."""

    def __enter__(self):
        return jax.process_index() == 0

    def __exit__(self, *exc):
        return False
