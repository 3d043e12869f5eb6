"""Checkpoint save/load (reference ``ppsci/utils/save_load.py:84-290``).

The reference writes model/optimizer/scaler/metric/equation/EMA/aggregator as
separate ``.pd*`` files; here the whole TrainState is one pytree saved with
orbax (single atomic directory per tag: latest / best_model / epoch_K), plus
a small metric JSON sidecar.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from paddlescience_tpu.utils import logger

__all__ = ["save_checkpoint", "load_checkpoint", "load_pretrain"]


def _ckpt_dir(output_dir: str, prefix: str) -> str:
    return os.path.abspath(os.path.join(output_dir, "checkpoints", prefix))


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    state: Dict[str, Any],
    output_dir: Optional[str],
    prefix: str = "latest",
    metric: Optional[Dict[str, float]] = None,
    print_log: bool = True,
) -> None:
    """Save a TrainState pytree + metric dict under output_dir/checkpoints/prefix."""
    if output_dir is None:
        logger.warning("output_dir is None, skip save_checkpoint")
        return
    if jax.process_count() > 1:
        # fetch collectively BEFORE the rank gate: leaves sharded across
        # processes are not addressable from rank 0 alone, and a rank-gated
        # device_get would deadlock in the cross-host gather
        def fetch(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                import numpy as _np

                if not x.sharding.is_fully_replicated:
                    # reshard to replicated through a jitted identity — the
                    # all-gather compiles to the same XLA collectives the
                    # train step uses, keeping rank collective order aligned
                    from jax.sharding import NamedSharding, PartitionSpec

                    x = jax.jit(
                        lambda a: a,
                        out_shardings=NamedSharding(x.sharding.mesh, PartitionSpec()),
                    )(x)
                # the local shard of a replicated array holds the full value
                return _np.asarray(x.addressable_shards[0].data)
            return x

        state = jax.tree.map(fetch, state)
    import orbax.checkpoint as ocp

    path = _ckpt_dir(output_dir, prefix)
    # every process calls save(): orbax is multihost-aware (internal barriers
    # + primary-host writes); a rank-gated call would desync its collectives
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, _to_numpy_tree(state), force=True)
    if jax.process_index() != 0:
        return
    if metric:
        with open(os.path.join(path, "metric.json"), "w") as f:
            json.dump({k: float(v) for k, v in metric.items()}, f)
    if print_log:
        logger.info(f"Finish saving checkpoint to: {path}")


def load_checkpoint(path: str, state_like: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Restore a TrainState pytree; `state_like` restores exact array types."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not os.path.exists(path):
        raise FileNotFoundError(f"checkpoint not found: {path}")
    ckptr = ocp.PyTreeCheckpointer()
    if state_like is not None:
        restored = ckptr.restore(path, item=_to_numpy_tree(state_like))
    else:
        restored = ckptr.restore(path)
    logger.info(f"Finish loading checkpoint from: {path}")
    metric = {}
    mpath = os.path.join(path, "metric.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            metric = json.load(f)
    restored["_metric"] = metric
    return restored


def load_pretrain(path: str, params_like=None):
    """Load only model params from a checkpoint directory (reference
    save_load.py:84-130; URL download support lands with utils.download).

    When `params_like` is given, restoration is validated against that
    structure (orbax raises a structure/dtype mismatch at load time instead
    of a confusing tracing error later; ADVICE r1)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not os.path.exists(path):
        raise FileNotFoundError(f"checkpoint not found: {path}")
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path)
    if isinstance(restored, dict):
        restored.pop("_metric", None)
        params = restored.get("params", restored)
    else:
        params = restored
    if params_like is not None:
        import jax

        want = jax.tree.structure(_to_numpy_tree(params_like))
        got = jax.tree.structure(params)
        if want != got:
            raise ValueError(
                f"pretrained params at '{path}' do not match the model's "
                f"parameter structure.\n  model:      {want}\n  checkpoint: {got}\n"
                "Check the architecture config matches the one that was trained."
            )
    logger.info(f"Finish loading pretrained params from: {path}")
    return params
