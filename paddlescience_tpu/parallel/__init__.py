"""Parallelism: device mesh, sharding, collectives (TPU-native layer —
replaces the reference's fleet/NCCL data-parallel plumbing)."""

from paddlescience_tpu.parallel.mesh import (  # noqa: F401
    get_default_mesh,
    make_mesh,
    replicate,
    set_default_mesh,
    shard_batch,
)
