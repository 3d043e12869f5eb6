"""paddlescience_tpu.nn — pure-pytree module system + core layers."""

from paddlescience_tpu.nn.core import (  # noqa: F401
    Buffer,
    Lambda,
    Module,
    ModuleDict,
    ModuleList,
    Param,
    Rngs,
    Sequential,
    merge_call,
    split,
)
from paddlescience_tpu.nn.layers import (  # noqa: F401
    Conv,
    Dropout,
    Embedding,
    GroupNorm,
    InstanceNorm,
    LayerNorm,
    Linear,
    identity,
)
