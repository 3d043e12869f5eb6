"""Operator networks: DeepONet (reference ``ppsci/arch/deeponet.py:28``).

Branch x trunk dot product: G(u)(y) = sum_k b_k(u) t_k(y) + bias. Both nets
are MLP stacks; the final contraction is one MXU matvec per sample.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple, Union

import jax.numpy as jnp

from paddlescience_tpu.arch import base, mlp
from paddlescience_tpu.nn.core import Param, Rngs

__all__ = ["DeepONet"]


class DeepONet(base.Arch):
    """Deep operator network (Lu et al., Nat Mach Intell 2021)."""

    def __init__(
        self,
        u_key: str,
        y_key: str,
        G_key: str,
        num_loc: int,
        num_features: int,
        branch_num_layers: Optional[int],
        trunk_num_layers: Optional[int],
        branch_hidden_size: Union[int, Tuple[int, ...]],
        trunk_hidden_size: Union[int, Tuple[int, ...]],
        branch_skip_connection: bool = False,
        trunk_skip_connection: bool = False,
        branch_activation: str = "tanh",
        trunk_activation: str = "tanh",
        branch_weight_norm: bool = False,
        trunk_weight_norm: bool = False,
        use_bias: bool = True,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.u_key = u_key
        self.y_key = y_key
        self.G_key = G_key
        self.input_keys = (u_key, y_key)
        self.output_keys = (G_key,)

        self.branch_net = mlp.MLP(
            (u_key,),
            ("b",),
            branch_num_layers,
            branch_hidden_size,
            branch_activation,
            branch_skip_connection,
            branch_weight_norm,
            input_dim=num_loc,
            output_dim=num_features,
            rngs=rngs,
        )
        self.trunk_net = mlp.MLP(
            (y_key,),
            ("t",),
            trunk_num_layers,
            trunk_hidden_size,
            trunk_activation,
            trunk_skip_connection,
            trunk_weight_norm,
            input_dim=1,
            output_dim=num_features,
            rngs=rngs,
        )
        self.trunk_act = mlp._make_act(trunk_activation, num_features, rngs)
        self.use_bias = use_bias
        if use_bias:
            self.b = Param(jnp.zeros((1,)))

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self._input_transform is not None:
            x = self._input_transform(x)
        u_features = self.branch_net({self.u_key: x[self.u_key]})["b"]
        y_features = self.trunk_act(self.trunk_net({self.y_key: x[self.y_key]})["t"])
        G_u = jnp.sum(u_features * y_features, axis=-1, keepdims=True)
        if self.use_bias:
            G_u = G_u + self.b
        result = {self.G_key: G_u}
        if self._output_transform is not None:
            result = self._output_transform(x, result)
        return result
