"""SPINN — Separable Physics-Informed Neural Network
(reference ``ppsci/arch/spinn.py:31,113-168``; arXiv:2211.08761).

Factorizes a d-dim field into per-axis feature nets combined by outer
product: u(x1..xd) = sum_r prod_i f_i^r(x_i) — O(N·d) network evaluations
for an N^d collocation grid. The per-axis nets are ModifiedMLPs; the outer
product broadcasts on the VPU.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

import jax.numpy as jnp

from paddlescience_tpu.arch import base
from paddlescience_tpu.arch.mlp import ModifiedMLP
from paddlescience_tpu.nn.core import Rngs

__all__ = ["SPINN"]


class SPINN(base.Arch):
    """Each input key gets its own (N_i, 1) coordinate array; outputs have
    shape (*N, 1) over the product grid."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        r: int,
        num_layers: int,
        hidden_size: Union[int, Tuple[int, ...]],
        activation: str = "tanh",
        skip_connection: bool = False,
        weight_norm: bool = False,
        periods: Optional[Dict[str, Tuple[float, bool]]] = None,
        fourier: Optional[Dict[str, Union[float, int]]] = None,
        random_weight: Optional[Dict[str, float]] = None,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.r = r
        self.branch_nets = [
            ModifiedMLP(
                input_keys=(key,),
                output_keys=("f",),
                num_layers=num_layers,
                hidden_size=hidden_size,
                activation=activation,
                skip_connection=skip_connection,
                weight_norm=weight_norm,
                output_dim=r * len(output_keys),
                periods={key: periods[key]} if periods and key in periods else None,
                fourier=fourier,
                random_weight=random_weight,
                rngs=rngs,
            )
            for key in self.input_keys
        ]

    @staticmethod
    def _tensor_contraction(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """[*N, C] x [*M, C] -> [*N, *M, C] via broadcast outer product."""
        x_ndim, y_ndim = x.ndim, y.ndim
        out_dim = x_ndim + y_ndim - 1
        x = x.reshape(x.shape[:-1] + (1,) * (out_dim - x_ndim) + (x.shape[-1],))
        y = y.reshape((1,) * (out_dim - y_ndim) + y.shape)
        return x * y

    def forward_tensor(self, *coords) -> List[jnp.ndarray]:
        feature_f = []
        for i, input_var in enumerate(coords):
            out_i = self.branch_nets[i]({self.input_keys[i]: input_var})
            feature_f.append(out_i["f"])  # (N_i, r * n_out)

        outputs = []
        for i, key in enumerate(self.output_keys):
            st, ed = i * self.r, (i + 1) * self.r
            output_i = feature_f[0][:, st:ed]
            for j in range(1, len(self.input_keys)):
                output_i = self._tensor_contraction(output_i, feature_f[j][:, st:ed])
            outputs.append(jnp.sum(output_i, axis=-1, keepdims=True))
        return outputs

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self._input_transform is not None:
            x = self._input_transform(x)
        coords = [x[key] for key in self.input_keys]
        outputs = self.forward_tensor(*coords)
        result = {key: out for key, out in zip(self.output_keys, outputs)}
        if self._output_transform is not None:
            result = self._output_transform(x, result)
        return result
