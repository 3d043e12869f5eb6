"""DeepPhyLSTM — physics-informed LSTM for structural seismic response
(reference ``ppsci/arch/phylstm.py:21``). model_type 2 and 3."""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from paddlescience_tpu.arch import base
from paddlescience_tpu.nn.core import Module, Rngs
from paddlescience_tpu.nn.layers import Linear
from paddlescience_tpu.nn.recurrent import LSTM

__all__ = ["DeepPhyLSTM"]


class _LSTMStack(Module):
    """3x (LSTM + relu) then Linear head(s) (reference phylstm.py:81-121)."""

    def __init__(self, in_size, hidden_size, out_size, extra_linear: bool, *, rngs: Rngs):
        self.l1 = LSTM(in_size, hidden_size, rngs=rngs)
        self.l2 = LSTM(hidden_size, hidden_size, rngs=rngs)
        self.l3 = LSTM(hidden_size, hidden_size, rngs=rngs)
        self.extra = Linear(hidden_size, hidden_size, rngs=rngs) if extra_linear else None
        self.head = Linear(hidden_size, out_size, rngs=rngs)

    def __call__(self, x):
        h = jax.nn.relu(self.l1(x))
        h = jax.nn.relu(self.l2(h))
        h = jax.nn.relu(self.l3(h))
        if self.extra is not None:
            h = self.extra(h)
        return self.head(h)


class DeepPhyLSTM(base.Arch):
    """Input dict keys: 'ag', 'ag_c' (B, T, 1) accelerations, 'phi'
    differentiation matrix; outputs per reference _forward_type_2/3."""

    def __init__(self, input_size: int, output_size: int, hidden_size: int = 100, model_type: int = 2, *, rngs: Optional[Rngs] = None):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_size = input_size
        self.output_size = output_size
        self.model_type = model_type
        self.input_keys = ("ag", "ag_c", "phi")
        if model_type == 2:
            self.lstm_model = _LSTMStack(input_size, hidden_size, 3 * output_size, True, rngs=rngs)
            self.lstm_model_f = _LSTMStack(3 * output_size, hidden_size, output_size, True, rngs=rngs)
            self.output_keys = ("eta_pred", "eta_dot_pred", "g_pred", "eta_t_pred_c", "eta_dot_pred_c", "lift_pred_c")
        elif model_type == 3:
            self.lstm_model = _LSTMStack(1, hidden_size, 3 * output_size, False, rngs=rngs)
            self.lstm_model_f = _LSTMStack(3 * output_size, hidden_size, output_size, False, rngs=rngs)
            self.lstm_model_g = _LSTMStack(2 * output_size, hidden_size, output_size, False, rngs=rngs)
            self.output_keys = (
                "eta_pred", "eta_dot_pred", "g_pred", "eta_t_pred_c", "eta_dot_pred_c",
                "lift_pred_c", "g_t_pred_c",
            )
        else:
            raise ValueError(f"model_type should be 2 or 3, but got {model_type}")

    def _split(self, output):
        n = self.output_size
        return output[:, :, :n], output[:, :, n : 2 * n], output[:, :, 2 * n :]

    def _forward_type_2(self, x):
        eta_pred, eta_dot_pred, g_pred = self._split(self.lstm_model(x["ag"]))
        eta_pred_c, eta_dot_pred_c, g_pred_c = self._split(self.lstm_model(x["ag_c"]))
        eta_t_pred_c = jnp.matmul(x["phi"], eta_pred_c)
        eta_tt_pred_c = jnp.matmul(x["phi"], eta_dot_pred_c)
        tmp = jnp.concatenate([eta_pred_c, eta_dot_pred_c[:, :, 0:1], g_pred_c], axis=2)
        f = self.lstm_model_f(tmp)
        return {
            "eta_pred": eta_pred,
            "eta_dot_pred": eta_dot_pred,
            "g_pred": g_pred,
            "eta_t_pred_c": eta_t_pred_c,
            "eta_dot_pred_c": eta_dot_pred_c,
            "lift_pred_c": eta_tt_pred_c + f,
        }

    def _forward_type_3(self, x):
        eta_pred, eta_dot_pred, g_pred = self._split(self.lstm_model(x["ag"]))
        eta_pred_c, eta_dot_pred_c, g_pred_c = self._split(self.lstm_model(x["ag_c"]))
        eta_t_pred_c = jnp.matmul(x["phi"], eta_pred_c)
        eta_tt_pred_c = jnp.matmul(x["phi"], eta_dot_pred_c)
        f = self.lstm_model_f(jnp.concatenate([eta_pred_c, eta_dot_pred_c[:, :, 0:1], g_pred_c], axis=2))
        lift_pred_c = eta_tt_pred_c + f
        g_t_pred_c = jnp.matmul(x["phi"], g_pred_c)
        g_dot_pred_c = self.lstm_model_g(jnp.concatenate([eta_dot_pred_c, eta_pred_c], axis=2))
        return {
            "eta_pred": eta_pred,
            "eta_dot_pred": eta_dot_pred,
            "g_pred": g_pred,
            "eta_t_pred_c": eta_t_pred_c,
            "eta_dot_pred_c": eta_dot_pred_c,
            "lift_pred_c": lift_pred_c,
            "g_t_pred_c": g_t_pred_c - g_dot_pred_c,
        }

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self._input_transform is not None:
            x = self._input_transform(x)
        result = self._forward_type_2(x) if self.model_type == 2 else self._forward_type_3(x)
        if self._output_transform is not None:
            result = self._output_transform(x, result)
        return result
