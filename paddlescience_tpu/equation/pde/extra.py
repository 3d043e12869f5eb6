"""Additional PDE zoo: NLSMB, HeatExchanger (sympy form)
(reference ``ppsci/equation/pde/nls_m_b.py:48``, ``heat_exchanger.py:61``)."""

from __future__ import annotations

from typing import Optional, Tuple, Union

import sympy as sp

from paddlescience_tpu.equation.pde.base import PDE

__all__ = ["NLSMB", "HeatExchanger"]


class NLSMB(PDE):
    """Nonlinear Schrodinger + Maxwell-Bloch system (reference nls_m_b.py:48)."""

    def __init__(
        self,
        alpha_1: Union[float, str],
        alpha_2: Union[float, str],
        omega_0: Union[float, str],
        time: bool,
        detach_keys: Optional[Tuple[str, ...]] = None,
    ):
        super().__init__()
        self.detach_keys = detach_keys
        self.time = time
        t, x = self.create_symbols("t x")
        invars = (x,)
        if time:
            invars = (t,) + invars
        self.alpha_1, self.alpha_2, self.omega_0 = alpha_1, alpha_2, omega_0

        Eu = self.create_function("Eu", invars)
        Ev = self.create_function("Ev", invars)
        pu = self.create_function("pu", invars)
        pv = self.create_function("pv", invars)
        eta = self.create_function("eta", invars)

        Schrodinger_1 = alpha_1 * Eu.diff(t, 2) - alpha_2 * Eu * (Eu**2 + Ev**2) + 2 * pv - Ev.diff(x)
        Schrodinger_2 = alpha_1 * Ev.diff(t, 2) - alpha_2 * Ev * (Eu**2 + Ev**2) - 2 * pu + Eu.diff(x)
        Maxwell_1 = 2 * Ev * eta - pv.diff(t) + 2 * pu * omega_0
        Maxwell_2 = -2 * Eu * eta + pu.diff(t) + 2 * pv * omega_0
        Bloch = 2 * pv * Ev + 2 * pu * Eu + eta.diff(t)

        self.add_equation("Schrodinger_1", Schrodinger_1)
        self.add_equation("Schrodinger_2", Schrodinger_2)
        self.add_equation("Maxwell_1", Maxwell_1)
        self.add_equation("Maxwell_2", Maxwell_2)
        self.add_equation("Bloch", Bloch)
        self._apply_detach()


class HeatExchanger(PDE):
    """1-D heat exchanger three-equation system (reference heat_exchanger.py:61)."""

    def __init__(
        self,
        alpha_h: Union[float, str],
        alpha_c: Union[float, str],
        v_h: Union[float, str],
        v_c: Union[float, str],
        w_h: Union[float, str],
        w_c: Union[float, str],
    ):
        super().__init__()
        x, t, qm_h, qm_c = self.create_symbols("x t qm_h qm_c")
        T_h = self.create_function("T_h", (x, t, qm_h))
        T_c = self.create_function("T_c", (x, t, qm_c))
        T_w = self.create_function("T_w", (x, t))

        beta_h = (alpha_h * v_h) / qm_h
        beta_c = (alpha_c * v_c) / qm_c

        heat_boundary = T_h.diff(t) + v_h * T_h.diff(x) - beta_h * (T_w - T_h)
        cold_boundary = T_c.diff(t) - v_c * T_c.diff(x) - beta_c * (T_w - T_c)
        wall = T_w.diff(t) - w_h * (T_h - T_w) - w_c * (T_c - T_w)

        self.add_equation("heat_boundary", heat_boundary)
        self.add_equation("cold_boundary", cold_boundary)
        self.add_equation("wall", wall)
        self._apply_detach()
