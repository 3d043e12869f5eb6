"""Additional PDE zoo: NLSMB, HeatExchanger (sympy form)
(reference ``ppsci/equation/pde/nls_m_b.py:48``, ``heat_exchanger.py:61``)."""

from __future__ import annotations

from typing import Optional, Tuple, Union

import sympy as sp

from paddlescience_tpu.equation.pde.base import PDE

__all__ = ["NLSMB", "HeatExchanger", "Hooke"]


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


class Hooke(PDE):
    """Isotropic Hooke-law elasticity in displacement form with a cavity
    pressure load — the cardiac-mechanics system of reference
    ``examples/heart/equation.py:27-164``.

    Strain e_ij from displacement gradients, stress t_ij = 2G(e_ij +
    nu/(1-2nu) tr(e) delta_ij), equilibrium div(t) = 0 ("hooke_*"),
    pressure-loaded surface traction t.n + P n ("traction_*") and its normal
    projection ("traction"). ``E`` may be a float, an output-key string, or
    ("learnable", init) to register an inverse-problem scalar.
    """

    def __init__(
        self,
        E,
        nu,
        P,
        dim: int = 3,
        time: bool = False,
        detach_keys=None,
    ):
        super().__init__()
        self.detach_keys = detach_keys
        self.dim = dim
        self.time = time

        t, x, y, z = self.create_symbols("t x y z")
        normal_x, normal_y, normal_z = self.create_symbols("normal_x normal_y normal_z")
        invars = (x, y)
        if time:
            invars = (t,) + invars
        if dim == 3:
            invars += (z,)

        u = self.create_function("u", invars)
        v = self.create_function("v", invars)
        w = self.create_function("w", invars) if dim == 3 else sp.Number(0)

        if isinstance(nu, str):
            nu = self.create_function(nu, invars)
        if isinstance(P, str):
            P = self.create_function(P, invars)
        if isinstance(E, str):
            E = self.create_function(E, invars)
        elif isinstance(E, (tuple, list)) and len(E) == 2 and E[0] == "learnable":
            E = self.create_parameter("E", float(E[1]))
        self.E, self.nu, self.P = E, nu, P

        e_xx = u.diff(x)
        e_yy = v.diff(y)
        e_zz = w.diff(z) if dim == 3 else sp.Number(0)
        e_xy = 0.5 * (u.diff(y) + v.diff(x))
        e_xz = 0.5 * (u.diff(z) + w.diff(x)) if dim == 3 else sp.Number(0)
        e_yz = 0.5 * (v.diff(z) + w.diff(y)) if dim == 3 else sp.Number(0)

        G = E / (2 * (1 + nu))
        tr = e_xx + e_yy + e_zz
        t_xx = 2 * G * (e_xx + nu / (1 - 2 * nu) * tr)
        t_yy = 2 * G * (e_yy + nu / (1 - 2 * nu) * tr)
        t_zz = 2 * G * (e_zz + nu / (1 - 2 * nu) * tr)
        t_xy = 2 * G * e_xy
        t_xz = 2 * G * e_xz
        t_yz = 2 * G * e_yz

        self.add_equation("hooke_x", t_xx.diff(x) + t_xy.diff(y) + t_xz.diff(z))
        self.add_equation("hooke_y", t_xy.diff(x) + t_yy.diff(y) + t_yz.diff(z))
        if dim == 3:
            self.add_equation("hooke_z", t_xz.diff(x) + t_yz.diff(y) + t_zz.diff(z))

        tx = t_xx * normal_x + t_xy * normal_y + t_xz * normal_z
        ty = t_xy * normal_x + t_yy * normal_y + t_yz * normal_z
        tz = t_xz * normal_x + t_yz * normal_y + t_zz * normal_z
        self.add_equation("traction_x", tx + P * normal_x)
        self.add_equation("traction_y", ty + P * normal_y)
        if dim == 3:
            self.add_equation("traction_z", tz + P * normal_z)
        self.add_equation("traction", tx * normal_x + ty * normal_y + tz * normal_z)

        self._apply_detach()
