"""Named PDE zoo (sympy + python-closure forms).

TPU-native counterparts of the reference equation zoo:
  * AllenCahn          (ppsci/equation/pde/allen_cahn.py:42-80, closure form)
  * Laplace            (ppsci/equation/pde/laplace.py:40)
  * Poisson            (ppsci/equation/pde/poisson.py:40)
  * Helmholtz          (ppsci/equation/pde/helmholtz.py:65)
  * Biharmonic         (ppsci/equation/pde/biharmonic.py:45)
  * NavierStokes       (ppsci/equation/pde/navier_stokes.py:83+)
  * NormalDotVec       (ppsci/equation/pde/normal_dot_vec.py:41)
  * LinearElasticity   (ppsci/equation/pde/linear_elasticity.py:63)
  * Vibration          (ppsci/equation/pde/viv.py:41, learnable k1/k2)

Same residual math; closure-form equations use the array-level
``autodiff.jacobian/hessian`` tape API, sympy forms are lowered by
``utils/symbolic.lambdify`` — both trace to one XLA program per constraint.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple, Union

import sympy as sp
from sympy.parsing import sympy_parser as sp_parser

from paddlescience_tpu.autodiff.ad import hessian, jacobian
from paddlescience_tpu.equation.pde.base import PDE

__all__ = [
    "AllenCahn",
    "Laplace",
    "Poisson",
    "Helmholtz",
    "Biharmonic",
    "NavierStokes",
    "NormalDotVec",
    "LinearElasticity",
    "Vibration",
]


class AllenCahn(PDE):
    """u_t - eps^2 u_xx + 5 u^3 - 5 u = 0 (reference allen_cahn.py:42-80,
    python-closure form; u*u*u instead of Pow for accuracy parity)."""

    def __init__(self, eps: float, detach_keys: Optional[Tuple[str, ...]] = None):
        super().__init__()
        self.detach_keys = detach_keys
        self.eps = eps

        def allen_cahn(out):
            t, x, u = out["t"], out["x"], out["u"]
            u__t, u__x = jacobian(u, [t, x])
            u__x__x = jacobian(u__x, x)
            return u__t - (self.eps**2) * u__x__x + 5 * u * u * u - 5 * u

        self.add_equation("allen_cahn", allen_cahn)


class Laplace(PDE):
    """sum_i u_{x_i x_i} = 0 (reference laplace.py:40)."""

    def __init__(self, dim: int, detach_keys: Optional[Tuple[str, ...]] = None):
        super().__init__()
        self.detach_keys = detach_keys
        self.dim = dim
        invars = self.create_symbols("x y z")[:dim]
        u = self.create_function("u", invars)
        laplace = sp.Number(0)
        for invar in invars:
            laplace += u.diff(invar, 2)
        self.add_equation("laplace", laplace)
        self._apply_detach()


class Poisson(PDE):
    """sum_i p_{x_i x_i} (reference poisson.py:40)."""

    def __init__(self, dim: int, detach_keys: Optional[Tuple[str, ...]] = None):
        super().__init__()
        self.detach_keys = detach_keys
        self.dim = dim
        invars = self.create_symbols("x y z")[:dim]
        p = self.create_function("p", invars)
        poisson = sp.Number(0)
        for invar in invars:
            poisson += p.diff(invar, 2)
        self.add_equation("poisson", poisson)
        self._apply_detach()


class Helmholtz(PDE):
    """nabla^2 u + k^2 u (reference helmholtz.py:65, closure form)."""

    def __init__(self, dim: int, k: float, detach_keys: Optional[Tuple[str, ...]] = None):
        super().__init__()
        self.dim = dim
        self.k = k
        self.detach_keys = detach_keys

        def helmholtz(out):
            u = out["u"]
            result = (self.k**2) * u
            for axis in ("x", "y", "z")[: self.dim]:
                result += hessian(u, out[axis])
            return result

        self.add_equation("helmholtz", helmholtz)


class Biharmonic(PDE):
    """nabla^4 u - q/D (reference biharmonic.py:45)."""

    def __init__(
        self,
        dim: int,
        q: Union[float, str],
        D: Union[float, str],
        detach_keys: Optional[Tuple[str, ...]] = None,
    ):
        super().__init__()
        self.detach_keys = detach_keys
        invars = self.create_symbols("x y z")[:dim]
        u = self.create_function("u", invars)
        if isinstance(q, str):
            q = self.create_function(q, invars)
        if isinstance(D, str):
            D = self.create_function(D, invars)
        self.dim = dim
        self.q = q
        self.D = D
        biharmonic = -self.q / self.D
        for invar_i in invars:
            for invar_j in invars:
                biharmonic += u.diff(invar_i, 2).diff(invar_j, 2)
        self.add_equation("biharmonic", biharmonic)
        self._apply_detach()


class NavierStokes(PDE):
    """Incompressible Navier-Stokes, 2D/3D, steady/unsteady (reference
    navier_stokes.py:83+). nu/rho may be floats or named field strings.

    Examples:
        >>> import paddlescience_tpu as psci
        >>> eq = psci.equation.NavierStokes(nu=0.01, rho=1.0, dim=2, time=False)
        >>> sorted(eq.equations)
        ['continuity', 'momentum_x', 'momentum_y']
    """

    def __init__(
        self,
        nu: Union[float, str],
        rho: Union[float, str],
        dim: int,
        time: bool,
        detach_keys: Optional[Tuple[str, ...]] = None,
    ):
        super().__init__()
        self.detach_keys = detach_keys
        self.dim = dim
        self.time = time

        t, x, y, z = self.create_symbols("t x y z")
        invars = (x, y)
        if time:
            invars = (t,) + invars
        if dim == 3:
            invars += (z,)

        if isinstance(nu, str):
            nu = sp_parser.parse_expr(nu)
            if isinstance(nu, sp.Symbol):
                invars += (nu,)
        if isinstance(rho, str):
            rho = sp_parser.parse_expr(rho)
            if isinstance(rho, sp.Symbol):
                invars += (rho,)
        self.nu = nu
        self.rho = rho

        u = self.create_function("u", invars)
        v = self.create_function("v", invars)
        w = self.create_function("w", invars) if dim == 3 else sp.Number(0)
        p = self.create_function("p", invars)

        continuity = u.diff(x) + v.diff(y) + w.diff(z)
        momentum_x = (
            u.diff(t)
            + u * u.diff(x)
            + v * u.diff(y)
            + w * u.diff(z)
            - ((nu * u.diff(x)).diff(x) + (nu * u.diff(y)).diff(y) + (nu * u.diff(z)).diff(z))
            + 1 / rho * p.diff(x)
        )
        momentum_y = (
            v.diff(t)
            + u * v.diff(x)
            + v * v.diff(y)
            + w * v.diff(z)
            - ((nu * v.diff(x)).diff(x) + (nu * v.diff(y)).diff(y) + (nu * v.diff(z)).diff(z))
            + 1 / rho * p.diff(y)
        )
        momentum_z = (
            w.diff(t)
            + u * w.diff(x)
            + v * w.diff(y)
            + w * w.diff(z)
            - ((nu * w.diff(x)).diff(x) + (nu * w.diff(y)).diff(y) + (nu * w.diff(z)).diff(z))
            + 1 / rho * p.diff(z)
        )
        self.add_equation("continuity", continuity)
        self.add_equation("momentum_x", momentum_x)
        self.add_equation("momentum_y", momentum_y)
        if dim == 3:
            self.add_equation("momentum_z", momentum_z)
        self._apply_detach()


class NormalDotVec(PDE):
    """n . v over boundary normals (reference normal_dot_vec.py:41)."""

    def __init__(self, vec_keys: Tuple[str, ...], detach_keys: Optional[Tuple[str, ...]] = None):
        super().__init__()
        self.detach_keys = detach_keys
        if not vec_keys:
            raise ValueError(f"vec_keys is {vec_keys}")
        self.vec_keys = vec_keys
        vec_vars = self.create_symbols(" ".join(vec_keys))
        if len(vec_keys) == 1:
            vec_vars = (vec_vars,)
        normals = self.create_symbols("normal_x normal_y normal_z")
        normal_dot_vec = sp.Number(0)
        for normal, vec in zip(normals, vec_vars):
            normal_dot_vec += normal * vec
        self.add_equation("normal_dot_vec", normal_dot_vec)
        self._apply_detach()


class LinearElasticity(PDE):
    """Stress-displacement + equilibrium + traction equations (reference
    linear_elasticity.py:63)."""

    def __init__(
        self,
        E: Optional[Union[float, str]] = None,
        nu: Optional[Union[float, str]] = None,
        lambda_: Optional[Union[float, str]] = None,
        mu: Optional[Union[float, str]] = None,
        rho: Union[float, str] = 1,
        dim: int = 3,
        time: bool = False,
        detach_keys: Optional[Tuple[str, ...]] = None,
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

        sigma_xx = self.create_function("sigma_xx", invars)
        sigma_yy = self.create_function("sigma_yy", invars)
        sigma_xy = self.create_function("sigma_xy", invars)
        sigma_zz = self.create_function("sigma_zz", invars) if dim == 3 else sp.Number(0)
        sigma_xz = self.create_function("sigma_xz", invars) if dim == 3 else sp.Number(0)
        sigma_yz = self.create_function("sigma_yz", invars) if dim == 3 else sp.Number(0)

        if lambda_ is None:
            if isinstance(nu, str):
                nu = self.create_function(nu, invars)
            if isinstance(E, str):
                E = self.create_function(E, invars)
            lambda_ = nu * E / ((1 + nu) * (1 - 2 * nu))
            mu = E / (2 * (1 + nu))
        else:
            if isinstance(lambda_, str):
                lambda_ = self.create_function(lambda_, invars)
            if isinstance(mu, str):
                mu = self.create_function(mu, invars)
        if isinstance(rho, str):
            rho = self.create_function(rho, invars)
        self.E, self.nu, self.lambda_, self.mu, self.rho = E, nu, lambda_, mu, rho

        div_u = u.diff(x) + v.diff(y) + w.diff(z)
        stress_disp_xx = lambda_ * div_u + 2 * mu * u.diff(x) - sigma_xx
        stress_disp_yy = lambda_ * div_u + 2 * mu * v.diff(y) - sigma_yy
        stress_disp_zz = lambda_ * div_u + 2 * mu * w.diff(z) - sigma_zz
        stress_disp_xy = mu * (u.diff(y) + v.diff(x)) - sigma_xy
        stress_disp_xz = mu * (u.diff(z) + w.diff(x)) - sigma_xz
        stress_disp_yz = mu * (v.diff(z) + w.diff(y)) - sigma_yz

        equilibrium_x = rho * ((u.diff(t)).diff(t)) - (sigma_xx.diff(x) + sigma_xy.diff(y) + sigma_xz.diff(z))
        equilibrium_y = rho * ((v.diff(t)).diff(t)) - (sigma_xy.diff(x) + sigma_yy.diff(y) + sigma_yz.diff(z))
        equilibrium_z = rho * ((w.diff(t)).diff(t)) - (sigma_xz.diff(x) + sigma_yz.diff(y) + sigma_zz.diff(z))

        traction_x = normal_x * sigma_xx + normal_y * sigma_xy + normal_z * sigma_xz
        traction_y = normal_x * sigma_xy + normal_y * sigma_yy + normal_z * sigma_yz
        traction_z = normal_x * sigma_xz + normal_y * sigma_yz + normal_z * sigma_zz

        self.add_equation("stress_disp_xx", stress_disp_xx)
        self.add_equation("stress_disp_yy", stress_disp_yy)
        self.add_equation("stress_disp_xy", stress_disp_xy)
        if dim == 3:
            self.add_equation("stress_disp_zz", stress_disp_zz)
            self.add_equation("stress_disp_xz", stress_disp_xz)
            self.add_equation("stress_disp_yz", stress_disp_yz)
        self.add_equation("equilibrium_x", equilibrium_x)
        self.add_equation("equilibrium_y", equilibrium_y)
        if dim == 3:
            self.add_equation("equilibrium_z", equilibrium_z)
        self.add_equation("traction_x", traction_x)
        self.add_equation("traction_y", traction_y)
        if dim == 3:
            self.add_equation("traction_z", traction_z)
        self._apply_detach()


class Vibration(PDE):
    """Vortex-induced-vibration ODE with learnable exp(k1), exp(k2)
    (reference viv.py:41; inverse problem)."""

    def __init__(self, rho: float, k1: float, k2: float):
        super().__init__()
        self.rho = rho
        k1_sym = self.create_parameter("k1", k1)
        k2_sym = self.create_parameter("k2", k2)
        t_f = self.create_symbols("t_f")
        eta = self.create_function("eta", (t_f,))
        f = self.rho * eta.diff(t_f, 2) + sp.exp(k1_sym) * eta.diff(t_f) + sp.exp(k2_sym) * eta
        self.add_equation("f", f)
        self._apply_detach()
