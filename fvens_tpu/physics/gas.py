"""Pointwise single-phase ideal-gas thermodynamics, vectorized over ``u[...,4]``.

Non-dimensionalization by free-stream density, velocity magnitude and
temperature (Matatsuka sec. 4.14.2 convention), exactly as the reference
IdealGasPhysics (FVENS src/physics/aphysics.hpp:37-41, aphysics_defs.hpp):

    rho* = rho/rho_inf, v* = v/|v_inf|, p* = p/(rho_inf |v_inf|^2),
    T* = T/T_inf  =>  p*_inf = 1/(g M^2),  T* = g M^2 p*/rho*.

Conserved variables u = (rho, rho u, rho v, rho E). All hand-written
Jacobians of the reference (aphysics.hpp:82-322) are replaced by jax.jacfwd
of these functions.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.tree_util.register_dataclass,
         data_fields=[], meta_fields=["g", "Minf", "Tinf", "Reinf", "Pr", "sC"])
@dataclasses.dataclass(frozen=True)
class GasPhysics:
    """Scalar gas parameters; a static pytree so it can close over jitted fns.

    sC is the Sutherland constant in Kelvin (aphysics.cpp:19).
    """
    g: float = 1.4
    Minf: float = 0.5
    Tinf: float = 288.15
    Reinf: float = 5000.0
    Pr: float = 0.72
    sC: float = 110.5

    # -- basic state functions ------------------------------------------------
    def pressure(self, u):
        """p = (g-1)(rhoE - |rho v|^2/(2 rho))  (aphysics_defs.hpp:60-63)."""
        ke = 0.5 * (u[..., 1] ** 2 + u[..., 2] ** 2) / u[..., 0]
        return (self.g - 1.0) * (u[..., 3] - ke)

    def temperature(self, rho, p):
        """T = g M^2 p / rho  (aphysics_defs.hpp:119-122)."""
        return p / rho * (self.g * self.Minf ** 2)

    def sound_speed(self, rho, p):
        return jnp.sqrt(self.g * p / rho)

    def sound_speed_u(self, u):
        return self.sound_speed(u[..., 0], self.pressure(u))

    def entropy(self, u):
        """s = p / rho^g  (aphysics_defs.hpp:204-207)."""
        return self.pressure(u) / u[..., 0] ** self.g

    def energy_from_pressure(self, p, rho, vmag2):
        return p / (self.g - 1.0) + 0.5 * rho * vmag2

    def energy_from_temperature(self, T, rho, vmag2):
        """(aphysics_defs.hpp:219-223)."""
        return rho * (T / (self.g * (self.g - 1.0) * self.Minf ** 2) + 0.5 * vmag2)

    def density_from_pT(self, p, T):
        return self.g * self.Minf ** 2 * p / T

    @property
    def p_inf(self) -> float:
        """Non-dimensional free-stream pressure 1/(g M^2) (defs.hpp:465-467)."""
        return 1.0 / (self.g * self.Minf ** 2)

    def freestream_state(self, aoa: float):
        """Non-dimensional free-stream conserved state (aphysics.cpp:43-58)."""
        uinf = jnp.array([1.0,
                          jnp.cos(aoa),
                          jnp.sin(aoa),
                          self.energy_from_pressure(self.p_inf, 1.0, 1.0)])
        return uinf

    # -- variable transforms ---------------------------------------------------
    def primitive_from_conserved(self, u):
        """(rho, vx, vy, p)  (aphysics_defs.hpp:259-267)."""
        rho = u[..., 0]
        return jnp.stack([rho, u[..., 1] / rho, u[..., 2] / rho,
                          self.pressure(u)], axis=-1)

    def primitive2_from_conserved(self, u):
        """(rho, vx, vy, T)  (aphysics_defs.hpp:273-281)."""
        rho = u[..., 0]
        p = self.pressure(u)
        return jnp.stack([rho, u[..., 1] / rho, u[..., 2] / rho,
                          self.temperature(rho, p)], axis=-1)

    def conserved_from_primitive(self, w):
        """w = (rho, vx, vy, p) -> u  (aphysics_defs.hpp:287-295)."""
        rho = w[..., 0]
        vmag2 = w[..., 1] ** 2 + w[..., 2] ** 2
        E = self.energy_from_pressure(w[..., 3], rho, vmag2)
        return jnp.stack([rho, rho * w[..., 1], rho * w[..., 2], E], axis=-1)

    # -- transport coefficients -------------------------------------------------
    def viscosity_from_T(self, T):
        """Sutherland mu-hat = mu/Re_inf (aphysics_defs.hpp:410-413)."""
        s = self.sC / self.Tinf
        return (1.0 + s) / (T + s) * T ** 1.5 / self.Reinf

    def viscosity(self, u):
        return self.viscosity_from_T(self.temperature(u[..., 0], self.pressure(u)))

    @property
    def const_viscosity(self) -> float:
        return 1.0 / self.Reinf

    def conductivity_from_viscosity(self, muhat):
        """k-hat = mu-hat / (M^2 (g-1) Pr)  (aphysics_defs.hpp:449-451)."""
        return muhat / (self.Minf ** 2 * (self.g - 1.0) * self.Pr)

    # -- fluxes -----------------------------------------------------------------
    def directional_flux(self, u, n):
        """Analytical Euler flux along unit direction n (aphysics_defs.hpp:15-23).

        u: (...,4), n: (...,2).
        """
        vn = (u[..., 1] * n[..., 0] + u[..., 2] * n[..., 1]) / u[..., 0]
        p = self.pressure(u)
        return jnp.stack([
            vn * u[..., 0],
            vn * u[..., 1] + p * n[..., 0],
            vn * u[..., 2] + p * n[..., 1],
            vn * (u[..., 3] + p),
        ], axis=-1)

    def delta_pressure(self, u, du):
        """Exact pressure change for a finite state change
        (aphysics_defs.hpp:67-81); used by the robust nonlinear update."""
        unew = u + du
        dp = jnp.zeros(u.shape[:-1], dtype=u.dtype)
        for i in (1, 2):
            dp = dp - ((u[..., i] + unew[..., i]) * (u[..., 0] + unew[..., 0])
                       / 2.0 * du[..., i]
                       - (unew[..., i] ** 2 + u[..., i] ** 2) / 2.0 * du[..., 0])
        return (self.g - 1.0) * (du[..., 3]
                                 - 1.0 / (2 * u[..., 0] * unew[..., 0]) * dp)

    def stress_tensor(self, mu, gradv):
        """Newtonian stress from velocity gradients.

        gradv: (...,2,2) with gradv[i,j] = d v_j / d x_i (matching the
        reference's grad[idim][ivar] layout, aphysics_defs.hpp:471-487).
        Returns tau (...,2,2) with tau[i][j] = mu (dv_j/dx_i + dv_i/dx_j)
        - (2/3) mu div(v) delta_ij.
        """
        div = gradv[..., 0, 0] + gradv[..., 1, 1]
        ldiv = (2.0 / 3.0) * mu * div
        t = mu[..., None, None] * (gradv + jnp.swapaxes(gradv, -1, -2))
        return t - ldiv[..., None, None] * jnp.eye(2, dtype=t.dtype)
