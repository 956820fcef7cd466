"""Nonlinear update (under-relaxation) schemes.

Reference: FVENS src/ode/nonlinearrelaxation.cpp:24-46. `full` applies
omega = 1; `robust_flow` limits the local relative change in density and
pressure, with a floor `min_factor` (control key
min_nonlinear_relaxation_factor, default 0.2).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..physics.gas import GasPhysics


def full_update(phy, u, du, min_factor):
    return jnp.ones(u.shape[:-1], dtype=u.dtype)


def flow_simple_update(phy: GasPhysics, u, du, min_factor):
    """omega_c = 1 - danger if danger < 1 - min_factor else min_factor,
    danger = max(|dp|/p, |drho|/rho) (nonlinearrelaxation.cpp:24-38).

    Positivity hardening beyond the reference: when the proposed update is
    so large that even the floor factor would change density/pressure by
    more than ~40%, the factor shrinks as 0.4/danger so the relaxed update
    can never drive the state negative (the reference NaNs here)."""
    p = phy.pressure(u)
    dp = jnp.abs(phy.delta_pressure(u, du)) / p
    drho = jnp.abs(du[..., 0]) / u[..., 0]
    danger = jnp.maximum(dp, drho)
    floor = jnp.minimum(min_factor, 0.4 / jnp.maximum(danger, 1e-30))
    return jnp.where(danger < 1.0 - min_factor, 1.0 - danger, floor)


UPDATE_SCHEMES = {
    "full": full_update,
    "robust_flow": flow_simple_update,
}


def get_update_scheme(name: str):
    try:
        return UPDATE_SCHEMES[name.lower()]
    except KeyError:
        raise ValueError(f"unknown nonlinear update scheme '{name}'") from None
