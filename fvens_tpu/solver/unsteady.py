"""Physical-time integration: TVD Runge-Kutta 1/2/3 with a global time step.

Reference: FVENS src/ode/aodesolver.cpp:45-67 (coefficient table) and
:672-785 (stage loop with global minimum time step dt_min * CFL).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

TVDRK_COEFFS = {
    1: [(1.0, 0.0, 1.0)],
    2: [(1.0, 0.0, 1.0), (0.5, 0.5, 0.5)],
    3: [(1.0, 0.0, 1.0), (0.75, 0.25, 0.25),
        (1.0 / 3.0, 2.0 / 3.0, 2.0 / 3.0)],
}


@dataclasses.dataclass
class TVDRKSolver:
    space: object
    order: int = 3
    cfl: float = 0.5

    def _step(self, mesh, u, remaining):
        """One physical time step of `order` TVD-RK stages; dt from stage 1,
        clipped to `remaining` so the last step lands exactly on the
        requested final time (no O(dt) overshoot in time-accurate
        comparisons)."""
        coeffs = TVDRK_COEFFS[self.order]
        ustage = u
        dtg = None
        for istage, (a, b, c) in enumerate(coeffs):
            # signs: rhs is the NEGATIVE flux divergence, so the reference's
            # "- c*dt/vol * residual" with its rvec (= -r) becomes "+" here
            rhs, dt = self.space.compute_residual(mesh, ustage, True)
            if istage == 0:
                dtmin = jnp.min(jnp.where(mesh.cell_mask > 0, dt, jnp.inf))
                dtg = jnp.minimum(dtmin * self.cfl, remaining)
            ustage = (a * u + b * ustage
                      + (c * dtg * mesh.inv_area)[..., None] * rhs)
        return ustage, dtg

    def solve(self, mesh, u0, final_time: float):
        # mesh passed as a jit argument (not a baked constant): keeps the
        # compiled program O(1) in mesh size (see SteadyBackwardEuler.solve).
        # The jit wrapper is cached on the instance: rebuilding it per
        # solve() retraces the program every solve (steady.py _jit).
        step_fn = getattr(self, "_step_jit", None)
        if step_fn is None:
            step_fn = self._step_jit = jax.jit(self._step)
        u = u0
        t = 0.0
        nsteps = 0
        while t < final_time - 1e-12:
            u, dt = step_fn(mesh, u, final_time - t)
            dtf = float(dt)
            if not np.isfinite(dtf):
                raise ArithmeticError("TVDRK diverged: dt NaN/inf")
            t += dtf
            nsteps += 1
        return u, t, nsteps
