"""Viscous (Navier-Stokes) face flux, batched over faces.

Equivalent of the reference viscous path (FVENS
src/physics/viscousphysics.cpp:14-122 + flow_spatial.cpp:348-395 +
aspatial.cpp:172-205):

  1. primitive-2 states (rho, v, T) at the two adjacent cell centres,
  2. one-sided temperature gradients from primitive gradients,
  3. "modified average" face gradient: average of cell gradients with the
     component along the cell-centre line replaced by the directional
     finite difference,
  4. Newtonian stress + Fourier heat flux; dissipation velocities and the
     viscosity average use the reconstructed face states.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..physics.gas import GasPhysics


def prim2_states_and_gradients(phy: GasPhysics, ucl, ucr, gradl, gradr,
                               order2: bool):
    """(viscousphysics.cpp:14-68). ucl/ucr: (F,4) conserved cell states;
    gradl/gradr: (F,2,4) primitive gradients. Returns prim-2 states (F,4)
    and prim-2 gradients (F,2,4)."""
    if order2:
        wl = phy.primitive_from_conserved(ucl)
        wr = phy.primitive_from_conserved(ucr)

        def tgrad(wc, grad):
            # dT = (dp*rho - p*drho)/rho^2 * g M^2   (aphysics_defs.hpp:349-353)
            rho = wc[:, 0:1]                     # (F,1) broadcasts over dims
            p = wc[:, 3:4]
            return ((grad[..., 3] * rho - p * grad[..., 0])
                    / rho ** 2 * (phy.g * phy.Minf ** 2))

        gtl = gradl.at[..., 3].set(tgrad(wl, gradl))
        gtr = gradr.at[..., 3].set(tgrad(wr, gradr))
        wtl = wl.at[..., 3].set(phy.temperature(wl[..., 0], wl[..., 3]))
        wtr = wr.at[..., 3].set(phy.temperature(wr[..., 0], wr[..., 3]))
        return wtl, wtr, gtl, gtr
    else:
        wtl = phy.primitive2_from_conserved(ucl)
        wtr = phy.primitive2_from_conserved(ucr)
        z = jnp.zeros_like(gradl)
        return wtl, wtr, z, z


def modified_average_gradient(dr_unit, dist, wl, wr, gradl, gradr):
    """(aspatial.cpp:172-205). dr_unit (F,2), dist (F,), states (F,V),
    gradients (F,2,V) -> face gradient (F,2,V)."""
    davg = 0.5 * (gradl + gradr)                            # (F,2,V)
    corr = (wr - wl) / dist[:, None]                        # (F,V)
    ddr = (davg * dr_unit[:, :, None]).sum(axis=1)          # (F,V)
    return davg + (corr - ddr)[:, None, :] * dr_unit[:, :, None]


def viscous_face_flux(phy: GasPhysics, n, grad, ufl, ufr, const_visc: bool):
    """(viscousphysics.cpp:71-122). n (F,2); grad (F,2,4) prim-2 face
    gradient; ufl/ufr (F,4) reconstructed conserved face states.
    Returns (F,4) flux contribution (already carries its sign)."""
    if const_visc:
        mu = jnp.full(ufl.shape[:-1], phy.const_viscosity, dtype=ufl.dtype)
    else:
        mu = 0.5 * (phy.viscosity(ufl) + phy.viscosity(ufr))
    k = phy.conductivity_from_viscosity(mu)

    gradv = grad[:, :, 1:3]                                 # (F,2,2) d v_j/d x_i
    tau = phy.stress_tensor(mu, gradv)                      # (F,2,2)

    # momentum: -tau . n
    fmom = -(tau * n[:, None, :]).sum(axis=2)               # (F,2)

    vavg = 0.5 * (ufl[:, 1:3] / ufl[:, 0:1] + ufr[:, 1:3] / ufr[:, 0:1])
    # energy: -(tau_i . vavg + k dT/dx_i) n_i
    work = (tau * vavg[:, None, :]).sum(axis=2)             # (F,2)
    heat = k[:, None] * grad[:, :, 3]                       # (F,2)
    fen = -((work + heat) * n).sum(axis=1)                  # (F,)

    zero = jnp.zeros_like(fen)
    return jnp.stack([zero, fmom[:, 0], fmom[:, 1], fen], axis=-1)
