"""First-order flux Jacobian assembly via forward-mode AD.

Replaces the ~1000 lines of hand-written flux/BC/viscous Jacobians of the
reference (anumericalflux.cpp get_jacobian methods, abc.cpp
computeGhostStateAndJacobian, aspatial.cpp:242-340 assembly loops) with
jax.jacfwd over the per-face first-order flux:

  interior face:  flux(u_l, u_r) * len          -> A = dF/du_l, B = dF/du_r
  boundary face:  flux(u_l, ghost(u_l)) * len   -> A  (the reference's
                  `left = len*(L - R*drdl)` fold comes out automatically)

The viscous contribution uses the thin-layer face gradient, exactly like the
reference's implicit path (aspatial.cpp:207-240, flow_spatial.cpp:397-446).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fv import bcs
from ..fv.fluxes import get_flux
from ..fv.viscous import viscous_face_flux
from .linear import BlockJacobian


def _thin_layer_grad(phy, ul, ur, dr_unit, dist):
    """Thin-layer prim-2 face gradient for one face (aspatial.cpp:207-240)."""
    wl = phy.primitive2_from_conserved(ul)
    wr = phy.primitive2_from_conserved(ur)
    corr = (wr - wl) / dist                       # (4,)
    return dr_unit[:, None] * corr[None, :]       # (2,4)


def assemble_jacobian(space, mesh, u) -> BlockJacobian:
    """Face blocks A, B and cell diagonal D (without the pseudo-time term)."""
    phy = space.phy
    fluxname = space.ncfg.flux_jacobian
    if fluxname.upper() == "CONSISTENT":
        fluxname = space.ncfg.flux
    inv_flux = get_flux(fluxname)
    viscous = space.pcfg.viscous
    const_visc = space.pcfg.const_visc
    uinf = space.uinf
    nb = mesh.n_bfaces

    def face_flux(ul, ur, n, dr_unit, dist, length):
        f = inv_flux(phy, ul, ur, n)
        if viscous:
            grad = _thin_layer_grad(phy, ul, ur, dr_unit, dist)
            f = f + viscous_face_flux(phy, n[None], grad[None], ul[None],
                                      ur[None], const_visc)[0]
        return f * length

    ul = u[mesh.f_left]
    ur = u[mesh.f_right]

    # one jacfwd over the stacked (ul, ur) pair: a single 8-tangent forward
    # sweep instead of two 4-tangent sweeps with duplicated primal work
    def face_flux_pair(ulr, n, dr_unit, dist, length):
        return face_flux(ulr[:4], ulr[4:], n, dr_unit, dist, length)

    jac_pair = jax.vmap(jax.jacfwd(face_flux_pair, argnums=0))
    AB = jac_pair(jnp.concatenate([ul, ur], axis=-1), mesh.f_normal,
                  mesh.f_dr_unit, mesh.f_dist, mesh.f_len)   # (NF,4,8)
    A = AB[..., :4]
    B = AB[..., 4:]

    # boundary faces: differentiate through the BC composition
    def bface_flux(uli, n, dr_unit, dist, length, code, v0, v1, upartner):
        ug = bcs.ghost_state(phy, uli, n, code, v0, v1, uinf,
                             u_partner=upartner)
        return face_flux(uli, ug, n, dr_unit, dist, length)

    jac_b = jax.vmap(jax.jacfwd(bface_flux, argnums=0))
    Ab = jac_b(ul[:nb], mesh.f_normal[:nb], mesh.f_dr_unit[:nb],
               mesh.f_dist[:nb], mesh.f_len[:nb], mesh.bc_code,
               mesh.bc_v0, mesh.bc_v1, u[mesh.f_right[:nb]])
    A = A.at[:nb].set(Ab)
    B = B.at[:nb].set(0.0)

    # diagonal: D[c] = sum_f (sign>0 ? A_f : -B_f)
    Ag = A[mesh.cell_faces]
    Bg = B[mesh.cell_faces]
    s = mesh.cell_fsign[..., None, None]
    D = (jnp.where(s > 0, Ag, -Bg) * jnp.abs(s)).sum(axis=1)
    # identity on padded cells to keep the diagonal invertible
    eye = jnp.eye(4, dtype=u.dtype)
    D = D + (1.0 - mesh.cell_mask)[:, None, None] * eye
    return BlockJacobian(D=D, A=A, B=B)


def add_pseudotime_term(mesh, jac: BlockJacobian, cfl, dt) -> BlockJacobian:
    """D += Vol/(cfl dt) I (aodesolver.cpp:301-329)."""
    diag = mesh.area / (cfl * dt) * mesh.cell_mask
    nv = jac.D.shape[-1]
    eye = jnp.eye(nv, dtype=jac.D.dtype)
    return jac._replace(D=jac.D + diag[:, None, None] * eye)
