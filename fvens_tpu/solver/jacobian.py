"""First-order flux Jacobian assembly via forward-mode AD, directly in
per-cell-slot layout.

Replaces the ~1000 lines of hand-written flux/BC/viscous Jacobians of the
reference (anumericalflux.cpp get_jacobian methods, abc.cpp
computeGhostStateAndJacobian, aspatial.cpp:242-340 assembly loops).

Slot formulation: for cell c and local face k the signed face flux is
    F_ck = flux(u_c, u_nbr, slot_normal_ck) * slot_len_ck
(by the conservation identity f(a,b,n) = -f(b,a,-n) the owner's orientation
is baked into slot_normal, see CompiledMesh). jax.jacfwd of F_ck w.r.t. the
stacked (u_c, u_nbr) pair yields, in ONE vectorized sweep and with no
post-hoc block gathers:
    L_ck = dF/du_c   -> diagonal blocks D_c = sum_k L_ck
    N_ck = dF/du_nbr -> per-slot off-diagonal blocks (the matvec layout)
Boundary slots differentiate through the ghost-state composition, so the
reference's `left = len*(L - R*drdl)` fold (flow_spatial.cpp:841-875) comes
out automatically; periodic slots couple to the partner cell like interior
faces (an off-diagonal block the reference never assembles).
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
    """Diagonal blocks D (NC,4,4) and per-slot neighbour blocks N (NC,4,4,4)
    (without the pseudo-time term)."""
    phy = space.phy
    fluxname = space.ncfg.flux_jacobian.upper()
    frozen = fluxname == "FROZEN"
    if fluxname in ("CONSISTENT", "FROZEN"):
        fluxname = space.ncfg.flux
    inv_flux = get_flux(fluxname)
    viscous = space.pcfg.viscous
    const_visc = space.pcfg.const_visc
    uinf = space.uinf
    NC = mesh.NC

    def slot_flux(ucn, n, dru, dist, length, code, v0, v1):
        uc, un = ucn[:4], ucn[4:]
        ug = bcs.ghost_state(phy, uc, n, code, v0, v1, uinf, u_partner=un)
        ur = jnp.where(code >= 0, ug, un)
        f = inv_flux(phy, uc, ur, n, frozen=frozen)
        if viscous:
            grad = _thin_layer_grad(phy, uc, ur, dru, dist)
            f = f + viscous_face_flux(phy, n[None], grad[None], uc[None],
                                      ur[None], const_visc)[0]
        return f * length

    # safe neighbour states: boundary/padding slots read the cell itself so
    # every branch of the BC select sees a valid state under jacfwd
    self_idx = jnp.arange(NC, dtype=mesh.cell_nbrs.dtype)[:, None]
    safe_nbrs = jnp.where(mesh.nbr_mask > 0, mesh.cell_nbrs, self_idx)
    u_nbr = u[safe_nbrs]                                    # (NC,4,4)
    u_c = jnp.broadcast_to(u[:, None, :], u_nbr.shape)

    S = NC * 4
    ucn = jnp.concatenate([u_c, u_nbr], axis=-1).reshape(S, 8)
    jac = jax.vmap(jax.jacfwd(slot_flux, argnums=0))
    JJ = jac(ucn,
             mesh.slot_normal.reshape(S, 2),
             mesh.slot_dr_unit.reshape(S, 2),
             mesh.slot_dist.reshape(S),
             mesh.slot_len.reshape(S),
             mesh.slot_bc_code.reshape(S),
             mesh.slot_v0.reshape(S),
             mesh.slot_v1.reshape(S)).reshape(NC, 4, 4, 8)

    L = JJ[..., :4]                                         # (NC,4,4,4)
    N = JJ[..., 4:] * mesh.nbr_mask[..., None, None]
    D = L.sum(axis=1)
    # identity on padded cells to keep the diagonal invertible
    eye = jnp.eye(4, dtype=u.dtype)
    D = D + (1.0 - mesh.cell_mask)[:, None, None] * eye
    return BlockJacobian(D=D, N=N)


def add_pseudotime_term(mesh, jac: BlockJacobian, cfl, dt) -> BlockJacobian:
    """D += Vol/(cfl dt) I (aodesolver.cpp:301-329)."""
    diag = mesh.area / (cfl * dt) * mesh.cell_mask
    nv = jac.D.shape[-1]
    eye = jnp.eye(nv, dtype=jac.D.dtype)
    return jac._replace(D=jac.D + diag[:, None, None] * eye)
