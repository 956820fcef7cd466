"""Scalar diffusion (Laplacian) spatial discretization.

The reference's DiffusionMA (FVENS src/spatial/diffusion.cpp:74-250): constant
diffusivity, Dirichlet boundaries via mirrored ghosts, source-term callback,
modified-average face gradients. Exercises the whole solver stack on a trivial
PDE — used by the heat-equation convergence tests and as the model problem
for orderings.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .bcs import scalar_ghost_state
from .gradients import get_gradient_scheme
from .viscous import modified_average_gradient


@dataclasses.dataclass(frozen=True)
class DiffusionFV:
    """nvars=1 spatial discretization with the Spatial interface used by the
    steady solvers (compute_residual -> (rhs, dt))."""
    diffusivity: float = 1.0
    source: Optional[Callable] = None      # source(xy (NC,2)) -> (NC,) or None
    gradient: str = "LEASTSQUARES"
    phy = None                             # no gas physics

    def compute_residual(self, mesh, u, gettimesteps: bool = True):
        nb = mesh.n_bfaces
        nu = self.diffusivity

        ins = u[mesh.f_left[:nb]]
        ug = scalar_ghost_state(ins, mesh.bc_code, mesh.bc_v0)

        grads = get_gradient_scheme(self.gradient)(mesh, u, ug)   # (NC,2,1)

        ul = u[mesh.f_left]
        ur = u[mesh.f_right].at[:nb].set(ug)
        gl = grads[mesh.f_left]
        gr_ = grads[mesh.f_right]
        gr_ = gr_.at[:nb].set(gl[:nb])     # boundary uses left grads twice
        fgrad = modified_average_gradient(mesh.f_dr_unit, mesh.f_dist,
                                          ul, ur, gl, gr_)        # (NF,2,1)

        # flux = -nu * (grad . n) * len  (diffusion.cpp:96-106)
        gn = (fgrad * mesh.f_normal[:, :, None]).sum(axis=1)      # (NF,1)
        fluxlen = -nu * gn * mesh.f_len[:, None]

        g = fluxlen[mesh.cell_faces]                              # (NC,4,1)
        rhs = -(mesh.cell_fsign[..., None] * g).sum(axis=1)

        if self.source is not None:
            rhs = rhs + self.source(mesh.rc) * mesh.area[:, None]
        rhs = rhs * mesh.cell_mask[:, None]

        dt = None
        if gettimesteps:
            # dt = h^2 / nu with h = max face length of the cell
            # (diffusion.cpp:22-31, 239)
            h = (mesh.f_len[mesh.cell_faces]
                 * (jnp.abs(mesh.cell_fsign) > 0)).max(axis=1)
            h = jnp.maximum(h, 1e-300)
            dt = h * h / nu
        return rhs, dt

    def assemble_jacobian(self, mesh, u):
        """Thin-layer 1x1 block Jacobian via jacfwd (matching the reference's
        compute_local_jacobian_* which uses the thin-layer face gradient,
        diffusion.cpp:253-300)."""
        from ..solver.linear import BlockJacobian
        nu = self.diffusivity

        # analytic 1x1 slot blocks of the thin-layer flux
        # F_ck = -nu (u_nbr - u_c)/dist (dr_unit . n) len  (slot orientation)
        fc = (-nu / mesh.slot_dist
              * (mesh.slot_dr_unit * mesh.slot_normal).sum(axis=-1)
              * mesh.slot_len)                           # (NC,4)
        L = -fc                                          # dF/du_c
        N = fc * mesh.nbr_mask                           # dF/du_nbr
        # Dirichlet boundary slots: ghost = 2b - u_c -> dF/du_c = -2 fc
        is_b = mesh.slot_bc_code >= 0
        L = jnp.where(is_b, -2.0 * fc, L)
        D = L.sum(axis=1)[:, None, None]
        D = D + (1.0 - mesh.cell_mask)[:, None, None]
        return BlockJacobian(D=D, N=N[..., None, None])
