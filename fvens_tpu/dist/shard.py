"""Multi-chip SPMD execution of the flow solver via jax.shard_map.

The reference's MPI layer (ghosted PETSc Vecs + L2TraceVector Isend/Irecv +
MPI_Allreduce, SURVEY.md sec 2.9) maps to:

  forward halo INSERT  -> all_gather of packed boundary-cell buffers over ICI
                          + static gather into local halo slots
  reverse halo ADD     -> unnecessary: cross-partition faces are computed
                          redundantly by both owners (like the reference's
                          connectivity faces, flow_spatial.cpp:499-502)
  MPI_Allreduce norms  -> jax.lax.psum

State u is (D, NC_local, V) sharded on the leading device axis; each device
runs the SAME single-mesh kernels on its local slab.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .partition import ShardedMeshBundle

AXIS = "mesh_x"


def halo_exchange(bundle_local, field, axis=AXIS):
    """Fill halo cell slots of `field` (NC_local, V) from remote owners.

    bundle_local: the per-device slice of (send_idx, halo_slots, halo_src).
    """
    send_idx, halo_slots, halo_src = bundle_local
    buf = field[send_idx]                               # (max_send, V)
    allbuf = jax.lax.all_gather(buf, axis)              # (D, max_send, V)
    flat = allbuf.reshape((-1,) + field.shape[1:])
    return field.at[halo_slots].set(flat[halo_src])


@dataclasses.dataclass
class ShardedFlow:
    """Distributed-flow executor over a 1-D jax device mesh.

    space: a FlowFV built for the case (single-mesh functions reused as-is).
    """
    space: object
    bundle: ShardedMeshBundle
    devices: list

    def __post_init__(self):
        self.jmesh = Mesh(self.devices, (AXIS,))
        self.n_parts = self.bundle.n_parts

    # ---- sharded primitives ------------------------------------------------
    def _local_residual(self, mesh_loc, exch, u_loc, gettimesteps=True):
        """One device's residual with halo exchanges threaded in."""
        u_loc = halo_exchange(exch, u_loc)
        space = self.space
        if space.ncfg.order2:
            # exchange gradients too (reference VecGhostUpdate on gradvec,
            # flow_spatial.cpp:710-717/725-729). We recompute the pipeline
            # with an exchanged-gradient hook rather than reusing
            # space.face_states, to keep the single-chip path hook-free.
            from ..fv import bcs as bcmod
            from ..fv.reconstruction import get_reconstruction
            phy = space.phy
            nb = mesh_loc.n_bfaces
            ug_cell = bcmod.compute_ghost_states(phy, mesh_loc, u_loc,
                                                 space.uinf)
            up = phy.primitive_from_conserved(u_loc)
            ugp = phy.primitive_from_conserved(ug_cell)
            grads = space.gradients(mesh_loc, up, ugp)
            grads = halo_exchange(exch, grads)
            recon = get_reconstruction(
                space.ncfg.reconstruction
                if space.ncfg.reconstruction != "NONE" else "LINEAR")
            wL, wR = recon(mesh_loc, up, ugp, grads, space.ncfg.limiter_param)
            uL = phy.conserved_from_primitive(wL)
            uR = phy.conserved_from_primitive(wR)
            ug_flux = bcmod.ghost_state(
                phy, uL[:nb], mesh_loc.f_normal[:nb], mesh_loc.bc_code,
                mesh_loc.bc_v0, mesh_loc.bc_v1, space.uinf,
                u_partner=u_loc[mesh_loc.f_right[:nb]])
            uR = uR.at[:nb].set(ug_flux)

            flux = space._inviscid_face_flux(uL, uR, mesh_loc.f_normal)
            if space.pcfg.viscous:
                from ..fv.viscous import (modified_average_gradient,
                                          prim2_states_and_gradients,
                                          viscous_face_flux)
                ucl = u_loc[mesh_loc.f_left]
                ucr = u_loc[mesh_loc.f_right].at[:nb].set(ug_cell)
                gl = grads[mesh_loc.f_left]
                gr_ = grads[mesh_loc.f_right].at[:nb].set(
                    grads[mesh_loc.f_left[:nb]])
                wtl, wtr, gtl, gtr = prim2_states_and_gradients(
                    phy, ucl, ucr, gl, gr_, True)
                fgrad = modified_average_gradient(
                    mesh_loc.f_dr_unit, mesh_loc.f_dist, wtl, wtr, gtl, gtr)
                flux = flux + viscous_face_flux(
                    phy, mesh_loc.f_normal, fgrad, uL, uR,
                    space.pcfg.const_visc)
            fluxlen = flux * mesh_loc.f_len[:, None]
            g = fluxlen[mesh_loc.cell_faces]
            rhs = -(mesh_loc.cell_fsign[..., None] * g).sum(axis=1)
            rhs = rhs * mesh_loc.cell_mask[:, None]
            dt = space.compute_timesteps(mesh_loc, uL, uR) \
                if gettimesteps else None
            return u_loc, rhs, dt
        else:
            rhs, dt = space.compute_residual(mesh_loc, u_loc, gettimesteps)
            return u_loc, rhs, dt

    def residual(self, u):
        """Global sharded residual: u (D, NC_local, V)."""
        b = self.bundle

        def body(mesh_st, si, hs, hsrc, u_loc):
            mesh_loc = jax.tree_util.tree_map(lambda x: x[0], mesh_st)
            _, rhs, dt = self._local_residual(
                mesh_loc, (si[0], hs[0], hsrc[0]), u_loc[0])
            return rhs[None], dt[None]

        return jax.shard_map(
            body, mesh=self.jmesh,
            in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
            out_specs=(P(AXIS), P(AXIS)),
        )(b.mesh, b.send_idx, b.halo_slots, b.halo_src, u)

    def fe_step_fn(self, cfl: float):
        """Jittable explicit forward-Euler step over the device mesh:
        returns (u', global residual norm)."""
        b = self.bundle

        def body(mesh_st, si, hs, hsrc, u_loc):
            mesh_loc = jax.tree_util.tree_map(lambda x: x[0], mesh_st)
            exch = (si[0], hs[0], hsrc[0])
            u1, rhs, dt = self._local_residual(mesh_loc, exch, u_loc[0])
            unew = u1 + (cfl * dt * mesh_loc.inv_area)[:, None] * rhs
            r = rhs[:, -1]
            loc = ((r * r) * mesh_loc.area * mesh_loc.cell_mask).sum()
            res = jnp.sqrt(jax.lax.psum(loc, AXIS))
            return unew[None], res

        def step(u):
            return jax.shard_map(
                body, mesh=self.jmesh,
                in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
                out_specs=(P(AXIS), P()),
            )(b.mesh, b.send_idx, b.halo_slots, b.halo_src, u)

        return jax.jit(step)


    # ---- distributed implicit (backward Euler) step -------------------------
    def be_step_fn(self, lin=None, nl=None):
        """Jittable distributed implicit pseudo-time step.

        Structure mirrors the single-chip SteadyBackwardEuler._step with the
        reference's parallel layout (PETSc bjacobi: Schwarz across ranks,
        strong smoother within): per shard local Jacobian + multicolor SGS
        preconditioner with zero halo coupling; the GMRES matvec halo-
        exchanges the Krylov vector every application; dot products psum.
        Returns step(u, cfl, rtol) -> (u', global res norm, lin iters).
        """
        from ..config import LinearSolverConfig, NonlinearUpdateConfig
        from ..solver import jacobian as jacmod
        from ..solver.linear import (bsr_matvec, gmres, make_preconditioner)
        from ..solver.relaxation import get_update_scheme
        from ..solver.steady import residual_norm
        lin = lin or LinearSolverConfig()
        nl = nl or NonlinearUpdateConfig()
        b = self.bundle
        space = self.space

        def body(mesh_st, si, hs, hsrc, u_sh, cfl, rtol):
            mesh_loc = jax.tree_util.tree_map(lambda x: x[0], mesh_st)
            exch = (si[0], hs[0], hsrc[0])
            mask = mesh_loc.cell_mask[:, None]

            u_loc, rhs, dt = self._local_residual(mesh_loc, exch, u_sh[0])
            jac = space.assemble_jacobian(mesh_loc, u_loc)
            jac = jacmod.add_pseudotime_term(mesh_loc, jac, cfl, dt)

            # shard-local preconditioner (additive Schwarz, no halo coupling)
            pc = make_preconditioner(mesh_loc, jac, lin.pc, lin.pc_sweeps)

            def matvec(x):
                xh = halo_exchange(exch, x)
                return bsr_matvec(mesh_loc, jac, xh) * mask

            du, iters, relres = gmres(
                matvec, rhs * mask, jnp.zeros_like(rhs),
                lambda v: pc(v) * mask,
                restart=lin.restart, maxiter=lin.maxiter, rtol=rtol,
                axis_name=AXIS)

            omega = get_update_scheme(nl.scheme)(
                getattr(space, "phy", None), u_loc, du, nl.min_factor)
            unew = u_loc + omega[:, None] * du * mask

            loc = ((rhs[:, -1] ** 2) * mesh_loc.area * mesh_loc.cell_mask).sum()
            res = jnp.sqrt(jax.lax.psum(loc, AXIS))
            ok = (jnp.isfinite(rhs).all() & jnp.isfinite(unew).all()
                  & jnp.isfinite(relres))
            ok = jax.lax.pmin(jnp.where(ok, 1, 0), AXIS) > 0
            res = jnp.where(ok, res, jnp.nan)
            return unew[None], res, iters

        def step(u, cfl, rtol):
            return jax.shard_map(
                body, mesh=self.jmesh,
                in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                          P(), P()),
                out_specs=(P(AXIS), P(), P()),
            )(b.mesh, b.send_idx, b.halo_slots, b.halo_src, u,
              jnp.asarray(cfl), jnp.asarray(rtol))

        return jax.jit(step)

    def solve_implicit(self, cfg, lin=None, nl=None, u=None,
                       log_every: int = 0):
        """Distributed steady implicit solve (host-side CFL/forcing control,
        device-side distributed steps). cfg: PseudoTimeConfig."""
        import numpy as np
        from ..solver.steady import (NumericalError, SolveInfo,
                                     ToleranceError, exp_residual_ramp)
        step = self.be_step_fn(lin=lin, nl=nl)
        if u is None:
            u = self.initial_state()
        info = SolveInfo()
        res = resold = initres = 1.0
        cfl = cfg.cfl_init
        stepn = 0
        while stepn < cfg.maxiter:
            if stepn > 0:
                cfl = exp_residual_ramp(cfg.cfl_init, cfg.cfl_fin, cfl,
                                        resold / res, 0.25, 0.3)
            u, resj, iters = step(u, cfl, 0.1)
            resold = res
            res = float(resj)
            info.total_lin_iters += int(iters)
            if not np.isfinite(res):
                raise NumericalError("distributed implicit solve diverged")
            if stepn == 0:
                initres = res
                resold = res
            stepn += 1
            if log_every and (stepn - 1) % log_every == 0:
                print(f"  dBE step {stepn}: relres {res/initres:.3e}")
            if res / initres <= cfg.tol:
                break
        info.steps = stepn
        info.initres = initres
        info.finalres = res
        info.converged = res / initres <= cfg.tol
        if not info.converged:
            raise ToleranceError("distributed implicit solve did not converge")
        return u, info

    def initial_state(self):
        u0 = jnp.tile(self.space.uinf.astype(self.bundle.mesh.dtype),
                      (self.n_parts, self.bundle.mesh.NC, 1))
        return jax.device_put(
            u0, jax.sharding.NamedSharding(self.jmesh, P(AXIS)))

    def gather_solution(self, u):
        """(D, NC_local, V) -> (n_cells_global, V) in global cell order."""
        import numpy as np
        b = self.bundle
        out = np.zeros((b.n_cells_global, u.shape[-1]))
        u_np = np.asarray(u)
        gid = np.asarray(b.own_gid)
        for p in range(b.n_parts):
            n_own = int(b.own_counts[p])
            out[gid[p, :n_own]] = u_np[p, :n_own]
        return out
