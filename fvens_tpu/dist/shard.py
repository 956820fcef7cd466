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
    """Fill halo cell slots of `field` (NC_local, ...) from remote owners
    via R rounds of neighbour ppermute (each round a partial permutation
    over the device axis; see partition._neighbor_schedule). Per-device
    traffic is O(local partition boundary), not O(D).

    bundle_local: (pp_send, pp_recv) per-device slices + static pp_perms.
    """
    pp_send, pp_recv, perms = bundle_local
    for r, perm in enumerate(perms):
        if not perm:
            continue
        buf = field[pp_send[r]]                     # (max_pair, ...)
        rbuf = jax.lax.ppermute(buf, axis, perm)
        field = field.at[pp_recv[r]].set(rbuf, mode="drop")
    return field


def halo_exchange_allgather(bundle_local, field, axis=AXIS):
    """All-gather halo variant (kept for A/B validation of the ppermute
    schedule and as a fallback): every device receives every other's packed
    send buffer."""
    send_idx, halo_slots, halo_src = bundle_local
    buf = field[send_idx]                               # (max_send, V)
    allbuf = jax.lax.all_gather(buf, axis)              # (D, max_send, V)
    flat = allbuf.reshape((-1,) + field.shape[1:])
    # pad slots are NC_local (out of bounds): dropped, not written
    return field.at[halo_slots].set(flat[halo_src], mode="drop")


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
        """One device's residual = the single-chip pipeline with the halo
        hook threaded in (FlowFV.compute_residual(exchange=...)): u is
        exchanged up front, gradients are re-exchanged inside face_states
        (the reference's VecGhostUpdate on gradvec,
        flow_spatial.cpp:710-729)."""
        u_loc = halo_exchange(exch, u_loc)
        ex = partial(halo_exchange, exch)
        rhs, dt = self.space.compute_residual(
            mesh_loc, u_loc, gettimesteps, exchange=ex)
        return u_loc, rhs, dt

    def _exch(self, pps, ppr):
        """Per-device exchange context from shard_map operands (leading
        device axis already sliced to 1)."""
        return (pps[0], ppr[0], self.bundle.pp_perms)

    def residual(self, u):
        """Global sharded residual: u (D, NC_local, V)."""
        b = self.bundle

        def body(mesh_st, pps, ppr, u_loc):
            mesh_loc = jax.tree_util.tree_map(lambda x: x[0], mesh_st)
            _, rhs, dt = self._local_residual(
                mesh_loc, self._exch(pps, ppr), u_loc[0])
            return rhs[None], dt[None]

        return jax.shard_map(
            body, mesh=self.jmesh,
            in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
            out_specs=(P(AXIS), P(AXIS)),
        )(b.mesh, b.pp_send, b.pp_recv, u)

    def fe_step_fn(self, cfl: float):
        """Jittable explicit forward-Euler step over the device mesh:
        returns (u', global residual norm)."""
        b = self.bundle

        def body(mesh_st, pps, ppr, u_loc):
            mesh_loc = jax.tree_util.tree_map(lambda x: x[0], mesh_st)
            exch = self._exch(pps, ppr)
            u1, rhs, dt = self._local_residual(mesh_loc, exch, u_loc[0])
            unew = u1 + (cfl * dt * mesh_loc.inv_area)[:, None] * rhs
            r = rhs[:, -1]
            loc = ((r * r) * mesh_loc.area * mesh_loc.cell_mask).sum()
            res = jnp.sqrt(jax.lax.psum(loc, AXIS))
            return unew[None], res

        def step(u):
            return jax.shard_map(
                body, mesh=self.jmesh,
                in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
                out_specs=(P(AXIS), P()),
            )(b.mesh, b.pp_send, b.pp_recv, u)

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
        from ..solver.linear import (gmres, make_bsr_matvec,
                                     make_preconditioner)
        from ..solver.relaxation import get_update_scheme
        from ..solver.steady import residual_norm
        lin = lin or LinearSolverConfig()
        nl = nl or NonlinearUpdateConfig()
        b = self.bundle
        space = self.space

        def body(mesh_st, pps, ppr, u_sh, cfl, rtol):
            mesh_loc = jax.tree_util.tree_map(lambda x: x[0], mesh_st)
            exch = self._exch(pps, ppr)
            mask = mesh_loc.cell_mask[:, None]

            u_loc, rhs, dt = self._local_residual(mesh_loc, exch, u_sh[0])
            jac = space.assemble_jacobian(mesh_loc, u_loc)
            jac = jacmod.add_pseudotime_term(mesh_loc, jac, cfl, dt)

            # shard-local preconditioner (additive Schwarz, no halo coupling)
            pc = make_preconditioner(mesh_loc, jac, lin.pc, lin.pc_sweeps)

            mv_loc = make_bsr_matvec(mesh_loc, jac)  # fused operand, built
            #                                          once per Newton step

            def matvec(x):
                xh = halo_exchange(exch, x)
                return mv_loc(xh) * mask

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
                in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P()),
                out_specs=(P(AXIS), P(), P()),
            )(b.mesh, b.pp_send, b.pp_recv, u,
              jnp.asarray(cfl), jnp.asarray(rtol))

        return jax.jit(step)

    def solve_implicit(self, cfg, lin=None, nl=None, u=None,
                       log_every: int = 0, logger=None):
        """Distributed steady implicit solve (host-side CFL/forcing control,
        device-side distributed steps). cfg: PseudoTimeConfig."""
        import numpy as np
        from ..config import LinearSolverConfig
        from ..solver.steady import (NumericalError, SolveInfo,
                                     ToleranceError, exp_residual_ramp)
        lin = lin or LinearSolverConfig()
        step = self.be_step_fn(lin=lin, nl=nl)
        if u is None:
            u = self.initial_state()
        if logger is None and log_every:
            from ..io_config.logs import ConvergenceLogger
            logger = ConvergenceLogger(print_every=log_every, label="dBE")
        info = SolveInfo()
        res = resold = initres = 1.0
        cfl = cfg.cfl_init
        rtol = 0.1 if lin.rtol_adapt else lin.rtol
        stepn = 0
        while stepn < cfg.maxiter:
            if stepn > 0:
                cfl = exp_residual_ramp(cfg.cfl_init, cfg.cfl_fin, cfl,
                                        resold / res, 0.25, 0.3)
                if lin.rtol_adapt:
                    ratio = res / resold
                    if ratio > 1.2:
                        rtol = min(rtol * 2.0, lin.rtol_max)
                    elif ratio <= 1.0:
                        rtol = max(rtol * 0.3, lin.rtol)
            u, resj, iters = step(u, cfl, rtol)
            resold = res
            res = float(resj)
            info.total_lin_iters += int(iters)
            if not np.isfinite(res):
                raise NumericalError("distributed implicit solve diverged")
            if stepn == 0:
                initres = res
                resold = res
            stepn += 1
            info.history.append((stepn, res / initres, res, cfl))
            if logger:
                logger.log(stepn, res / initres, res,
                           lin_iters=int(iters), cfl=cfl)
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
