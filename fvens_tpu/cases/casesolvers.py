"""Embeddable steady flow case drivers.

Equivalent of the reference case API (FVENS src/utilities/casesolvers.cpp):
free-stream initialization, the first-order low-tolerance STARTER solve
(:225-314, tolerance failures swallowed) followed by the second-order MAIN
solve (:316-386), and the output functionals (entropy + CL/CDp/CDsf).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..config import FlowCaseConfig, NumericsConfig
from ..fv.residual import FlowFV
from ..mesh.device_mesh import CompiledMesh, compile_mesh
from ..mesh.reader import read_mesh
from ..output import FlowSolutionFunctionals, entropy_error, surface_data
from ..physics.gas import GasPhysics
from ..solver.steady import (SolveInfo, SteadyBackwardEuler,
                             SteadyForwardEuler, ToleranceError)


def build_space(cfg: FlowCaseConfig, order2: bool | None = None) -> FlowFV:
    p = cfg.physics
    phy = GasPhysics(g=p.gamma, Minf=p.Minf, Tinf=p.Tinf, Reinf=p.Reinf,
                     Pr=p.Pr)
    ncfg = cfg.numerics
    if order2 is not None and order2 != ncfg.order2:
        ncfg = dataclasses.replace(ncfg, order2=order2)
    if not ncfg.order2:
        # the starter forces first order: no gradients, no reconstruction
        # (controlparser.cpp:234-246 firstorder_spatial_numerics_config)
        ncfg = dataclasses.replace(ncfg, gradient="NONE",
                                   reconstruction="NONE")
    return FlowFV(phy=phy, pcfg=p, ncfg=ncfg)


def initial_state(space: FlowFV, mesh: CompiledMesh):
    """Uniform free-stream initialization (casesolvers.cpp:52-69)."""
    return jnp.tile(space.uinf.astype(mesh.dtype), (mesh.NC, 1))


def load_case_mesh(cfg: FlowCaseConfig, mesh_file: str | None = None,
                   dtype=jnp.float64) -> CompiledMesh:
    md = read_mesh(mesh_file or cfg.mesh_file)
    return compile_mesh(md, cfg.bcs, dtype=dtype)


@dataclasses.dataclass
class SteadyFlowCase:
    """Starter (first-order, loose tol) -> main (second-order) solve."""
    cfg: FlowCaseConfig

    def _make_solver(self, space, pt, checkpoint: bool = False):
        if pt.stepping == "explicit":
            return SteadyForwardEuler(space, pt)
        return SteadyBackwardEuler(
            space, pt, self.cfg.linear, self.cfg.nl_update,
            checkpoint_path=(self.cfg.checkpoint_path or None) if checkpoint
            else None,
            checkpoint_every=self.cfg.checkpoint_every)

    def execute_starter(self, mesh, u, log_every: int = 0):
        """First-order startup; tolerance failures are swallowed
        (casesolvers.cpp:294-299)."""
        space1 = build_space(self.cfg, order2=False)
        solver = self._make_solver(space1, self.cfg.init)
        try:
            u, info = solver.solve(mesh, u, log_every=log_every)
        except ToleranceError:
            pass
        return u

    def execute_main(self, mesh, u, log_every: int = 0):
        space = build_space(self.cfg)
        solver = self._make_solver(space, self.cfg.main, checkpoint=True)
        return solver.solve(mesh, u, log_every=log_every)

    def solve(self, mesh, u=None, log_every: int = 0):
        space = build_space(self.cfg)
        if u is None:
            u = initial_state(space, mesh)
        if self.cfg.use_starter and self.cfg.numerics.order2:
            u = self.execute_starter(mesh, u, log_every=log_every)
        return self.execute_main(mesh, u, log_every=log_every)

    def run_output(self, mesh, u=None, log_every: int = 0
                   ) -> tuple[jnp.ndarray, SolveInfo, FlowSolutionFunctionals]:
        """Solve and compute output functionals (casesolvers.cpp:75-164)."""
        u, info = self.solve(mesh, u, log_every=log_every)
        space = build_space(self.cfg)
        ent = entropy_error(space, mesh, u)
        CL = CDp = CDsf = 0.0
        if self.cfg.wall_markers:
            _, (CL, CDp, CDsf) = surface_data(space, mesh, u,
                                              self.cfg.wall_markers)
        fnls = FlowSolutionFunctionals(mesh_size=mesh.h_param, entropy=ent,
                                       CL=CL, CDp=CDp, CDsf=CDsf)
        return u, info, fnls
