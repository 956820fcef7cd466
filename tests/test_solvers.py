"""Solver infrastructure tests.

  - matrix-free (JVP) vs assembled-Jacobian implicit solves must take the
    SAME number of pseudo-time steps on a first-order problem where both
    operators are mathematically identical (reference
    tests/solvers/testmatrixfree.cpp:43-66)
  - mesh reordering must not change the residual (only permute it)
    (reference regr-MUSCL_LS_HLLC_LineOrdering golden test)
  - the solver must raise on NaN/inf residuals (reference
    tests/flowpseudotime.cpp PseudotimeFlow_exception_nanorinf)
  - GMRES solves a block system against dense reference
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fvens_tpu.config import (BCSpec, LinearSolverConfig,
                              NonlinearUpdateConfig, NumericsConfig,
                              PhysicsConfig, PseudoTimeConfig)
from fvens_tpu.fv.residual import FlowFV
from fvens_tpu.mesh import compile_mesh
from fvens_tpu.mesh.meshgen import cylinder_omesh
from fvens_tpu.mesh.ordering import apply_ordering, rcm_ordering, reorder_mesh
from fvens_tpu.physics import GasPhysics
from fvens_tpu.solver.steady import (NumericalError, SteadyBackwardEuler,
                                     ToleranceError)

BCS = [BCSpec(marker=2, type="slipwall"), BCSpec(marker=4, type="farfield")]


def make_space(order2=False, flux="ROE"):
    pcfg = PhysicsConfig(Minf=0.38, viscous=False)
    ncfg = NumericsConfig(flux=flux, gradient="NONE" if not order2
                          else "LEASTSQUARES",
                          reconstruction="NONE" if not order2 else "LINEAR",
                          order2=order2)
    phy = GasPhysics(g=pcfg.gamma, Minf=pcfg.Minf, Tinf=pcfg.Tinf,
                     Reinf=pcfg.Reinf, Pr=pcfg.Pr)
    return FlowFV(phy=phy, pcfg=pcfg, ncfg=ncfg)


def test_matrixfree_same_step_count():
    md = cylinder_omesh(24, 10)
    cm = compile_mesh(md, BCS)
    space = make_space(order2=False)
    pt = PseudoTimeConfig(cfl_init=50.0, cfl_fin=500.0, tol=1e-6, maxiter=200)
    nl = NonlinearUpdateConfig(scheme="full")

    steps = {}
    # assembled, exact-JVP matrix-free, and the reference's eps/||x||
    # finite-difference matrix-free shell (tests/solvers/testmatrixfree.cpp
    # gates on identical step counts; alinalg.cpp:143-233 for the FD form)
    for key, mf, fd in (("asm", False, False), ("jvp", True, False),
                        ("fd", True, True)):
        lin = LinearSolverConfig(restart=40, maxiter=40, rtol=1e-3,
                                 pc="bcsgs", pc_sweeps=1, matrix_free=mf,
                                 matrix_free_fd=fd)
        solver = SteadyBackwardEuler(space, pt, lin, nl)
        u0 = jnp.tile(space.uinf, (cm.NC, 1))
        u, info = solver.solve(cm, u0)
        steps[key] = info.steps
    assert steps["asm"] == steps["jvp"] == steps["fd"], (
        f"step counts differ: {steps}")


def test_reordering_permutes_residual():
    md = cylinder_omesh(24, 10)
    space = make_space(order2=True)

    cm = compile_mesh(md, BCS)
    rng = np.random.default_rng(3)
    pert = 1.0 + 0.05 * rng.standard_normal(cm.NC)
    u = jnp.asarray(np.tile(np.asarray(space.uinf), (cm.NC, 1))
                    * pert[:, None])
    rhs, _ = space.compute_residual(cm, u, False)

    perm = rcm_ordering(md)
    md2 = reorder_mesh(md, perm)
    cm2 = compile_mesh(md2, BCS)
    u2 = jnp.asarray(np.asarray(u)[: cm.n_cells][perm])
    # pad to cm2.NC
    u2 = jnp.concatenate([u2, jnp.tile(space.uinf, (cm2.NC - cm2.n_cells, 1))])
    rhs2, _ = space.compute_residual(cm2, u2, False)

    np.testing.assert_allclose(np.asarray(rhs2)[: cm2.n_cells],
                               np.asarray(rhs)[: cm.n_cells][perm],
                               rtol=1e-11, atol=1e-13)


def test_line_ordering_runs():
    md = cylinder_omesh(16, 8)
    md2 = apply_ordering(md, "line_rcm")
    assert md2.nelem == md.nelem
    cm = compile_mesh(md2, BCS)
    assert cm.n_cells == md.nelem


def test_nan_residual_raises():
    """A wildly unstable configuration must raise, not silently diverge
    (reference PseudotimeFlow_exception_nanorinf)."""
    md = cylinder_omesh(16, 8)
    cm = compile_mesh(md, BCS)
    space = make_space(order2=False)
    from fvens_tpu.solver.steady import SteadyForwardEuler
    solver = SteadyForwardEuler(
        space, PseudoTimeConfig(cfl_init=1e4, cfl_fin=1e4, tol=1e-12,
                                maxiter=500))
    u0 = jnp.tile(space.uinf, (cm.NC, 1))
    with pytest.raises((NumericalError, ToleranceError)):
        solver.solve(cm, u0)


def test_gmres_against_dense_solve():
    rng = np.random.default_rng(0)
    n, v = 24, 4
    A = np.eye(n * v) * 4.0 + 0.3 * rng.standard_normal((n * v, n * v))
    b = rng.standard_normal((n, v))
    from fvens_tpu.solver.linear import gmres
    Aj = jnp.asarray(A)
    bj = jnp.asarray(b)
    mv = lambda x: (Aj @ x.reshape(-1)).reshape(n, v)
    x, iters, rel = gmres(mv, bj, jnp.zeros_like(bj), lambda z: z,
                          restart=60, maxiter=60, rtol=1e-12)
    xd = np.linalg.solve(A, b.reshape(-1)).reshape(n, v)
    np.testing.assert_allclose(np.asarray(x), xd, rtol=1e-8, atol=1e-9)


def test_chunked_device_stepping_matches_single_step():
    """device_steps>1 runs the CFL ramp + forcing controller inside the
    jitted program (lax.scan); the trajectory must match the single-step
    host loop at the trajectory level (inexact Krylov solves make bitwise
    equality across different XLA fusions impossible)."""
    from fvens_tpu.solver.steady import SteadyBackwardEuler

    md = cylinder_omesh(32, 12)
    cm = compile_mesh(md, BCS, dtype=jnp.float64)
    space = make_space(order2=True)
    u0 = jnp.tile(space.uinf, (cm.NC, 1)).astype(jnp.float64)

    def solve(K):
        lin = LinearSolverConfig(restart=40, maxiter=40, rtol=1e-2,
                                 pc="bsgs", pc_sweeps=4)
        pt = PseudoTimeConfig(cfl_init=50.0, cfl_fin=2000.0, tol=1e-8,
                              maxiter=200, device_steps=K)
        be = SteadyBackwardEuler(space, pt, lin,
                                 NonlinearUpdateConfig("full"))
        return be.solve(cm, u0)

    u1, i1 = solve(1)
    u8, i8 = solve(8)
    assert i1.converged and i8.converged
    assert abs(i1.steps - i8.steps) <= max(5, 0.2 * i1.steps)
    assert float(jnp.abs(u1 - u8).max()) < 1e-5
    # history is recorded per step in both modes
    assert len(i8.history) == i8.steps
