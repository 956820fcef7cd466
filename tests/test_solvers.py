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


def test_gmres_dr_against_dense_solve():
    """GCRO-DR (solver/linear.py:gmres_dr) must solve to the same answer as
    a dense solve, both on the first call (no recycle space: plain projected
    Arnoldi + harvest) and on a second call reusing the harvested space."""
    rng = np.random.default_rng(1)
    n, v, k = 24, 4, 6
    A = np.eye(n * v) * 4.0 + 0.3 * rng.standard_normal((n * v, n * v))
    b = rng.standard_normal((n, v))
    from fvens_tpu.solver.linear import gmres_dr
    Aj = jnp.asarray(A)
    mv = lambda x: (Aj @ x.reshape(-1)).reshape(n, v)
    ident = lambda z: z

    bj = jnp.asarray(b)
    x, iters, rel, U = gmres_dr(mv, bj, jnp.zeros_like(bj), ident, U=None,
                                k=k, restart=60, maxiter=60, rtol=1e-12)
    xd = np.linalg.solve(A, b.reshape(-1)).reshape(n, v)
    np.testing.assert_allclose(np.asarray(x), xd, rtol=1e-8, atol=1e-9)
    assert U.shape == (k, n, v)

    b2 = jnp.asarray(rng.standard_normal((n, v)))
    x2, it2, rel2, U2 = gmres_dr(mv, b2, jnp.zeros_like(b2), ident, U=U,
                                 k=k, restart=60, maxiter=60, rtol=1e-12)
    xd2 = np.linalg.solve(A, np.asarray(b2).reshape(-1)).reshape(n, v)
    np.testing.assert_allclose(np.asarray(x2), xd2, rtol=1e-7, atol=1e-8)


def test_gmres_dr_recycling_cuts_iterations():
    """On a sequence of slowly varying systems (the GCRO-DR use case), the
    recycled deflation space must reduce Krylov iterations vs cold GMRES.
    Ill-conditioned model problem: a few isolated small eigenvalues (the
    'slow directions' recycling is designed to capture)."""
    rng = np.random.default_rng(2)
    n = 96
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    evals = np.linspace(1.0, 2.0, n)
    evals[:4] = [1e-3, 2e-3, 3e-3, 4e-3]     # slow modes
    from fvens_tpu.solver.linear import gmres, gmres_dr
    ident = lambda z: z
    k, m = 6, 20

    U = None
    cold_total, defl_total = 0, 0
    for s in range(4):
        A = Q @ np.diag(evals * (1.0 + 0.01 * s)) @ Q.T
        Aj = jnp.asarray(A)
        mv = lambda x: Aj @ x
        b = jnp.asarray(rng.standard_normal(n))
        _, it_cold, rel_c = gmres(mv, b, jnp.zeros_like(b), ident,
                                  restart=m, maxiter=5 * m, rtol=1e-8)
        _, it_dr, rel_d, U = gmres_dr(mv, b, jnp.zeros_like(b), ident, U=U,
                                      k=k, restart=m, maxiter=5 * m,
                                      rtol=1e-8)
        assert float(rel_c) < 1e-7 and float(rel_d) < 1e-7
        if s > 0:                      # first call has nothing to recycle
            cold_total += int(it_cold)
            defl_total += int(it_dr)
    assert defl_total < 0.75 * cold_total, (defl_total, cold_total)


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


def test_pipelined_stepping_matches_single_step():
    """cfg.pipeline dispatches step k+1 before fetching step k's scalars,
    with the controller as a tiny device program. The step program is
    byte-identical to the single-step path and the controller arithmetic
    is the same function (controller_advance), so the trajectory must
    match step-for-step; only ulp-level drift from the device pow in the
    CFL ramp is tolerated."""
    from fvens_tpu.solver.steady import SteadyBackwardEuler

    md = cylinder_omesh(32, 12)
    cm = compile_mesh(md, BCS, dtype=jnp.float64)
    space = make_space(order2=True)
    u0 = jnp.tile(space.uinf, (cm.NC, 1)).astype(jnp.float64)

    def solve(pipe):
        lin = LinearSolverConfig(restart=40, maxiter=40, rtol=1e-2,
                                 pc="bsgs", pc_sweeps=4)
        pt = PseudoTimeConfig(cfl_init=50.0, cfl_fin=2000.0, tol=1e-8,
                              maxiter=200, pipeline=pipe)
        be = SteadyBackwardEuler(space, pt, lin,
                                 NonlinearUpdateConfig("full"))
        return be.solve(cm, u0)

    u1, i1 = solve(False)
    u2, i2 = solve(True)
    assert i1.converged and i2.converged
    assert i1.steps == i2.steps
    assert i1.total_lin_iters == i2.total_lin_iters
    assert float(jnp.abs(u1 - u2).max()) < 1e-10
    # history is recorded per committed step with the step's actual CFL
    assert len(i2.history) == i2.steps
    c1 = np.array([h[3] for h in i1.history])
    c2 = np.array([h[3] for h in i2.history])
    np.testing.assert_allclose(c1, c2, rtol=1e-6)


def _bench_like_jacobian(nbig=24, nsm=10):
    """A real implicit-step Jacobian on a small cylinder mesh."""
    from fvens_tpu.solver import jacobian as jacmod
    md = cylinder_omesh(nbig, nsm)
    cm = compile_mesh(md, BCS)
    space = make_space(order2=False)
    u = jnp.tile(space.uinf, (cm.NC, 1))
    rhs, dt = space.compute_residual(cm, u, True)
    jac = jacmod.assemble_jacobian(space, cm, u)
    jac = jacmod.add_pseudotime_term(cm, jac, 50.0, dt)
    return cm, jac, rhs


def _dense_from_slots(cm, D, N):
    """Dense (NC*V, NC*V) matrix from slot-block storage (tests only)."""
    NC, V = D.shape[0], D.shape[-1]
    nbrs = np.asarray(cm.cell_nbrs)
    mask = np.asarray(cm.nbr_mask) > 0
    A = np.zeros((NC * V, NC * V))
    Dn, Nn = np.asarray(D), np.asarray(N)
    for c in range(NC):
        A[c * V:(c + 1) * V, c * V:(c + 1) * V] = Dn[c]
        for k in range(nbrs.shape[1]):
            if mask[c, k]:
                j = nbrs[c, k]
                A[c * V:(c + 1) * V, j * V:(j + 1) * V] += Nn[c, k]
    return A


def test_ilu0_exact_fixed_point():
    """With enough Chow-Patel sweeps the fixed point IS the exact block
    ILU0: (L U) must equal A on the sparsity pattern (the ILU0 defining
    property; the reference's BLASTed factorization satisfies it exactly
    in its synchronous limit)."""
    from fvens_tpu.solver.ilu import ilu_factorize, ilu_structure
    cm, jac, _ = _bench_like_jacobian()
    st = ilu_structure(cm)
    L, Ud, Udinv, Us = ilu_factorize(cm, jac, st, sweeps=80)

    NC, V = jac.D.shape[0], jac.D.shape[-1]
    A = _dense_from_slots(cm, jac.D, jac.N)
    Ld = _dense_from_slots(cm, np.zeros_like(np.asarray(jac.D)), L) \
        + np.eye(NC * V)
    Uden = _dense_from_slots(cm, Ud, Us)
    M = Ld @ Uden
    # compare ON the pattern only (off-pattern fill is the "incomplete")
    nbrs = np.asarray(cm.cell_nbrs)
    mask = np.asarray(cm.nbr_mask) > 0
    scale = np.abs(np.asarray(jac.D)).max()
    for c in range(cm.n_cells):
        np.testing.assert_allclose(
            M[c * V:(c + 1) * V, c * V:(c + 1) * V],
            A[c * V:(c + 1) * V, c * V:(c + 1) * V],
            atol=1e-9 * scale)
        for k in range(nbrs.shape[1]):
            if mask[c, k]:
                j = nbrs[c, k]
                np.testing.assert_allclose(
                    M[c * V:(c + 1) * V, j * V:(j + 1) * V],
                    A[c * V:(c + 1) * V, j * V:(j + 1) * V],
                    atol=1e-9 * scale)


def test_ilu0_apply_matches_dense_triangular_solve():
    """With many truncated-Neumann sweeps the ILU0 application must match
    the exact (dense) solve with the factored M = L U."""
    from fvens_tpu.solver.ilu import (ilu_factorize, ilu_structure,
                                      make_ilu_apply)
    cm, jac, rhs = _bench_like_jacobian()
    st = ilu_structure(cm)
    L, Ud, Udinv, Us = ilu_factorize(cm, jac, st, sweeps=80)
    pc = make_ilu_apply(cm, L, Udinv, Us, sweeps=120)
    z = np.asarray(pc(rhs))

    NC, V = jac.D.shape[0], jac.D.shape[-1]
    Ld = _dense_from_slots(cm, np.zeros_like(np.asarray(jac.D)), L) \
        + np.eye(NC * V)
    Uden = _dense_from_slots(cm, Ud, Us)
    zd = np.linalg.solve(Ld @ Uden,
                         np.asarray(rhs).reshape(-1)).reshape(NC, V)
    np.testing.assert_allclose(z, zd, rtol=1e-6, atol=1e-8)


def test_ilu0_preconditioned_solve_converges():
    """Full implicit solve with pc='ilu0' (Chow-Patel sweeps at practical
    counts) reaches the same converged state as the bsgs solve.

    Measured (docs/BENCH_NOTES.md round 3): on these Jacobians even the
    EXACT ILU0 is weaker per Krylov iteration than the degree-6
    block-Jacobi Neumann polynomial, so the gate here is correctness and
    a bounded iteration overhead, not superiority."""
    md = cylinder_omesh(24, 10)
    cm = compile_mesh(md, BCS)
    space = make_space(order2=False)
    pt = PseudoTimeConfig(cfl_init=50.0, cfl_fin=500.0, tol=1e-6,
                          maxiter=200)
    nl = NonlinearUpdateConfig(scheme="full")
    u0 = jnp.tile(space.uinf, (cm.NC, 1))

    results = {}
    for pc, sweeps in (("bsgs", 4), ("ilu0", 3)):
        lin = LinearSolverConfig(restart=40, maxiter=40, rtol=1e-3,
                                 pc=pc, pc_sweeps=sweeps)
        solver = SteadyBackwardEuler(space, pt, lin, nl)
        u, info = solver.solve(cm, u0)
        assert info.converged
        results[pc] = (np.asarray(u), info.total_lin_iters)
    np.testing.assert_allclose(results["ilu0"][0], results["bsgs"][0],
                               rtol=1e-5, atol=1e-8)
    assert results["ilu0"][1] <= 2 * results["bsgs"][1], results
