"""Benchmark entry point (run by the driver on real TPU hardware).

Measures the BASELINE.json driver metric: WALL-CLOCK TO A 1e-10 STEADY
RESIDUAL on the laminar viscous NACA0012 case (Roe + weighted least squares,
implicit backward Euler; testcases/visc-naca0012/laminar-implicit.ctrl), on
one chip. Prints ONE JSON line:

  {"metric": "wallclock_to_1e-10_visc_naca0012", "value": S, "unit": "s",
   "vs_baseline": R, ...}

The solve cascades precision the TPU-native way: an f32-Jacobian/Krylov
"mixed" phase does the continuation work at f32 speed (f64 residual + update
throughout, LinearSolverConfig.mixed_precision), and a short full-f64 phase
finishes the last orders to 1e-10 (vs the FIRST phase's initial residual).

vs_baseline: (CPU_BASELINE_WALL / 10) / measured, i.e. 1.0 == exactly the
10x-single-socket-CPU bar. FVENS publishes no absolute numbers (SURVEY.md
sec 6, BASELINE.md), so the stand-in is this framework's own single-host CPU
f64 run of the same solve (860 s, docs/BENCH_NOTES.md) — an imperfect proxy:
a native C++ FVENS with OpenMP+ILU0 could be faster than our JAX-CPU
backend, so treat the ratio as an upper bound on the true FVENS ratio.

Compile time is excluded (warmup solves trigger compilation first; the
persistent compilation cache makes reruns cheap): the C++ reference is also
timed on a prebuilt binary, not including its build.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPU_BASELINE_WALL = 860.0      # s, our CPU f64 solve of the same case
TARGET_FACTOR = 10.0           # the BASELINE.md bar


def main() -> int:
    import jax
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/fvens_tpu/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from fvens_tpu.config import (BCSpec, FlowCaseConfig, LinearSolverConfig,
                                  NonlinearUpdateConfig, NumericsConfig,
                                  PhysicsConfig, PseudoTimeConfig)
    from fvens_tpu.cases.casesolvers import build_space, initial_state
    from fvens_tpu.mesh import compile_mesh
    from fvens_tpu.mesh.reader import read_mesh
    from fvens_tpu.mesh.meshgen import naca0012_omesh
    from fvens_tpu.solver.steady import (SteadyBackwardEuler, ToleranceError,
                                         residual_norm)

    ref_mesh = ("/root/reference/testcases/visc-naca0012/grids/"
                "NACA0012_lam_hybrid_1.msh")
    md = read_mesh(ref_mesh) if os.path.exists(ref_mesh) \
        else naca0012_omesh(160, 80)

    pcfg = PhysicsConfig(Minf=0.5, Reinf=5000.0, Tinf=288.15, viscous=True)
    ncfg = NumericsConfig(flux="ROE", gradient="LEASTSQUARES",
                          reconstruction="LINEAR", order2=True)
    bcs = [BCSpec(marker=2, type="adiabaticwall", values=(0.0,)),
           BCSpec(marker=4, type="inflowoutflow")]
    cfg = FlowCaseConfig(physics=pcfg, numerics=ncfg, bcs=bcs)
    mesh = compile_mesh(md, bcs, dtype=jnp.float64)
    space = build_space(cfg)
    nl = NonlinearUpdateConfig("full")

    def solver(mixed, tol, maxiter):
        lin = LinearSolverConfig(restart=90, maxiter=90, rtol=1e-2,
                                 pc="bcsgs", pc_sweeps=3,
                                 mixed_precision=mixed)
        pt = PseudoTimeConfig(cfl_init=500.0, cfl_fin=5000.0, tol=tol,
                              maxiter=maxiter)
        return SteadyBackwardEuler(space, pt, lin, nl)

    def cascade(report=False):
        """mixed phase to 3e-7, f64 tail to 1e-10 (vs the mixed phase's
        initial residual). Returns (u, steps, lin_iters)."""
        u0 = initial_state(space, mesh).astype(jnp.float64)
        u, info1 = solver(True, 3e-7, 600).solve(mesh, u0)
        # rebase the f64 tail target onto the original initres
        rhs, _ = space.compute_residual(mesh, u, True)
        r2 = float(residual_norm(mesh, rhs))
        tol2 = 1e-10 * info1.initres / r2
        u, info2 = solver(False, tol2, 300).solve(mesh, u)
        return u, info1.steps + info2.steps, \
            info1.total_lin_iters + info2.total_lin_iters

    # warmup: compile both phases' step programs (not measured)
    try:
        cascade()
    except ToleranceError:
        pass

    t0 = time.perf_counter()
    u, steps, lin_iters = cascade()
    jax.block_until_ready(u)
    wall = time.perf_counter() - t0

    # secondary: implicit-step throughput during the measured solve
    rate = mesh.n_cells * steps / wall

    print(json.dumps({
        "metric": "wallclock_to_1e-10_visc_naca0012",
        "value": wall,
        "unit": "s",
        "vs_baseline": (CPU_BASELINE_WALL / TARGET_FACTOR) / wall,
        "steps": steps,
        "lin_iters": lin_iters,
        "cells": mesh.n_cells,
        "cell_updates_per_sec": rate,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
