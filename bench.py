"""Benchmark entry point (run by the driver on real TPU hardware).

Measures implicit pseudo-time solver throughput — cell-updates per second —
on the flagship laminar NACA0012 viscous case (the BASELINE.md north-star:
Roe + weighted-least-squares, implicit backward Euler, FGMRES(30) +
multicolor block-SGS). Prints ONE JSON line:

  {"metric": "cell_updates_per_sec", "value": N, "unit": "cells*steps/s",
   "vs_baseline": R}

vs_baseline: ratio to BASELINE.json's target of 10x a single-socket-CPU
FVENS run. FVENS publishes no absolute numbers (SURVEY.md sec 6), so the
stand-in CPU rate is this framework's own single-thread-competitive CPU
path measured on the same case (recorded below after first calibration).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/fvens_tpu/jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Estimated single-socket CPU FVENS rate for this case (cells*steps/s).
# Calibrated from our CPU backend run of the same implicit solve on the
# 13,156-cell NACA mesh (see docs/BENCH_NOTES.md); FVENS itself publishes no
# numbers. The BASELINE target is 10x this.
CPU_BASELINE_RATE = 55_928.0


def main() -> int:
    import jax
    import jax.numpy as jnp

    from fvens_tpu.config import (BCSpec, FlowCaseConfig, LinearSolverConfig,
                                  NonlinearUpdateConfig, NumericsConfig,
                                  PhysicsConfig, PseudoTimeConfig)
    from fvens_tpu.cases.casesolvers import build_space, initial_state
    from fvens_tpu.mesh import compile_mesh
    from fvens_tpu.mesh.reader import read_mesh
    from fvens_tpu.mesh.meshgen import naca0012_omesh
    from fvens_tpu.solver.steady import SteadyBackwardEuler

    dtype = jnp.float32

    ref_mesh = ("/root/reference/testcases/visc-naca0012/grids/"
                "NACA0012_lam_hybrid_1.msh")
    if os.path.exists(ref_mesh):
        md = read_mesh(ref_mesh)
    else:
        md = naca0012_omesh(160, 80)

    cfg = FlowCaseConfig(
        physics=PhysicsConfig(Minf=0.5, Reinf=5000.0, Tinf=288.15,
                              viscous=True),
        numerics=NumericsConfig(flux="ROE", gradient="LEASTSQUARES",
                                reconstruction="LINEAR", order2=True),
        bcs=[BCSpec(marker=2, type="adiabaticwall", values=(0.0,)),
             BCSpec(marker=4, type="inflowoutflow")],
        linear=LinearSolverConfig(restart=30, maxiter=30, rtol=1e-1,
                                  pc="bcsgs", pc_sweeps=1),
        nl_update=NonlinearUpdateConfig(scheme="full"),
    )
    mesh = compile_mesh(md, cfg.bcs, dtype=dtype)
    space = build_space(cfg)
    solver = SteadyBackwardEuler(
        space, PseudoTimeConfig(cfl_init=500.0, cfl_fin=5000.0, tol=0.0,
                                maxiter=10**9),
        cfg.linear, cfg.nl_update)

    import functools
    step = jax.jit(functools.partial(solver._step, mesh))

    u = initial_state(space, mesh).astype(dtype)
    cfl = jnp.asarray(500.0, dtype)
    rtol = jnp.asarray(0.1, dtype)

    # warmup (compile + 3 steps)
    for _ in range(3):
        u, res, iters = step(u, cfl, rtol)
    jax.block_until_ready(u)

    nsteps = 20
    t0 = time.perf_counter()
    for _ in range(nsteps):
        u, res, iters = step(u, cfl, rtol)
    jax.block_until_ready(u)
    dt = time.perf_counter() - t0

    rate = mesh.n_cells * nsteps / dt
    print(json.dumps({
        "metric": "cell_updates_per_sec",
        "value": rate,
        "unit": "cells*steps/s",
        "vs_baseline": rate / (10.0 * CPU_BASELINE_RATE),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
