"""Preconditioner sweep benchmark harness.

Equivalent of the reference's threads_async perftest (FVENS
perftest/threads_async.cpp:5-18, threads_async_tests.cpp:102-330): sweep the
preconditioner configuration grid (kind x sweep counts x Krylov budget),
repeat each solve, and report averaged wall times and iteration counts.
On TPU the sweep axis is (preconditioner, color-sweeps) instead of
(threads, async build/apply sweeps).

Usage: python -m fvens_tpu.cases.perftest case.ctrl [--mesh_file m.msh]
           [--repeats 3] [--f32]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("control_file")
    ap.add_argument("--mesh_file", default=None)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from ..config import LinearSolverConfig
    from ..io_config import parse_control_file
    from .casesolvers import SteadyFlowCase, load_case_mesh

    cfg0 = parse_control_file(args.control_file, mesh_file=args.mesh_file)
    dtype = jnp.float32 if args.f32 else jnp.float64
    mesh = load_case_mesh(cfg0, dtype=dtype)

    grid = [
        ("bjacobi", 0, 60),
        ("bsgs", 2, 60),
        ("bsgs", 4, 60),
        ("bcsgs", 1, 30),
        ("bcsgs", 1, 60),
        ("bcsgs", 2, 60),
        ("bcsgs", 4, 60),
    ]
    results = []
    for pc, sweeps, kmax in grid:
        cfg = dataclasses.replace(cfg0, linear=LinearSolverConfig(
            restart=kmax, maxiter=kmax, rtol=1e-1, pc=pc, pc_sweeps=sweeps))
        case = SteadyFlowCase(cfg)
        walls, steps, its = [], [], []
        ok = True
        for rep in range(args.repeats):
            t0 = time.perf_counter()
            try:
                u, info, _ = case.run_output(mesh)
            except Exception as e:
                print(f"{pc}/{sweeps}/{kmax}: FAILED ({type(e).__name__})")
                ok = False
                break
            walls.append(time.perf_counter() - t0)
            steps.append(info.steps)
            its.append(info.total_lin_iters)
        if not ok:
            continue
        rec = {"pc": pc, "sweeps": sweeps, "krylov": kmax,
               "avg_wall_s": sum(walls) / len(walls),
               "min_wall_s": min(walls),
               "steps": steps[0], "total_lin_iters": its[0]}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    if results:
        best = min(results, key=lambda r: r["min_wall_s"])
        print("# best:", json.dumps(best))
    return 0


if __name__ == "__main__":
    sys.exit(main())
